package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Delimited-text corpus ingestion — the other wire format metadata
  * tables ship in (CSV/TSV parts). Same two contracts as [[JsonLines]]:
  * the schema is always SUPPLIED (no inference pass over the largest
  * input), and corrupt lines are fatal or quarantined verbatim, never
  * silently nulled into the corpus. Parts are written headerless so the
  * strict and quarantine paths parse identical bytes.
  */
object CsvLines {

  /** Strict read: FAILFAST on any unparseable line. Whitespace is
    * significant (Spark's default CSV write/read trims it — silent
    * corruption for a text corpus, so both sides disable trimming).
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST").option("header", "false")
      .option("sep", delimiter)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  /** Tolerant read: (good rows, quarantined raw lines) — text scan +
    * `from_csv` with the parser's own corrupt-record verdict, the same
    * shape (and for the same reason) as [[JsonLines.readWithQuarantine]].
    */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType, delimiter: String = ","): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not declare _corrupt_record; it is added internally")
    val withCorrupt = schema.add("_corrupt_record", "string")
    val parsed = spark.read.text(path)
      .select(col("value"), from_csv(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "sep" -> delimiter,
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("__row"))
    val isBad = col("__row").isNull || col("__row._corrupt_record").isNotNull
    val good = parsed.where(!isBad)
      .select(schema.fieldNames.map(f => col(s"__row.$f")).toIndexedSeq: _*)
    val bad = parsed.where(isBad).select(col("value").as("line"))
    (good, bad)
  }

  /** Write headerless CSV parts (values quoted as needed; `codec` e.g.
    * "gzip" for .csv.gz parts).
    */
  def write(df: DataFrame, path: String, delimiter: String = ",",
      codec: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .option("header", "false").option("sep", delimiter)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
    codec.fold(w)(c => w.option("compression", c)).csv(path)
  }
}
