package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Null marker pinned on BOTH write and read (the MySQL-dump
    * convention): Spark's defaults let empty-string and null collapse
    * into each other across a round-trip — fatal ambiguity for corpus
    * text columns where "" (an empty document) and null (no value)
    * mean different things.
    *
    * Known plain-path limitation (inherent to any in-band marker): a
    * string value LITERALLY equal to the sentinel is indistinguishable
    * from null and reads back as null — the MySQL-dump caveat. The
    * escaped variants do not have it: [[writeEscaped]] percent-encodes
    * the backslash, so a literal `\N` value becomes `%5CN` on the wire
    * and decodes back exactly.
    */
  private val NullSentinel = "\\N"

  /** Strict read: FAILFAST on any unparseable line. Whitespace is
    * significant (Spark's default CSV write/read trims it — silent
    * corruption for a text corpus, so both sides disable trimming).
    * `multiLine` parses RFC-4180 quoted fields with embedded newlines —
    * what [[write]] emits for such values — at the cost of per-file
    * (not per-split) parallelism; corpora known newline-free can pass
    * `multiLine = false` to restore splittable reads.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ",", multiLine: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST").option("header", "false")
      .option("sep", delimiter)
      .option("multiLine", multiLine.toString)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", NullSentinel)
      .option("emptyValue", "")
      .csv(path)

  /** Tolerant read: (good rows, quarantined raw lines) — text scan +
    * `from_csv` with the parser's own corrupt-record verdict, the same
    * shape (and for the same reason) as [[JsonLines.readWithQuarantine]].
    *
    * LINE-BASED by construction (the text scan splits on newlines before
    * parsing), so records carrying embedded newlines cannot be
    * reassembled here: their fragments fail to parse and land in
    * quarantine rather than silently corrupting the corpus. A corpus
    * with multi-line values must use the strict [[read]] (multiLine),
    * which parses them exactly — tolerant mode trades that for
    * splittable scans and verbatim quarantine lines.
    */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType, delimiter: String = ","): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not declare _corrupt_record; it is added internally")
    val withCorrupt = schema.add("_corrupt_record", "string")
    val parsed = spark.read.text(path)
      .select(col("value"), from_csv(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "sep" -> delimiter,
          "nullValue" -> NullSentinel, "emptyValue" -> "",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("__row"))
    val isBad = col("__row").isNull || col("__row._corrupt_record").isNotNull
    val good = parsed.where(!isBad)
      .select(schema.fieldNames.map(f => col(s"__row.$f")).toIndexedSeq: _*)
    val bad = parsed.where(isBad).select(col("value").as("line"))
    (good, bad)
  }

  /* Percent-encoding of the record-structure bytes (%, CR, LF) plus the
   * backslash (so a value literally equal to the \N null sentinel stays
   * distinguishable from null) for the ESCAPED variants: every record
   * becomes one physical line, so the line-based quarantine scan can
   * never split a record — the failure mode where a fragment of a quoted
   * multi-line value parses cleanly (e.g. a text line "7,foo" inside a
   * document) and silently corrupts the corpus. Chained regexp replaces,
   * codegen'd, exactly reversible: encode % first, decode it last.
   */
  private def encodeLine(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, lit("%"), lit("%25")), lit("\\\\"), lit("%5C")),
      lit("\r"), lit("%0D")), lit("\n"), lit("%0A"))

  private def decodeLine(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, lit("%0A"), lit("\n")), lit("%0D"), lit("\r")),
      lit("%5C"), lit("\\\\")), lit("%25"), lit("%"))

  private def mapStringCols(df: DataFrame, f: Column => Column): DataFrame = {
    val cols = df.schema.fields.map { fd =>
      if (fd.dataType == org.apache.spark.sql.types.StringType)
        f(col(fd.name)).as(fd.name)
      else col(fd.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** [[write]] with string columns percent-encoded so every record is ONE
    * physical line — the wire format whose tolerant read
    * ([[readEscapedWithQuarantine]]) is structurally safe for values with
    * embedded newlines. Non-string columns pass through untouched.
    */
  def writeEscaped(df: DataFrame, path: String, delimiter: String = ",",
      codec: Option[String] = None): Unit =
    write(mapStringCols(df, encodeLine), path, delimiter, codec)

  /** Tolerant read of [[writeEscaped]] output: line-based quarantine scan
    * (records are single-line by construction), good rows decoded back to
    * their exact original values, quarantined lines verbatim as written.
    */
  def readEscapedWithQuarantine(spark: SparkSession, path: String,
      schema: StructType, delimiter: String = ","): (DataFrame, DataFrame) = {
    val (good, bad) = readWithQuarantine(spark, path, schema, delimiter)
    (mapStringCols(good, decodeLine), bad)
  }

  /** Write headerless CSV parts (values quoted as needed — embedded
    * newlines land RFC-4180-quoted, which the strict multiLine [[read]]
    * parses back exactly; `codec` e.g. "gzip" for .csv.gz parts). Null
    * and empty string are written distinguishably ([[NullSentinel]] vs
    * `""`), mirroring the read options, so both round-trip exactly.
    */
  def write(df: DataFrame, path: String, delimiter: String = ",",
      codec: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .option("header", "false").option("sep", delimiter)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", NullSentinel)
      .option("emptyValue", "\"\"")
    codec.fold(w)(c => w.option("compression", c)).csv(path)
  }
}
