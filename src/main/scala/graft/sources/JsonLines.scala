package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines corpus ingestion — the wire format web-crawl corpora
  * actually ship in (one JSON object per line, usually gzip parts).
  *
  * Two contracts matter at 100 TB and both are explicit here:
  *
  *   1. **The schema is always supplied, never inferred.** Spark's JSON
  *      schema inference is a full extra pass over the data before the
  *      real job starts — doubling the scan cost of the largest input in
  *      the pipeline — and it infers from whatever happens to be present,
  *      so two crawl slices can come back with different schemas. The
  *      reference's sources are schema-carrying for the same reason (a
  *      source is `PipeFactory[T]` of a KNOWN T, never "whatever parses" —
  *      summingbird-scalding/.../ScaldingPlatform.scala:715-719).
  *   2. **Corrupt lines are either fatal or quarantined, never silently
  *      nulled.** Spark's default PERMISSIVE mode turns an unparseable
  *      line into a row of nulls — at crawl scale that silently injects
  *      millions of empty documents into the corpus. [[read]] is FAILFAST;
  *      [[readWithQuarantine]] keeps the pipeline running but returns the
  *      bad raw lines as a second frame to audit, count, and alert on.
  */
object JsonLines {

  /** Strict read: `path` with the supplied schema, any corrupt line fails
    * the job loudly (FAILFAST). The parse is distributed and columnar —
    * JSON decoding happens inside the scan, column pruning still applies
    * (unread fields are skipped by the parser).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Tolerant read: (good rows, quarantined raw lines). Good rows carry
    * the supplied schema; the quarantine frame is (line: string) holding
    * each unparseable input line verbatim for offline audit.
    *
    * Built on a text scan + `from_json` rather than the JSON source's
    * `_corrupt_record` column: Spark refuses a corrupt-column-only
    * projection from a raw JSON scan unless the parse is cached first,
    * and caching a crawl-sized parse is not a library's call to make.
    * `from_json` yields a NULL struct exactly when the line is not a
    * parseable JSON object, so both frames are narrow codegen'd filters
    * over the same text scan. A line that parses but carries a
    * wrong-typed field stays "good" with that field null — quarantine is
    * for unparseable lines, not schema drift (the TableContract layer
    * owns drift).
    */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not declare _corrupt_record; it is added internally")
    val withCorrupt = schema.add("_corrupt_record", "string")
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("__row"))
    // corrupt = the parser's own verdict (the corrupt field carries the
    // raw line) OR a shape from_json maps to a NULL struct outright
    val isBad = col("__row").isNull ||
      col("__row._corrupt_record").isNotNull
    val good = parsed.where(!isBad)
      .select(schema.fieldNames.map(f => col(s"__row.$f")).toIndexedSeq: _*)
    val bad = parsed.where(isBad).select(col("value").as("line"))
    (good, bad)
  }

  /** Write `df` as JSON-lines parts under `path` — the interchange-export
    * side of the same format (one object per line, field names verbatim,
    * no top-level array). Compression rides Spark's standard option
    * (`codec`: e.g. "gzip" for crawl-style .json.gz parts; None = plain).
    */
  def write(df: DataFrame, path: String, codec: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }
}
