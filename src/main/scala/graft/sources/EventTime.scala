package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Representation-tolerant event-time ingestion.
  *
  * The engine's canonical event-time representation is a NANOS `Long`
  * (exact total ordering; exact `DIV 1000000` millis — floating division
  * would lose precision above 2^53 ns). The driver's `events.ts` parquet
  * column has shipped as BOTH `timestamp[ns]` (which Spark reads as a
  * nanos Long under `spark.sql.legacy.parquet.nanosAsLong=true`) and
  * `timestamp[us]` (which Spark reads as TIMESTAMP_NTZ, or TIMESTAMP when
  * the file says isAdjustedToUTC). A source must adapt to whatever the
  * data actually is — the reference extracts event time through a
  * job-supplied `T => Long` over whatever the source yields
  * (summingbird-core/src/main/scala/com/twitter/summingbird/TimeExtractor.scala:24-38)
  * precisely so a pipeline never hard-codes one physical layout — so time
  * normalization dispatches on the OBSERVED Spark type instead of assuming
  * a layout.
  */
object EventTime {

  /** Canonical nanos-Long column from whatever Spark read the source
    * column as. All three supported representations convert exactly:
    * micros * 1000 cannot overflow a Long for any timestamp this side of
    * year 2262, and the NTZ→instant cast is exact under the UTC session
    * zone every entrypoint pins.
    */
  def nanosCol(dt: DataType, c: Column): Column = dt match {
    case LongType => c // legacy timestamp[ns] layout read via nanosAsLong
    case TimestampType => unix_micros(c) * lit(1000L)
    case TimestampNTZType => unix_micros(c.cast(TimestampType)) * lit(1000L)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported event-time column type ${other.simpleString}: expected " +
        "BIGINT nanos (legacy nanosAsLong layout), TIMESTAMP, or TIMESTAMP_NTZ")
  }

  /** Replace `colName` with its canonical nanos-Long form (no-op for the
    * legacy Long layout). Downstream code sees ONE representation
    * regardless of what the parquet writer chose.
    */
  def normalize(df: DataFrame, colName: String = "ts"): DataFrame =
    df.withColumn(colName, nanosCol(df.schema(colName).dataType, df.col(colName)))

  /** Startup schema contract: assert the canonical time column derives
    * from `dir/events.parquet`, failing with ONE message that names the
    * table, column, and observed physical type — instead of the 66 opaque
    * per-query AnalysisExceptions a silent layout change produced in
    * round 10. Returns a short description for the bench/verify stdout.
    */
  def contractProbe(spark: SparkSession, dir: String): String = {
    val path = s"$dir/events.parquet"
    val raw =
      try spark.read.parquet(path)
      catch {
        case e: Throwable => throw new IllegalStateException(
          s"schema contract: cannot read $path: ${e.getMessage}", e)
      }
    val dt = raw.schema.fields.find(_.name == "ts").map(_.dataType).getOrElse(
      throw new IllegalStateException(
        s"schema contract: $path has no `ts` column (schema: ${raw.schema.simpleString})"))
    val derived =
      try normalize(raw).selectExpr("ts", "ts DIV 1000000 AS ts_ms").limit(1).collect()
      catch {
        case e: Throwable => throw new IllegalStateException(
          s"schema contract: events.ts (${dt.simpleString}) does not derive the " +
          s"canonical nanos time column: ${e.getMessage}", e)
      }
    if (derived.isEmpty || derived.head.isNullAt(1))
      throw new IllegalStateException(
        s"schema contract: events.ts (${dt.simpleString}) derived an empty/NULL " +
        "canonical time value")
    s"events.ts=${dt.simpleString}->nanosLong"
  }
}
