package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestSession

/** The round-10 regression class, pinned forever: the engine must ingest
  * `events.ts` in EVERY physical layout the driver's generator has shipped
  * — legacy `timestamp[ns]`-as-Long, `timestamp[us]` NTZ, and
  * `timestamp[us, tz=UTC]` — and a layout it cannot ingest must fail with
  * ONE loud schema-contract message, not per-query analysis errors.
  */
class EventTimeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // one logical dataset: (event nanos-since-epoch, user, value); nanos
  // chosen non-round so µs truncation in the timestamp layouts is visible
  // if any path double-converts
  private val rowsNanos = Seq(
    (1700000000123456000L, 1L, 2.0),
    (1700000000123457000L, 1L, 3.0),
    (1700086400000001000L, 2L, 5.0),
    (1700172800999999000L, 3L, 7.0))

  /** Write the logical dataset in the requested physical layout; returns
    * the fixture dir (with the table at `events.parquet`, as in testdata).
    */
  private def fixture(layout: String): String = {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ts_$layout").toString
    val base = rowsNanos.toDF("ts", "user_id", "value")
    val df = layout match {
      case "nanosLong" => base // plain int64 column
      case "microsLtz" => base.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case "microsNtz" => base.withColumn("ts",
        expr("timestamp_micros(ts DIV 1000)").cast(TimestampNTZType))
      case "string" => base.withColumn("ts", col("ts").cast(StringType))
      case "noTs" => base.drop("ts")
    }
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readNorm(dir: String) =
    EventTime.normalize(spark.read.parquet(s"$dir/events.parquet"))

  test("all three supported layouts normalize to the SAME nanos Long column") {
    val legacy = readNorm(fixture("nanosLong"))
    assert(legacy.schema("ts").dataType == LongType)
    assert(legacy.select("ts").collect().map(_.getLong(0)).sorted
      === rowsNanos.map(_._1).sorted.toArray)

    for (layout <- Seq("microsLtz", "microsNtz")) {
      val df = readNorm(fixture(layout))
      assert(df.schema("ts").dataType == LongType, layout)
      // µs-resolution layouts carry ts truncated to micros; our fixture
      // nanos are all whole-µs so equality is exact
      assert(df.select("ts").collect().map(_.getLong(0)).sorted
        === rowsNanos.map(_._1).sorted.toArray, layout)
    }
  }

  test("a keyed time-bucketed aggregation is layout-invariant") {
    def agg(dir: String): Set[(Long, Long, Double)] =
      readNorm(dir)
        .select(expr("ts DIV 1000000").as("ts_ms"), col("user_id"), col("value"))
        .groupBy(expr("ts_ms DIV 86400000").as("day"), col("user_id"))
        .agg(sum("value").as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = agg(fixture("nanosLong"))
    assert(expected.nonEmpty)
    assert(agg(fixture("microsLtz")) == expected)
    assert(agg(fixture("microsNtz")) == expected)
  }

  test("an unsupported layout fails loudly at nanosCol, naming the observed type") {
    val df = spark.read.parquet(s"${fixture("string")}/events.parquet")
    val e = intercept[IllegalArgumentException] {
      EventTime.normalize(df)
    }
    assert(e.getMessage.contains("string"), e.getMessage)
    assert(e.getMessage.contains("event-time"), e.getMessage)
  }

  test("contractProbe: ok line for every supported layout; ONE loud message otherwise") {
    assert(EventTime.contractProbe(spark, fixture("nanosLong"))
      .contains("bigint"))
    assert(EventTime.contractProbe(spark, fixture("microsNtz"))
      .contains("timestamp_ntz"))
    assert(EventTime.contractProbe(spark, fixture("microsLtz"))
      .contains("timestamp"))
    // the real driver testdata must satisfy the contract as-is
    assert(EventTime.contractProbe(spark, "/root/testdata/sf0.001").nonEmpty)

    val broken = intercept[IllegalStateException] {
      EventTime.contractProbe(spark, fixture("string"))
    }
    assert(broken.getMessage.contains("schema contract"), broken.getMessage)
    val missing = intercept[IllegalStateException] {
      EventTime.contractProbe(spark, fixture("noTs"))
    }
    assert(missing.getMessage.contains("no `ts` column"), missing.getMessage)
  }
}
