package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** The buffered stream-stream leftJoin (reference leftJoin(stream, buffer))
  * on real MemoryStreams: matches inside the window join, right events
  * outside the trailing window don't, and unmatched left events complete
  * with nulls once the watermark passes.
  */
class StreamingJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("windowed buffer join: in-window match, out-of-window miss, outer completion") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lefts = MemoryStream[(Long, Long, String)]  // (ms, user, what)
    val rights = MemoryStream[(Long, Long, String)] // (ms, user, tag)
    val lDf = lefts.toDS().toDF("lms", "l_user", "what")
      .withColumn("lts", timestamp_millis(col("lms")))
    val rDf = rights.toDS().toDF("rms", "r_user", "tag")
      .withColumn("rts", timestamp_millis(col("rms")))

    val joined = StreamingJoin.leftJoinBuffered(
        lDf, "lts", rDf, "rts", Seq("l_user" -> "r_user"),
        windowMs = 1000L, watermarkMs = 500L)
      .select(col("lms"), col("l_user"), col("what"), col("tag"))

    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      // right write at t=1000 for user 1; left lookups at t=1500 (in window),
      // t=2500 (window passed); user 2 left at t=1500 never matches
      rights.addData((1000L, 1L, "promo"))
      lefts.addData((1500L, 1L, "hit"), (2500L, 1L, "stale"), (1500L, 2L, "miss"))
      q.processAllAvailable()
      // flush events far in the future push the watermark past everything
      rights.addData((100000L, 99L, "flushR"))
      lefts.addData((100000L, 99L, "flushL"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("sj_out").as[(Long, Long, String, Option[String])]
      .collect().filter(_._2 != 99L).toSet
    assert(rows == Set(
      (1500L, 1L, "hit", Some("promo")),
      (2500L, 1L, "stale", None),
      (1500L, 2L, "miss", None)))
  }
}
