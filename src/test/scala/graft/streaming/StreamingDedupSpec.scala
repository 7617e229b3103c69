package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Streaming exact dedup: first arrival of a digest passes, later
  * byte-identical arrivals drop — across micro-batches — and only under
  * the watermarked form is that state bounded.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("exact drops cross-micro-batch byte duplicates, keeps first arrival") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(Long, String)]
    val deduped = StreamingDedup.exact(
      ms.toDS().toDF("id", "text"), "text")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      ms.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      ms.addData((4L, "beta"), (5L, "gamma"), (6L, "gamma"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sdedup").as[(Long, String)].collect().toMap
    // one survivor per distinct text; within a micro-batch either id may
    // win (no event-time order in the unbounded form), across batches the
    // earlier batch always wins
    assert(got.values.toSet == Set("alpha", "beta", "gamma"))
    assert(got.size == 3)
    assert(got.find(_._2 == "beta").get._1 == 2L,   "batch-1 beta must beat batch-2 beta")
    assert(Set(5L, 6L).contains(got.find(_._2 == "gamma").get._1))
  }

  test("exactWithinHorizon bounds state: duplicates inside the horizon drop") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = StreamingDedup.exactWithinHorizon(
      ms.toDS().toDF("ts", "text"), "text", "ts", "10 seconds")
    val q = deduped.writeStream.format("memory").queryName("sdedup_wm")
      .outputMode("append").start()
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    try {
      ms.addData((t(1), "alpha"), (t(2), "beta"))
      q.processAllAvailable()
      // in-horizon duplicates: dropped
      ms.addData((t(3), "alpha"), (t(4), "beta"), (t(5), "gamma"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sdedup_wm").select(col("text")).as[String].collect().toSeq
    assert(got.sorted == Seq("alpha", "beta", "gamma"))
  }
}
