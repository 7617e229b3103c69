package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("gaps-and-islands model: exactly-gap boundary starts a new session; ties share one") {
    val s = spark; import s.implicits._
    val gap = 1800000L
    // user 1: two close events, then one exactly `gap` after the second
    // (must START a session — the half-open session_window convention),
    // duplicated at the same ts (ties stay in one session); user 2: lone event
    val rows = Seq((1L, 0L), (1L, 1000L), (1L, 1000L + gap), (1L, 1000L + gap), (2L, 5L))
    val got = Sessionize.sessionize(rows.toDF("user_id", "ts_ms"), "user_id", "ts_ms", gap)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0L, 1000L, 2L),
      (1L, 2L, 1000L + gap, 1000L + gap, 2L),
      (2L, 1L, 5L, 5L, 1L)))
  }

  test("batch == streaming session_window on a deterministic feed") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val gap = 60000L
    val rows = Seq((1L, 0L), (1L, 30000L), (1L, 100000L), (2L, 10L), (2L, 59000L), (2L, 200000L))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val out = Sessionize.sessionizeStreaming(
      ms.toDS().toDF("user_id", "__ms").withColumn("ts", timestamp_millis(col("__ms"))),
      "user_id", "ts", gapMs = gap, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess_spec_sink")
      .outputMode("append").start()
    try {
      ms.addData(rows)
      q.processAllAvailable()
      ms.addData(Seq((-1L, 10000000L))) // flush watermark past every session
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_spec_sink").where(col("user_id") =!= -1L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = Sessionize.sessionize(rows.toDF("user_id", "ts_ms"), "user_id", "ts_ms", gap)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("plan audit: every window is partitioned by the key — no single-partition exchange") {
    val s = spark; import s.implicits._
    val df = Seq.tabulate(100)(i => (i.toLong % 7, i.toLong * 1000)).toDF("user_id", "ts_ms")
    val plan = Sessionize.sessionize(df, "user_id", "ts_ms", 30000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("hashpartitioning(user_id"), plan)
  }
}
