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

  test("sessionizePreSplit == plain, including sessions straddling chunk boundaries") {
    val s = spark; import s.implicits._
    val gap = 100L
    // chunk = 1000: user 1's first session spans the 1000 boundary through
    // THREE chunks (995, 1005, ..., 2050 with all inter-event gaps < 100);
    // a second session starts exactly at +gap; user 2 sits in one chunk;
    // user 3 has an empty middle chunk between two sessions
    val rows = Seq(
      (1L, 900L), (1L, 995L), (1L, 1005L), (1L, 1100L), (1L, 1190L),
      (1L, 1290L), (1L, 1950L), (1L, 2040L),
      (1L, 2040L + gap), // exactly-gap -> new session
      (2L, 300L), (2L, 350L),
      (3L, 100L), (3L, 3100L))
    val df = rows.toDF("user_id", "ts_ms")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Long, Long, Long)].collect().toSet
    val plain = canon(Sessionize.sessionize(df, "user_id", "ts_ms", gap))
    for (chunk <- Seq(1000L, 100L, 5000L)) {
      val split = canon(Sessionize.sessionizePreSplit(df, "user_id", "ts_ms",
        gap, chunkMs = chunk))
      assert(split == plain, s"chunkMs=$chunk")
    }
    // sanity: the straddling session really merged across the 1000
    // chunk boundary (900..1190 — the 1190->1290 gap is exactly gapMs
    // and splits — 5 events, chunks 0 and 1)
    assert(plain.exists { case (u, _, st, en, n) => u == 1L && st == 900L && n == 5L && en == 1190L })
    // a chunk smaller than the gap refuses loudly
    val e = intercept[IllegalArgumentException] {
      Sessionize.sessionizePreSplit(df, "user_id", "ts_ms", gapMs = 100L, chunkMs = 50L)
    }
    assert(e.getMessage.contains("chunkMs"), e.getMessage)
  }

  test("sessionizePreSplit == plain on a randomized burst pattern (default chunk)") {
    val s = spark; import s.implicits._
    // deterministic pseudo-random bursts: 3 users, ts spread over ~40 gaps
    val gap = 1000L
    val rows = for {
      u <- 1L to 3L
      i <- 0 until 120
    } yield (u, (i * 137 + u * 53) % 40000L)
    val df = rows.toDF("user_id", "ts_ms")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(canon(Sessionize.sessionizePreSplit(df, "user_id", "ts_ms", gap)) ==
      canon(Sessionize.sessionize(df, "user_id", "ts_ms", gap)))
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
