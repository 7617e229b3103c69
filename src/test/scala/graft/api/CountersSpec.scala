package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** The reference Counter contract: created per (group, name) under a job
  * id, incremented from inside operator closures on the executors, read
  * on the driver. In local mode each task runs exactly once, so the
  * values here are exact.
  */
class CountersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("counters increment from inside GraftStream closures, driver reads totals") {
    val s = spark; import s.implicits._
    val seen = Counters.counter(spark, "job", "events_seen")
    val dropped = Counters.counter(spark, "job", "events_dropped")
    val before = (seen.value, dropped.value)
    val out = GraftStream.from((1L to 100L).map(i => (i, i)).toDS())(_._1)
      .map { e => seen.incr(); e }
      .filter { e =>
        val keep = e._2 % 4 != 0
        if (!keep) dropped.incr()
        keep
      }
      .ds.count()
    assert(out == 75L)
    assert(seen.value - before._1 == 100L)
    assert(dropped.value - before._2 == 25L)
  }

  test("re-requesting a counter returns the same one; forSession lists registrations") {
    val a = Counters.counter(spark, "g2", "n1")
    val b = Counters.counter(spark, "g2", "n1")
    a.incrBy(5L)
    assert(b.value == a.value)
    val names = Counters.forSession(spark).map(c => (c.group, c.name))
    assert(names.contains(("g2", "n1")) && names.contains(("job", "events_seen")))
    assert(names == names.sorted)
  }

  test("snapshot maps group.name -> value with sorted keys") {
    val c1 = Counters.counter(spark, "snap", "zeta")
    val c2 = Counters.counter(spark, "snap", "alpha")
    c1.incrBy(3L); c2.incrBy(11L)
    val snap = Counters.snapshot(spark)
    assert(snap("snap.zeta") == c1.value && snap("snap.alpha") == c2.value)
    assert(snap.keys.toSeq == snap.keys.toSeq.sorted)
    // a later increment shows in a later snapshot, not the earlier one
    c1.incr()
    assert(Counters.snapshot(spark)("snap.zeta") == snap("snap.zeta") + 1)
  }

  test("counters work under Structured Streaming micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = spark; import s.implicits._
    val c = Counters.counter(spark, "stream", "rows")
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    ms.addData(1L to 40L: _*)
    val q = ms.toDS().map { x => c.incr(); x }
      .writeStream.format("noop").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(c.value == 40L)
  }

  test("job scopes isolate same-named counters; snapshots keep historical keys") {
    val a = Counters.counterFor(spark, "jobA", "core", "emitted")
    val b = Counters.counterFor(spark, "jobB", "core", "emitted")
    val d = Counters.counter(spark, "core", "emitted") // DefaultJob scope
    a.incrBy(7L); b.incrBy(2L); d.incrBy(40L)
    assert(a.value == 7L && b.value == 2L && d.value == 40L)
    assert(Counters.counterFor(spark, "jobA", "core", "emitted").value == 7L)
    assert(Counters.forJob(spark, "jobA").map(c => (c.group, c.name)) ==
      Seq(("core", "emitted")))
    val snap = Counters.snapshot(spark)
    // default scope keeps the un-prefixed key (Verify artifact stability);
    // named jobs prefix theirs
    assert(snap("core.emitted") == 40L)
    assert(snap("jobA.core.emitted") == 7L && snap("jobB.core.emitted") == 2L)
    assert(Counters.snapshotFor(spark, "jobB") == Map("core.emitted" -> 2L))
  }

  test("streaming counters are monotone across micro-batch triggers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = spark; import s.implicits._
    val c = Counters.counterFor(spark, "mono", "stream", "rows")
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = ms.toDS().map { x => c.incr(); x }
      .writeStream.format("noop").outputMode("append").start()
    val observed = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      (0 until 4).foreach { i =>
        ms.addData((1L to 10L).map(_ + i * 10): _*)
        q.processAllAvailable()
        observed += Counters.snapshotFor(spark, "mono")("stream.rows")
      }
    } finally q.stop()
    // accumulator totals never decrease trigger over trigger, and each
    // trigger's delta is exactly that micro-batch's row count here
    // (local mode: every task runs once)
    assert(observed.toSeq == Seq(10L, 20L, 30L, 40L))
    assert(observed.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }
}
