package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestSession

/** Streaming wiring: TimeExtractor-style source wrap + foreachBatch
  * fan-out sink (every writer sees every micro-batch exactly once).
  */
class StreamingIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("timed source wrap + fanout sink deliver each micro-batch to all writers once") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[Long]
    val timed = StreamingIO.timed(ms.toDS())(x => x * 10)

    val rows = new scala.collection.concurrent.TrieMap[(Long, Long), Int]
    val batchCounts = new java.util.concurrent.atomic.AtomicLong(0)
    val q = StreamingIO.fanout(timed)(Seq(
        (b, _) => b.collect().foreach(r => rows.updateWith(r) {
          case Some(n) => Some(n + 1); case None => Some(1) }),
        (b, _) => { batchCounts.addAndGet(b.count()); () }
      )).start()
    try {
      ms.addData(1L, 2L, 3L); q.processAllAvailable()
      ms.addData(4L); q.processAllAvailable()
    } finally q.stop()

    assert(rows.keySet == Set((10L, 1L), (20L, 2L), (30L, 3L), (40L, 4L)))
    assert(rows.values.forall(_ == 1), s"duplicated delivery: $rows")
    assert(batchCounts.get() == 4L)
  }

  test("committedParquet sink is idempotent: a retried write converges, other batches survive") {
    val s = spark; import s.implicits._
    import graft.api.{GraftSink, GraftStream}
    import graft.time.Batcher

    val dir = java.nio.file.Files.createTempDirectory("graft_sink_commit_").toString
    val batcher = Batcher.ofMillis(1000)
    val sink = GraftSink.committedParquet[Long](dir, batcher)

    // first run writes batches 0 and 1
    sink.write(Seq((100L, 1L), (1200L, 2L)).toDS().map(identity))
    // a RETRY of a job covering batch 1 (plus a new batch 2): batch 1 is
    // overwritten in place — not appended — and batch 0 is untouched
    sink.write(Seq((1300L, 20L), (2500L, 3L)).toDS().map(identity))

    val rows = GraftStream.fromBatchedSink[Long](spark, dir).ds.collect().toSet
    assert(rows == Set((100L, 1L), (1300L, 20L), (2500L, 3L)))

    // re-running the identical write is a no-op on final state
    sink.write(Seq((1300L, 20L), (2500L, 3L)).toDS().map(identity))
    val again = GraftStream.fromBatchedSink[Long](spark, dir).ds.collect().toSet
    assert(again == rows)
  }

  test("a batched sink replays as a STREAM: existing batches first, new files follow") {
    val s = spark; import s.implicits._
    import graft.api.{GraftSink, GraftStream}
    import graft.time.Batcher

    val dir = java.nio.file.Files.createTempDirectory("graft_sink_stream_").toString
    val batcher = Batcher.ofMillis(1000)
    val sink = GraftSink.parquet[Long](dir, batcher)
    def writeVals(vs: (Long, Long)*): Unit =
      sink.write(vs.toSeq.toDS().map(identity))

    writeVals((100L, 11L), (1200L, 22L))
    val replay = GraftStream.fromBatchedSinkStream[Long](spark, dir)
      .map(_ * 10).toDF
    val q = replay.writeStream.format("memory").queryName("sink_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val first = spark.table("sink_replay").as[(Long, Long)].collect().toSet
      assert(first == Set((100L, 110L), (1200L, 220L)))
      // a late batch lands -> it arrives as a later micro-batch
      writeVals((2500L, 33L))
      q.processAllAvailable()
      val all = spark.table("sink_replay").as[(Long, Long)].collect().toSet
      assert(all == Set((100L, 110L), (1200L, 220L), (2500L, 330L)))
    } finally q.stop()
  }
}
