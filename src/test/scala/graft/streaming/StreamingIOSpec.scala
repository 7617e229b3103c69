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
}
