package graft.api

import java.util.concurrent.atomic.{AtomicInteger, AtomicBoolean}

import scala.concurrent.Future

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestSession

/** Counting mock for the live-lookup connector. Static state is fine here:
  * local-mode tests run executors in the test JVM.
  */
object CountingService {
  val opens = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  val calls = new AtomicInteger(0)
  val maxBatch = new AtomicInteger(0)
  val inflight = new AtomicInteger(0)
  val maxInflight = new AtomicInteger(0)
  val closedBeforeLookup = new AtomicBoolean(false)

  def reset(): Unit = {
    opens.set(0); closes.set(0); calls.set(0); maxBatch.set(0)
    inflight.set(0); maxInflight.set(0); closedBeforeLookup.set(false)
  }

  private def bumpMax(target: AtomicInteger, v: Int): Unit = {
    var cur = target.get()
    while (v > cur && !target.compareAndSet(cur, v)) cur = target.get()
  }

  /** Service mapping k -> k * 10 for even keys only (odd keys miss). */
  def service(delayMs: Long = 0): ExternalService[Long, Long] =
    new ExternalService[Long, Long] {
      def open(): ExternalService.Conn[Long, Long] = {
        opens.incrementAndGet()
        val closed = new AtomicBoolean(false)
        new ExternalService.Conn[Long, Long] {
          def multiGet(keys: Seq[Long]): Future[Map[Long, Long]] = {
            if (closed.get()) closedBeforeLookup.set(true)
            calls.incrementAndGet()
            bumpMax(maxBatch, keys.size)
            bumpMax(maxInflight, inflight.incrementAndGet())
            import scala.concurrent.ExecutionContext.Implicits.global
            Future {
              if (delayMs > 0) Thread.sleep(delayMs)
              val r = keys.iterator.filter(_ % 2 == 0).map(k => k -> k * 10).toMap
              inflight.decrementAndGet()
              r
            }
          }
          def close(): Unit = { closed.set(true); closes.incrementAndGet() }
        }
      }
    }
}

/** Static failure counter for the flaky-service laws (local-mode: executors
  * share the test JVM).
  */
object FlakyService {
  val failuresLeft = new AtomicInteger(0)
  /** Fails each multiGet while failuresLeft > 0, then behaves like
    * CountingService.service (k -> k*10 for even keys).
    */
  def service(): ExternalService[Long, Long] = new ExternalService[Long, Long] {
    def open(): ExternalService.Conn[Long, Long] = new ExternalService.Conn[Long, Long] {
      def multiGet(keys: Seq[Long]): Future[Map[Long, Long]] =
        if (failuresLeft.getAndDecrement() > 0)
          Future.failed(new RuntimeException("transient service failure"))
        else
          Future.successful(keys.iterator.filter(_ % 2 == 0).map(k => k -> k * 10).toMap)
      def close(): Unit = ()
    }
  }
}

class ExternalServiceSpec extends AnyFunSuite with Matchers {
  private val spark = SparkTestSession.spark

  private def keyed(n: Int, partitions: Int) = {
    val s = spark; import s.implicits._
    val evs = (0 until n).map(i => (i.toLong, (i % 37).toLong, i.toLong * 3))
    new KeyedGraftStream(evs.toDS().repartition(partitions))
  }

  test("failure policy: retries recover a transient failure; missOnFailure degrades to misses") {
    val s = spark; import s.implicits._
    // one partition, one batch => exactly one initial multiGet
    def run(retries: Int, missOnFailure: Boolean) =
      keyed(40, 1).leftJoinExternal(FlakyService.service(), batchSize = 100,
          retries = retries, missOnFailure = missOnFailure)
        .ds.map { case (_, k, (v, w)) => (k, v, w) }.collect()

    FlakyService.failuresLeft.set(1) // first call fails, retry succeeds
    val recovered = run(retries = 1, missOnFailure = false)
    assert(recovered.length == 40)
    assert(recovered.forall { case (k, _, w) => w == (if (k % 2 == 0) Some(k * 10) else None) })

    FlakyService.failuresLeft.set(1000) // never recovers
    val degraded = run(retries = 2, missOnFailure = true)
    assert(degraded.length == 40 && degraded.forall(_._3.isEmpty))

    FlakyService.failuresLeft.set(1000)
    val ex = intercept[org.apache.spark.SparkException] {
      run(retries = 1, missOnFailure = false)
    }
    assert(ex.getMessage.contains("transient service failure")
      || Option(ex.getCause).exists(_.getMessage.contains("transient service failure")))
  }

  test("leftJoinExternal == leftJoinDs on the same service data (misses included)") {
    val s = spark; import s.implicits._
    CountingService.reset()
    val stream = keyed(500, 4)
    val ext = stream.leftJoinExternal(CountingService.service(), batchSize = 32, maxWaiting = 3)
      .ds.collect().sortBy(r => (r._1, r._2))
    val svcDs = (0L until 37L).filter(_ % 2 == 0).map(k => (k, k * 10)).toDS()
    val ref = keyed(500, 4).leftJoinDs(svcDs)
      .ds.collect().sortBy(r => (r._1, r._2))
    ext should contain theSameElementsInOrderAs ref
    // every row survives, misses are None
    ext.length shouldBe 500
    assert(ext.exists(_._3._2.isEmpty) && ext.exists(_._3._2.nonEmpty))
  }

  test("one connection per non-empty partition, closed exactly once, batches bounded") {
    val s = spark; import s.implicits._
    CountingService.reset()
    val stream = keyed(1000, 5)
    stream.leftJoinExternal(CountingService.service(), batchSize = 64, maxWaiting = 2)
      .ds.collect()
    CountingService.opens.get() shouldBe 5
    CountingService.closes.get() shouldBe 5
    CountingService.maxBatch.get() should be <= 64
    CountingService.closedBeforeLookup.get() shouldBe false
    // batched, not per-row: 1000 rows / 64 per batch ~= 16 calls, never 1000
    CountingService.calls.get() should be <= 5 * (1000 / 5 / 64 + 1)
  }

  test("pipelining keeps at most maxWaiting lookups in flight") {
    val s = spark; import s.implicits._
    CountingService.reset()
    val stream = keyed(600, 2)
    stream.leftJoinExternal(CountingService.service(delayMs = 5), batchSize = 10, maxWaiting = 3)
      .ds.collect()
    // 2 partitions * 3 waiting max
    CountingService.maxInflight.get() should be <= 2 * 3
    CountingService.maxInflight.get() should be >= 2 // it does overlap lookups
  }

  test("fromFunction wraps a plain lookup with the same join semantics") {
    val s = spark; import s.implicits._
    val f: Long => Option[String] = k => if (k < 10) Some(s"u$k") else None
    val rows = keyed(100, 3)
      .leftJoinExternal(ExternalService.fromFunction(f), batchSize = 7)
      .ds.collect()
    rows.foreach { case (_, k, (_, w)) => w shouldBe f(k) }
  }

  test("leftJoinExternal works on a STREAMING dataset; connections close per micro-batch") {
    // the online form of the reference's service leftJoin: the same
    // connector runs under Structured Streaming, opening fresh connections
    // in each micro-batch's tasks and closing every one at task end
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    CountingService.reset()
    val ms = MemoryStream[(Long, Long, Long)]
    val joined = new KeyedGraftStream(ms.toDS())
      .leftJoinExternal(CountingService.service(), batchSize = 8, maxWaiting = 2)
    val q = joined.ds.writeStream.format("memory").queryName("ext_stream_out")
      .outputMode("append").start()
    try {
      ms.addData((1L, 2L, 10L), (2L, 3L, 20L)); q.processAllAvailable()
      ms.addData((3L, 4L, 30L), (4L, 5L, 40L), (5L, 6L, 50L)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ext_stream_out").as[(Long, Long, (Long, Option[Long]))]
      .collect().map(r => (r._2, r._3._2)).toSet
    assert(rows == Set((2L, Some(20L)), (3L, None), (4L, Some(40L)),
      (5L, None), (6L, Some(60L))))
    assert(CountingService.opens.get() > 0)
    assert(CountingService.closes.get() == CountingService.opens.get(),
      s"leaked connections: opens=${CountingService.opens.get()} closes=${CountingService.closes.get()}")
    assert(!CountingService.closedBeforeLookup.get())
  }
}
