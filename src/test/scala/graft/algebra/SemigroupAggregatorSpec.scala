package graft.algebra

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestSession
import graft.streaming.StreamingSum
import graft.time.Batcher

/** The Aggregator bridge (commutative hash-agg path) and the streaming
  * summer's TTL configuration.
  */
class SemigroupAggregatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("SemigroupAggregator through groupByKey.agg equals reduceGroups") {
    val s = spark; import s.implicits._
    val data = Seq((1L, 3L), (1L, 4L), (2L, 10L), (3L, -1L), (2L, 1L))
    val ds = data.toDS()
    val viaAgg = ds.groupByKey(_._1)
      .agg(new PairValueAggregator[Long, Long](Semigroup.longSemigroup).toColumn)
      .collect().toMap
    val viaReduce = ds.groupByKey(_._1).mapValues(_._2)
      .reduceGroups(Semigroup.longSemigroup.plus _).collect().toMap
    val model = data.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(viaAgg == model && viaReduce == model)
  }

  test("SemigroupAggregator carries non-trivial values (TopK) through hash agg") {
    val s = spark; import s.implicits._
    implicit val sg: Semigroup[TopK[Long]] = TopK.topKSemigroup[Long]
    implicit val topkEnc: org.apache.spark.sql.Encoder[TopK[Long]] =
      org.apache.spark.sql.Encoders.kryo[TopK[Long]]
    val data = Seq((1L, 5.0, 50L), (1L, 9.0, 90L), (1L, 7.0, 70L), (2L, 1.0, 10L))
    val out = data.toDS()
      .map { case (k, score, item) => (k, TopK.one(2, score, item)) }
      .groupByKey(_._1)
      .agg(new PairValueAggregator[Long, TopK[Long]](sg).toColumn)
      .collect().toMap
    assert(out(1L).items.map(_._2) == List(90L, 70L))
    assert(out(2L).items.map(_._2) == List(10L))
  }

  test("StreamingSum with a state TTL still sums correctly within the window") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    val out = StreamingSum.sumByKey[Long, Long](ms.toDS(), Batcher.unit,
        stateTtl = Some(java.time.Duration.ofHours(1)))(
        Semigroup.longSemigroup, implicitly, implicitly)
      .map { case (k, b, (p, d)) => (k, b, p, d) }
    // ProcessingTimeTimeout schedules wall-clock follow-up batches, so
    // processAllAvailable can keep seeing work: drive two explicit
    // checkpointed Trigger.AvailableNow runs instead (which also proves
    // state survives a query restart) and collect via foreachBatch
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ttl_ckpt_").toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Option[Long], Long)]
    def runOnce(): Unit = {
      val q = out.writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[(Long, Long, Option[Long], Long)], _: Long) =>
          buf.synchronized { buf ++= df.collect() }; ()
        }
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        // Trigger.Once, not AvailableNow: exactly one micro-batch per run —
        // the engine otherwise keeps the query alive for the (1 hour away)
        // processing-time timers
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      try assert(q.awaitTermination(120000L)) finally q.stop()
    }
    ms.addData((0L, 1L, 5L), (1L, 1L, 6L), (2L, 2L, 7L))
    runOnce()
    ms.addData((3L, 1L, 1L))
    runOnce()
    val rows = buf.synchronized(buf.toList)
    val perKey = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(perKey == Map(1L -> 12L, 2L -> 7L))
    // the second run saw the live (un-expired) state from the first
    assert(rows.exists(r => r._1 == 1L && r._3 == Some(11L) && r._4 == 1L))
  }

  test("sumByKeyWithinHorizon: sums match, state dies when the WATERMARK " +
      "passes a group's newest event, and a late group re-opens from None") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val out = StreamingSum.sumByKeyWithinHorizon[Long, Long](
        ms.toDS(), Batcher.unit, "10 seconds")(
        Semigroup.longSemigroup, implicitly, implicitly)
      .map { case (k, b, (p, d)) => (k, b, p, d) }
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val q = out.writeStream.format("memory").queryName("ssum_wm")
      .outputMode("append").start()
    try {
      ms.addData((t(1), 1L, 5L), (t(2), 1L, 6L))
      q.processAllAvailable()
      ms.addData((t(5), 1L, 1L))                 // in-horizon: prior chains
      q.processAllAvailable()
      ms.addData((t(1000), 2L, 7L))              // watermark jumps to ~990s
      q.processAllAvailable()
      ms.addData((t(1002), 2L, 1L))              // k=1's timer fires this batch
      q.processAllAvailable()
      ms.addData((t(1003), 1L, 3L))              // k=1 re-opens past eviction
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssum_wm")
      .as[(Long, Long, Option[Long], Long)].collect().toList
    // deltas still sum to the true totals whatever the state lifecycle —
    // the lambda contract (batch layer owns accumulated values)
    val perKey = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(perKey == Map(1L -> 15L, 2L -> 8L))
    // in-horizon chaining really happened
    assert(rows.exists(r => r._1 == 1L && r._3 == Some(11L) && r._4 == 1L))
    // the post-eviction arrival re-opened from None, proving the
    // watermark-driven reclaim (wall-clock TTL would still hold Some(12))
    assert(rows.exists(r => r._1 == 1L && r._3 == None && r._4 == 3L),
      s"expected a None-prior re-open for k=1, got $rows")
  }

  test("RocksDB state store: Summer state survives a query restart (snapshot AND changelog checkpointing)") {
    // the gate queries run on RocksDBStateStoreProvider; this pins the
    // fault-tolerance half of that story — two Trigger.Once runs sharing a
    // checkpoint, the second run's PRIOR must reflect the first run's
    // state, recovered from RocksDB files (not executor memory). Run the
    // scenario on BOTH checkpoint modes: full-snapshot (default) and
    // changelog checkpointing (the large-state configuration — commits
    // upload deltas, recovery REPLAYS the changelog, the riskier path).
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val clogKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val saved = Seq(provKey, clogKey).map(k => k -> spark.conf.getOption(k)).toMap
    for (changelog <- Seq(false, true)) {
      spark.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(clogKey, changelog.toString)
      try {
        val ms = MemoryStream[(Long, Long, Long)]
        val out = StreamingSum.sumByKey[Long, Long](ms.toDS(), Batcher.unit)(
            Semigroup.longSemigroup, implicitly, implicitly)
          .map { case (k, b, (p, d)) => (k, b, p, d) }
        val ckpt = java.nio.file.Files.createTempDirectory("graft_rocks_ckpt_").toString
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Option[Long], Long)]
        def runOnce(): Unit = {
          val q = out.writeStream
            .foreachBatch { (df: org.apache.spark.sql.Dataset[(Long, Long, Option[Long], Long)], _: Long) =>
              buf.synchronized { buf ++= df.collect() }; ()
            }
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.Once())
            .start()
          try assert(q.awaitTermination(120000L)) finally q.stop()
        }
        ms.addData((0L, 1L, 5L), (1L, 1L, 6L), (2L, 2L, 7L))
        runOnce() // first query: no prior state
        ms.addData((3L, 1L, 1L), (4L, 2L, 2L))
        runOnce() // RESTARTED query: priors must come from recovered state
        val rows = buf.synchronized(buf.toList)
        assert(rows.exists(r => r._1 == 1L && r._3 == Some(11L) && r._4 == 1L),
          s"changelog=$changelog: key 1 prior not recovered across restart: $rows")
        assert(rows.exists(r => r._1 == 2L && r._3 == Some(7L) && r._4 == 2L),
          s"changelog=$changelog: key 2 prior not recovered across restart: $rows")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("sketch value types (Moments, QHist) flow through StreamingSum == batch fold") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Seq(
      (0L, 1L, 2.0), (1L, 1L, 8.0), (2L, 2L, 5.0), (3L, 1L, 4.0), (4L, 2L, 5.5))

    // Moments: one micro-batch => delta is the full event-time-ordered fold,
    // bit-identical to the same fold done offline
    val msM = MemoryStream[(Long, Long, Moments)]
    msM.addData(events.map { case (t, k, v) => (t, k, Moments.of(v)) })
    val outM = StreamingSum.sumByKey[Long, Moments](msM.toDS(), Batcher.unit)(
        Moments.momentsSemigroup, implicitly, implicitly)
      .map { case (k, _, (_, d)) => (k, d) }
    val qM = outM.writeStream.format("memory").queryName("sketch_m")
      .outputMode("append").start()
    try { qM.processAllAvailable() } finally qM.stop()
    val gotM = spark.table("sketch_m").as[(Long, Moments)].collect().toMap
    val modelM = events.groupBy(_._2).view.mapValues(
      evs => evs.sortBy(_._1).map(e => Moments.of(e._3))
        .reduce(Moments.momentsSemigroup.plus)).toMap
    assert(gotM == modelM)

    // QHist: exact Long bucket counts => structural equality
    val msQ = MemoryStream[(Long, Long, QHist)]
    msQ.addData(events.map { case (t, k, v) => (t, k, QHist.of(v, width = 1.0)) })
    val outQ = StreamingSum.sumByKey[Long, QHist](msQ.toDS(), Batcher.unit)(
        QHist.qhistSemigroup, implicitly, implicitly)
      .map { case (k, _, (_, d)) => (k, d) }
    val qQ = outQ.writeStream.format("memory").queryName("sketch_q")
      .outputMode("append").start()
    try { qQ.processAllAvailable() } finally qQ.stop()
    val gotQ = spark.table("sketch_q").as[(Long, QHist)].collect().toMap
    val modelQ = events.groupBy(_._2).view.mapValues(
      evs => evs.map(e => QHist.of(e._3, 1.0)).reduce(QHist.qhistSemigroup.plus)).toMap
    assert(gotQ == modelQ)
    assert(gotQ(1L).quantileBounds(0.5) == (4.0, 5.0))
  }
}
