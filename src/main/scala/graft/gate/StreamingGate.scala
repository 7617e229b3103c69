package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.algebra.{Moments, QHist, Semigroup, TopK}
import graft.api.{ExternalService, GraftSink, GraftStream, KeyedGraftStream}
import graft.batch.BatchStore
import graft.client.ClientStore
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{AsofJoin, BatchServices, Dedup, LoopJoin, Packing, PretrainPipeline, Retrieval, RowIndex, Sampling, Scoring, Sharding, Similarity}
import graft.time.{BatchID, Batcher, Timestamp}

import GateHelpers._

/** Gate registry — streaming components, driven as real Structured Streaming queries.
  * Split from SparkEntry (round 19, mechanical move): SparkEntry
  * concatenates the per-family registries; entries are verbatim.
  */
private[graft] object StreamingGate {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // -- streaming components, driven as REAL Structured Streaming queries
    // inside the gate (MemoryStream feed in deterministic micro-batches →
    // processAllAvailable → memory sink), so the online half of the engine
    // gets DuckDB-oracled rows, not just batch≡streaming laws. The
    // driver-side MemoryStream feed is the standard streaming-test shape —
    // the operators under test are the distributed state machines.

    "q_streaming_sum" -> ((s, dir) => {
      // online Summer (flatMapGroupsWithState, state ACROSS micro-batches):
      // events arrive in 4 disjoint micro-batches; each emitted row is that
      // micro-batch's (prior, delta) per (user, day-batch), so the deltas
      // must sum to exactly the batch-layer totals whatever the slicing.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = eventsDF(s, dir).select(col("ts_ms"), col("user_id"), col("event_id"))
        .as[(Long, Long, Long)].collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val out = graft.streaming.StreamingSum.sumByKey(
        ms.toDS().map { case (ts, u) => (ts, u, 1L) }, Batcher.ofDays(1))(
        Semigroup.longSemigroup, implicitly, implicitly)
      val view = "q_streaming_sum_sink"
      s.catalog.dropTempView(view)
      withStreamingGateConf(s, 4) {
        val q = out.writeStream.format("memory").queryName(view)
          .outputMode("append").start()
        try {
          (0 until 4).foreach { i =>
            ms.addData(rows.iterator.filter(_._3 % 4 == i).map(r => (r._1, r._2)).toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      s.table(view)
        .select(col("_1").as("user_id"), col("_2").as("batch_id"),
          col("_3._2").as("__delta"))
        .groupBy(col("user_id"), col("batch_id"))
        .agg(sum(col("__delta")).as("cnt"))
    }),


    "q_streaming_sum_horizon" -> ((s, dir) => {
      // round 16: the online Summer with an EVENT-TIME state horizon —
      // state for a (user, day-batch) dies when the WATERMARK passes its
      // newest event, so a decades-long replay holds horizon-sized state
      // (the wall-clock-TTL form holds the full key space under replay;
      // the decades probe contrasts the two). Events feed in event-TIME
      // order (4 contiguous chunks), so nothing arrives late and every
      // delta is emitted; a group whose state was reclaimed mid-stream
      // re-opens from a None prior — and the per-(key,batch) SUM of
      // deltas is therefore still exactly the batch totals, the same
      // oracle as q_streaming_sum. Eviction semantics are law-pinned in
      // SemigroupAggregatorSpec.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = eventsDF(s, dir).select(col("ts_ms"), col("user_id"))
        .as[(Long, Long)].collect().sortBy(_._1)
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val out = graft.streaming.StreamingSum.sumByKeyWithinHorizon(
        ms.toDS().map { case (ts, u) => (new java.sql.Timestamp(ts), u, 1L) },
        Batcher.ofDays(1), "1 hour")(
        Semigroup.longSemigroup, implicitly, implicitly)
      val view = "q_streaming_sum_horizon_sink"
      s.catalog.dropTempView(view)
      val chunk = math.max(1, (rows.length + 3) / 4)
      withStreamingGateConf(s, 4) {
        val q = out.writeStream.format("memory").queryName(view)
          .outputMode("append").start()
        try {
          rows.grouped(chunk).foreach { part =>
            ms.addData(part.toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      s.table(view)
        .select(col("_1").as("user_id"), col("_2").as("batch_id"),
          col("_3._2").as("__delta"))
        .groupBy(col("user_id"), col("batch_id"))
        .agg(sum(col("__delta")).as("cnt"))
    }),


    "q_streaming_dedup" -> ((s, dir) => {
      // ingest-time exact dedup with digest state across micro-batches:
      // batch 1 feeds the whole corpus, batch 2 feeds planted byte-copies
      // (ids above max) — every planted row must dedup against batch-1
      // state, so the sink holds one row per distinct text and no planted
      // id survives, both SQL-expressible facts.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      // NULL texts would desync from the oracle (md5(NULL) is a kept
      // dedup key, count(DISTINCT text) excludes NULLs) — feed non-null
      val docs = docsDs(s, dir).collect().filter(_.text != null)
      val maxId = docs.iterator.map(_.doc_id).max
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val out = graft.streaming.StreamingDedup.exact(
        ms.toDS().toDF("doc_id", "text"), "text")
      val view = "q_streaming_dedup_sink"
      s.catalog.dropTempView(view)
      withStreamingGateConf(s, 4) {
        val q = out.writeStream.format("memory").queryName(view)
          .outputMode("append").start()
        try {
          ms.addData(docs.iterator.map(d => (d.doc_id, d.text)).toSeq)
          q.processAllAvailable()
          ms.addData(docs.iterator.filter(_.doc_id % 10 == 0)
            .map(d => (maxId + 1 + d.doc_id, d.text)).toSeq)
          q.processAllAvailable()
        } finally q.stop()
      }
      s.table(view).agg(count(lit(1)).as("n_kept"),
        (max(col("doc_id")) <= maxId).as("planted_dropped"))
    }),


    "q_streaming_minhash" -> ((s, dir) => {
      // streaming MinHash-LSH candidate machine (per-bucket id state in
      // flatMapGroupsWithState) as a REAL streaming query: the corpus
      // feeds in two ascending-doc_id halves, then a third micro-batch of
      // planted byte-copies (ids above max, sources doc_id % 10 == 0).
      // Identical text → identical signature → the copy must pair with
      // its batch-1/2 source ACROSS the state store, and the deduped
      // emitted pair set must equal the batch candidate set on the same
      // fed corpus (signature/banding are the same columnar expressions;
      // maxBucket is lifted above any bucket size at gate scale so the
      // cap can't hide a missing pair).
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = docsDs(s, dir).collect().filter(_.text != null).sortBy(_.doc_id)
      val maxId = docs.iterator.map(_.doc_id).max
      val planted = docs.filter(_.doc_id % 10 == 0)
        .map(d => (maxId + 1 + d.doc_id, d.text)).toSeq
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val out = graft.streaming.StreamingDedup.minhashCandidates(
        ms.toDS().toDF("doc_id", "text"), "text", "doc_id", maxBucket = 8192)
      val view = "q_streaming_minhash_sink"
      s.catalog.dropTempView(view)
      withStreamingGateConf(s, 4) {
        val q = out.writeStream.format("memory").queryName(view)
          .outputMode("append").start()
        try {
          val half = docs.length / 2
          ms.addData(docs.take(half).map(d => (d.doc_id, d.text)).toSeq)
          q.processAllAvailable()
          ms.addData(docs.drop(half).map(d => (d.doc_id, d.text)).toSeq)
          q.processAllAvailable()
          ms.addData(planted)
          q.processAllAvailable()
        } finally q.stop()
      }
      val streamed = s.table(view)
        .select(col("_1").as("id_a"), col("_2").as("id_b")).distinct()
        .localCheckpoint(true)
      val full = (docs.map(d => (d.doc_id, d.text)).toSeq ++ planted).toDF("doc_id", "text")
      // materialize ONCE: the two except directions below would otherwise
      // each recompute the full-corpus signature + banded join (the r9→r10
      // bench regression on this row was exactly that double recompute
      // stacked on the RocksDB premium)
      val batchCands = Dedup.minhashCandidates(full, "text", "doc_id")
        .localCheckpoint(true)
      // planted ids are the largest ids fed, so a planted doc always sits
      // on the id_b side of its (source, copy) pair
      val pairedPlanted = streamed.where(col("id_b") > maxId)
        .select("id_b").distinct().count()
      val (extra, missing) = withPinnedShufflePartitions(s, 4) {
        (streamed.except(batchCands).count(), batchCands.except(streamed).count())
      }
      Seq((planted.length.toLong,
          pairedPlanted == planted.length.toLong,
          extra == 0L && missing == 0L))
        .toDF("n_planted", "planted_all_paired", "stream_eq_batch")
    }),


    "q_streaming_minhash_horizon" -> ((s, dir) => {
      // the BOUNDED-STATE regime of q_streaming_minhash (endless-crawl
      // shape): band-bucket state remembers only ids inside the event-time
      // watermark horizon. In-horizon planted copies must still pair
      // across micro-batches; after the watermark passes the horizon, the
      // old corpus's buckets are reclaimed (state tracks the horizon's
      // arrival volume, not corpus size — the scale contract) and a late
      // copy emits nothing (the batch backstop's job). All three pinned.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = docsDs(s, dir).collect().filter(_.text != null).sortBy(_.doc_id)
      val maxId = docs.iterator.map(_.doc_id).max
      val planted = docs.filter(_.doc_id % 10 == 0)
        .map(d => (maxId + 1 + d.doc_id, d.text)).toSeq
      def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, String)]
      val out = graft.streaming.StreamingDedup.minhashCandidatesWithinHorizon(
        ms.toDS().toDF("doc_id", "ts", "text"), "text", "doc_id", "ts",
        "10 minutes", maxBucket = 8192)
      val view = "q_streaming_minhash_horizon_sink"
      s.catalog.dropTempView(view)
      var lateStateRows = 0L
      withStreamingGateConf(s, 4) {
        val q = out.writeStream.format("memory").queryName(view)
          .outputMode("append").start()
        try {
          val half = docs.length / 2
          ms.addData(docs.take(half).map(d => (d.doc_id, t(100), d.text)).toSeq)
          q.processAllAvailable()
          ms.addData(docs.drop(half).map(d => (d.doc_id, t(200), d.text)).toSeq)
          q.processAllAvailable()
          // planted copies at t=300 — inside the 10-minute horizon
          ms.addData(planted.map(p => (p._1, t(300), p._2)))
          q.processAllAvailable()
          // advance the watermark far past the horizon, then feed a late
          // byte-copy of the smallest doc: its source's bucket state has
          // aged out, so it must emit NO pair
          ms.addData((maxId * 4 + 1, t(100000), "watermark advancing filler text"))
          q.processAllAvailable()
          ms.addData((maxId * 4 + 2, t(100001), docs.head.text))
          q.processAllAvailable()
          lateStateRows = q.lastProgress.stateOperators(0).numRowsTotal
        } finally q.stop()
      }
      val streamed = s.table(view)
        .select(col("_1").as("id_a"), col("_2").as("id_b")).distinct()
        .localCheckpoint(true)
      val pairedPlanted = streamed.where(col("id_b") > maxId)
        .where(col("id_b") <= maxId * 2 + 1)
        .select("id_b").distinct().count()
      val latePaired = streamed.where(col("id_b") === maxId * 4 + 2).count()
      // bounded: only the two past-horizon docs' buckets may remain (each
      // at most 16 bands) — the whole pre-horizon corpus's buckets are gone
      Seq((planted.length.toLong,
          pairedPlanted == planted.length.toLong,
          latePaired == 0L,
          lateStateRows <= 34L))
        .toDF("n_planted", "planted_all_paired", "late_unpaired", "state_bounded")
    }),


    "q_streaming_loop_join" -> ((s, dir) => {
      // streaming loop join (state-dependent store, flatMapGroupsWithState):
      // events arrive in 4 event-id-quartile micro-batches, so arrival
      // order respects event time per key and the running prior-event
      // counter must reproduce the batch loop join's oracle exactly.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = eventsDF(s, dir).select(col("event_id"), col("user_id"))
        .as[(Long, Long)].collect()
      val maxId = rows.iterator.map(_._1).max
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val out = graft.streaming.StreamingLoopJoin.loopJoin[Long, Long, Long](
        ms.toDS().map { case (eid, u) => (eid, u, eid) }, None, (_, _) => Some(1L))(
        Semigroup.longSemigroup, implicitly, implicitly, implicitly)
      val view = "q_streaming_loop_join_sink"
      s.catalog.dropTempView(view)
      withStreamingGateConf(s, 4) {
        val q = out.writeStream.format("memory").queryName(view)
          .outputMode("append").start()
        try {
          (0 until 4).foreach { i =>
            val lo = maxId * i / 4
            val hi = if (i == 3) maxId + 1 else maxId * (i + 1) / 4
            ms.addData(rows.iterator.filter(r => r._1 >= lo && r._1 < hi).toSeq)
            q.processAllAvailable()
          }
        } finally q.stop()
      }
      s.table(view)
        .select(col("_1").as("event_id"), col("_2").as("user_id"),
          coalesce(col("_3._2"), lit(0L)).as("prior_events"))
    }),


    "q_streaming_join" -> ((s, dir) => {
      // watermarked stream-stream buffered leftJoin (the reference's
      // leftJoin(stream, buffer)) as a REAL streaming query: purchases
      // and signups feed two MemoryStreams in ts-quartile chunks (disjoint
      // ascending ranges — nothing ever arrives late for the 1h
      // watermark), a final sentinel advances both watermarks past every
      // join window so unmatched-left nulls flush, and the sink must
      // equal the batch range-join exactly: every signup of the same user
      // in the trailing 7 days of each purchase, null when none.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      // filters pushed into the scan: only the 10% user slice of the two
      // joined event types ever reaches the driver-side feed arrays
      val evs = eventsDF(s, dir)
        .where(col("user_id") % 10 === 0 &&
          col("event_type").isin("purchase", "signup"))
        .select(col("event_id"), col("user_id"), col("ts_ms"), col("event_type"))
        .as[(Long, Long, Long, String)].collect()
      val minTs = evs.iterator.map(_._3).min
      val maxTs = evs.iterator.map(_._3).max
      val lms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
      val rms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
      val left = lms.toDS().toDF("event_id", "user_id", "__lms")
        .withColumn("l_ts", timestamp_millis(col("__lms")))
      val right = rms.toDS().toDF("r_event_id", "r_user", "__rms")
        .withColumn("r_ts", timestamp_millis(col("__rms")))
      val joined = graft.streaming.StreamingJoin.leftJoinBuffered(
        left, "l_ts", right, "r_ts", Seq(("user_id", "r_user")),
        windowMs = 7L * 86400000L, watermarkMs = 3600000L)
      val view = "q_streaming_join_sink"
      s.catalog.dropTempView(view)
      withStreamingGateConf(s, 4) {
        val q = joined.select(col("event_id"), col("user_id"), col("r_event_id"))
          .writeStream.format("memory").queryName(view).outputMode("append").start()
        try {
          val purchases = evs.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3))
          val signups = evs.filter(_._4 == "signup").map(e => (e._1, e._2, e._3))
          val mid = minTs + (maxTs - minTs) / 2 + 1
          Seq((minTs, mid), (mid, maxTs + 1)).foreach { case (lo, hi) =>
            lms.addData(purchases.iterator.filter(e => e._3 >= lo && e._3 < hi).toSeq)
            rms.addData(signups.iterator.filter(e => e._3 >= lo && e._3 < hi).toSeq)
            q.processAllAvailable()
          }
          val flush = maxTs + 8L * 86400000L // past every window + watermark
          lms.addData(Seq((-1L, -1L, flush)))
          rms.addData(Seq((-1L, -1L, flush)))
          q.processAllAvailable()
        } finally q.stop()
      }
      s.table(view).where(col("user_id") =!= -1L)
    }),


    "q_fanout" -> ((s, dir) => {
      // foreachBatch fan-out sink (StreamingIO.fanout — the
      // WrittenProducer/AlsoProducer shape for streams): one streaming
      // query, each micro-batch persisted once and handed to TWO parquet
      // writers. Events feed in 3 event-id slices; both sinks must hold
      // exactly the fed corpus (count oracled against the source table)
      // and equal each other (Spark-computed invariant the oracle pins
      // TRUE) — the written data is load-bearing on both tails.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val rows = eventsDF(s, dir).select(col("event_id"), col("user_id"))
        .as[(Long, Long)].collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val tmp = java.nio.file.Files.createTempDirectory("graft_fanout_").toString
      // two full corpus copies land under /tmp — delete them on EVERY exit
      // path (a failing feed mid-rep must not leak them across bench reps)
      try {
        val (sinkA, sinkB) = (s"$tmp/a", s"$tmp/b")
        val writer = graft.streaming.StreamingIO.fanout(
          ms.toDS().toDF("event_id", "user_id"))(Seq(
          (b, _) => b.write.mode("append").parquet(sinkA),
          (b, _) => b.write.mode("append").parquet(sinkB)))
        withStreamingGateConf(s, 4) {
          val q = writer.start()
          try {
            (0 until 3).foreach { i =>
              ms.addData(rows.iterator.filter(_._1 % 3 == i).toSeq)
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        val a = s.read.parquet(sinkA)
        val b = s.read.parquet(sinkB)
        val equal = a.except(b).count() == 0 && b.except(a).count() == 0
        // materialize the 1-row result before the finally reclaims the
        // sinks (the returned frame must not read deleted parquet lazily)
        a.agg(count(lit(1)).as("n_rows"))
          .withColumn("sinks_equal", lit(equal)).localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),


    "q_loop_join_presplit" -> ((s, dir) => {
      // the hot-key pre-split form of the loop join: same semantics as
      // q_loop_join (state-independent +1 delta), but each key's scan is
      // parallelized across event-id chunks (chunk totals -> prefix seeds ->
      // per-chunk scans). Must match the same running-counter oracle.
      import s.implicits._
      val events = eventsDF(s, dir).select(col("event_id").as("_1"),
        col("user_id").as("_2"), col("event_id").as("_3")).as[(Long, Long, Long)]
      LoopJoin.loopJoinPreSplit[Long, Long, Long](events, None, _ => Some(1L),
          _ / 4096)(Semigroup.longSemigroup, implicitly, implicitly, implicitly)
        .map { case (_, user, (eid, prior)) => (eid, user, prior.getOrElse(0L)) }
        .toDF("event_id", "user_id", "prior_events")
    }),


    "q_also" -> ((s, dir) => {
      // also (AlsoProducer, Producer.scala:297-300): side tail writes
      // purchases to a batched sink; the result branch REPLAYS that sink
      // (BatchedSink read-back) and aggregates per batch — the written data
      // is load-bearing, so the oracle verifies both tails.
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_sink_").toString
      val daily = Batcher.ofDays(1)
      val tail = eventStream(s, dir)
        .collect { case e if e.event_type == "purchase" => e.event_id }
        .write(GraftSink.parquet[Long](tmp, daily))
      tail.also(GraftStream.fromBatchedSink[Long](s, tmp))
        .toDF()
        .groupBy(daily.batchIdColumn(col("ts_ms")).as("batch_id"))
        .agg(count(lit(1)).as("cnt"))
    })
  )

  def oracleSql: Map[String, String] = Map(


    "q_loop_join_presplit" ->
      """SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS prior_events
        |FROM events""".stripMargin,


    // streaming rows: whatever the micro-batch slicing, per-(key,batch)
    // deltas sum to the batch totals, dedup keeps one row per distinct
    // text with no planted id surviving, and the quartile-fed loop join
    // reproduces the batch running counter exactly
    "q_streaming_sum" ->
      """SELECT user_id, CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS batch_id,
        |  count(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin,


    // watermark-horizon summer: in-order feed → no late drops, and a
    // reclaimed group re-opens from None — sum of deltas per (key, batch)
    // is still exactly the batch totals
    "q_streaming_sum_horizon" ->
      """SELECT user_id, CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS batch_id,
        |  count(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin,


    "q_streaming_dedup" ->
      """SELECT count(DISTINCT text) AS n_kept, TRUE AS planted_dropped
        |FROM documents""".stripMargin,


    // planted byte-copies must all pair with their sources across the
    // state store, and the deduped streaming pair set must equal the
    // batch candidate set on the same fed corpus (asserted Spark-side;
    // the oracle pins the planted count and both invariants)
    "q_streaming_minhash" ->
      """SELECT count(*) AS n_planted, TRUE AS planted_all_paired,
        |  TRUE AS stream_eq_batch
        |FROM documents WHERE text IS NOT NULL AND doc_id % 10 = 0""".stripMargin,


    // bounded-state regime: in-horizon planted copies pair, the late copy
    // does not, and post-horizon state is reclaimed down to the two
    // live documents' buckets
    "q_streaming_minhash_horizon" ->
      """SELECT count(*) AS n_planted, TRUE AS planted_all_paired,
        |  TRUE AS late_unpaired, TRUE AS state_bounded
        |FROM documents WHERE text IS NOT NULL AND doc_id % 10 = 0""".stripMargin,


    "q_streaming_loop_join" ->
      """SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS prior_events
        |FROM events""".stripMargin,


    "q_streaming_join" ->
      """SELECT l.event_id, l.user_id, r.event_id AS r_event_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id % 10 = 0) l
        |LEFT JOIN (SELECT * FROM events
        |  WHERE event_type = 'signup' AND user_id % 10 = 0) r
        |  ON l.user_id = r.user_id
        |  AND epoch_ms(r.ts) <= epoch_ms(l.ts)
        |  AND epoch_ms(r.ts) >= epoch_ms(l.ts) - 604800000""".stripMargin,


    // both fan-out sinks hold exactly the fed corpus; cross-sink equality
    // is computed Spark-side and pinned TRUE
    "q_fanout" ->
      """SELECT count(*) AS n_rows, TRUE AS sinks_equal FROM events""".stripMargin,


    "q_also" ->
      """SELECT CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS batch_id,
        |  count(*) AS cnt
        |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin
  )
}
