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

/** Typed rows for the API-parity queries (encoders derive at use sites). */
case class Ev(event_id: Long, ts_ms: Long, user_id: Long, event_type: String,
    value: Double, props: String)
case class Doc(doc_id: Long, text: String)

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the LLM-pipeline operator family), with a DuckDB oracle
  * where the semantics are SQL-expressible. See Scaladoc on each module for
  * the reference file:line provenance.
  */
object SparkEntry {

  /** Stateful streaming pays per-micro-batch state-store task overhead on
    * every shuffle partition; the streaming gate queries pin a small count
    * for their own checkpoints (the session value is restored after).
    *
    * SEQUENTIAL-ONLY: this mutates the session-global conf non-reentrantly,
    * which is safe under Bench/Verify's one-query-at-a-time execution but
    * would race concurrent queries onto 4 shuffle partitions. Concurrent
    * callers must scope the override to a cloned session
    * (`spark.newSession()`) instead.
    */
  private def withPinnedShufflePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    val saved = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", saved)
  }

  private val StateStoreProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private[graft] val RocksDBProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Streaming-gate session conf: pins the shuffle-partition count (per-
    * micro-batch state-store task overhead scales with partitions) AND runs
    * the state on the RocksDB state store provider — the Spark-native
    * answer to the reference offloading online state to external Mergeable
    * stores (StormPlatform.scala:66-67). The default HDFSBackedStateStore
    * keeps every key in executor heap (~330 B/key measured, SURVEY §8), so
    * at 100M+ keys per executor the heap is the first thing to fall over;
    * RocksDB keeps the working state in native memory + local SST files
    * and the gate queries prove the whole streaming half runs green on it.
    * Both conf keys are restored after the body — same SEQUENTIAL-ONLY
    * caveat as the partition pin.
    */
  private def withStreamingGateConf[A](s: SparkSession, n: Int)(body: => A): A = {
    val savedProv = s.conf.getOption(StateStoreProviderKey)
    s.conf.set(StateStoreProviderKey, RocksDBProvider)
    try withPinnedShufflePartitions(s, n)(body)
    finally savedProv match {
      case Some(v) => s.conf.set(StateStoreProviderKey, v)
      case None    => s.conf.unset(StateStoreProviderKey)
    }
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events with event-time millis attached (TimeExtractor → column).
    * `EventTime.normalize` canonicalizes `ts` to a nanos Long by
    * dispatching on the OBSERVED Spark type — the source has shipped as
    * both `timestamp[ns]` (nanos Long under the sessions' `nanosAsLong`
    * flag, kept for back-compat) and `timestamp[us]` (TIMESTAMP_NTZ) —
    * so every downstream consumer (nanos window constants, as-of
    * ordering, `ts DIV 1000000` millis) sees one representation.
    * `ts` below is nanos (exact ordering), `ts_ms` is integral-division
    * millis (exact — double division would lose precision above 2^53 ns).
    */
  private def eventsDF(s: SparkSession, dir: String): DataFrame =
    sources.EventTime.normalize(t(s, dir, "events"))
      .withColumn("ts_ms", expr("ts DIV 1000000"))

  private def eventsDs(s: SparkSession, dir: String): Dataset[Ev] = {
    import s.implicits._
    eventsDF(s, dir)
      .select("event_id", "ts_ms", "user_id", "event_type", "value", "props").as[Ev]
  }

  /** COLUMNAR source: the (ts, Ev) pair is a Catalyst projection, so
    * `where()` predicates push down to the parquet scan (closure filters
    * can't). `_1` is ts_ms, Ev fields are `_2.<field>`.
    */
  private def eventStream(s: SparkSession, dir: String): GraftStream[Ev] = {
    import s.implicits._
    GraftStream.fromColumnar(eventsDs(s, dir), col("ts_ms"))
  }

  private def docsDs(s: SparkSession, dir: String): Dataset[Doc] = {
    import s.implicits._
    t(s, dir, "documents").select("doc_id", "text").as[Doc]
  }

  /** The fixed BM25 gate query set — mirrored verbatim in the oracle SQL's
    * VALUES clause (corpus-vocabulary terms so every query matches docs).
    */
  private val bm25QuerySet = Seq(
    0 -> "spark window merge",
    1 -> "customer filter join",
    2 -> "batch stream data",
    3 -> "hash join order sort",
    4 -> "query group agg",
    5 -> "vector scan dup table")

  private[graft] def bm25Queries(s: SparkSession): DataFrame = {
    import s.implicits._
    bm25QuerySet.toDF("query_id", "qtext")
  }

  /** Shared verification tail of the int8 stored-serving rows
    * (q_ann_int8_stored, q_streaming_ann): both pin the SAME invariants —
    * exact equality with the one-shot in-memory int8TopK plus
    * q_ann_int8's recall/k contract — so the assertion lives once.
    */
  private def int8InvariantRow(e: DataFrame, q: Array[Double],
      stored: DataFrame): DataFrame = {
    val mem = Similarity.int8TopK(e, "embedding", "vec_id", q, 10)
    val nDiff = stored.exceptAll(mem).unionByName(mem.exceptAll(stored))
      .agg(count(lit(1)).as("nd"))
    val exact = Similarity.bruteForceTopK(e, "embedding", "vec_id", q, 10)
      .select(col("vec_id"))
    val hit = stored.join(exact, "vec_id").agg(count(lit(1)).as("hits"))
    val kc = stored.agg(count(lit(1)).as("kc"))
    e.agg(count(lit(1)).as("n_vecs"))
      .crossJoin(broadcast(hit)).crossJoin(broadcast(kc))
      .crossJoin(broadcast(nDiff))
      .select(col("n_vecs"),
        (col("hits") >= 9).as("recall_ok"), (col("kc") === 10).as("k_ok"),
        (col("nd") === 0).as("same_as_mem"))
      .localCheckpoint(true)
  }

  /** Flagship: the reference's canonical wordCount job (summingbird-example
    * ExampleJob.scala:43-50) through the full stack — source → flatMap
    * tokenize → sumByKey(Long semigroup) — on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    GraftStream.from(docsDs(spark, dir))(_.doc_id * 1000L) // synthetic ts
      .flatMap(d => d.text.split("\\s+").iterator.filter(_.nonEmpty))
      .asKeyedWith(identity[String], (_: String) => 1L)
      .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
      .toDF("word", "cnt")
  }

  // ---------------------------------------------------------------------
  // operator inventory
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- source / stateless producers (SURVEY §2.1-2.2) ------------------
    "q_source" -> ((s, dir) =>
      eventsDF(s, dir).select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_ms"))),

    "q_map" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir).map(e => (e.event_id, e.value * 2))
        .valuesDF("event_id", "doubled")
    }),

    // columnar filter: the predicate PUSHES DOWN to the parquet scan
    // (PlanAuditSpec asserts PushedFilters); the closure `filter` twin is
    // exercised by q_merge and TestGraphsProps
    "q_filter" -> ((s, dir) =>
      eventStream(s, dir).where(col("_2.event_type") === "click")
        .ds.select(col("_2.event_id").as("event_id"), col("_2.user_id").as("user_id"))),

    "q_flatmap" -> ((s, dir) => {
      import s.implicits._
      // the reference's canonical Counter usage — incremented inside the
      // tokenize flatMap (ExampleJob-style) — so Verify's counters.json
      // carries a real cross-round-diffable value (a named accumulator
      // add per emitted token; no measurable cost)
      val tokens = graft.api.Counters.counter(s, "job", "tokens_emitted")
      GraftStream.fromColumnar(docsDs(s, dir), col("doc_id"))
        .flatMap(d => d.text.split("\\s+").iterator.filter(_.nonEmpty)
          .map { w => tokens.incr(); (d.doc_id, w) })
        .valuesDF("doc_id", "word")
    }),

    "q_collect" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir)
        .collect { case e if e.event_type == "purchase" => (e.user_id, e.value) }
        .valuesDF("user_id", "value")
    }),

    // FIRST digit run, capped at 18 digits — the exact semantics the DuckDB
    // oracle's regexp_extract computes (greedy leftmost match in both
    // engines), and 18 digits always fits a signed Long/BIGINT, so neither
    // side can overflow if the testdata ever grows longer digit runs
    "q_optionmap" -> ((s, dir) => {
      import s.implicits._
      val firstRun = "[0-9]{1,18}".r
      eventStream(s, dir)
        .optionMap(e => firstRun.findFirstIn(e.props).map(d => (e.event_id, d.toLong)))
        .valuesDF("event_id", "k")
    }),

    // closure-filter parity (q_filter covers the pushed-down columnar twin)
    "q_merge" -> ((s, dir) => {
      val clicks = eventStream(s, dir).filter(_.event_type == "click")
      val buys = eventStream(s, dir).filter(_.event_type == "purchase")
      (clicks ++ buys).ds.select(col("_2.event_id").as("event_id"),
        col("_2.event_type").as("event_type"))
    }),

    "q_either" -> ((s, dir) => {
      import s.implicits._
      val l = eventStream(s, dir).where(col("_2.event_type") === "signup")
        .selectValue[Long](col("_2.event_id"))
      val r = GraftStream.fromColumnar(docsDs(s, dir), col("doc_id"))
        .selectValue[Long](col("_2.doc_id"))
      l.either(r).ds.map {
        case (_, Left(id))  => ("L", id)
        case (_, Right(id)) => ("R", id)
      }.toDF("side", "id")
    }),

    // -- keyed operator family (SURVEY §2.2) -----------------------------
    "q_sumbykey" -> ((s, dir) => {
      import s.implicits._
      GraftStream.from(docsDs(s, dir))(_.doc_id)
        .flatMap(d => d.text.split("\\s+").iterator.filter(_.nonEmpty))
        .asKeyedWith(identity[String], (_: String) => 1L)
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("word", "cnt")
    }),

    // closure mapKeys (the subject) over a columnar keyed source
    "q_mapkeys" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .mapKeys(_ % 10)
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("bucket", "cnt")
    }),

    "q_flatmapkeys" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .flatMapKeys(k => Iterator(k, k + 1000L))
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("user_key", "cnt")
    }),

    // columnar mapValues (selectValues); the closure twin is law-covered
    "q_mapvalues" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir).asKeyedCols[Long, Double](col("_2.user_id"), col("_2.value"))
        .selectValues[Long](lit(1L))
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("user_id", "cnt")
    }),

    "q_flatmapvalues" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir).asKeyedCols[Long, String](col("_2.user_id"), col("_2.event_type"))
        .flatMapValues(v => Iterator(v, v))
        .selectValues[Long](lit(1L))
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("user_id", "cnt")
    }),

    // columnar filterKeys: where() on the key column — pushes to the scan
    "q_filterkeys" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .where(col("_2") < 50L)
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("user_id", "cnt")
    }),

    "q_filtervalues" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir).asKeyedCols[Long, Double](col("_2.user_id"), col("_2.value"))
        .where(col("_3") > 50.0)
        .selectValues[Long](lit(1L))
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("user_id", "cnt")
    }),

    "q_keys" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir).asKeyedCols[String, Long](col("_2.event_type"), col("_2.event_id"))
        .keys.asKeyedCols[String, Long](col("_2"), lit(1L))
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("event_type", "cnt")
    }),

    "q_values" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir).asKeyedCols[String, Long](col("_2.event_type"), col("_2.user_id"))
        .values.asKeyedCols[Long, Long](col("_2"), lit(1L))
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("user_id", "cnt")
    }),

    "q_swap" -> ((s, dir) => {
      import s.implicits._
      eventStream(s, dir).asKeyedCols[String, Long](col("_2.event_type"), col("_2.user_id"))
        .swap
        .selectValues[Long](lit(1L))
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("user_id", "cnt")
    }),

    // -- joins (SURVEY §2.3) ---------------------------------------------
    "q_leftjoin" -> ((s, dir) => {
      import s.implicits._
      val service: Dataset[(Long, String)] =
        t(s, dir, "customer").select(col("c_custkey"), col("c_name")).as[(Long, String)]
      eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), col("_2.event_id"))
        .leftJoinDs(service)
        .ds.select(col("_3._1").as("event_id"), col("_2").as("user_id"),
          col("_3._2").as("c_name"))
    }),

    "q_leftjoin_external" -> ((s, dir) => {
      import s.implicits._
      // live-connector twin of q_leftjoin: an external KV service cannot be
      // dataset-shaped by definition, so the oracle rig backs it with a
      // broadcast of the customer table (the collect is the SERVICE's data,
      // bounded by the dimension size — the event stream itself stays
      // distributed and flows through the batched mapPartitions connector)
      val svcMap: Map[Long, String] =
        t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
          .as[(Long, String)].collect().toMap
      val bc = s.sparkContext.broadcast(svcMap)
      eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), col("_2.event_id"))
        .leftJoinExternal(ExternalService.fromFunction[Long, String](k => bc.value.get(k)),
          batchSize = 512, maxWaiting = 4)
        .ds.select(col("_3._1").as("event_id"), col("_2").as("user_id"),
          col("_3._2").as("c_name"))
    }),

    "q_lookup" -> ((s, dir) => {
      import s.implicits._
      val service: Dataset[(Long, String)] =
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)]
      eventStream(s, dir).selectValue[Long](col("_2.user_id"))
        .lookup(service)
        .ds.select(col("_2._1").as("user_id"), col("_2._2").as("segment"))
    }),

    "q_range_join" -> ((s, dir) => {
      // point-in-interval join, the containment complement of the as-of:
      // every click landing inside a same-user purchase's 1-hour window.
      // The naive non-equi spelling nested-loops; RangeJoin bucketizes
      // time (W = the window length, so each interval explodes to <= 2
      // buckets) into an EQUI join + residual filter — plan-audited in
      // RangeJoinSpec. The oracle is the naive non-equi join itself.
      val hourNs = 3600L * 1000 * 1000 * 1000
      val ev = eventsDF(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("puser"),
          col("ts").as("ps"), (col("ts") + lit(hourNs)).as("pe"))
      operators.RangeJoin.pointInInterval(clicks, col("ts"),
          purchases, col("ps"), col("pe"), bucketWidth = hourNs,
          equiKeys = Seq(col("user_id") -> col("puser")))
        .select(col("click_id"), col("purchase_id"), col("user_id"))
    }),

    "q_range_join_left" -> ((s, dir) => {
      // LEFT point-in-interval: every click survives; clicks inside no
      // same-user purchase window carry a null purchase_id. The unmatched
      // remainder is recovered with a null-safe (<=>) anti-join on the
      // same bucketed keys — never a second range scan. Oracle: the naive
      // non-equi LEFT join.
      val hourNs = 3600L * 1000 * 1000 * 1000
      val ev = eventsDF(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("puser"),
          col("ts").as("ps"), (col("ts") + lit(hourNs)).as("pe"))
      operators.RangeJoin.pointInIntervalLeft(clicks, col("ts"),
          purchases, col("ps"), col("pe"), bucketWidth = hourNs,
          equiKeys = Seq(col("user_id") -> col("puser")))
        .select(col("click_id"), col("purchase_id"), col("user_id"))
    }),

    "q_interval_overlap" -> ((s, dir) => {
      // interval × interval overlap (the second range-join shape): each
      // purchase's 1-hour window against each same-user click's 30-minute
      // window. Bucketized equi-join; the first-shared-bucket filter
      // emits each overlapping pair exactly once — oracled by the naive
      // non-equi overlap join
      val hourNs = 3600L * 1000 * 1000 * 1000
      val halfNs = hourNs / 2
      val ev = eventsDF(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("ps"), (col("ts") + lit(hourNs)).as("pe"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cuser"),
          col("ts").as("cs"), (col("ts") + lit(halfNs)).as("ce"))
      operators.RangeJoin.intervalOverlap(purchases, col("ps"), col("pe"),
          clicks, col("cs"), col("ce"), bucketWidth = hourNs,
          equiKeys = Seq(col("user_id") -> col("cuser")))
        .select(col("purchase_id"), col("click_id"), col("user_id"))
    }),

    "q_asof_join" -> ((s, dir) => {
      // purchases enriched with the user's most recent signup event at-or-
      // before the purchase time (DuckDB-ASOF `>=` semantics)
      val ev = eventsDF(s, dir)
      val left = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("signup_ts"))
        .agg(max("event_id").as("signup_id"))
      AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "signup_ts",
          Seq("signup_id"), strict = false)
        .select("event_id", "user_id", "signup_id")
    }),

    "q_asof_summing" -> ((s, dir) => {
      // running count of prior clicks per user as of each purchase
      val ev = eventsDF(s, dir)
      val left = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), lit(1L).as("one"))
      AsofJoin.asofJoinSumming(left, right, Seq("user_id"), "ts", "click_ts",
          Seq("one"), strict = false)
        .select(col("event_id"), col("user_id"),
          coalesce(col("one"), lit(0L)).as("clicks_before"))
    }),

    "q_window_service" -> ((s, dir) => {
      // windowed batch service (BatchedWindowService): the as-of signup is
      // visible only within a trailing 7-day window of the purchase
      val ev = eventsDF(s, dir)
      val left = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts").as("signup_ts"))
        .agg(max("event_id").as("signup_id"))
      // ts is the canonical nanos Long (EventTime.normalize): window in nanos
      BatchServices.windowed(left, right, Seq("user_id"), "ts", "signup_ts",
          Seq("signup_id"), window = 7L * 86400L * 1000000000L)
        .select("event_id", "user_id", "signup_id")
    }),

    "q_sessionize" -> ((s, dir) =>
      // round 10: gaps-and-islands sessionization (30-min inactivity gap
      // per user) — windows partitioned by user only, one hash exchange,
      // exactly reproduced by the DuckDB lag + running-sum oracle
      graft.operators.Sessionize.sessionize(eventsDF(s, dir),
        "user_id", "ts_ms", gapMs = 1800000L)),

    "q_sessionize_presplit" -> ((s, dir) =>
      // hot-entity form: level-1 windows partition by (user, time-chunk)
      // so one bot user's history sorts in parallel across chunks; level 2
      // re-islands the sub-sessions — identical output by associativity,
      // so this row shares q_sessionize's oracle verbatim
      graft.operators.Sessionize.sessionizePreSplit(eventsDF(s, dir),
        "user_id", "ts_ms", gapMs = 1800000L, chunkMs = 86400000L)),

    "q_sliding_window" -> ((s, dir) =>
      // round 10: SLIDING event-time windows (7-day window, 1-day slide —
      // rolling weekly activity per user), completing the time-window
      // triad: tumbling = the Batcher family, session = Sessionize,
      // sliding = the native window() aggregate. Spark explodes each
      // event into its 7 covering windows then map-side-combines, so the
      // shuffle is ≈ |distinct (user, window)|, not 7x the events; the
      // oracle reproduces the same 7-window cover with a lateral
      // generate_series. Epoch is midnight-UTC-aligned so day windows
      // land on day boundaries.
      eventsDF(s, dir)
        .withColumn("__t", timestamp_millis(col("ts_ms")))
        .groupBy(col("user_id"), window(col("__t"), "7 days", "1 day").as("__w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"),
          (unix_millis(col("__w.start")) / lit(86400000L)).cast("long").as("window_day"),
          col("cnt"))),

    "q_streaming_sliding" -> ((s, dir) => {
      // round 10: sliding event-time windows as a STREAMING aggregation —
      // watermarked window(7 days, 1 day slide) over the 10% user slice,
      // fed in two ascending-ts halves plus a flush sentinel past every
      // window end + watermark. Append mode emits each (user, window)
      // exactly once when the watermark passes its close; the emitted set
      // must equal the batch sliding-window computation on the same fed
      // slice (Spark-computed invariant; the oracle pins the distinct
      // (user, window) count).
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val evs = eventsDF(s, dir).where(col("user_id") % 10 === 0)
        .select(col("user_id"), col("ts_ms")).as[(Long, Long)].collect()
      val minTs = evs.iterator.map(_._2).min
      val maxTs = evs.iterator.map(_._2).max
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val out = ms.toDS().toDF("user_id", "__ms")
        .withColumn("ts", timestamp_millis(col("__ms")))
        .withWatermark("ts", "1 hour")
        .groupBy(col("user_id"), window(col("ts"), "7 days", "1 day").as("__w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"),
          (unix_millis(col("__w.start")) / lit(86400000L)).cast("long").as("window_day"),
          col("cnt"))
      val view = "q_streaming_sliding_sink"
      s.catalog.dropTempView(view)
      withStreamingGateConf(s, 4) {
        val q = out.writeStream.format("memory").queryName(view)
          .outputMode("append").start()
        try {
          val mid = minTs + (maxTs - minTs) / 2 + 1
          Seq((minTs, mid), (mid, maxTs + 1)).foreach { case (lo, hi) =>
            ms.addData(evs.iterator.filter(e => e._2 >= lo && e._2 < hi).toSeq)
            q.processAllAvailable()
          }
          ms.addData(Seq((-1L, maxTs + 9L * 86400000L))) // flush everything
          q.processAllAvailable()
        } finally q.stop()
      }
      val streamed = s.table(view).where(col("user_id") =!= -1L)
        .localCheckpoint(true)
      val batch = evs.toSeq.toDF("user_id", "ts_ms")
        .withColumn("__t", timestamp_millis(col("ts_ms")))
        .groupBy(col("user_id"), window(col("__t"), "7 days", "1 day").as("__w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"),
          (unix_millis(col("__w.start")) / lit(86400000L)).cast("long").as("window_day"),
          col("cnt"))
        .localCheckpoint(true) // both except directions read it; compute once
      val eq = withPinnedShufflePartitions(s, 4) {
        streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0
      }
      streamed.agg(count(lit(1)).as("n_windows"))
        .withColumn("stream_eq_batch", lit(eq))
    }),

    "q_streaming_sessionize" -> ((s, dir) => {
      // streaming sessionization via the NATIVE session_window aggregate
      // (merging session state per user in the state store, watermark
      // eviction): the 10% user slice feeds in two ascending-ts halves
      // plus a flush sentinel; the emitted sessions must equal the batch
      // gaps-and-islands operator on the same fed corpus EXACTLY (same
      // half-open gap convention), a Spark-computed invariant the oracle
      // pins alongside the session count.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val evs = eventsDF(s, dir).where(col("user_id") % 10 === 0)
        .select(col("user_id"), col("ts_ms")).as[(Long, Long)].collect()
      val minTs = evs.iterator.map(_._2).min
      val maxTs = evs.iterator.map(_._2).max
      val gap = 1800000L
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
      val out = graft.operators.Sessionize.sessionizeStreaming(
        ms.toDS().toDF("user_id", "__ms")
          .withColumn("ts", timestamp_millis(col("__ms"))),
        "user_id", "ts", gapMs = gap)
      val view = "q_streaming_sessionize_sink"
      s.catalog.dropTempView(view)
      withStreamingGateConf(s, 4) {
        val q = out.writeStream.format("memory").queryName(view)
          .outputMode("append").start()
        try {
          val mid = minTs + (maxTs - minTs) / 2 + 1
          Seq((minTs, mid), (mid, maxTs + 1)).foreach { case (lo, hi) =>
            ms.addData(evs.iterator.filter(e => e._2 >= lo && e._2 < hi).toSeq)
            q.processAllAvailable()
          }
          // flush: past every open session's close + watermark
          ms.addData(Seq((-1L, maxTs + 48L * 3600000L)))
          q.processAllAvailable()
        } finally q.stop()
      }
      val streamed = s.table(view).where(col("user_id") =!= -1L)
        .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
        .localCheckpoint(true)
      val batch = graft.operators.Sessionize.sessionize(
          evs.toSeq.toDF("user_id", "ts_ms"), "user_id", "ts_ms", gapMs = gap)
        .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
        .localCheckpoint(true) // both except directions read it; compute once
      val eq = withPinnedShufflePartitions(s, 4) {
        streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0
      }
      streamed.agg(count(lit(1)).as("n_sessions"))
        .withColumn("stream_eq_batch", lit(eq))
    }),

    "q_unique_service" -> ((s, dir) => {
      // UniqueKeyedService + EmptyService (reference scalding/service/
      // UniqueKeyedService.scala, EmptyService): unique-keyed dimension
      // lookup collapses the temporal machinery to a plain left equi-join
      // (Catalyst broadcasts the small side), and the empty service
      // contributes a typed all-null column — both directly
      // SQL-expressible. The service is partial (signup users only) so
      // the left-outer miss path carries real nulls.
      val ev = eventsDF(s, dir).select(col("event_id"), col("user_id"))
      val svc = eventsDF(s, dir).where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("event_id")).as("signup_event_id"))
      val joined = BatchServices.uniqueKeyed(ev, svc, Seq("user_id"))
      BatchServices.empty(joined, Seq(("missing_val", "bigint")))
    }),

    "q_loop_join" -> ((s, dir) => {
      // loop join: the store DEPENDS on the join output (reference
      // Service.scala:196-269). Running prior-event counter per user: each
      // event looks up the current count, then writes +1 back. Event-time
      // := event_id so the scan order is total and oracle-reproducible.
      import s.implicits._
      val events = eventsDF(s, dir).select(col("event_id").as("_1"),
        col("user_id").as("_2"), col("event_id").as("_3")).as[(Long, Long, Long)]
      LoopJoin.loopJoin[Long, Long, Long](events, None, (_, _) => Some(1L))(
          Semigroup.longSemigroup, implicitly, implicitly, implicitly)
        .map { case (_, user, (eid, prior)) => (eid, user, prior.getOrElse(0L)) }
        .toDF("event_id", "user_id", "prior_events")
    }),

    "q_availability" -> ((s, dir) => {
      // round 10: availability planning itself (TimePathedSource — the
      // reference's satisfiableHdfs/minify + planner interval shrink)
      // oracled directly: events land in a dense batch_id=N partitioned
      // source, batch 3's directory is DELETED (the hole), and the
      // requested range (1, nBatches) must shrink to the maximal
      // satisfiable prefix (1, 2) — with the read returning exactly those
      // two batches' rows and a request STARTING at the hole planning to
      // None. All facts derive from the data's own day range, so the row
      // is corpus-agnostic.
      import s.implicits._
      val src = java.nio.file.Files.createTempDirectory("graft_avail_").toString
      try { // scratch source deleted on EVERY exit path
        val dayIdx = eventsDF(s, dir)
          .select(expr("ts_ms DIV 86400000").as("day")).distinct()
          .withColumn("batch_id", row_number().over(Window.orderBy(col("day"))).cast("long"))
        val byBatch = eventsDF(s, dir)
          .select(col("user_id"), expr("ts_ms DIV 86400000").as("day"))
          .join(broadcast(dayIdx), "day")
          .select(col("user_id"), col("batch_id"))
        byBatch.repartition(col("batch_id"))
          .write.mode("overwrite").partitionBy("batch_id").parquet(src)
        val nBatches = dayIdx.count()
        graft.batch.BatchState.deleteDir(s"$src/batch_id=3") // the hole
        val ((lo, hi), planned) = graft.sources.TimePathedSource
          .read(s, src, (BatchID(1), BatchID(nBatches))).get
        val nRows = planned.count()
        val holeStartNone = graft.sources.TimePathedSource
          .satisfiable(s, src, (BatchID(3), BatchID(nBatches))).isEmpty
        Seq((lo.id, hi.id, nRows, holeStartNone))
          .toDF("planned_lo", "planned_hi", "n_rows", "hole_start_none")
      } finally graft.batch.BatchState.deleteDir(src)
    }),

    "q_name_options" -> ((s, dir) => {
      // round 10: the `name` per-name options surface oracled — the
      // reference's FlatMapShards / MonoidIsCommutative options keyed by
      // node name (Options.scala). Three facts in one row set: the label
      // is semantics-free (oracled content is the plain per-user count),
      // `shards = 7` reshards the next closure flatMap onto exactly 7
      // partitions (Spark-computed invariant), and `commutative = false`
      // forces the event-time-ordered fold whose result must equal the
      // hash-agg path on a commutative semigroup.
      import s.implicits._
      val base = eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
      // both sides materialize ONCE: each except direction would otherwise
      // recompute both aggregation frames (4 computes for 2 needed)
      val default = base.sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .localCheckpoint(true)
      val forced = base.name("ordered", commutative = false)
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .localCheckpoint(true)
      val pathsEqual = default.except(forced).count() == 0 &&
        forced.except(default).count() == 0
      val sharded = eventStream(s, dir).name("resharded", shards = 7)
        .flatMap(e => Iterator.single(e.event_id))
      val shardsOk = sharded.ds.rdd.getNumPartitions == 7
      default.toDF("user_id", "cnt")
        .withColumn("paths_equal", lit(pathsEqual))
        .withColumn("shards_ok", lit(shardsOk))
    }),

    "q_incremental_driver" -> ((s, dir) => {
      // the FULL incremental run loop (BatchDriver: commit log →
      // availability planning → delta pipeline over only the planned
      // batch partitions → snapshot commit) oracled end-to-end: events
      // land in a batch_id=N partitioned source, three driver invocations
      // with advancing upTo bounds roll the store forward (each plans and
      // reads only its new prefix, recorded in the commit log), and the
      // final snapshot must equal the all-time per-user counts. Bounds
      // derive from the data's own batch range so the row is corpus-
      // agnostic.
      import s.implicits._
      val src = java.nio.file.Files.createTempDirectory("graft_drv_src_").toString
      val storeDir = java.nio.file.Files.createTempDirectory("graft_drv_store_").toString
      // batch ids are the DENSE index over the days actually present (a
      // tiny distinct-days dim, window over <=thousands of rows, broadcast
      // back) — a raw day number would leave partition gaps on any
      // zero-event day and availability planning would correctly stall
      // at the hole forever, failing the row on such a corpus
      val dayIdx = eventsDF(s, dir)
        .select(expr("ts_ms DIV 86400000").as("day")).distinct()
        .withColumn("batch_id", row_number().over(Window.orderBy(col("day"))).cast("long"))
      val byBatch = eventsDF(s, dir)
        .select(col("user_id"), expr("ts_ms DIV 86400000").as("day"))
        .join(broadcast(dayIdx), "day")
        .select(col("user_id"), col("batch_id"))
      byBatch.repartition(col("batch_id"))
        .write.mode("overwrite").partitionBy("batch_id").parquet(src)
      val bHi = dayIdx.count() // dense ids are 1..nDays
      val store = new graft.batch.BatchStore[Long, Long](storeDir)
      def pipeline(input: org.apache.spark.sql.DataFrame): Dataset[(Long, Long, Long)] =
        input.groupBy(col("user_id"), col("batch_id"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("user_id"), col("batch_id"), col("cnt"))
          .as[(Long, Long, Long)]
      val step = math.max(1L, bHi / 3)
      // the temp dirs hold a partitioned copy of the events table — delete
      // them on EVERY exit path (a throwing driver run or readLast would
      // otherwise leak the copy into /tmp on each failing bench rep)
      try {
        Seq(1L + step, 1L + 2 * step, bHi).foreach { upTo =>
          graft.batch.BatchDriver.runIncremental(s, src, store,
            graft.time.BatchID(upTo))(pipeline)(
            Semigroup.longSemigroup, implicitly, implicitly)
        }
        // materialize before deleting the temp source/store dirs the lazy
        // plan would otherwise re-read
        store.readLast(s).get._2.toDF("user_id", "cnt").localCheckpoint(true)
      } finally {
        graft.batch.BatchState.deleteDir(src)
        graft.batch.BatchState.deleteDir(storeDir)
      }
    }),

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
    }),

    // -- time / batching (SURVEY §1.2) -----------------------------------
    "q_batcher" -> ((s, dir) => {
      val daily = Batcher.ofDays(1)
      eventsDF(s, dir)
        .groupBy(col("user_id"), daily.batchIdColumn(col("ts_ms")).as("batch_id"))
        .agg(count(lit(1)).as("cnt"))
    }),

    "q_batcher_calendar" -> ((s, dir) => {
      // calendar (civil-timezone) batching: batch boundaries at New York
      // midnight, not UTC midnight — the CalendarBatcher rebuild
      val ny = Batcher.calendarDays("America/New_York")
      eventsDF(s, dir)
        .groupBy(col("user_id"), ny.batchIdColumn(col("ts_ms")).as("batch_id"))
        .agg(count(lit(1)).as("cnt"))
    }),

    "q_collectkeys" -> ((s, dir) => {
      // collectKeys (partial function over keys, Producer.scala:345-347):
      // keep p-prefixed event types, re-key to uppercase, count
      import s.implicits._
      eventStream(s, dir).asKeyedCols[String, Long](col("_2.event_type"), lit(1L))
        .collectKeys { case t if t.startsWith("p") => t.toUpperCase }
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
        .toDF("etype", "cnt")
    }),

    "q_collectvalues" -> ((s, dir) => {
      // collectValues (Producer.scala:348-350): keep values over 100,
      // shifted down, summed per user
      import s.implicits._
      eventStream(s, dir).asKeyedCols[Long, Double](col("_2.user_id"), col("_2.value"))
        .collectValues { case v if v > 100.0 => v - 100.0 }
        .sumByKeyAllTime(Semigroup.doubleSemigroup, implicitly)
        .select(col("_1").as("user_id"), round(col("_2"), 6).as("sumv"))
    }),

    "q_decayed" -> ((s, dir) => {
      // exponentially time-decayed sum (SURVEY §1.3 Decayed value): per
      // user, events' values decayed to the user's latest event time with a
      // 7-day half-life. Commutative merge (rescale to max ts, then add);
      // rounded to 6 dp — association order only perturbs ~1e-12 relative.
      import s.implicits._
      import graft.algebra.Decayed
      implicit val sg: Semigroup[Decayed] =
        Decayed.semigroup(halfLifeMs = 7.0 * 86400000.0)
      eventStream(s, dir)
        .asKeyedCols[Long, Decayed](col("_2.user_id"),
          struct(col("_1").as("ts"), col("_2.value").as("value")))
        .sumByKeyAllTime(sg, implicitly)
        .select(col("_1").as("user_id"), col("_2.ts").as("last_ts_ms"),
          round(col("_2.value"), 6).as("decayed"))
    }),

    "q_lastbytime" -> ((s, dir) => {
      // lastByTime value semigroup (latest-write-wins register, SURVEY §1.3):
      // per user, the time and type of their latest event. Non-commutative,
      // so sumByKey routes it through the event-time-ordered fold.
      import s.implicits._
      implicit val sg: Semigroup[(Long, String)] = Semigroup.lastByTime[String]
      eventStream(s, dir)
        .asKeyedCols[Long, (Long, String)](col("_2.user_id"),
          struct(col("_1").as("_1"), col("_2.event_type").as("_2")))
        .sumByKeyAllTime(sg, implicitly)
        .select(col("_1").as("user_id"), col("_2._1").as("last_ts_ms"),
          col("_2._2").as("last_type"))
    }),

    "q_batcher_combined" -> ((s, dir) => {
      // Combined batcher (reference CombinedBatcher): daily batches before
      // the cut, hourly after, ids monotone across the switch. The cut lands
      // exactly on a daily boundary — the case where a naive batchOf(at)
      // would skip an id.
      val comb = Batcher.Combined(Batcher.ofDays(1), Batcher.ofHours(1),
        Timestamp(1705276800000L)) // 2024-01-15T00:00:00Z
      eventsDF(s, dir)
        .groupBy(col("user_id"), comb.batchIdColumn(col("ts_ms")).as("batch_id"))
        .agg(count(lit(1)).as("cnt"))
    }),

    "q_sumbykey_delta" -> ((s, dir) => {
      // the Summer's (Option[V], V) contract per (key, batch):
      // prior = all-time sum before this batch, delta = this batch's sum
      import s.implicits._
      val daily = Batcher.ofDays(1)
      eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .sumByKey(daily)(Semigroup.longSemigroup)
        .select(col("_1").as("user_id"), col("_2").as("batch_id"),
          col("_3._1").as("prior"), col("_3._2").as("delta"))
    }),

    "q_client_merge" -> ((s, dir) => {
      // lambda-architecture read: offline snapshot (first half of the month)
      // semigroup-merged with online deltas (second half)
      import s.implicits._
      val cut = 1705276800000L // 2024-01-15T00:00:00Z
      val offline = eventStream(s, dir).where(col("_1") < cut)
        .asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
      val online = eventStream(s, dir).where(col("_1") >= cut)
        .asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
      graft.client.ClientStore.mergeKV(offline.union(online))(
        Semigroup.longSemigroup, implicitly, implicitly)
        .toDF("user_id", "cnt")
    }),

    "q_batch_merge" -> ((s, dir) => {
      // The incremental batch merge end-to-end (BatchedStore.mergeBatched
      // semantics): run BatchStore.merge TWICE — first half of the month,
      // then roll forward from the committed snapshot — and emit the union
      // of both runs' (key, batch, prior, delta) outputs. Matching the
      // single-pass q_sumbykey_delta oracle proves the snapshot
      // roll-forward reads exactly the prior state and the delta filter
      // (priorBatch, upTo] neither drops nor double-counts.
      import s.implicits._
      val daily = Batcher.ofDays(1)
      val cutBatch = 19736L // day before 2024-01-15
      val deltas = eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .sumDeltasPerBatch(daily)(Semigroup.longSemigroup)
        .persist()
      val tmp = java.nio.file.Files.createTempDirectory("graft_store_").toString
      val store = new BatchStore[Long, Long](tmp)
      val out1 = store.merge(s, deltas, BatchID(cutBatch))(Semigroup.longSemigroup)
      // upper bound past the data's end (events end 2024-01-30 = batch
      // 19752): trailing empty batches are free, and this avoids a
      // driver-side max() job
      val out2 = store.merge(s, deltas, BatchID(19800L))(Semigroup.longSemigroup)
      out1.union(out2)
        .select(col("_1").as("user_id"), col("_2").as("batch_id"),
          col("_3._1").as("prior"), col("_3._2").as("delta"))
    }),

    "q_store_delete" -> ((s, dir) => {
      // round 14: key-deletion maintenance on the serving store
      // (BatchStore.deleteKeys — the takedown path a lambda deployment
      // needs against the KV store, not just the indexes): merge ALL
      // events, revoke a deterministic user slice (user_id % 5 == 2),
      // then the served snapshot must equal a recompute over the
      // RETAINED events — and a ClientStore point-get of a revoked key
      // must return None (asserted in-row; the delete rewrote every
      // retained version as a new generation behind one atomic flip).
      import s.implicits._
      val daily = Batcher.ofDays(1)
      val deltas = eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .sumDeltasPerBatch(daily)(Semigroup.longSemigroup)
        .persist()
      val tmp = java.nio.file.Files.createTempDirectory("graft_store_").toString
      try {
        val store = new BatchStore[Long, Long](tmp)
        store.merge(s, deltas, BatchID(19800L))(Semigroup.longSemigroup).count()
        val victims = eventsDF(s, dir).select(col("user_id")).distinct()
          .where(col("user_id") % 5 === 2).as[Long].collect()
        // a dataset slice with no user_id % 5 == 2 degrades to the
        // no-victims case cleanly (deleteKeys requires a non-empty set)
        if (victims.nonEmpty) store.deleteKeys(s, victims.toSeq)
        // end-to-end serving check: a revoked key point-reads as None
        // (no online deltas — the store is the only source)
        require(victims.isEmpty || withPinnedShufflePartitions(s, 4) {
          graft.client.ClientStore.get(s, store,
            s.emptyDataset[(Long, Long, Long)], victims.head)(
            Semigroup.longSemigroup, implicitly, implicitly).isEmpty
        }, "q_store_delete: ClientStore.get served a revoked key")
        store.readLast(s).get._2.toDF("user_id", "cnt")
      } finally {
        deltas.unpersist()
        ()
      }
    }),

    "q_backfill" -> ((s, dir) => {
      // round 14: historical recompute (BatchStore.backfill — the lambda
      // architecture's human-fault-tolerance move): the middle batch
      // range merges CORRUPTED (every event double-counted), poisoning
      // its snapshot and the one after it; backfill from the corruption
      // point with the corrected master-dataset deltas rewrites exactly
      // those two snapshots as new generations behind one atomic flip —
      // the earlier snapshot stays at generation 0 untouched. Output is
      // BOTH rewritten snapshots (history must be corrected, not just
      // the newest), oracled against a DuckDB recompute at each batch.
      import s.implicits._
      val daily = Batcher.ofDays(1)
      val (b1, b2, b3) = (19736L, 19768L, 19800L)
      val events = eventStream(s, dir)
      val correct = events.asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .sumDeltasPerBatch(daily)(Semigroup.longSemigroup)
        .persist()
      val corrupt = events.asKeyedCols[Long, Long](col("_2.user_id"), lit(2L))
        .sumDeltasPerBatch(daily)(Semigroup.longSemigroup)
      val tmp = java.nio.file.Files.createTempDirectory("graft_store_").toString
      try {
        val store = new BatchStore[Long, Long](tmp)
        store.merge(s, correct, BatchID(b1))(Semigroup.longSemigroup).count()
        store.merge(s, corrupt, BatchID(b2))(Semigroup.longSemigroup).count()
        store.merge(s, correct, BatchID(b3))(Semigroup.longSemigroup).count()
        val poisoned = store.readLast(s).get._2.map(_._2).reduce(_ + _)
        store.backfill(s, correct, BatchID(b1 + 1))(Semigroup.longSemigroup)
        // the corruption was real and the fix rewrote ONLY the poisoned
        // range: (b1] untouched at generation 0, (b1, b3] re-pointed
        val healed = store.readLast(s).get._2.map(_._2).reduce(_ + _)
        require(healed < poisoned,
          s"q_backfill: expected the corrupt store to overcount ($healed vs $poisoned)")
        val gens = store.state.gens
        require(gens == Map(b2 -> 1L, b3 -> 1L),
          s"q_backfill: unexpected generation map $gens")
        store.readLast(s, BatchID(b2)).get._2.toDF("user_id", "cnt")
          .withColumn("batch_id", lit(b2))
          .union(store.readLast(s, BatchID(b3)).get._2.toDF("user_id", "cnt")
            .withColumn("batch_id", lit(b3)))
          .select(col("user_id"), col("batch_id"), col("cnt"))
      } finally {
        correct.unpersist()
        ()
      }
    }),

    "q_backfill_guard" -> ((s, dir) => {
      // round 15: the deleteKeys × backfill COMPOSITION, enforced — merge
      // all events, revoke the user_id % 7 == 3 slice (Dataset-scale
      // takedown: anti-join rewrite, victims never collected), then
      // backfill the whole history with DIRTY deltas (the master stream
      // still carrying the revoked users): the recorded revocation
      // digests must be re-applied, so the rewritten snapshot serves the
      // retained users' recomputed counts and NEVER a revoked key
      // (absence also asserted in-row — a silent resurrection would be
      // invisible to a rows-only check).
      import s.implicits._
      val daily = Batcher.ofDays(1)
      val deltas = eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .sumDeltasPerBatch(daily)(Semigroup.longSemigroup)
        .persist()
      val tmp = java.nio.file.Files.createTempDirectory("graft_store_").toString
      try {
        val store = new BatchStore[Long, Long](tmp)
        store.merge(s, deltas, BatchID(19800L))(Semigroup.longSemigroup).count()
        val victims = eventsDF(s, dir).select(col("user_id")).distinct()
          .where(col("user_id") % 7 === 3).as[Long]
        if (victims.limit(1).count() > 0) store.deleteKeys(victims)
        // dirty replay: `deltas` is the UNCLEANSED master stream
        store.backfill(s, deltas, BatchID(19800L))(Semigroup.longSemigroup)
        val served = store.readLast(s).get._2.toDF("user_id", "cnt")
          .localCheckpoint(true)
        require(served.where(col("user_id") % 7 === 3).limit(1).count() == 0,
          "q_backfill_guard: a dirty backfill resurrected a revoked key")
        served
      } finally {
        deltas.unpersist()
        ()
      }
    }),

    "q_client_get" -> ((s, dir) => {
      // round 10: the point-serving read end-to-end through the
      // KEY-CLUSTERED snapshot layout (BatchStore keyBuckets →
      // readLastForKey → ClientStore.get): offline = clustered snapshot
      // through the cut batch, online = the delta stream; each get
      // statically prunes its bucket dir and must equal the all-data
      // per-user count. Keys are the 6 smallest user ids IN THE DATA, so
      // the row is corpus-agnostic and every get is a hit.
      import s.implicits._
      val daily = Batcher.ofDays(1)
      val cutBatch = 19736L // day before 2024-01-15
      val deltas = eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .sumDeltasPerBatch(daily)(Semigroup.longSemigroup)
        .persist()
      val tmp = java.nio.file.Files.createTempDirectory("graft_store_").toString
      try { // store dir + cache reclaimed on EVERY exit path
        val store = new BatchStore[Long, Long](tmp, keyBuckets = Some(8))
        store.merge(s, deltas, BatchID(cutBatch))(Semigroup.longSemigroup).count()
        val keys = eventsDF(s, dir).select(col("user_id")).distinct()
          .orderBy(col("user_id")).limit(6).as[Long].collect()
        // serving reads pin a SMALL shuffle width: each get merges ONE
        // key's snapshot row + deltas, so a 32-partition shuffle per get
        // is pure task overhead (a real point-serving deployment sizes
        // its request-path partitions to the request, not the corpus)
        val (singles, multi) = withPinnedShufflePartitions(s, 4) {
          val ones = keys.toSeq.map { k =>
            (k, ClientStore.get(s, store, deltas, k)(
              Semigroup.longSemigroup, implicitly, implicitly).getOrElse(0L))
          }
          // the storehaus multiGet shape: ONE pruned job for the whole key
          // set must agree with the per-key gets exactly
          (ones, ClientStore.getBatch(s, store, deltas, keys.toSeq)(
            Semigroup.longSemigroup, implicitly, implicitly))
        }
        require(multi == singles.toMap,
          s"getBatch disagrees with per-key gets: $multi vs $singles")
        multi.toSeq.toDF("user_id", "cnt")
      } finally {
        deltas.unpersist()
        graft.batch.BatchState.deleteDir(tmp)
      }
    }),

    "q_lambda_merged" -> ((s, dir) => {
      // Full lambda read path: offline = BatchStore snapshot committed
      // through the cut batch; online = the delta stream; ClientStore.merged
      // applies the monotonicity guard (only deltas AFTER the snapshot
      // batch) and semigroup-merges. Equals an all-data recompute.
      import s.implicits._
      val daily = Batcher.ofDays(1)
      val cutBatch = 19736L
      val deltas = eventStream(s, dir).asKeyedCols[Long, Long](col("_2.user_id"), lit(1L))
        .sumDeltasPerBatch(daily)(Semigroup.longSemigroup)
        .persist()
      val tmp = java.nio.file.Files.createTempDirectory("graft_store_").toString
      val store = new BatchStore[Long, Long](tmp)
      store.merge(s, deltas, BatchID(cutBatch))(Semigroup.longSemigroup).count()
      ClientStore.merged(s, store, deltas)(Semigroup.longSemigroup, implicitly, implicitly)
        .toDF("user_id", "cnt")
    }),

    // -- semigroup value types (SURVEY §1.3) -----------------------------
    "q_max_by" -> ((s, dir) => {
      // latest event per user via a max-(ts,event_id) semigroup value
      import s.implicits._
      eventStream(s, dir)
        .asKeyedCols[Long, (Long, Long)](col("_2.user_id"),
          struct(col("_2.ts_ms").as("_1"), col("_2.event_id").as("_2")))
        .sumByKeyAllTime(Semigroup.maxSemigroup[(Long, Long)], implicitly)
        .select(col("_1").as("user_id"), col("_2._2").as("last_event"))
    }),

    "q_topk" -> ((s, dir) => {
      // top-5 events by value per event_type, as a TopK semigroup value
      import s.implicits._
      implicit val sg: Semigroup[TopK[Long]] = TopK.topKSemigroup[Long]
      eventStream(s, dir)
        .asKeyedWith(_.event_type, (e: Ev) => TopK.one(5, e.value, e.event_id))
        .sumByKeyAllTime(sg, implicitly)
        .flatMap { case (et, topk) => topk.items.map { case (v, id) => (et, id, v) } }
        .toDF("event_type", "event_id", "value")
    }),

    "q_sumbykey_presplit" -> ((s, dir) => {
      // round 10: the HOT-KEY PRE-SPLIT form of the non-commutative
      // ordered fold (sumDeltasPerBatchPreSplit) — same List-concat
      // semantics as q_sumbykey_ordered, but each key's event-time scan
      // parallelizes across event-id chunks (chunk folds → chunk-order
      // merge, identical by associativity). Must match the same ordered
      // string_agg oracle exactly.
      import s.implicits._
      GraftStream.from(eventsDs(s, dir))(_.event_id)
        .asKeyedWith(_.user_id, (e: Ev) => List(e.event_id))
        .sumByKeyAllTimePreSplit(_ / 4096)(Semigroup.listSemigroup[Long], implicitly)
        .map { case (u, ids) => (u, ids.mkString(",")) }
        .toDF("user_id", "event_ids")
    }),

    "q_sumbykey_ordered" -> ((s, dir) => {
      // NON-COMMUTATIVE semigroup (List concat) through sumByKey: routes
      // through the event-time-ordered fold (sorted groups), never hash
      // aggregation. Event-time := event_id for a total, oracle-stable order.
      import s.implicits._
      GraftStream.from(eventsDs(s, dir))(_.event_id)
        .asKeyedWith(_.user_id, (e: Ev) => List(e.event_id))
        .sumByKeyAllTime(Semigroup.listSemigroup[Long], implicitly)
        .map { case (u, ids) => (u, ids.mkString(",")) }
        .toDF("user_id", "event_ids")
    }),

    "q_json_props" -> ((s, dir) =>
      // JSON-metadata filtering — the training-pipeline shape where
      // per-record metadata gates inclusion: extract props.k (Spark's
      // codegen'd get_json_object), filter on it, aggregate per type
      eventsDF(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("__k"))
        .where(col("__k") >= 50)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_hi"), sum(col("__k")).as("sum_k"))),

    "q_count_distinct" -> ((s, dir) =>
      eventsDF(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))),

    "q_hll" -> ((s, dir) => {
      // HLL via the native TypedImperativeAggregate (one mutable register
      // set per key per partition — no per-event allocation); identical
      // registers to the HLL semigroup VALUE form (SketchAggregatesSpec
      // asserts equality). The estimate itself is engine-specific, but
      // |est − exact| ≤ max(1, 5% · exact) is deterministic on given
      // data (q_cms pattern; the tighter ±2% bound at 10k distinct is the
      // SketchAggregatesSpec law) — so the row is fully oracled against
      // the SQL-exact distinct count.
      import s.implicits._
      import graft.functions.{SketchAggregates => SK}
      val est = eventStream(s, dir)
        .asKeyedCols[String, Long](col("_2.event_type"), col("_2.user_id"))
        .sumByKeyAgg[Long](c => SK.hllCountDistinct(c))
        .toDF("event_type", "__est")
      eventsDF(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .join(est, Seq("event_type"))
        .select(col("event_type"), col("n_users"),
          (abs(col("__est") - col("n_users")) <=
            greatest(lit(1.0), col("n_users") * 0.05)).as("est_ok"))
    }),

    "q_cms" -> ((s, dir) => {
      // Count-min sketch aggregate: per event_type, sketch the user_id
      // stream, then check the DETERMINISTIC CMS invariant per user —
      // a point estimate can never under-count (estimate >= exact count,
      // by construction, independent of data). The eps*N over-count bound
      // is probabilistic and lives in SketchAggregatesSpec instead.
      import s.implicits._
      import graft.functions.{SketchAggregates => SK}
      val sketches = eventStream(s, dir)
        .asKeyedCols[String, Long](col("_2.event_type"), col("_2.user_id"))
        .sumByKeyAgg[Array[Byte]](c => SK.cmsSketch(c, depth = 5, width = 8192))
        .toDF("event_type", "__sk")
      val exact = eventsDF(s, dir)
        .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("__cnt"))
      exact.join(sketches, Seq("event_type"))
        .select(col("event_type"), col("user_id"),
          (SK.cmsEstimate(col("__sk"), col("user_id")) >= col("__cnt")).as("cnt_ok"))
    }),

    "q_moments" -> ((s, dir) => {
      // mean/variance/skewness/kurtosis per event_type via the Moments
      // semigroup VALUE (algebird Moments; SURVEY §1.3): partials merge
      // with the Pebay pairwise formulas, stats read off the final value.
      // Rounded to 6dp on both sides — merge order differs from the
      // oracle's two-pass formula only in float ulps.
      import s.implicits._
      eventStream(s, dir)
        .asKeyedWith(_.event_type, (e: Ev) => Moments.of(e.value))
        .sumByKeyAllTime(Moments.momentsSemigroup, implicitly)
        .map { case (et, m) => (et, m.n, m.mean, m.variance, m.skewness, m.kurtosis) }
        .toDF("event_type", "n_events", "mean_v", "var_v", "skew_v", "kurt_v")
        .select(col("event_type"), col("n_events"),
          round(col("mean_v"), 6).as("mean_v"),
          round(col("var_v"), 6).as("var_v"),
          round(col("skew_v"), 6).as("skew_v"),
          round(col("kurt_v"), 6).as("kurt_v"))
    }),

    "q_heavy_hitters" -> ((s, dir) => {
      // top-3 users by event count per event_type via the SpaceSaver
      // sketch (algebird SpaceSaver; SURVEY §1.3), via the native
      // aggregate (one mutable counter map per key per partition — the
      // semigroup VALUE form pays a persistent-map fold per event, and is
      // law-checked equal in SketchAggregatesSpec). capacity 2048 >=
      // distinct users per type through sf0.1 (1500), so the sketch is in
      // its EXACT regime and the oracle is the true frequency ranking;
      // the bounded-memory approximation guarantees (eviction regime) are
      // law-checked in SemigroupSpec.
      import s.implicits._
      import graft.functions.{SketchAggregates => SK}
      eventStream(s, dir)
        .asKeyedCols[String, Long](col("_2.event_type"), col("_2.user_id"))
        .sumByKeyAggDF(c => SK.spaceSaver(c, capacity = 2048))
        .select(col("_1").as("event_type"), posexplode(col("_2")))
        .where(col("pos") < 3)
        .select(col("event_type"), col("col.item").as("user_id"), col("col.cnt").as("cnt"))
    }),

    "q_quantile" -> ((s, dir) => {
      // p50/p90/p99 of value per event_type via the QHist semigroup VALUE
      // (the algebird-QTree role; SURVEY §1.3). The histogram is exact
      // (bucket counts, not samples), so the bucket [lo, hi) holding the
      // ceil(q*n)-th element is a deterministic function of the data —
      // the oracle recomputes it from the exact rank-quantile.
      import s.implicits._
      eventStream(s, dir)
        .asKeyedWith(_.event_type, (e: Ev) => QHist.of(e.value, width = 0.25))
        .sumByKeyAllTime(QHist.qhistSemigroup, implicitly)
        .flatMap { case (et, h) =>
          Seq(0.5, 0.9, 0.99).map { p =>
            val (lo, hi) = h.quantileBounds(p)
            (et, p, lo, hi)
          }
        }
        .toDF("event_type", "p", "lo", "hi")
        .select(col("event_type"), col("p"),
          round(col("lo"), 6).as("lo"), round(col("hi"), 6).as("hi"))
    }),

    "q_bloom" -> ((s, dir) => {
      // Bloom filter of user_ids per event_type via the native aggregate
      // (one bit array per key per partition, OR-merged partials), then
      // the DETERMINISTIC no-false-negative invariant: every (event_type,
      // user_id) actually present must probe true. The false-positive
      // RATE is probabilistic and lives in SketchAggregatesSpec.
      import s.implicits._
      import graft.functions.{SketchAggregates => SK}
      val sketches = eventStream(s, dir)
        .asKeyedCols[String, Long](col("_2.event_type"), col("_2.user_id"))
        .sumByKeyAgg[Array[Byte]](c => SK.bloomFilter(c, numBits = 1 << 16, k = 5))
        .toDF("event_type", "__bf")
      eventsDF(s, dir).select(col("event_type"), col("user_id")).distinct()
        .join(sketches, Seq("event_type"))
        .select(col("event_type"), col("user_id"),
          SK.bfContains(col("__bf"), col("user_id")).as("contained"))
    }),

    // -- dedup family ----------------------------------------------------
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(docsDs(s, dir).toDF(), "text", "doc_id").select("doc_id")),

    "q_dedup_exact_norm" -> ((s, dir) =>
      Dedup.exactNormalized(docsDs(s, dir).toDF(), "text", "doc_id").select("doc_id")),

    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLsh(docsDs(s, dir).toDF(), "text", "doc_id",
        w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5).select("doc_id")),

    "q_exact_substr" -> ((s, dir) =>
      // ExactSubstr-style span removal (Lee et al. ACL'22): non-first
      // occurrences of 8-token windows are removed, text rebuilt from
      // surviving tokens. Oracle recomputes the same first-occurrence
      // ranking over literal gram strings in DuckDB.
      Dedup.removeDuplicatedSpans(docsDs(s, dir).toDF(), "text", "doc_id", k = 8)),

    "q_span_incr" -> ((s, dir) => {
      // incremental span removal: the daily batch (doc_id % 5 == 0) loses
      // spans already present in the historical corpus plus non-first
      // re-occurrences within the batch; the corpus-side input is the
      // stored spanHashes frame (here computed inline).
      val base = t(s, dir, "documents").select("doc_id", "text")
      val batch = base.where(col("doc_id") % 5 === 0)
      val corpus = base.where(col("doc_id") % 5 =!= 0)
      Dedup.removeDuplicatedSpansAgainst(batch,
        Dedup.spanHashes(corpus, "text", k = 8), "text", "doc_id", k = 8)
    }),

    "q_pipeline_spans" -> ((s, dir) => {
      // span-hygiene COMPOSITION: ExactSubstr span removal → drop docs
      // emptied by it → exact dedup of the REBUILT text (catches docs
      // that became byte-identical only after their duplicated spans
      // were cut). The whole chain is oracled in one SQL statement.
      val cleaned = Dedup.removeDuplicatedSpans(
        t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id", k = 8)
      Dedup.exact(cleaned.where(length(col("text_clean")) > 0),
        "text_clean", "doc_id").select("doc_id")
    }),

    "q_dedup_cc" -> ((s, dir) =>
      // transitive-closure dedup: connected components over the verified
      // near-dup graph, keep each component's min id. The oracle computes
      // the same closure with a recursive CTE over the exact-jaccard pair
      // set (banding recall is ~1 at 0.5 on this corpus, as established
      // for q_minhash_cands).
      Dedup.minhashLshTransitive(docsDs(s, dir).toDF(), "text", "doc_id",
        w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5).select("doc_id")),

    "q_dedup_canonical" -> ((s, dir) => {
      // the POLICY layer over the same closure: production releases keep
      // the best member per near-dup cluster, not the smallest id — here
      // the longest text, ties to min id. Output is the full resolution
      // mapping (every doc -> its cluster's canonical doc).
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("score", length(col("text")))
      val pairs = Dedup.minhashVerifiedPairs(docs, "text", "doc_id",
        w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      Dedup.canonicalByScore(docs, pairs, "doc_id", "score")
    }),

    "q_bm25" -> ((s, dir) => {
      // lexical retrieval: all BM25-scored (query, doc) pairs for the
      // fixed query set — the index build + broadcast-candidate join +
      // score aggregation path, fully oracled (scores to 6dp)
      Retrieval.bm25Scores(t(s, dir, "documents").select("doc_id", "text"),
        bm25Queries(s), "text", "doc_id", "qtext", "query_id")
    }),

    "q_bm25_topk" -> ((s, dir) => {
      // per-query top-3 by (rounded score desc, doc_id) — the window
      // rank compiles to WindowGroupLimit (partial top-k map-side)
      val idx = Retrieval.buildIndex(
        t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id")
      Retrieval.bm25TopK(idx, bm25Queries(s), "qtext", "query_id", k = 3)
    }),

    "q_bm25_topk_pruned" -> ((s, dir) => {
      // WAND-lite (max-score) impact pruning: per-token ub/minc bounds
      // derive a sound k-th-score floor θ, docs reachable only through
      // the sub-θ token prefix are never scored — identical output to
      // q_bm25_topk (shared oracle) with the stopword-class aggregation
      // volume skipped
      val idx = Retrieval.buildIndex(
        t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id")
      Retrieval.bm25TopKPruned(idx, bm25Queries(s), "qtext", "query_id", k = 3)
    }),

    "q_bm25_incr" -> ((s, dir) => {
      // daily-ingest shape: index built on 2/3 of the corpus, the rest
      // appended WITHOUT touching existing postings (stats merged
      // associatively) — scores must equal the full rebuild, so this row
      // shares q_bm25's oracle verbatim
      val base = t(s, dir, "documents").select("doc_id", "text")
      val idx0 = Retrieval.buildIndex(
        base.where(col("doc_id") % 3 =!= 0), "text", "doc_id")
      val idx = Retrieval.appendToIndex(idx0,
        base.where(col("doc_id") % 3 === 0), "text")
      Retrieval.bm25FromIndex(idx, bm25Queries(s), "qtext", "query_id")
    }),

    "q_bm25_stored" -> ((s, dir) => {
      // the serving path: index persisted token-bucketed, queries answered
      // from a PRUNED read (static tb partition filter + pushed token IN) —
      // exactness unaffected, so the row shares q_bm25's oracle verbatim
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_store_").toString
      try {
        val idx = Retrieval.buildIndex(
          t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id")
        Retrieval.writeIndex(idx, tmp, tokenBuckets = 16)
        // materialize before the finally reclaims the index files
        Retrieval.bm25FromStored(s, tmp, tokenBuckets = 16,
          bm25Queries(s), "qtext", "query_id", "doc_id").localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_bm25_topk_stored" -> ((s, dir) => {
      // the end-to-end stored SERVING path: scan pruned to the query
      // tokens' buckets (tb IN + pushed token IN), WAND-pruned scoring,
      // WindowGroupLimit top-k — exact, shares q_bm25_topk's oracle
      val docsDf = t(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_tks_").toString
      try {
        Retrieval.writeIndex(Retrieval.buildIndex(docsDf, "text", "doc_id"),
          tmp, tokenBuckets = 16)
        Retrieval.bm25TopKFromStored(s, tmp, tokenBuckets = 16,
          bm25Queries(s), "qtext", "query_id", "doc_id", k = 3)
          .localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_bm25_delete" -> ((s, dir) => {
      // the takedown / right-to-be-forgotten maintenance path: bootstrap a
      // stored index over the full corpus, DELETE doc_id % 7 == 3 (a
      // delete-set segment + negative stats delta on one atomic commit),
      // then serve — must equal DuckDB's BM25 over the RETAINED corpus
      // exactly, including the N/avgdl shift and df-derived idf changes
      val docsDf = t(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_del_").toString
      try {
        Retrieval.writeIndex(Retrieval.buildIndex(docsDf, "text", "doc_id"),
          tmp, tokenBuckets = 16)
        Retrieval.deleteFromStored(s, tmp,
          docsDf.where(col("doc_id") % 7 === 3).select("doc_id"))
        Retrieval.bm25FromStored(s, tmp, tokenBuckets = 16,
          bm25Queries(s), "qtext", "query_id", "doc_id").localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_bm25_replace" -> ((s, dir) => {
      // round 14: ATOMIC correction of a poisoned ingest
      // (Retrieval.replaceInStored): bootstrap the stored index from a
      // corpus whose doc_id % 7 == 3 slice was mangled at ingest (junk
      // token noise), then upsert the TRUE slice back — corrected
      // postings, the victim delete-set with its coverage marker, and
      // the exact (N, total_dl) stats delta publish on ONE commit-log
      // flip — and serve. Must equal DuckDB's BM25 over the true corpus
      // verbatim (q_bm25's oracle shared): no trace of the poisoned
      // texts in N, avgdl, dfs, or scores.
      val docsDf = t(s, dir, "documents").select("doc_id", "text")
      val mangled = docsDf.withColumn("text",
        when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" zzjunk zzjunk zznoise zzjunk")))
          .otherwise(col("text")))
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_rep_").toString
      try {
        Retrieval.writeIndex(Retrieval.buildIndex(mangled, "text", "doc_id"),
          tmp, tokenBuckets = 16)
        Retrieval.replaceInStored(s, tmp, tokenBuckets = 16,
          docsDf.where(col("doc_id") % 7 === 3), "text", "doc_id")
        Retrieval.bm25FromStored(s, tmp, tokenBuckets = 16,
          bm25Queries(s), "qtext", "query_id", "doc_id").localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_streaming_bm25" -> ((s, dir) => {
      // the FULL stored-index maintenance lifecycle: the corpus arrives in
      // 3 doc_id-sliced micro-batches, each committed as a new index
      // segment inside foreachBatch (the index stays serveable between
      // batches), then the maintenance-cadence COMPACTION folds the
      // segments into one (atomic commit-log flip), and scoring runs off
      // the compacted index. Every stage is exact, so this row still
      // shares q_bm25's oracle verbatim.
      // State story: NO Spark state-store state (fanout is stateless) —
      // the index IS the durable state, all-time by the operator's
      // contract; replay safety is the segment replay guard (batchId),
      // not a TTL/horizon (see StreamingIO.fanout)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = docsDs(s, dir).collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_stream_").toString
      try {
        // bootstrap: an EMPTY index ((0,0) stats, no postings) to ingest into
        Retrieval.writeIndex(Retrieval.buildIndex(
          t(s, dir, "documents").select("doc_id", "text").limit(0),
          "text", "doc_id"), tmp, tokenBuckets = 16)
        val writer = graft.streaming.StreamingIO.fanout(
          ms.toDS().toDF("doc_id", "text"))(Seq(
          (b, bid) => Retrieval.appendToStored(s, tmp, 16, b, "text",
            "doc_id", batchId = Some(bid))))
        withStreamingGateConf(s, 4) {
          val q = writer.start()
          try {
            (0 until 3).foreach { i =>
              ms.addData(docs.iterator.filter(_.doc_id % 3 == i)
                .map(d => (d.doc_id, d.text)).toSeq)
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        Retrieval.compactStored(s, tmp, tokenBuckets = 16)
        Retrieval.bm25FromStored(s, tmp, tokenBuckets = 16,
          bm25Queries(s), "qtext", "query_id", "doc_id").localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_minhash_cands" -> ((s, dir) =>
      // the VERIFIED candidate stage: banding proposes, exact shingle
      // jaccard disposes. Oracling the raw candidate set would assert
      // perfect banding PRECISION (false positives are allowed by
      // construction — a single sub-threshold band collision on regenerated
      // data would fail the gate); the verified stage is the contract.
      Dedup.minhashVerifiedPairs(docsDs(s, dir).toDF(), "text", "doc_id",
        w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .select("id_a", "id_b")),

    "q_dedup_incr_exact" -> ((s, dir) => {
      // incremental exact dedup: a "daily batch" (the %5 slice plus planted
      // byte-copies of corpus docs under shifted ids) deduped against the
      // historical corpus without re-pairing the corpus with itself. The
      // planted copies must all drop; the originals survive.
      val base = t(s, dir, "documents").select("doc_id", "text")
      val newBatch = base.where(col("doc_id") % 5 === 0).unionByName(
        base.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val corpus = base.where(col("doc_id") % 5 =!= 0)
      Dedup.exactAgainst(newBatch, corpus, "text", "doc_id").select("doc_id")
    }),

    "q_dedup_incr_bloom" -> ((s, dir) => {
      // same daily-ingest shape, via the Bloom-prefiltered path: the
      // corpus collapses to one bit array; only sketch-flagged batch rows
      // enter the verification anti-join. No false negatives => result is
      // exactly exactAgainst's, so the two queries share an oracle.
      val base = t(s, dir, "documents").select("doc_id", "text")
      val newBatch = base.where(col("doc_id") % 5 === 0).unionByName(
        base.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val corpus = base.where(col("doc_id") % 5 =!= 0)
      Dedup.exactAgainstBloom(newBatch, corpus, "text", "doc_id",
        numBits = 1 << 20, k = 5).select("doc_id")
    }),

    "q_dedup_incr_minhash" -> ((s, dir) => {
      // incremental near-dup: cross-only LSH between the new batch and the
      // corpus (bands x |new| bucket probes, no corpus self-join), verified
      // at exact 3-gram jaccard >= 0.5 against the cross-pair oracle
      val base = t(s, dir, "documents").select("doc_id", "text")
      Dedup.minhashNearCorpus(
        base.where(col("doc_id") % 5 === 0), base.where(col("doc_id") % 5 =!= 0),
        "text", "doc_id", w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    }),

    "q_row_index" -> ((s, dir) =>
      // contiguous 0-based export ids in (ts, event_id) order WITHOUT the
      // single-task global window: range partition -> per-partition counts
      // -> broadcast offsets -> per-slice row_number
      RowIndex.withRowIndex(eventsDF(s, dir), "idx", col("ts"), col("event_id"))
        .select(col("event_id"), col("idx"))),

    "q_pack" -> ((s, dir) =>
      // concat-and-chunk packing into 512-token training sequences in
      // doc_id order — global token prefix sum via the RowIndex shape
      // (range partition -> per-partition totals -> broadcast offsets),
      // never a data-sized unpartitioned window
      Packing.packSequences(
        t(s, dir, "documents").select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens")),
        col("n_tokens"), 512L, Seq(col("doc_id")))
        .select(col("doc_id"), col("n_tokens"), col("seq_id"), col("seq_offset"))),

    "q_pack_docwise" -> ((s, dir) =>
      // document-boundary-aware packing: budgeted next-fit that never
      // splits a doc across 512-token sequences — groups of 4096 tokens
      // (by prefix sum) are the deterministic parallel unit, local seq ids
      // renumber via a group-count-sized prefix sum
      Packing.packDocwise(
        t(s, dir, "documents").select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", col("n_tokens"), 512L, Seq(col("doc_id")), groupBudget = 4096L)
        .select(col("doc_id"), col("n_tokens"), col("seq_id"), col("seq_offset"))),

    "q_shared_ngrams" -> ((s, dir) =>
      // cross-document duplicated-trigram stats: docs sharing any distinct
      // lowercased 3-gram with another doc; only (id, gram-hash) Longs move
      Dedup.sharedNgramStats(t(s, dir, "documents"), "text", "doc_id",
        n = 3, minDocs = 2)),

    "q_boilerplate" -> ((s, dir) =>
      // C4-style boilerplate-line removal at corpus doc-frequency >= 2;
      // this corpus has no repeated lines, so the row also pins the exact
      // split/filter/rebuild byte-roundtrip (planted-removal laws live in
      // TrainingDataOpsSpec)
      Dedup.removeBoilerplateLines(t(s, dir, "documents"), "text", "doc_id",
        minDocs = 2)),

    "q_lm_score" -> ((s, dir) => {
      // CCNet-style LM quality scoring: unigram LM from the even-id half of
      // the corpus, mean per-token surprisal for the odd-id half. The LM
      // table broadcasts; scoring is explode -> broadcast probe -> hash avg.
      val base = t(s, dir, "documents").select("doc_id", "text")
      val lm = Scoring.unigramLm(base.where(col("doc_id") % 2 === 0), "text")
      Scoring.surprisal(base.where(col("doc_id") % 2 === 1), lm, "text", "doc_id")
        .select(col("doc_id"), round(col("surprisal"), 6).as("surprisal"))
    }),

    "q_lm_score_bigram" -> ((s, dir) => {
      // conditional-bigram LM from the even-id half, mean per-bigram
      // surprisal for the odd-id half — same broadcast-table shape as
      // q_lm_score, one n-gram order up
      val base = t(s, dir, "documents").select("doc_id", "text")
      val lm = Scoring.bigramLm(base.where(col("doc_id") % 2 === 0), "text")
      Scoring.bigramSurprisal(base.where(col("doc_id") % 2 === 1), lm, "text", "doc_id")
        .select(col("doc_id"), round(col("surprisal"), 6).as("surprisal"))
    }),

    "q_pipeline" -> ((s, dir) => {
      // the END-TO-END hygiene pipeline: quality gate -> repetition gate ->
      // exact dedup -> verified minhash near-dup dedup -> benchmark
      // decontamination -> deterministic sample + split labels, one call.
      // Every stage is individually oracled elsewhere; this row oracles the
      // COMPOSITION (stage order and survivor flow).
      val base = t(s, dir, "documents").select("doc_id", "text")
      PretrainPipeline.clean(
        base.where(col("doc_id") % 20 =!= 0), base.where(col("doc_id") % 20 === 0),
        "text", "doc_id")
    }),

    "q_dedup_simhash" -> ((s, dir) => {
      // planted-needle invariant oracle (q_hll pattern): the survivor set
      // itself is signature-specific, but simhash(maxHamming=3) MUST drop
      // an exact copy — identical text ⇒ identical 64-bit signature ⇒
      // hamming 0, and the 4×16-bit banding is pigeonhole-complete at
      // hamming ≤ 3, so the copy always pairs with its smaller-id original
      // and the smallest-id-survives policy drops it. Plant a copy of
      // every 10th doc — at id MAX + 1 + doc_id, so plants sit strictly
      // above every real id at ANY corpus size (a fixed offset would
      // collide once doc_ids reach it) — and oracle that ALL planted
      // copies are dropped; the full simhash pipeline (signatures,
      // banding join, hamming verify) runs over corpus + plants.
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val planted = docs.where(col("doc_id") % 10 === 0)
        .crossJoin(docs.agg(max(col("doc_id")).as("__mx")))
        .select((col("__mx") + lit(1L) + col("doc_id")).as("doc_id"), col("text"))
      val survivors = Dedup.simhash(docs.union(planted), "text", "doc_id",
        maxHamming = 3).select(col("doc_id"), lit(1).as("__kept"))
      planted.select("doc_id")
        .join(survivors, Seq("doc_id"), "left")
        .select(col("doc_id"), col("__kept").isNull.as("planted_dropped"))
    }),

    "q_ngram_jaccard" -> ((s, dir) =>
      // EXACT all-pairs n-gram Jaccard >= 0.5 — the ground truth the LSH
      // candidate stage approximates; oracle-checked via DuckDB string
      // shingle sets (hashing is jaccard-invariant modulo 64-bit collisions)
      Dedup.jaccardAllPairs(docsDs(s, dir).toDF(), "text", "doc_id", 3, 0.5)),

    "q_dedup_embedding" -> ((s, dir) =>
      // exact all-pairs form (oracle-checked); the LSH-bucketed scale path
      // is q_dedup_embedding_lsh
      Dedup.embeddingNearDupExact(t(s, dir, "embeddings"), "embedding", "vec_id",
        threshold = 0.95).select("vec_id")),

    "q_dedup_embedding_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDup(t(s, dir, "embeddings"), "embedding", "vec_id",
        dim = 64, threshold = 0.95, nBits = 8).select("vec_id")),

    "q_semdedup" -> ((s, dir) =>
      // SemDeDup at nClusters = 1: the cluster-scoped pair search is
      // exhaustive, so the survivor set is exact (the oracle-checked
      // configuration, like full-probe IVF); partial-cluster recall and
      // the cluster-containment law live in ApproxOpsSpec
      Dedup.semanticDedup(t(s, dir, "embeddings"), "embedding", "vec_id",
        nClusters = 1, threshold = 0.9, lloydIters = 0).select("vec_id")),

    "q_semdedup_hier" -> ((s, dir) => {
      // SemDeDup in the PRODUCTION-k regime: k grows with the corpus, so
      // assignment goes through the multi-probe two-level coarse quantizer
      // (~5√k cosines/row at nProbe=4 instead of k — at 100 TB, k ~ 1e5
      // makes brute-force assignment the dominant cost: 5√k/k ≈ 1.6%).
      // Invariants computed Spark-side: survivors stay within the corpus;
      // the EXHAUSTIVE all-pairs survivors are a subset (cluster scoping
      // can only MISS pairs, true for ANY assignment); the probed
      // assignment agrees with brute argmax on >= 90% of rows; and the
      // mean cosine gap between the probed choice and the true best
      // centroid is <= 0.02 (measured 0.005 — near-ties among crowded
      // centroids account for most disagreements, so the gap is the
      // honest fidelity metric, the agreement rate the strict one).
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val k = 64
      // ONE k-means training shared by the operator and the quality check
      // (each Lloyd pass compiles a k-literal-centroid expression; training
      // twice would double the row's dominant fixed cost). Round 16: Lloyd
      // trains on a BOUNDED hashed-id sample, driver-local (the
      // pqCodebooks discipline) — at 100x data the training cost is flat
      // and the corpus is scanned once (the assignment pass); every
      // invariant below is computed against THESE centroids, so the gate
      // is unchanged by where they were refined.
      val cents = PhaseTimer.time("q_semdedup_hier", "train") {
        Similarity.kmeansCentroids(e, "embedding", "vec_id", k, 2,
          hierAssign = true, trainSample = 16384)
      }
      val hierKept = PhaseTimer.time("q_semdedup_hier", "dedup") {
        Dedup.semanticDedup(e, "embedding", "vec_id",
          nClusters = k, threshold = 0.9, hierAssign = true,
          centroids = Some(cents))
          .select("vec_id").localCheckpoint(true)
      }
      def simToAssigned(cid: org.apache.spark.sql.Column) = {
        val sims = array(cents.toIndexedSeq.map(c => graft.functions.VectorFunctions
          .cosine(col("embedding"), array(c.toIndexedSeq.map(lit(_)): _*))): _*)
        element_at(sims, cid + 1)
      }
      val q = PhaseTimer.time("q_semdedup_hier", "fidelity") {
        Similarity.withNearestCentroidTwoLevel(
            e, col("embedding"), cents, "__hier")
          .withColumn("__brute", Similarity.nearestCentroid(col("embedding"), cents))
          .agg(avg(when(col("__hier") === col("__brute"), 1.0).otherwise(0.0)),
            avg(simToAssigned(col("__brute")) - simToAssigned(col("__hier"))))
          .head()
      }
      val (agree, gap) = (q.getDouble(0), q.getDouble(1))
      val nVecs = e.count()
      val within = hierKept.join(e.select("vec_id"), Seq("vec_id"), "left_anti").count() == 0
      // exact-subset invariant in WITNESS form (round 16), banded
      // (round 17): exactKept ⊆ hierKept ⇔ every hier-DROPPED doc has a
      // smaller-id exact near-dup — complement inclusion, the identical
      // boolean. Round 16's broadcast witness scan was |dropped| × n
      // (51.1 s of this row's 77.4 s at organic 100x); the banded form
      // prefilters witness pairs with the SAME hyperplane-bucket family
      // q_dedup_embedding_lsh uses and re-checks only the LSH-missed
      // remainder exhaustively — one banded broadcast join + a small
      // exact pass, boolean unchanged (Dedup.nearDupWitnessCheck; the
      // all-pairs OPERATOR keeps its own oracle row, q_dedup_embedding).
      val exactSubset = PhaseTimer.time("q_semdedup_hier", "exact_oracle") {
        Dedup.nearDupWitnessCheck(e, hierKept, "embedding", "vec_id",
          dim = 64, threshold = 0.9)
      }
      Seq((nVecs, within, exactSubset, agree >= 0.9, gap <= 0.02))
        .toDF("n_vecs", "survivors_within_corpus", "exact_kept_subset",
          "agreement_ok", "gap_ok")
    }),

    // -- similarity search ----------------------------------------------
    "q_ann_brute" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = Array.tabulate(64)(i => math.sin(i + 1.0)) // deterministic query
      Similarity.bruteForceTopK(e, "embedding", "vec_id", q, 10)
    }),

    "q_ann_int8" -> ((s, dir) => {
      // two-stage int8 serving read (codes-only scan + exact re-rank of
      // oversample*k candidates), q_ann_lsh-style invariant oracle:
      // corpus size is the SQL check; recall@10 vs the exact brute
      // top-10 (computed in-row) and the k contract are pinned TRUE
      val e = t(s, dir, "embeddings")
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val exact = Similarity.bruteForceTopK(e, "embedding", "vec_id", q, 10)
        .select(col("vec_id"))
      val approx = Similarity.int8TopK(e, "embedding", "vec_id", q, 10)
        .localCheckpoint(true)
      val hit = approx.join(exact, "vec_id").agg(count(lit(1)).as("hits"))
      val kc = approx.agg(count(lit(1)).as("kc"))
      e.agg(count(lit(1)).as("n_vecs"))
        .crossJoin(broadcast(hit)).crossJoin(broadcast(kc))
        .select(col("n_vecs"),
          (col("hits") >= 9).as("recall_ok"), (col("kc") === 10).as("k_ok"))
    }),

    "q_ann_int8_stored" -> ((s, dir) => {
      // the SPLIT serving form of q_ann_int8: codes materialized ONCE
      // (int8WriteIndex — the 4x-smaller stored index), per-query work is
      // a codes-only scan + broadcast join back to floats for the exact
      // re-rank of oversample*k candidates. Must return EXACTLY the
      // in-memory int8TopK rows (same quantization, re-rank, tie-break),
      // pinned as same_as_mem alongside q_ann_int8's invariants.
      val e = t(s, dir, "embeddings")
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val tmp = java.nio.file.Files.createTempDirectory("graft_int8_idx_").toString
      try {
        Similarity.int8WriteIndex(e, "embedding", "vec_id", tmp)
        val stored = Similarity.int8TopKStored(s, tmp, e, "embedding",
          "vec_id", q, 10).localCheckpoint(true)
        int8InvariantRow(e, q, stored)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_ann_delete" -> ((s, dir) => {
      // takedown on the ANN side: bootstrap the stored codes index over
      // all embeddings, DELETE vec_id % 5 == 2 (a delete-set segment the
      // reads anti-join), serve — invariants computed against the
      // RETAINED corpus, with same_as_mem pinning exact equality to the
      // in-memory int8TopK over that corpus
      val e = t(s, dir, "embeddings")
      val kept = e.where(col("vec_id") % 5 =!= 2)
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val tmp = java.nio.file.Files.createTempDirectory("graft_ann_del_").toString
      try {
        PhaseTimer.time("q_ann_delete", "build") {
          Similarity.int8WriteIndex(e, "embedding", "vec_id", tmp)
        }
        PhaseTimer.time("q_ann_delete", "takedown") {
          Similarity.int8DeleteFromStored(s, tmp,
            e.where(col("vec_id") % 5 === 2).select("vec_id"))
        }
        val stored = Similarity.int8TopKStored(s, tmp, kept, "embedding",
          "vec_id", q, 10).localCheckpoint(true)
        int8InvariantRow(kept, q, stored)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_ann_replace" -> ((s, dir) => {
      // round 14: atomic upsert correction on the ANN side
      // (Similarity.int8ReplaceInStored): bootstrap the stored codes
      // index from embeddings whose vec_id % 5 == 2 slice arrived
      // NEGATED at ingest, upsert the true slice back (corrected codes
      // + victim delete-set on one commit-log flip), serve — the four
      // invariants computed against the TRUE corpus, with same_as_mem
      // pinning exact equality to the in-memory int8TopK over it
      val e = t(s, dir, "embeddings")
      val mangled = e.withColumn("embedding",
        when(col("vec_id") % 5 === 2,
          transform(col("embedding"), x => -x)).otherwise(col("embedding")))
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val tmp = java.nio.file.Files.createTempDirectory("graft_ann_rep_").toString
      try {
        Similarity.int8WriteIndex(mangled, "embedding", "vec_id", tmp)
        Similarity.int8ReplaceInStored(s, tmp,
          e.where(col("vec_id") % 5 === 2), "embedding", "vec_id")
        val stored = Similarity.int8TopKStored(s, tmp, e, "embedding",
          "vec_id", q, 10).localCheckpoint(true)
        int8InvariantRow(e, q, stored)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_ann_ivf_stored" -> ((s, dir) => {
      // round 17: the stored IVF tier's full lifecycle — the one serving
      // form whose per-query scan cost is ∝ probed cells, not corpus
      // (int8 codes partitioned by frozen coarse-centroid cell; parquet
      // partition pruning does the rest). Bootstrap over the corpus,
      // append a fresh-id slice (assigned against the FROZEN centroids),
      // take down the %7==3 slice, compact (fold + carry centroids),
      // then serve. Invariants: full-probe serve ≡ the in-memory int8TopK
      // over the LIVE corpus exactly (the candidate space is the whole
      // store — the oracle-checked configuration, like full-probe IVF);
      // the probe-pruned read provably touches ONLY probed `cid=`
      // partitions (inputFiles audit in-row); the pruned serve keeps the
      // k contract. n_vecs is the SQL-checkable live count.
      val e = t(s, dir, "embeddings")
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val appended = e.where(col("vec_id") % 11 === 0)
        .withColumn("vec_id", col("vec_id") + lit(1000000000L))
      val live = e.where(col("vec_id") % 7 =!= 3).unionByName(appended)
      val tmp = java.nio.file.Files.createTempDirectory("graft_ann_ivf_").toString
      try {
        PhaseTimer.time("q_ann_ivf_stored", "build") {
          Similarity.ivfWriteIndex(e, "embedding", "vec_id", tmp,
            nCentroids = 16)
        }
        PhaseTimer.time("q_ann_ivf_stored", "append") {
          Similarity.ivfAppendToStored(s, tmp, appended, "embedding", "vec_id")
        }
        PhaseTimer.time("q_ann_ivf_stored", "takedown") {
          Similarity.ivfDeleteFromStored(s, tmp,
            e.where(col("vec_id") % 7 === 3).select("vec_id"))
        }
        PhaseTimer.time("q_ann_ivf_stored", "compact") {
          Similarity.ivfCompactStored(s, tmp)
        }
        // serve_full vs serve_pruned split (round 18, r17 verdict #6):
        // the full-probe serve exists to feed the equality oracle (it
        // scans every cell — audit-shaped); the PRUNED serve is the
        // production path whose scale curve matters at 100 TB, so each
        // gets its own phase and Bench bills only the pruned one as
        // operator cost
        val stored = PhaseTimer.time("q_ann_ivf_stored", "serve_full") {
          Similarity.ivfTopKStored(s, tmp, live, "embedding",
            "vec_id", q, 10, nProbe = 16).localCheckpoint(true)
        }
        val cents = Similarity.readIvfCentroids(s, tmp)
        val probes = Similarity.ivfProbeCids(q, cents, nProbe = 4)
        // the equality audit (in-memory int8 serve + brute-force recall
        // scan over the live corpus) is the row's oracle, not the
        // operator — attribute it so the 100x reading bills serving,
        // not auditing
        val invariants = PhaseTimer.time("q_ann_ivf_stored", "exact_oracle") {
          int8InvariantRow(live, q, stored)
        }
        // input_file_name() observes the post-pruning scan (inputFiles
        // reports the pre-pruning file index); the store is freshly
        // compacted, so every read file is a codes partition
        val prunedFiles = PhaseTimer.time("q_ann_ivf_stored", "prune_audit") {
          Similarity.readIvfIndex(s, tmp, probeCids = Some(probes))
            .select(input_file_name().as("f")).distinct()
            .collect().map(_.getString(0)).filter(_.contains("/ivf/"))
        }
        val pruneFilesOk = prunedFiles.nonEmpty &&
          prunedFiles.forall(f => probes.exists(p => f.contains(s"/cid=$p/")))
        val prunedK = PhaseTimer.time("q_ann_ivf_stored", "serve_pruned") {
          Similarity.ivfTopKStored(s, tmp, live, "embedding",
            "vec_id", q, 10, nProbe = 4).count()
        }
        invariants
          .withColumn("prune_files_ok", lit(pruneFilesOk))
          .withColumn("pruned_k_ok", lit(prunedK >= 1 && prunedK <= 10))
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_ann_ivfpq_stored" -> ((s, dir) => {
      // round 17: the stored IVF-PQ tier (FAISS's IVFADC layout on disk) —
      // PQ-coded residuals partitioned by frozen coarse cell; a probe
      // scan reads (cid, m small ints) per row from the probed partitions
      // only, and the float corpus is touched only by the exact re-rank
      // of the oversample·k ADC candidates. Lifecycle: bootstrap
      // (train + encode), append a fresh-id slice ENCODED against the
      // frozen model (plus a planted exact match of the query), take
      // down the %7==3 slice, compact (fold + carry model), serve.
      // Invariants: full-probe stored serve ≡ the in-memory same-model
      // path exactly (identical codes → identical ADC ranks → identical
      // exact re-rank); the planted needle surfaces at rank 1 with
      // cosine 1.0 under PRUNED probing (its cell is the query's argmax
      // cell — probe #1 by construction — and its residual
      // reconstruction dominates natural neighbors, the q_ann_ivfpq
      // argument); the pruned read touches ONLY probed `cid=` partitions;
      // the pruned serve keeps the k contract. n_vecs is the
      // SQL-checkable live count (corpus − takedown + append + needle).
      import s.implicits._
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      // the needle takes the SMALLEST id in the corpus: ivfPqServe breaks
      // ADC-score ties ascending by id before the oversample·k candidate
      // cut, and vectors encoding to the needle's exact (cid, codes) tie
      // with it — a largest-id needle could lose enough ties at 100x to
      // drop out of the candidate cut and flip needle_ok (advisor r17)
      val needle = Seq((-1L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e.schema("embedding").dataType))
      val appended = e.where(col("vec_id") % 11 === 0)
        .withColumn("vec_id", col("vec_id") + lit(1000000000L))
        .unionByName(needle)
      val live = e.where(col("vec_id") % 7 =!= 3).unionByName(appended)
      val tmp = java.nio.file.Files.createTempDirectory("graft_ann_ivfpq_").toString
      try {
        PhaseTimer.time("q_ann_ivfpq_stored", "build") {
          Similarity.ivfPqWriteIndex(e, "embedding", "vec_id", tmp,
            dim = 64, nCentroids = 16)
        }
        PhaseTimer.time("q_ann_ivfpq_stored", "append") {
          Similarity.ivfPqAppendToStored(s, tmp, appended, "embedding", "vec_id")
        }
        PhaseTimer.time("q_ann_ivfpq_stored", "takedown") {
          Similarity.ivfPqDeleteFromStored(s, tmp,
            e.where(col("vec_id") % 7 === 3).select("vec_id"))
        }
        PhaseTimer.time("q_ann_ivfpq_stored", "compact") {
          Similarity.ivfPqCompactStored(s, tmp)
        }
        val (cents, books) = Similarity.readIvfPqModel(s, tmp)
        // serve_full (audit-shaped: feeds the equality oracle, scans every
        // cell) vs serve_pruned (the production path) — r17 verdict #6
        val stored = PhaseTimer.time("q_ann_ivfpq_stored", "serve_full") {
          Similarity.ivfPqTopKStored(s, tmp, live, "embedding",
            "vec_id", q, 10, nProbe = 16).localCheckpoint(true)
        }
        // the same-model equality audit re-encodes the live corpus in
        // memory — the row's oracle, not the operator (see
        // q_ann_ivf_stored's attribution note)
        val nDiff = PhaseTimer.time("q_ann_ivfpq_stored", "exact_oracle") {
          val mem = Similarity.ivfPqTopKWithModel(live, "embedding", "vec_id",
            q, 10, cents, books, nProbe = 16)
          stored.exceptAll(mem).unionByName(mem.exceptAll(stored)).count()
        }
        val pruned = PhaseTimer.time("q_ann_ivfpq_stored", "serve_pruned") {
          Similarity.ivfPqTopKStored(s, tmp, live, "embedding",
            "vec_id", q, 10, nProbe = 4).collect()
        }
        val needleOk = pruned.nonEmpty &&
          pruned.head.getLong(0) == -1L && pruned.head.getDouble(1) == 1.0
        // input_file_name() observes the post-pruning scan (inputFiles
        // reports the pre-pruning file index); freshly compacted, so
        // every read file is a codes partition
        val probes = Similarity.ivfProbeCids(q, cents, nProbe = 4)
        val prunedFiles = PhaseTimer.time("q_ann_ivfpq_stored", "prune_audit") {
          Similarity.readIvfPqIndex(s, tmp, probeCids = Some(probes))
            .select(input_file_name().as("f")).distinct()
            .collect().map(_.getString(0)).filter(_.contains("/ivfpq/"))
        }
        val pruneFilesOk = prunedFiles.nonEmpty &&
          prunedFiles.forall(f => probes.exists(p => f.contains(s"/cid=$p/")))
        live.agg(count(lit(1)).as("n_vecs"))
          .withColumn("same_as_mem", lit(nDiff == 0L))
          .withColumn("needle_ok", lit(needleOk))
          .withColumn("prune_files_ok", lit(pruneFilesOk))
          .withColumn("pruned_k_ok", lit(pruned.length >= 1 && pruned.length <= 10))
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_ann_ivf_join" -> ((s, dir) => {
      // round 18 (r17 verdict #2): query-TABLE serving over the stored
      // IVF tier — the batch decontamination / curation-search shape (the
      // storehaus multiGet discipline, reference FlatMapOperation.scala:
      // 113-137, the same bounded-key-set contract the KV store's
      // clustered point reads honor). ONE commit-log resolve + ONE
      // partition-pruned scan over the UNION of all queries' probe cells
      // serves every query, instead of one resolve + one scan PER query.
      // Invariants: each query is a corpus row, so its own cell is probe
      // #1 and the self-hit must rank first at cosine 1.0 (self_found);
      // the per-query k contract holds (k_ok); per-query results EXACTLY
      // equal the single-query ivfTopKStored loop over the same store
      // (same_as_loop — the law that makes the one-scan plan a pure
      // serving optimization); the joined read provably touches ONLY the
      // union of probed `cid=` partitions (prune_files_ok, audited with
      // input_file_name since DataFrame.inputFiles reports the
      // pre-pruning index).
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_join_").toString
      try {
        PhaseTimer.time("q_ann_ivf_join", "build") {
          Similarity.ivfWriteIndex(e, "embedding", "vec_id", tmp,
            nCentroids = 16)
        }
        val queries = e.where(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val joined = PhaseTimer.time("q_ann_ivf_join", "serve_join") {
          Similarity.ivfTopKStoredJoin(s, tmp, e, "embedding", "vec_id",
            queries, "q_vec", "q_id", k = 10, nProbe = 4)
            .localCheckpoint(true)
        }
        // equality-to-loop law: the joined serve is EXACTLY the per-query
        // loop — the row's oracle, not the operator
        val qs = queries.collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        val sameAsLoop = PhaseTimer.time("q_ann_ivf_join", "exact_oracle") {
          qs.forall { case (qid, qv) =>
            val loop = Similarity.ivfTopKStored(s, tmp, e, "embedding",
              "vec_id", qv, 10, nProbe = 4)
            val got = joined.where(col("q_id") === qid)
              .select(col("vec_id"), col("cosine_sim"))
            got.exceptAll(loop).unionByName(loop.exceptAll(got)).count() == 0L
          }
        }
        val cents = Similarity.readIvfCentroids(s, tmp)
        val union = qs.flatMap(q => Similarity.ivfProbeCids(q._2, cents, 4))
          .distinct.toSeq
        val prunedFiles = PhaseTimer.time("q_ann_ivf_join", "prune_audit") {
          Similarity.readIvfIndex(s, tmp, probeCids = Some(union))
            .select(input_file_name().as("f")).distinct()
            .collect().map(_.getString(0)).filter(_.contains("/ivf/"))
        }
        val pruneFilesOk = prunedFiles.nonEmpty &&
          prunedFiles.forall(f => union.exists(p => f.contains(s"/cid=$p/")))
        joined.groupBy(col("q_id"))
          .agg(max(col("vec_id") === col("q_id") && col("cosine_sim") === 1.0)
              .as("self_found"),
            count(lit(1)).between(1, 10).as("k_ok"))
          .withColumn("same_as_loop", lit(sameAsLoop))
          .withColumn("prune_files_ok", lit(pruneFilesOk))
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_ann_mmr" -> ((s, dir) => {
      // round 18: MMR diversity re-rank (Carbonell & Goldstein SIGIR'98)
      // over a bounded candidate set — the serving tail for crowded
      // near-duplicate regions (the failure mode the drift probe
      // measures: thousands of copies fill a plain top-k). Plant the
      // query copy twice (-2 and -1; the cosine-1.0 tie breaks to the
      // smaller id). Invariants are THEOREMS, not data properties:
      // lambda=1 equals the plain cosine top-k over the same candidates
      // exactly (same rounded scores, same id tie-breaks); at
      // lambda=0.3 the first pick is the pure-relevance argmax (-2, at
      // cosine 1.0) and its exact duplicate can NEVER be second (the
      // duplicate scores 2λ−1 = −0.4 while any distinct candidate with
      // relevance c scores (2λ−1)·c = −0.4c > −0.4 for every c in
      // (−1, 1)); selections are distinct; the k contract holds.
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val planted = Seq((-1L, q.toSeq), (-2L, q.toSeq))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast(e0.schema("embedding").dataType))
      val corpus = e0.unionByName(planted)
      // the bounded candidate set: an oversampled exact serve (50) —
      // MMR re-ranks a serve's output, never a corpus
      val cands = Similarity.bruteForceTopK(corpus, "embedding", "vec_id",
          q, 50)
        .select("vec_id")
        .join(corpus, Seq("vec_id")).select("vec_id", "embedding")
        .localCheckpoint(true)
      val mmr = Similarity.mmrRerank(cands, "embedding", "vec_id", q,
        k = 10, lambda = 0.3).orderBy("mmr_rank").collect()
      val mmr1 = Similarity.mmrRerank(cands, "embedding", "vec_id", q,
        k = 10, lambda = 1.0).orderBy("mmr_rank").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val plain = Similarity.bruteForceTopK(cands, "embedding", "vec_id",
          q, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val ids = mmr.map(_.getLong(0)).toSeq
      Seq((mmr.length.toLong,
          ids.head == -2L && mmr.head.getDouble(1) == 1.0,
          ids(1) != -1L,
          mmr1 == plain,
          ids.distinct.length == ids.length))
        .toDF("k_rows", "first_is_copy", "dup_not_second",
          "lambda1_equals_topk", "distinct_ok")
    }),

    "q_ann_int8_join" -> ((s, dir) => {
      // round 18: the flat int8 tier's query-TABLE serve — the last
      // serving family without a bounded query-table form. No cells to
      // prune (the flat tier's per-query work is the full codes scan by
      // nature), so the join's win is ONE commit-log resolve + ONE codes
      // scan amortized across the table. Invariants: self-hit rank 1 at
      // cosine 1.0, per-query k contract, exact equality to the
      // single-query int8TopKStored loop.
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_int8_join_").toString
      try {
        PhaseTimer.time("q_ann_int8_join", "build") {
          Similarity.int8WriteIndex(e, "embedding", "vec_id", tmp)
        }
        val queries = e.where(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val joined = PhaseTimer.time("q_ann_int8_join", "serve_join") {
          Similarity.int8TopKStoredJoin(s, tmp, e, "embedding", "vec_id",
            queries, "q_vec", "q_id", k = 10).localCheckpoint(true)
        }
        val qs = queries.collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        val sameAsLoop = PhaseTimer.time("q_ann_int8_join", "exact_oracle") {
          qs.forall { case (qid, qv) =>
            val loop = Similarity.int8TopKStored(s, tmp, e, "embedding",
              "vec_id", qv, 10)
            val got = joined.where(col("q_id") === qid)
              .select(col("vec_id"), col("cosine_sim"))
            got.exceptAll(loop).unionByName(loop.exceptAll(got)).count() == 0L
          }
        }
        joined.groupBy(col("q_id"))
          .agg(max(col("vec_id") === col("q_id") && col("cosine_sim") === 1.0)
              .as("self_found"),
            count(lit(1)).between(1, 10).as("k_ok"))
          .withColumn("same_as_loop", lit(sameAsLoop))
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_ann_ivfpq_join" -> ((s, dir) => {
      // round 18 (r17 verdict #2): the q_ann_ivf_join shape over the
      // stored IVF-PQ tier — one pruned scan of (cid, m small ints) rows
      // serves the whole query table, per-query ADC scoring against
      // broadcast per-query lookup tables. The self-hit pin is the
      // PLANTED needle (vec_id = -1, the q_ann_pq discipline, r18
      // advice): a natural corpus row's ADC self-score surviving the
      // oversample·k cut is a data property that a crowded near-duplicate
      // region can flip at scale, while the needle's isolated direction
      // ADC-scores cos(q, recon(q)) far above any natural neighbor by
      // construction — a theorem. same_as_loop stays the hard equality
      // law (every query, needle and natural, exactly equals the
      // single-query ivfPqTopKStored loop); prune_files_ok audits the
      // union-of-probes partition pruning in-row.
      import s.implicits._
      val qNeedle = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val e = e0.unionByName(Seq((-1L, qNeedle.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"),
          col("embedding").cast(e0.schema("embedding").dataType)))
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_join_").toString
      try {
        PhaseTimer.time("q_ann_ivfpq_join", "build") {
          Similarity.ivfPqWriteIndex(e, "embedding", "vec_id", tmp,
            dim = 64, nCentroids = 16)
        }
        val queries = e.where(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val joined = PhaseTimer.time("q_ann_ivfpq_join", "serve_join") {
          Similarity.ivfPqTopKStoredJoin(s, tmp, e, "embedding", "vec_id",
            queries, "q_vec", "q_id", k = 10, nProbe = 4)
            .localCheckpoint(true)
        }
        val qs = queries.collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
        val sameAsLoop = PhaseTimer.time("q_ann_ivfpq_join", "exact_oracle") {
          qs.forall { case (qid, qv) =>
            val loop = Similarity.ivfPqTopKStored(s, tmp, e, "embedding",
              "vec_id", qv, 10, nProbe = 4)
            val got = joined.where(col("q_id") === qid)
              .select(col("vec_id"), col("cosine_sim"))
            got.exceptAll(loop).unionByName(loop.exceptAll(got)).count() == 0L
          }
        }
        val (cents, _) = Similarity.readIvfPqModel(s, tmp)
        val union = qs.flatMap(q => Similarity.ivfProbeCids(q._2, cents, 4))
          .distinct.toSeq
        val prunedFiles = PhaseTimer.time("q_ann_ivfpq_join", "prune_audit") {
          Similarity.readIvfPqIndex(s, tmp, probeCids = Some(union))
            .select(input_file_name().as("f")).distinct()
            .collect().map(_.getString(0)).filter(_.contains("/ivfpq/"))
        }
        val pruneFilesOk = prunedFiles.nonEmpty &&
          prunedFiles.forall(f => union.exists(p => f.contains(s"/cid=$p/")))
        // the theorem pin: the planted needle query must surface ITSELF
        // at exact-reranked cosine 1.0 (natural corpus rows carry no
        // self pin — their self-survival through the ADC preselect is
        // data, not a law; same_as_loop covers them exactly)
        val needleSelfFound = joined
          .where(col("q_id") === -1L && col("vec_id") === -1L &&
            col("cosine_sim") === 1.0).count() == 1L
        joined.groupBy(col("q_id"))
          .agg(count(lit(1)).between(1, 10).as("k_ok"))
          .withColumn("needle_self_found", lit(needleSelfFound))
          .withColumn("same_as_loop", lit(sameAsLoop))
          .withColumn("prune_files_ok", lit(pruneFilesOk))
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_ivf_drift" -> ((s, dir) => {
      // round 18 (r17 verdict #3): frozen-model drift is MEASURED, not
      // discovered as recall loss. The IVF centroids are frozen by design
      // (FAISS discipline: appends assign against the stored model,
      // retraining = rebuild), so the store maintains two cheap retrain-
      // WHEN signals from per-segment cellstats tables (O(change) at
      // write time, never a store scan): cell-occupancy imbalance
      // (max/mean over the model's cells) and appended-mass fraction
      // (rows the frozen model never saw / total). This row exercises
      // both on the real corpus: a fresh bootstrap reads appended 0; a
      // SKEWED append (half the corpus re-pointed at ONE direction —
      // every vector lands in one cell) raises the imbalance and trips
      // the warning at a threshold the appended mass (1/3) also crosses;
      // compaction must carry the trained-corpus marker so the fold
      // cannot launder the drift (frac_survives_compact).
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_drift_").toString
      try {
        PhaseTimer.time("q_ivf_drift", "build") {
          Similarity.ivfWriteIndex(e, "embedding", "vec_id", tmp,
            nCentroids = 16)
        }
        def snap(appendedWarn: Double): (Long, Long, Double, Boolean) = {
          val r = Similarity.ivfDriftStats(s, tmp, imbalanceWarn = 4.0,
            appendedWarn = appendedWarn).collect().head
          (r.getAs[Long]("occupied_rows"), r.getAs[Long]("max_cell_rows"),
            r.getAs[Double]("appended_mass_fraction"),
            r.getAs[Boolean]("drift_warn"))
        }
        val (rows0, _, frac0, _) = snap(0.5)
        // the skewed append: half the corpus under fresh ids, every
        // embedding replaced by ONE fixed direction — frozen-centroid
        // assignment lands them all in the same cell
        val skewVec = typedLit(Array.tabulate(64)(i => math.cos(i / 3.0)).toSeq)
        val skew = e.where(col("vec_id") % 2 === 0)
          .withColumn("vec_id", col("vec_id") + lit(2000000000L))
          .withColumn("embedding", skewVec)
        PhaseTimer.time("q_ivf_drift", "append") {
          Similarity.ivfAppendToStored(s, tmp, skew, "embedding", "vec_id")
        }
        // warn threshold 0.25 < appended 1/3: trips on appended mass even
        // if the corpus' trained occupancy were skewed enough to mask the
        // imbalance delta — deterministic at every scale. The occupancy
        // pin is likewise masking-proof: the skew batch lands entirely in
        // ONE frozen cell, so max_cell_rows must at least reach the skew
        // count regardless of how the trained occupancy was shaped
        // (imbalance-delta pins are data-dependent when a trained cell
        // already holds > 1/3 of the corpus)
        val (rows1, maxCell1, frac1, warn1) = snap(0.25)
        val skewCount = rows1 - rows0
        val expectedFrac = skewCount.toDouble / rows1
        PhaseTimer.time("q_ivf_drift", "compact") {
          Similarity.ivfCompactStored(s, tmp)
        }
        val (_, _, frac2, _) = snap(0.25)
        import s.implicits._
        Seq((16, rows1, frac0 == 0.0, maxCell1 >= skewCount, warn1,
            math.abs(frac1 - expectedFrac) < 0.001, frac2 == frac1))
          .toDF("n_cells", "occupied_rows", "clean_frac_zero", "skew_cell_ok",
            "warn_skewed", "frac_ok", "frac_survives_compact")
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_streaming_ivf" -> ((s, dir) => {
      // round 18 (r17 verdict #7): streaming ingest for the stored IVF
      // tier — q_streaming_ann's lifecycle with frozen-centroid
      // assignment INSIDE the writer lock. Production shape: train the
      // coarse centroids offline (bounded hashed-id sample), bootstrap an
      // EMPTY cell-partitioned store carrying them, then ingest vectors
      // in micro-batches (foreachBatch → ivfAppendToStored, replay-
      // guarded by batchId — the guard survives compaction via the
      // applied-batch high-water mark in the commit log). After the
      // cadence fold, the full-probe serve must EXACTLY equal the
      // one-shot in-memory int8TopK (full probe = the flat int8 path) —
      // the same four invariants as q_streaming_ann.
      // State story: no state-store state; the codes index is the
      // all-time durable state, replay-guarded by batchId.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val e = t(s, dir, "embeddings")
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val rows = e.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Array[Float])]
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_stream_").toString
      try {
        val cents = Similarity.kmeansCentroids(
          e.select(col("vec_id"), col("embedding")), "embedding", "vec_id",
          nCentroids = 16, lloydIters = 2, trainSample = 16384)
        // trainedRows records the OFFLINE training corpus size, so the
        // streamed rows (drawn from the same corpus) don't read as
        // appended-mass drift on the cadence check
        Similarity.ivfWriteIndex(
          e.select(col("vec_id"), col("embedding")).limit(0),
          "embedding", "vec_id", tmp, centroids = Some(cents),
          trainedRows = Some(rows.length.toLong))
        val writer = graft.streaming.StreamingIO.fanout(
          ms.toDS().toDF("vec_id", "embedding"))(Seq(
          (b, bid) => Similarity.ivfAppendToStored(s, tmp, b, "embedding",
            "vec_id", batchId = Some(bid))))
        PhaseTimer.time("q_streaming_ivf", "ingest") {
          withStreamingGateConf(s, 4) {
            val sq = writer.start()
            try {
              (0 until 3).foreach { i =>
                ms.addData(rows.iterator.filter(_._1 % 3 == i).toSeq)
                sq.processAllAvailable()
              }
            } finally sq.stop()
          }
        }
        // cadence fold (3 segments > 1) — runs the drift check too
        PhaseTimer.time("q_streaming_ivf", "compact") {
          Similarity.ivfCompactIfFragmented(s, tmp, maxSegments = 1)
        }
        // the full-probe serve + invariant row is the equality oracle
        // (int8InvariantRow re-ranks the whole corpus in memory) — audit
        // cost, attributed so the 100x reading bills ingest, not audit
        PhaseTimer.time("q_streaming_ivf", "exact_oracle") {
          val stored = Similarity.ivfTopKStored(s, tmp, e, "embedding",
            "vec_id", q, 10, nProbe = 16).localCheckpoint(true)
          int8InvariantRow(e, q, stored)
        }
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_streaming_ivfpq" -> ((s, dir) => {
      // round 18: streaming ingest for the stored IVF-PQ tier —
      // q_streaming_ivf's shape on the IVFADC layout: the model (coarse
      // centroids + residual codebooks) trains OFFLINE on a bounded
      // sample, an EMPTY cell-partitioned store bootstraps carrying it
      // (trained_rows = the true training corpus), micro-batch appends
      // encode residuals against the FROZEN model inside the writer lock
      // (replay-guarded by batchId), the cadence folds, and the
      // full-probe serve must EXACTLY equal the in-memory same-model
      // path over the corpus (identical codes → identical ADC ranks →
      // identical exact re-rank — the q_ann_ivfpq_stored equality on the
      // streaming ingest path). k contract pinned beside it.
      // State story: no state-store state; the codes index is the
      // all-time durable state, replay-guarded by batchId.
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val e = t(s, dir, "embeddings")
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val rows = e.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Array[Float])]
      val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_stream_").toString
      try {
        val model = Similarity.ivfPqTrain(
          e.select(col("vec_id"), col("embedding")), "embedding", "vec_id",
          dim = 64, nCentroids = 16)
        Similarity.ivfPqWriteIndex(
          e.select(col("vec_id"), col("embedding")).limit(0),
          "embedding", "vec_id", tmp, dim = 64, nCentroids = 16,
          model = Some(model), trainedRows = Some(rows.length.toLong))
        val writer = graft.streaming.StreamingIO.fanout(
          ms.toDS().toDF("vec_id", "embedding"))(Seq(
          (b, bid) => Similarity.ivfPqAppendToStored(s, tmp, b, "embedding",
            "vec_id", batchId = Some(bid))))
        PhaseTimer.time("q_streaming_ivfpq", "ingest") {
          withStreamingGateConf(s, 4) {
            val sq = writer.start()
            try {
              (0 until 3).foreach { i =>
                ms.addData(rows.iterator.filter(_._1 % 3 == i).toSeq)
                sq.processAllAvailable()
              }
            } finally sq.stop()
          }
        }
        PhaseTimer.time("q_streaming_ivfpq", "compact") {
          Similarity.ivfPqCompactIfFragmented(s, tmp, maxSegments = 1)
        }
        PhaseTimer.time("q_streaming_ivfpq", "exact_oracle") {
          val stored = Similarity.ivfPqTopKStored(s, tmp, e, "embedding",
            "vec_id", q, 10, nProbe = 16).localCheckpoint(true)
          val (cents, books) = Similarity.readIvfPqModel(s, tmp)
          val mem = Similarity.ivfPqTopKWithModel(
            e.select(col("vec_id"), col("embedding")), "embedding", "vec_id",
            q, 10, cents, books, nProbe = 16)
          val nDiff = stored.exceptAll(mem).unionByName(mem.exceptAll(stored))
            .count()
          e.agg(count(lit(1)).as("n_vecs"))
            .withColumn("same_as_mem", lit(nDiff == 0L))
            .withColumn("k_ok", lit(stored.count() == 10L))
        }
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_streaming_ann" -> ((s, dir) => {
      // streaming ANN index maintenance — the embedding-side counterpart
      // of q_streaming_bm25's lifecycle: vectors arrive in 3 vec_id-sliced
      // micro-batches, each committed as a new codes segment inside
      // foreachBatch (int8AppendToStored; the index stays serveable
      // between batches), compaction folds the segments, and the served
      // top-k must EXACTLY equal the one-shot in-memory int8TopK —
      // pinned alongside q_ann_int8's recall/k invariants.
      // State story: no state-store state; the codes index is the
      // all-time durable state, replay-guarded by batchId (see
      // StreamingIO.fanout)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val e = t(s, dir, "embeddings")
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val rows = e.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Array[Float])]
      val tmp = java.nio.file.Files.createTempDirectory("graft_ann_stream_").toString
      try {
        Similarity.int8WriteIndex(e.select("vec_id", "embedding").limit(0),
          "embedding", "vec_id", tmp)
        val writer = graft.streaming.StreamingIO.fanout(
          ms.toDS().toDF("vec_id", "embedding"))(Seq(
          (b, bid) => Similarity.int8AppendToStored(s, tmp, b, "embedding",
            "vec_id", batchId = Some(bid))))
        withStreamingGateConf(s, 4) {
          val sq = writer.start()
          try {
            (0 until 3).foreach { i =>
              ms.addData(rows.iterator.filter(_._1 % 3 == i).toSeq)
              sq.processAllAvailable()
            }
          } finally sq.stop()
        }
        Similarity.int8CompactStored(s, tmp)
        val stored = Similarity.int8TopKStored(s, tmp, e, "embedding",
          "vec_id", q, 10).localCheckpoint(true)
        int8InvariantRow(e, q, stored)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_ann_lsh" -> ((s, dir) => {
      // LSH ANN with a self-hit invariant oracle: each query vector IS a
      // table row, so it lands in its own bucket (multi-probe includes the
      // identity probe), scores cosine 1.0 against itself, and must rank
      // first — self_found is deterministic even though the rest of the
      // top-k is hash-specific. k_ok pins the top-k contract (1..k rows
      // per query). Recall-vs-brute law lives in ApproxOpsSpec.
      val e = t(s, dir, "embeddings")
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.lshTopK(e, "embedding", "vec_id", queries, "q_vec", "q_id",
          dim = 64, k = 5, nBits = 8)
        .groupBy(col("q_id"))
        .agg(max(col("vec_id") === col("q_id") && col("cosine_sim") === 1.0)
            .as("self_found"),
          (count(lit(1)).between(1, 5)).as("k_ok"))
    }),

    "q_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val queries = e.where(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.ivfTopK(s, e, "embedding", "vec_id", queries, "q_vec", "q_id",
        k = 5, nCentroids = 8, nProbe = 8) // full probe = exact
    }),

    "q_ann_pq" -> ((s, dir) => {
      // product-quantization ANN with a planted-needle invariant oracle
      // (q_hll pattern): ADC ranking is quantization-specific, but a
      // planted exact match of the query (vec_id = −1) must surface in
      // the top-k — its ADC score is cos(q, recon(q)) ≈ 0.76-0.83 on this
      // corpus while the best natural neighbor scores ≤ ~0.48, so the
      // needle found/not-found bit is deterministic. The full PQ path
      // (codebook training, encode, codes-only ADC rescore) runs over
      // corpus + needle to produce the row. ADC-exactness and
      // recall-vs-brute laws live in ApproxOpsSpec.
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val needle = Seq((-1L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e0.schema("embedding").dataType))
      Similarity.pqTopK(e0.union(needle), "embedding", "vec_id", q,
          k = 10, dim = 64, m = 8, c = 16)
        .agg(count(lit(1)).as("k"), countDistinct(col("vec_id")).as("n_ids"),
          max(col("vec_id") === -1L).as("needle_found"))
    }),

    "q_ann_nsw" -> ((s, dir) => {
      // graph ANN (partitioned NSW — HNSW's layer-0 per shard): planted-
      // needle invariant oracle, q_ann_pq construction. The needle (exact
      // copy of the query, vec_id = -1) scores cosine 1.0 while the best
      // natural neighbor is far below; the greedy beam search must
      // surface it from its shard's graph, and the merged top-k is
      // deterministic by the smaller-id tie rule. Recall-vs-brute and
      // built-index-equality laws live in ApproxOpsSpec.
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val needle = Seq((-1L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e0.schema("embedding").dataType))
      Similarity.nswTopK(e0.union(needle), "embedding", "vec_id", q, k = 10)
        .agg(count(lit(1)).as("k"), countDistinct(col("vec_id")).as("n_ids"),
          max(col("vec_id") === -1L && col("nsw_sim") === 1.0).as("needle_found"))
    }),

    "q_ann_nsw_coded" -> ((s, dir) => {
      // codes-only NSW serving: the persisted index swaps vectors for PQ
      // codes (nswEncodeIndex) and the beam search scores by ADC lookups
      // (nswSearchCoded) — the needle's quantized self-similarity
      // dominates natural neighbors by the q_ann_pq margin, so
      // found-in-top-k stays deterministic through BOTH approximations
      // (graph greediness + quantization).
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val needle = Seq((-1L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e0.schema("embedding").dataType))
      val full = e0.union(needle)
      val books = Similarity.pqCodebooks(full, "embedding", "vec_id",
        dim = 64, m = 8, c = 16)
      val coded = Similarity.nswEncodeIndex(
        Similarity.nswBuild(full, "embedding", "vec_id"),
        "embedding", "vec_id", books).localCheckpoint(true)
      Similarity.nswSearchCoded(coded, "vec_id", books, q, k = 10)
        .agg(count(lit(1)).as("k"), countDistinct(col("vec_id")).as("n_ids"),
          max(col("vec_id") === -1L).as("needle_found"))
    }),

    "q_nsw_delete" -> ((s, dir) => {
      // round 14: takedown on the GRAPH-ANN serving form
      // (nswDeleteFromBuilt — HNSW-style tombstones: a deleted node is
      // never RETURNED but still routes as a waypoint, so connectivity
      // is preserved; physical fold = the maintenance-cadence rebuild).
      // TWO exact copies of the query are planted and one revoked: the
      // served top-k must surface the retained copy at cosine 1.0,
      // never the revoked one nor any of the revoked id slice, with k
      // rows — through the persisted adjacency round-trip.
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val needles = Seq((-1L, q.toSeq), (-2L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e0.schema("embedding").dataType))
      val index = PhaseTimer.time("q_nsw_delete", "build") {
        Similarity.nswBuild(e0.union(needles), "embedding", "vec_id")
          .localCheckpoint(true)
      }
      val marked = Similarity.nswDeleteFromBuilt(index,
        e0.where(col("vec_id") % 97 === 0).select("vec_id")
          .union(Seq(-1L).toDF("vec_id")), "vec_id")
      Similarity.nswSearchBuilt(marked, "embedding", "vec_id", q, k = 10)
        .agg(count(lit(1)).as("k"),
          max(col("vec_id") === -2L && col("nsw_sim") === 1.0).as("retained_needle"),
          max(col("vec_id") === -1L || col("vec_id") % 97 === 0).as("served_deleted"))
    }),

    "q_nsw_delete_stored" -> ((s, dir) => {
      // round 15: takedown on the PERSISTED graph index (nswWriteIndex →
      // nswDeleteFromStored → readNswIndex): the takedown is one tiny
      // mark segment behind an atomic flip — the graph payload is never
      // rewritten — and the reload OR-folds the marks into nsw_deleted,
      // so the served top-k obeys exactly q_nsw_delete's invariants:
      // retained copy at cosine 1.0, revoked needle and revoked slice
      // never surface, k rows (tombstoned nodes still route).
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val needles = Seq((-1L, q.toSeq), (-2L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e0.schema("embedding").dataType))
      val tmp = java.nio.file.Files.createTempDirectory("graft_nsw_idx_").toString
      try {
        PhaseTimer.time("q_nsw_delete_stored", "build") {
          Similarity.nswWriteIndex(
            Similarity.nswBuild(e0.union(needles), "embedding", "vec_id"), tmp)
        }
        PhaseTimer.time("q_nsw_delete_stored", "takedown") {
          Similarity.nswDeleteFromStored(s, tmp,
            e0.where(col("vec_id") % 97 === 0).select("vec_id")
              .union(Seq(-1L).toDF("vec_id")))
        }
        // the takedown never rewrote the graph payload: one graph segment
        // plus one marks-only segment
        val segs = graft.batch.SegmentedStore.committedSegs(tmp)
        require(segs.size == 2 && !graft.batch.StoreFs.exists(
          s"${graft.batch.SegmentedStore.segDir(tmp, segs.max)}/graph"),
          s"q_nsw_delete_stored: takedown was not a marks-only segment ($segs)")
        Similarity.nswSearchBuilt(Similarity.readNswIndex(s, tmp),
            "embedding", "vec_id", q, k = 10)
          .agg(count(lit(1)).as("k"),
            max(col("vec_id") === -2L && col("nsw_sim") === 1.0).as("retained_needle"),
            max(col("vec_id") === -1L || col("vec_id") % 97 === 0).as("served_deleted"))
          .localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_nsw_lifecycle_stored" -> ((s, dir) => {
      // round 15 (delta appends round 16): the FULL stored-graph
      // lifecycle in one row — bootstrap (nswWriteIndex) → takedown (one
      // mark segment; the original needle revoked) → append
      // (nswAppendToStored: one O(|batch|·m) graphdelta segment, a fresh
      // exact copy of the query ingested; the mark keeps applying
      // through the read-side fold) → compaction (nswCompactStored:
      // deltas + marks folded physically, segments down to one) → serve.
      // The appended copy must rank first at cosine 1.0, the revoked
      // original must never surface, and the compacted index must hold
      // exactly corpus-1+1 rows with no marks left (asserted in-row).
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val needle = Seq((-1L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e0.schema("embedding").dataType))
      val tmp = java.nio.file.Files.createTempDirectory("graft_nsw_lc_").toString
      try {
        val n0 = e0.count()
        PhaseTimer.time("q_nsw_lifecycle_stored", "build") {
          Similarity.nswWriteIndex(
            Similarity.nswBuild(e0.union(needle), "embedding", "vec_id"), tmp)
        }
        PhaseTimer.time("q_nsw_lifecycle_stored", "takedown") {
          Similarity.nswDeleteFromStored(s, tmp, Seq(-1L).toDF("vec_id"))
        }
        PhaseTimer.time("q_nsw_lifecycle_stored", "append") {
          Similarity.nswAppendToStored(s, tmp,
            needle.select(lit(-2L).as("vec_id"), col("embedding")),
            "embedding", "vec_id")
        }
        PhaseTimer.time("q_nsw_lifecycle_stored", "compact") {
          Similarity.nswCompactStored(s, tmp, "embedding", "vec_id")
        }
        val segs = graft.batch.SegmentedStore.committedSegs(tmp)
        require(segs.size == 1,
          s"q_nsw_lifecycle_stored: compaction left ${segs.size} segments")
        val idx = Similarity.readNswIndex(s, tmp).localCheckpoint(true)
        require(!idx.columns.contains("nsw_deleted") ||
          idx.where(col("nsw_deleted")).limit(1).count() == 0,
          "q_nsw_lifecycle_stored: compaction left live marks")
        val nRows = idx.count()
        require(nRows == n0 + 1,
          s"q_nsw_lifecycle_stored: expected ${n0 + 1} rows, got $nRows")
        // appended_first asserts RANK (round-16 review): the top-scored
        // row must BE the appended copy at cosine 1.0 — membership alone
        // would pass with the copy served at rank 5
        Similarity.nswSearchBuilt(idx, "embedding", "vec_id", q, k = 10)
          .agg(count(lit(1)).as("k"),
            (max_by(col("vec_id"), col("nsw_sim")) === -2L &&
              max(col("nsw_sim")) === 1.0).as("appended_first"),
            max(col("vec_id") === -1L).as("served_deleted"))
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_hnsw_lifecycle_stored" -> ((s, dir) => {
      // round 16: the stored HIERARCHICAL tier's full lifecycle —
      // bootstrap (hnswWriteIndex of an hnswBuild frame) → takedown (one
      // mark segment; the original needle revoked) → append (one
      // O(|batch|·m) graphdelta via the hierarchical insert-replay) →
      // compaction (hnswCompactStored: hierarchy rebuilt over retained,
      // segments to one) → serve through hnswSearchBuilt (tombstones
      // gate results, route as waypoints at every layer). Same
      // invariants as q_nsw_lifecycle_stored on the multi-layer frame.
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val needle = Seq((-1L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e0.schema("embedding").dataType))
      val tmp = java.nio.file.Files.createTempDirectory("graft_hnsw_lc_").toString
      try {
        val n0 = e0.count()
        PhaseTimer.time("q_hnsw_lifecycle_stored", "build") {
          Similarity.hnswWriteIndex(
            Similarity.hnswBuild(e0.union(needle), "embedding", "vec_id"), tmp)
        }
        PhaseTimer.time("q_hnsw_lifecycle_stored", "takedown") {
          Similarity.hnswDeleteFromStored(s, tmp, Seq(-1L).toDF("vec_id"))
        }
        PhaseTimer.time("q_hnsw_lifecycle_stored", "append") {
          Similarity.hnswAppendToStored(s, tmp,
            needle.select(lit(-2L).as("vec_id"), col("embedding")),
            "embedding", "vec_id")
        }
        // the append committed a delta-only segment, never a rewrite
        val preCompact = graft.batch.SegmentedStore.committedSegs(tmp)
        require(preCompact.size == 3 && !graft.batch.StoreFs.exists(
          s"${graft.batch.SegmentedStore.segDir(tmp, preCompact.max)}/graph"),
          s"q_hnsw_lifecycle_stored: append was not delta-only ($preCompact)")
        PhaseTimer.time("q_hnsw_lifecycle_stored", "compact") {
          Similarity.hnswCompactStored(s, tmp, "embedding", "vec_id")
        }
        val segs = graft.batch.SegmentedStore.committedSegs(tmp)
        require(segs.size == 1,
          s"q_hnsw_lifecycle_stored: compaction left ${segs.size} segments")
        val idx = Similarity.readHnswIndex(s, tmp).localCheckpoint(true)
        require(!idx.columns.contains("nsw_deleted") ||
          idx.where(col("nsw_deleted")).limit(1).count() == 0,
          "q_hnsw_lifecycle_stored: compaction left live marks")
        val nRows = idx.count()
        require(nRows == n0 + 1,
          s"q_hnsw_lifecycle_stored: expected ${n0 + 1} rows, got $nRows")
        // appended_first asserts RANK, not membership: the top-scored row
        // must BE the appended copy at cosine 1.0 (max_by picks the served
        // rank-1 id; the exact copy is the unique 1.0, so no tie)
        Similarity.hnswSearchBuilt(idx, "embedding", "vec_id", q, k = 10)
          .agg(count(lit(1)).as("k"),
            (max_by(col("vec_id"), col("hnsw_sim")) === -2L &&
              max(col("hnsw_sim")) === 1.0).as("appended_first"),
            max(col("vec_id") === -1L).as("served_deleted"))
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_nsw_append_stored" -> ((s, dir) => {
      // round 16: O(batch) stored append — nswWriteIndex over day 1,
      // then nswAppendToStored of a day-2 batch (needle + noise, ids
      // above every indexed id). Asserted in-row: the append committed
      // ONE graphdelta-only segment of ≤ |batch|·(m+1) rows (never an
      // index-sized rewrite — the round-15 append rewrote the whole
      // grown graph) and the read-side last-writer-wins reassembly is
      // IDENTICAL to a full rebuild over both days (append-only ids →
      // rebuild-identical construction). Output: the q_ann_nsw_incr
      // search invariants + the equality bit, oracle-pinned TRUE.
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val vecType = e0.schema("embedding").dataType
      val base = 1000000000L
      val day2 = ((base, q.toSeq) +: Seq.tabulate(20)(j =>
          (base + 1 + j.toLong, Seq.tabulate(64)(i => math.sin(j * 64 + i + 2.0)))))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(vecType))
      val tmp = java.nio.file.Files.createTempDirectory("graft_nsw_app_").toString
      try {
        PhaseTimer.time("q_nsw_append_stored", "build") {
          Similarity.nswWriteIndex(
            Similarity.nswBuild(e0, "embedding", "vec_id"), tmp)
        }
        PhaseTimer.time("q_nsw_append_stored", "append") {
          Similarity.nswAppendToStored(s, tmp, day2, "embedding", "vec_id")
        }
        val segs = graft.batch.SegmentedStore.committedSegs(tmp)
        require(segs.size == 2 && !graft.batch.StoreFs.exists(
          s"${graft.batch.SegmentedStore.segDir(tmp, segs.max)}/graph"),
          s"q_nsw_append_stored: append was not a delta-only segment ($segs)")
        val deltaRows = s.read.parquet(
          s"${graft.batch.SegmentedStore.segDir(tmp, segs.max)}/graphdelta").count()
        require(deltaRows <= 21L * 9L, // |batch|·(m+1), m = 8
          s"q_nsw_append_stored: delta not O(|batch|·m): $deltaRows rows")
        val idx = Similarity.readNswIndex(s, tmp).localCheckpoint(true)
        // the append ≡ rebuild equality ORACLE costs a second full build —
        // audit cost, attributed separately from the operator phases
        val eq = PhaseTimer.time("q_nsw_append_stored", "rebuild_oracle") {
          val rebuilt = Similarity.nswBuild(e0.unionByName(day2),
            "embedding", "vec_id").localCheckpoint(true)
          idx.except(rebuilt).count() == 0 &&
            rebuilt.except(idx).count() == 0
        }
        Similarity.nswSearchBuilt(idx, "embedding", "vec_id", q, k = 10)
          .agg(count(lit(1)).as("k"), countDistinct(col("vec_id")).as("n_ids"),
            max(col("vec_id") === base && col("nsw_sim") === 1.0).as("needle_found"))
          .withColumn("append_eq_rebuild", lit(eq))
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_ann_hnsw" -> ((s, dir) => {
      // round 10: REAL hierarchical NSW (full HNSW per shard — id-hash
      // level assignment, greedy descent through the upper layers, beam
      // at layer 0). Same planted-needle invariant as q_ann_nsw, searched
      // through the PERSISTED multi-layer index so the (id, vec,
      // layer_nbrs) round-trip and the re-derived entry point are what
      // the gate exercises.
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val needle = Seq((-1L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e0.schema("embedding").dataType))
      val index = Similarity.hnswBuild(e0.union(needle), "embedding", "vec_id")
        .localCheckpoint(true)
      Similarity.hnswSearchBuilt(index, "embedding", "vec_id", q, k = 10)
        .agg(count(lit(1)).as("k"), countDistinct(col("vec_id")).as("n_ids"),
          max(col("vec_id") === -1L && col("hnsw_sim") === 1.0).as("needle_found"))
    }),

    "q_ann_hnsw_coded" -> ((s, dir) => {
      // codes-only hierarchical serving: the persisted HNSW index swaps
      // vectors for PQ codes (hnswEncodeIndex) and BOTH the greedy
      // upper-layer descent and the layer-0 beam score by ADC lookups —
      // the needle's quantized self-similarity dominates natural
      // neighbors by the q_ann_pq margin through the whole hierarchy.
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val needle = Seq((-1L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e0.schema("embedding").dataType))
      val full = e0.union(needle)
      val books = Similarity.pqCodebooks(full, "embedding", "vec_id",
        dim = 64, m = 8, c = 16)
      val coded = Similarity.hnswEncodeIndex(
        Similarity.hnswBuild(full, "embedding", "vec_id"),
        "embedding", "vec_id", books).localCheckpoint(true)
      Similarity.hnswSearchCoded(coded, "vec_id", books, q, k = 10)
        .agg(count(lit(1)).as("k"), countDistinct(col("vec_id")).as("n_ids"),
          max(col("vec_id") === -1L).as("needle_found"))
    }),

    "q_ann_hnsw_incr" -> ((s, dir) => {
      // incremental maintenance for the HIERARCHICAL index — same
      // daily-ingest contract and append-only insert ≡ rebuild equality
      // as q_ann_nsw_incr, through hnswInsertAgainst (levels are
      // id-derived, the entry only advances on a strictly higher level,
      // so the replayed loop is node-for-node identical).
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val vecType = e0.schema("embedding").dataType
      val base = 1000000000L
      val day2 = ((base, q.toSeq) +: Seq.tabulate(20)(j =>
          (base + 1 + j.toLong, Seq.tabulate(64)(i => math.sin(j * 64 + i + 2.0)))))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(vecType))
      val idx1 = Similarity.hnswBuild(e0, "embedding", "vec_id").localCheckpoint(true)
      val incr = Similarity.hnswInsertAgainst(idx1, day2, "embedding", "vec_id")
        .localCheckpoint(true)
      val rebuilt = Similarity.hnswBuild(e0.unionByName(day2), "embedding", "vec_id")
        .localCheckpoint(true)
      val eq = incr.except(rebuilt).count() == 0 && rebuilt.except(incr).count() == 0
      Similarity.hnswSearchBuilt(incr, "embedding", "vec_id", q, k = 10)
        .agg(count(lit(1)).as("k"), countDistinct(col("vec_id")).as("n_ids"),
          max(col("vec_id") === base && col("hnsw_sim") === 1.0).as("needle_found"))
        .withColumn("insert_eq_rebuild", lit(eq))
    }),

    "q_ann_nsw_incr" -> ((s, dir) => {
      // incremental ANN maintenance (nswInsertAgainst — the daily-ingest
      // contract, as Dedup.exactAgainst): day 1 builds the index over the
      // corpus; day 2 appends a batch at ids above every indexed id — the
      // planted needle (exact query copy) plus deterministic noise rows.
      // The incremental index must be IDENTICAL to a full rebuild over
      // both days (append-only insert replays the construction loop node
      // for node) and the day-2 needle must surface from a search of the
      // incrementally-maintained index — both Spark-computed invariants
      // the oracle pins TRUE.
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val vecType = e0.schema("embedding").dataType
      val base = 1000000000L
      val day2 = ((base, q.toSeq) +: Seq.tabulate(20)(j =>
          (base + 1 + j.toLong, Seq.tabulate(64)(i => math.sin(j * 64 + i + 2.0)))))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(vecType))
      val idx1 = Similarity.nswBuild(e0, "embedding", "vec_id").localCheckpoint(true)
      val incr = Similarity.nswInsertAgainst(idx1, day2, "embedding", "vec_id")
        .localCheckpoint(true)
      val rebuilt = Similarity.nswBuild(e0.unionByName(day2), "embedding", "vec_id")
        .localCheckpoint(true)
      val eq = incr.except(rebuilt).count() == 0 && rebuilt.except(incr).count() == 0
      Similarity.nswSearchBuilt(incr, "embedding", "vec_id", q, k = 10)
        .agg(count(lit(1)).as("k"), countDistinct(col("vec_id")).as("n_ids"),
          max(col("vec_id") === base && col("nsw_sim") === 1.0).as("needle_found"))
        .withColumn("insert_eq_rebuild", lit(eq))
    }),

    "q_ann_ivfpq" -> ((s, dir) => {
      // IVF-PQ (FAISS IVFADC layout): coarse cells + PQ-coded residuals,
      // probe scan reads (cell, codes) only. Planted-needle invariant
      // oracle, same construction as q_ann_pq: the needle assigns to the
      // query's argmax-similarity cell, which is by definition among the
      // probed cells, and its residual reconstruction dominates natural
      // neighbors — found-in-top-k is deterministic. Recall and
      // probed-cell-containment laws live in ApproxOpsSpec.
      import s.implicits._
      val q = Array.tabulate(64)(i => math.sin(i + 1.0))
      val e0 = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val needle = Seq((-1L, q.toSeq)).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(e0.schema("embedding").dataType))
      Similarity.ivfPqTopK(e0.union(needle), "embedding", "vec_id", q, k = 10,
          dim = 64, nCentroids = 16, nProbe = 4, m = 8, c = 16)
        .agg(count(lit(1)).as("k"), countDistinct(col("vec_id")).as("n_ids"),
          max(col("vec_id") === -1L).as("needle_found"))
    }),

    // -- text analysis ---------------------------------------------------
    "q_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TF.tokenCount(col("text")).as("n_tokens"),
        TF.subwordCount(col("text")).as("n_subwords"))),

    "q_mixture_tokens" -> ((s, dir) =>
      // the pretraining mixture table (GPT-3/Pile/LLaMA recipe): each
      // source gets a token share of the budget; src1 truncates at its
      // 3000-token target, src2/src3 are scarcer and wrap into repeat
      // epochs under the cap. One membership inequality covers all
      // regimes (Sampling.mixtureByTokens); the oracle replays the
      // identical prefix-sum + epoch arithmetic
      Sampling.mixtureByTokens(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          TF.tokenCount(col("text")).as("n_tokens")),
        col("source"), col("doc_id"), col("n_tokens"),
        Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.25),
        tokenBudget = 6000, maxRepeat = 3)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("epoch"))),

    "q_quality" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TF.charCount(col("text")).as("n_chars"),
        round(TF.meanWordLength(col("text")), 6).as("mean_word_len"),
        round(TF.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        round(TF.alphaRatio(col("text")), 6).as("alpha_ratio"))),

    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TF.fingerprintMd5(col("text")).as("fp"))),

    "q_corpus_diff" -> ((s, dir) => {
      // snapshot diff between two corpus versions: old = ids not %7,
      // new = ids not %5 with %11 texts mutated — added/removed/changed/
      // same per id, digests (not text) through the one full-outer shuffle
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val oldV = base.where(col("doc_id") % 7 =!= 0)
      val newV = base.where(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      operators.CorpusDiff.diff(oldV, newV, "doc_id", "text")
    }),

    "q_bpe" -> ((s, dir) => {
      // corpus-fitted BPE tokenizer: ONE wordFreq aggregation over the
      // corpus, merges trained driver-side from the frequency dictionary
      // (the Sennrich split of labor — the only corpus-sized job is the
      // word count), then distributed encode. The token stream itself is
      // engine-specific, so the row oracles what SQL can see (n_words)
      // plus Spark-computed invariants pinned TRUE: the word-level
      // roundtrip (tokens concatenate back to the lowercased words) and
      // the n_words <= n_bpe <= n_nonspace_chars bounds.
      import graft.functions.Bpe
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val merges = Bpe.trainMerges(Bpe.wordFreq(docs, "text"), numMerges = 200)
      val enc = Bpe.encodeUdf(merges)
      val toks = enc(col("text"))
      val words = TF.tokens(lower(col("text")))
      val decoded = trim(regexp_replace(array_join(toks, ""), Bpe.EndOfWord, " "))
      docs.select(col("doc_id"),
        size(words).as("n_words"),
        (decoded === array_join(words, " ")).as("roundtrip_ok"),
        (size(toks) >= size(words) && size(toks).cast("long") <=
          length(regexp_replace(lower(col("text")), "\\s+", ""))).as("bounds_ok"))
    }),

    "q_quality_gate" -> ((s, dir) =>
      // per-language rank cut: keep the top 30% by text length per lang —
      // the deterministic rank-based quality gate (integer-exact cut, no
      // percentile-interpolation boundary ambiguity)
      Scoring.topFractionByScore(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
        col("lang"), length(col("text")), col("doc_id"), 0.3)
        .select("doc_id", "lang", "rank")),

    "q_quality_gate_salted" -> ((s, dir) =>
      // the hot-group form: per-salt candidate election + exact ranking
      // over the candidate union (declarative shortfall rescue). Result —
      // ranks included — is IDENTICAL to the plain cut by construction,
      // so this row shares q_quality_gate's oracle verbatim
      Scoring.topFractionByScoreSalted(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text")),
        col("lang"), length(col("text")), col("doc_id"), 0.3, salts = 8)
        .select("doc_id", "lang", "rank")),

    // no SQL oracle (engine-specific shingle hashes) — rows-only check;
    // the winnowing guarantees are law-checked in ApproxOpsSpec
    "q_winnow" -> ((s, dir) => {
      // winnowing as a CORRECTNESS row (q_cms pattern): the fingerprint
      // SET is engine-specific, but the 3-gram count is SQL-exact and the
      // fingerprint count obeys the deterministic guarantee
      // 0 < n_fp <= max(1, g - w + 1) for g > 0 (0 for empty docs) by
      // construction — the density EXPECTATION 2/(w+1) stays law-only.
      val seq = Dedup.shingleSeqCol(col("text"), 3)
      val g = size(seq)
      val nFp = size(TF.winnow(seq, 4))
      t(s, dir, "documents").select(col("doc_id"),
        g.as("n_grams"),
        ((g === 0 && nFp === 0) ||
          (g > 0 && nFp >= 1 && nFp <= greatest(g - 3, lit(1)))).as("fp_ok"))
    }),

    "q_langid" -> ((s, dir) => {
      // planted-extreme invariant oracle (q_hll pattern): script plants
      // (hiragana/hangul/CJK/cyrillic) are deterministic by
      // codepoint-range detection, Latin plants by trigram-profile
      // dominance, 'und' by construction — each planted guess is pinned;
      // the whole corpus still flows through the native codegen'd LangId
      // expression, collapsing to one always-true containment row (every
      // guess lands in the closed label set).
      import s.implicits._
      import graft.functions.NativeExpressions
      val planted = Seq(
        (-1L, "the thing and the best of the year and the rest of the morning", "en"),
        (-2L, "der die und ich nicht sich ein eine schon unglaublich", "de"),
        (-3L, "le de la et que les dans une entente quelque", "fr"),
        (-4L, "el de la ciudad que los en una canción corazón adelantado", "es"),
        (-5L, "di che la per una della nelle quale mente bellissima atto", "it"),
        (-6L, "こんにちは せかい", "ja"),
        (-7L, "안녕하세요 세계", "ko"),
        (-8L, "你好世界", "zh"),
        (-9L, "привет мир как дела", "ru"),
        (-10L, "12345 67890 !!!", "und")
      ).toDF("doc_id", "text", "expected")
      val plantedOut = planted.select(col("doc_id"), col("expected").as("lang"),
        (NativeExpressions.langId(col("text")) === col("expected")).as("lang_ok"))
      val corpus = t(s, dir, "documents")
        .select(NativeExpressions.langId(col("text")).as("__g"))
        .agg(min(col("__g").isin("en", "de", "fr", "es", "it",
          "ja", "ko", "zh", "ru", "und")).as("lang_ok"))
        .select(lit(0L).as("doc_id"), lit("__corpus").as("lang"), col("lang_ok"))
      plantedOut.union(corpus)
    }),

    "q_decontaminate" -> ((s, dir) => {
      // benchmark decontamination: docs sharing >= 5 distinct word 3-grams
      // with the held-out "benchmark" slice (doc_id % 20 == 0). The
      // benchmark n-gram set broadcasts; only (id, hash64) Longs move.
      val docs = t(s, dir, "documents").where(col("doc_id") % 20 =!= 0)
      val bench = t(s, dir, "documents").where(col("doc_id") % 20 === 0)
      Dedup.decontaminate(docs, bench, "text", "doc_id", n = 3, minOverlap = 5)
    }),

    "q_repetition" -> ((s, dir) =>
      // Gopher repetition quality rules: duplicate-line fraction (0 on this
      // single-line corpus — still verified), duplicate- and top-2-gram
      // occurrence fractions. One narrow codegen'd projection.
      t(s, dir, "documents").select(col("doc_id"),
        round(TF.duplicateLineFraction(col("text")), 6).as("dup_line_frac"),
        round(TF.duplicateNgramFraction(col("text"), 2), 6).as("dup_bigram_frac"),
        round(TF.topNgramFraction(col("text"), 2), 6).as("top_bigram_frac"))),

    "q_redact" -> ((s, dir) => {
      // PII scrub. The synthetic corpus is clean, so plant id-derived PII
      // identically here and in the oracle: the redacted string and the
      // per-category counts must match byte-for-byte across engines.
      val planted = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 10.0."), (col("doc_id") % 256).cast("string"),
        lit(".7 ssn 123-45-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        expr("repeat(' ip 8.8.8.8', CAST(doc_id % 3 AS INT))"))
      val counts = TF.piiCounts(planted)
      t(s, dir, "documents").select(col("doc_id"),
        TF.redactPii(planted).as("clean"),
        counts.getField("emails").as("n_email"),
        counts.getField("ips").as("n_ip"),
        counts.getField("ssns").as("n_ssn"),
        counts.getField("phones").as("n_phone"))
    }),

    "q_sample_stratified" -> ((s, dir) =>
      // deterministic stratified sampling: per-event_type keep rates from
      // the md5-uniform of event_id — membership is a pure function of the
      // data (re-runs/re-shards/other engines agree row-for-row)
      Sampling.stratified(eventsDF(s, dir), col("event_type"), col("event_id"),
          Map("purchase" -> 0.5, "click" -> 0.05, "view" -> 0.2), default = 0.01)
        .select(col("event_id"), col("event_type"))),

    "q_sample_mixture" -> ((s, dir) =>
      // data-mixing table: per-language keep rates derived from target
      // shares of a 300-row output; rate-starved strata (everything but
      // 'en' here) cap at 1 and are kept whole
      Sampling.mixture(t(s, dir, "documents"), col("lang"), col("doc_id"),
          Map("en" -> 0.5, "fr" -> 0.2, "de" -> 0.2, "es" -> 0.1),
          totalRows = 300)
        .select(col("doc_id"), col("lang"), col("source"))),

    "q_sample_quota" -> ((s, dir) =>
      // exact quota: the 150 smallest key-uniforms per event_type —
      // count + oversampled narrow filter + small-window trim, never a
      // whole-stratum window
      Sampling.quota(eventsDF(s, dir).select("event_id", "event_type"),
          col("event_type"), col("event_id"), k = 150)
        .select(col("event_id"), col("event_type"))),

    "q_split" -> ((s, dir) =>
      // deterministic train/val/test assignment: every event gets exactly
      // one label from the same portable md5-uniform
      eventsDF(s, dir).select(col("event_id"),
        Sampling.splitCol(col("event_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))),

    "q_vocab_coverage" -> ((s, dir) =>
      // tokenizer sizing: the smallest frequency-ranked vocabulary
      // covering 80% of the corpus token mass — cumulative mass via the
      // distributed prefix sum, never a vocabulary-wide window
      graft.functions.Bpe.vocabCoverage(
        graft.functions.Bpe.wordFreq(t(s, dir, "documents"), "text"), 0.8)),

    "q_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval: reciprocal-rank fusion (k0=60) of two
      // heterogeneous rankers over the same query set — BM25 top-10 and
      // distinct-token-overlap top-10 — keeping each query's fused
      // top-5. Both input rankings and the fusion arithmetic replay
      // exactly in the oracle.
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val idx = Retrieval.buildIndex(docs, "text", "doc_id")
      val lex = Retrieval.bm25TopK(idx, bm25Queries(s), "qtext", "query_id",
          k = 10).select("query_id", "doc_id", "rank")
      val qTok = bm25Queries(s).select(col("query_id"),
        explode(array_distinct(TF.tokens(lower(col("qtext"))))).as("tok"))
      val dTok = docs.select(col("doc_id"),
        explode(array_distinct(TF.tokens(lower(col("text"))))).as("tok"))
      val ovW = Window.partitionBy(col("query_id"))
        .orderBy(col("ov").desc, col("doc_id").asc)
      val ov = dTok.join(broadcast(qTok), "tok")
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("ov"))
        .withColumn("rank", row_number().over(ovW))
        .where(col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
      Retrieval.rrfFuse(Seq(lex, ov), "query_id", "doc_id", topK = 5)
        .select(col("query_id"), col("doc_id"),
          round(col("rrf"), 6).as("rrf"), col("fused_rank"))
    }),

    "q_hybrid_stored" -> ((s, dir) => {
      // the SERVING-path composition of q_hybrid_rrf: both rankers are
      // answered from the STORED token-bucketed index (one pruned
      // candidate-postings read feeds BM25 scoring AND the overlap
      // counts), then fused with the same RRF arithmetic — closing the
      // retrieval-serving lifecycle, and sharing q_hybrid_rrf's oracle
      // verbatim because the stored path is exact.
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_hybrid_idx_").toString
      try {
        Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
          tmp, tokenBuckets = 16)
        // ONE pruned candidate-postings read feeds BOTH rankers:
        // materialize it (candidate-sized), rebuild a Bm25Index around it
        // for BM25 scoring, and count token overlaps from the same rows
        val post = Retrieval.storedQueryPostings(s, tmp, 16,
          bm25Queries(s), "qtext").localCheckpoint(true)
        val stats = Retrieval.readIndex(s, tmp, "doc_id").stats
        val scored = Retrieval.bm25FromIndex(
          Retrieval.Bm25Index(post, stats, "doc_id"),
          bm25Queries(s), "qtext", "query_id")
        val lexW = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)
        val lex = scored.withColumn("rank", row_number().over(lexW))
          .where(col("rank") <= 10).select("query_id", "doc_id", "rank")
        val qTok = bm25Queries(s).select(col("query_id"),
          explode(array_distinct(TF.tokens(lower(col("qtext"))))).as("token"))
        val ovW = Window.partitionBy(col("query_id"))
          .orderBy(col("ov").desc, col("doc_id").asc)
        val ov = post.join(broadcast(qTok), "token")
          .groupBy(col("query_id"), col("doc_id"))
          .agg(count(lit(1)).as("ov"))
          .withColumn("rank", row_number().over(ovW))
          .where(col("rank") <= 10)
          .select("query_id", "doc_id", "rank")
        Retrieval.rrfFuse(Seq(lex, ov), "query_id", "doc_id", topK = 5)
          .select(col("query_id"), col("doc_id"),
            round(col("rrf"), 6).as("rrf"), col("fused_rank"))
          .localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_fold_assign" -> ((s, dir) =>
      // deterministic 5-fold assignment from the portable key-uniform
      t(s, dir, "documents").select(col("doc_id"),
        Sampling.foldCol(col("doc_id"), 5).as("fold"))),

    "q_sample_weighted" -> ((s, dir) =>
      // Efraimidis-Spirakis weighted draw without replacement: 200 docs
      // preferring longer text, exactly reproducible (the oracle replays
      // the identical u^(1/w) keys)
      Sampling.weightedSample(
        t(s, dir, "documents").select(col("doc_id"),
          length(col("text")).cast("long").as("w")),
        col("doc_id"), col("w"), k = 200)
        .select(col("doc_id"), col("w"))),

    "q_epoch_shuffle" -> ((s, dir) =>
      // deterministic epoch permutation: every doc's 0-based position in
      // the seed-7 md5 order, assigned by the distributed prefix-sum (a
      // balanced range shuffle, never one unpartitioned row_number window)
      Sharding.epochShuffle(t(s, dir, "documents").select("doc_id"),
          col("doc_id"), seed = 7L)
        .select(col("doc_id"), col("pos"))),

    "q_shard_assign" -> ((s, dir) =>
      // data-parallel trainer sharding: round-robin stripe the seed-3
      // epoch permutation across 8 ranks — shard sizes differ by <= 1 and
      // each rank's in-shard order is a uniform sample of the global one
      Sharding.shardAssign(t(s, dir, "documents").select("doc_id"),
          col("doc_id"), worldSize = 8, seed = 3L)
        .select(col("doc_id"), col("shard"), col("ord"))),

    "q_nb_classifier" -> ((s, dir) => {
      // fastText-style learned quality gate: closed-form multinomial
      // Naive-Bayes (one token-count aggregation = the whole training
      // run) fit on the even-id half labeled by length > 300, scoring
      // the odd-id half; model probes are broadcast, like q_lm_score
      val base = t(s, dir, "documents").select("doc_id", "text")
      val model = Scoring.naiveBayesTrain(base.where(col("doc_id") % 2 === 0),
        "text", length(col("text")) > 300)
      Scoring.naiveBayesScore(base.where(col("doc_id") % 2 === 1),
          model, "text", "doc_id")
        .select(col("doc_id"), round(col("score"), 6).as("score"), col("pred"))
    }),

    "q_nb_incr" -> ((s, dir) => {
      // incremental retrain ≡ full retrain, EXACTLY: NB state is integer
      // count tables (a sumByKey value), so merging the 0-mod-4 and
      // 2-mod-4 quarters' counts is bit-identical to training on the even
      // half — this row scores through the merged model and shares
      // q_nb_classifier's oracle verbatim
      val base = t(s, dir, "documents").select("doc_id", "text")
      val y = length(col("text")) > 300
      val a = base.where(col("doc_id") % 4 === 0)
      val b = base.where(col("doc_id") % 4 === 2)
      val counts = Scoring.mergeNaiveBayesCounts(
        Scoring.naiveBayesCounts(a, "text", y),
        Scoring.naiveBayesCounts(b, "text", y))
      val docCounts = a.unionByName(b).agg(
        sum(when(y, 1L).otherwise(0L)).as("d_pos"),
        sum(when(!y, 1L).otherwise(0L)).as("d_neg"))
      val model = Scoring.naiveBayesFromCounts(counts, docCounts)
      Scoring.naiveBayesScore(base.where(col("doc_id") % 2 === 1),
          model, "text", "doc_id")
        .select(col("doc_id"), round(col("score"), 6).as("score"), col("pred"))
    }),

    "q_corpus_stats" -> ((s, dir) =>
      // the monitoring surface every pipeline reports: per-(lang, source)
      // doc/char/token volumes — one hash aggregation, fully SQL-oracled
      t(s, dir, "documents").groupBy("lang", "source").agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(TF.tokenCount(col("text")).cast("long")).as("n_tokens"))),

    "q_streaming_corpus_stats" -> ((s, dir) => {
      // live ingest monitoring: the per-(lang, source) volume report
      // rolls forward as the corpus streams in 3 micro-batches
      // (foreachBatch merges each batch's aggregate into stored state —
      // counts are sums, the Summer contract). The final state equals
      // the batch aggregation exactly, so this row shares
      // q_corpus_stats' oracle verbatim.
      // State story: no state-store state; the stats table is bounded by
      // the (lang, source) key space, not by time — all-time by the
      // report's contract (see StreamingIO.fanout)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      def statsOf(df: DataFrame): DataFrame =
        df.groupBy("lang", "source").agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("n_chars"),
          sum(TF.tokenCount(col("text")).cast("long")).as("n_tokens"))
      def mergeStats(a: DataFrame, b: DataFrame): DataFrame =
        a.unionByName(b).groupBy("lang", "source").agg(
          sum(col("n_docs")).as("n_docs"), sum(col("n_chars")).as("n_chars"),
          sum(col("n_tokens")).as("n_tokens"))
      val base = t(s, dir, "documents").select("doc_id", "text", "lang", "source")
      val rows = base.as[(Long, String, String, String)].collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, String, String)]
      val tmp = java.nio.file.Files.createTempDirectory("graft_cstats_").toString
      try {
        statsOf(base.limit(0)).write.parquet(s"$tmp/v0")
        @volatile var ver = 0
        val writer = graft.streaming.StreamingIO.fanout(
          ms.toDS().toDF("doc_id", "text", "lang", "source"))(Seq(
          (b, _) => {
            mergeStats(s.read.parquet(s"$tmp/v$ver"), statsOf(b))
              .write.parquet(s"$tmp/v${ver + 1}")
            ver += 1
          }))
        withStreamingGateConf(s, 4) {
          val q = writer.start()
          try {
            (0 until 3).foreach { i =>
              ms.addData(rows.filter(_._1 % 3 == i).toSeq)
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        s.read.parquet(s"$tmp/v$ver")
          .select("lang", "source", "n_docs", "n_chars", "n_tokens")
          .localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_export_pipeline" -> ((s, dir) => {
      // the END-TO-END tokenized export: corpus-fitted BPE encode →
      // doc-boundary packing into 512-token sequences → 8-rank striping
      // of the sequences. Every stage is oracled on its own elsewhere
      // (q_bpe, q_pack_docwise, q_shard_assign); this row oracles the
      // COMPOSITION: n_docs is SQL-exact, and the export invariants —
      // every doc packed exactly once, multi-doc sequences within
      // budget, rank loads within 1, per-rank orders contiguous — are
      // Spark-computed booleans pinned TRUE (the q_semdedup_hier
      // invariant-row pattern).
      import graft.functions.Bpe
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val merges = Bpe.trainMerges(Bpe.wordFreq(docs, "text"), numMerges = 200)
      val enc = Bpe.encodeUdf(merges)
      val withToks = docs.select(col("doc_id"),
        size(enc(col("text"))).cast("long").as("n_bpe"))
      val packed = Packing.packDocwise(withToks, "doc_id", col("n_bpe"),
        512L, Seq(col("doc_id")), groupBudget = 4096L).localCheckpoint(true)
      val seqs = packed.groupBy("seq_id").agg(
        sum(col("n_bpe")).as("seq_tokens"), count(lit(1)).as("docs_in_seq"))
      val sharded = Sharding.shardAssign(seqs, col("seq_id"),
        worldSize = 8, seed = 11L).localCheckpoint(true)
      val perRank = sharded.groupBy("shard").agg(
        count(lit(1)).as("n_seqs"),
        (max(col("ord")) === count(lit(1)) - 1).as("contig"))
      val rankStats = perRank.agg(
        (max(col("n_seqs")) - min(col("n_seqs")) <= 1).as("ranks_balanced"),
        min(col("contig")).as("ords_contiguous"))
      val packStats = sharded.agg(
        sum(col("docs_in_seq")).as("docs_packed"),
        max(when(col("docs_in_seq") >= 2, col("seq_tokens"))
          .otherwise(lit(0L))).as("max_multi_seq"))
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(packStats)).crossJoin(broadcast(rankStats))
        .select(col("n_docs"),
          (col("docs_packed") === col("n_docs")).as("packed_all"),
          (col("max_multi_seq") <= 512L).as("budget_ok"),
          col("ranks_balanced"), col("ords_contiguous"))
    }),

    "q_embed_quant" -> ((s, dir) =>
      // int8 embedding storage (rung one below PQ): exact per-vector
      // symmetric scale, 4x smaller serving footprint, error <= scale/254
      // per element; codes integer-exact across engines. The driver's
      // checker cannot sort array-typed cells, so the compared surface is
      // a canonical digest of the codes (comma-joined decimal int8s ->
      // md5), built with the byte-identical expression in the oracle.
      t(s, dir, "embeddings").select(col("vec_id"),
        md5(concat_ws(",",
          transform(VF.int8Quantize(col("embedding")),
            c => c.cast("string")))).as("codes_digest"),
        round(VF.int8Scale(col("embedding")), 6).as("scale"))),

    "q_shard_export" -> ((s, dir) => {
      // the persisted form of q_shard_assign: one ord-sorted directory
      // per trainer rank (the layout a dataloader consumes with no
      // further shuffle), read back and re-asserted against the SAME
      // oracle as the in-memory assignment
      val tmp = java.nio.file.Files.createTempDirectory("graft_shards_").toString
      try {
        Sharding.writeShards(t(s, dir, "documents").select("doc_id"),
          col("doc_id"), worldSize = 8, seed = 3L, tmp)
        s.read.parquet(tmp).select(col("doc_id"), col("shard"), col("ord"))
          .localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_lm_score_backoff" -> ((s, dir) => {
      // stupid-backoff trigram LM (Brants et al. 2007): one n-gram order
      // beyond q_lm_score_bigram, with the standard 0.4 backoff cascade
      // trigram -> bigram -> unigram -> unk; same train/score split
      val base = t(s, dir, "documents").select("doc_id", "text")
      Scoring.backoffSurprisal(base.where(col("doc_id") % 2 === 1),
          base.where(col("doc_id") % 2 === 0), "text", "doc_id")
        .select(col("doc_id"), round(col("surprisal"), 6).as("surprisal"))
    }),

    "q_chunk" -> ((s, dir) =>
      // RAG-ingestion chunking: 32-token windows, 8-token overlap —
      // columnar slice/explode at scan speed, fully SQL-oracled (the
      // oracle replays the identical window math and joins)
      graft.operators.Chunking.chunk(t(s, dir, "documents"),
        "text", "doc_id", chunkSize = 32, overlap = 8)),

    "q_nb_stored" -> ((s, dir) => {
      // the model SERVING story: train once, persist the model (two
      // parquet tables), score from the stored form in a plan that never
      // sees the training corpus. Doubles round-trip parquet bit-exactly,
      // so this row shares q_nb_classifier's oracle verbatim — the same
      // stored ≡ memory contract as q_bm25_stored.
      val base = t(s, dir, "documents").select("doc_id", "text")
      val model = Scoring.naiveBayesTrain(base.where(col("doc_id") % 2 === 0),
        "text", length(col("text")) > 300)
      val tmp = java.nio.file.Files.createTempDirectory("graft_nb_store_").toString
      try {
        Scoring.saveNaiveBayes(model, tmp)
        Scoring.naiveBayesScore(base.where(col("doc_id") % 2 === 1),
            Scoring.loadNaiveBayes(s, tmp), "text", "doc_id")
          .select(col("doc_id"), round(col("score"), 6).as("score"), col("pred"))
          .localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_langid_trained" -> ((s, dir) => {
      // TRAINED language ID (the learned counterpart of q_langid's n-gram
      // heuristic): multi-class Naive-Bayes fit on the even-id half's lang
      // labels, argmax prediction for the odd half — training is one
      // (token, class) aggregation, the model broadcasts, and the oracle
      // replays the identical ln arithmetic and tie-break
      val base = t(s, dir, "documents").select("doc_id", "text", "lang")
      val model = Scoring.naiveBayesMultiTrain(
        base.where(col("doc_id") % 2 === 0), "text", col("lang"))
      Scoring.naiveBayesMultiPredict(base.where(col("doc_id") % 2 === 1),
          model, "text", "doc_id")
        .select(col("doc_id"), col("cls").as("pred_lang"),
          round(col("score"), 6).as("score"))
    }),

    "q_csv_roundtrip" -> ((s, dir) => {
      // delimited-text interchange: corpus → headerless gzip CSV parts →
      // schema-supplied FAILFAST read-back ≡ the original parquet corpus
      val base = t(s, dir, "documents").select("doc_id", "text", "lang", "source")
      val tmp = java.nio.file.Files.createTempDirectory("graft_csv_").toString
      try {
        sources.CsvLines.write(base, tmp, codec = Some("gzip"))
        sources.CsvLines.read(s, tmp, base.schema).localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_jsonl_roundtrip" -> ((s, dir) => {
      // crawl-format interchange: corpus → JSON-lines gzip parts →
      // schema-supplied FAILFAST read-back (inference is a banned extra
      // full pass at scale — sources/JsonLines.scala); the result must
      // equal the original parquet corpus, which is exactly the oracle
      val base = t(s, dir, "documents").select("doc_id", "text", "lang", "source")
      val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl_").toString
      try {
        sources.JsonLines.write(base, tmp, codec = Some("gzip"))
        sources.JsonLines.read(s, tmp, base.schema).localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_streaming_nb" -> ((s, dir) => {
      // online classifier maintenance: the labeled (even-id) half arrives
      // in 3 micro-batches; foreachBatch merges each batch's token counts
      // into the stored model state (mergeNaiveBayesCounts roll-forward —
      // the model is re-finalizable and serveable after every batch).
      // Integer counts sum exactly, so the final state ≡ full retraining
      // and this row shares q_nb_classifier's oracle verbatim.
      // State story: no state-store state; the count model is the
      // all-time durable state (a classifier's counts are its sufficient
      // statistic — nothing to horizon). This harness versions by `ver`;
      // a production ingest commits counts through a BatchStore so a
      // replayed batch is guarded like any merge (see StreamingIO.fanout)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val base = t(s, dir, "documents").select("doc_id", "text")
      val y = length(col("text")) > 300
      val train = docsDs(s, dir).collect().filter(_.doc_id % 2 == 0)
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val tmp = java.nio.file.Files.createTempDirectory("graft_nb_stream_").toString
      try {
        Scoring.naiveBayesCounts(base.limit(0), "text", y)
          .write.parquet(s"$tmp/counts_v0")
        Seq((0L, 0L)).toDF("d_pos", "d_neg").write.parquet(s"$tmp/dc_v0")
        @volatile var ver = 0
        val writer = graft.streaming.StreamingIO.fanout(
          ms.toDS().toDF("doc_id", "text"))(Seq(
          (b, _) => {
            val bc = Scoring.naiveBayesCounts(b, "text", y)
            Scoring.mergeNaiveBayesCounts(
                s.read.parquet(s"$tmp/counts_v$ver"), bc)
              .write.parquet(s"$tmp/counts_v${ver + 1}")
            s.read.parquet(s"$tmp/dc_v$ver").unionByName(
                b.agg(sum(when(y, 1L).otherwise(0L)).as("d_pos"),
                  sum(when(!y, 1L).otherwise(0L)).as("d_neg")))
              .agg(sum(col("d_pos")).as("d_pos"), sum(col("d_neg")).as("d_neg"))
              .write.parquet(s"$tmp/dc_v${ver + 1}")
            ver += 1
          }))
        withStreamingGateConf(s, 4) {
          val q = writer.start()
          try {
            (0 until 3).foreach { i =>
              ms.addData(train.iterator.filter(_.doc_id % 3 == i)
                .map(d => (d.doc_id, d.text)).toSeq)
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        val model = Scoring.naiveBayesFromCounts(
          s.read.parquet(s"$tmp/counts_v$ver"),
          s.read.parquet(s"$tmp/dc_v$ver"))
        Scoring.naiveBayesScore(base.where(col("doc_id") % 2 === 1),
            model, "text", "doc_id")
          .select(col("doc_id"), round(col("score"), 6).as("score"), col("pred"))
          .localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),

    "q_multimodal" -> ((s, dir) => {
      // opaque-binary media pipeline: documents' utf-8 bytes play the media
      // content; features flow through the real mapPartitions batch
      // plumbing (oracle checks the byte-level features; the stub-decoded
      // statistics are covered by MultimodalSpec)
      import s.implicits._
      import graft.functions.Multimodal
      val media = docsDs(s, dir).map(d => Multimodal.MediaRow(d.doc_id,
        Multimodal.MediaMeta("image", 0, 0, 0, 0), d.text.getBytes("UTF-8")))
      Multimodal.featurize(media)
        .select(col("id").as("doc_id"), col("nBytes").as("n_bytes"),
          col("nFrames").as("n_frames"), col("contentMd5").as("content_md5"))
    }),

    "q_multimodal_decode" -> ((s, dir) => {
      // REAL image decode (JDK javax.imageio — public API, no new deps):
      // plant one deterministic grayscale PNG per 10th doc, whose
      // width/height/constant pixel value are pure functions of doc_id —
      // so the DECODED geometry and mean are fully SQL-oracled. The PNG
      // bytes flow through the same opaque-binary MediaRow plumbing and
      // mapPartitions batch decode any 100 TB media column would use;
      // round-trip pixel-exactness lives in MultimodalSpec.
      import s.implicits._
      import graft.functions.Multimodal
      val planted = docsDs(s, dir).filter(_.doc_id % 10 == 0).map { d =>
        val w = 8 + (d.doc_id % 16).toInt
        val h = 4 + (d.doc_id % 8).toInt
        val v = (d.doc_id % 251).toInt
        Multimodal.MediaRow(d.doc_id,
          Multimodal.MediaMeta("image/png", w, h, 1, 0),
          Multimodal.encodeGrayPng(w, h, v))
      }
      Multimodal.featurizeImages(planted)
        .select(col("id").as("doc_id"), col("decoded"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("bands").cast("long").as("bands"),
          round(col("meanValue"), 5).as("mean_value"))
    }),

    // -- headline relational shapes (bench) ------------------------------
    "q1_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("cnt"))),

    "q3_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q_top_users" -> ((s, dir) =>
      eventsDF(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
        .orderBy(col("n_events").desc, col("user_id"))
        .limit(50))
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles (same parquet tables, bare table names)
  // ---------------------------------------------------------------------

  /** BM25 oracle, assembled so the VALUES clause can never drift from
    * [[bm25QuerySet]]. Arithmetic mirrors the Spark side token for token
    * (same literals, same association) so both engines execute the same
    * IEEE operations; only the final few-term sum reorders, which 6dp
    * rounding absorbs.
    */
  /** The shared BM25 oracle CTE block, with the corpus restricted by
    * `docWhere` — "TRUE" for the full-corpus rows, a retained-set
    * predicate for the takedown row (q_bm25_delete), whose oracle IS the
    * rebuilt-without-the-documents computation.
    */
  private def bm25OracleBaseFor(docWhere: String): String =
    "WITH q(query_id, qtext) AS (VALUES " +
      bm25QuerySet.map { case (i, t) => "(" + i + ", '" + t + "')" }.mkString(", ") +
      ")," +
    s"""
      |d AS (SELECT doc_id,
      |  list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0) AS toks
      |  FROM documents WHERE $docWhere),
      |stats AS (SELECT count(*) AS n_docs,
      |  CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl FROM d),
      |post AS (SELECT doc_id, tok, count(*) AS tf, any_value(dl) AS dl FROM (
      |  SELECT doc_id, unnest(toks) AS tok, len(toks) AS dl FROM d)
      |  GROUP BY doc_id, tok),
      |qt AS (SELECT query_id, unnest(list_distinct(
      |  list_filter(string_split_regex(lower(qtext), '\\s+'), x -> len(x) > 0))) AS tok
      |  FROM q),
      |dfq AS (SELECT tok, count(*) AS df FROM post
      |  WHERE tok IN (SELECT DISTINCT tok FROM qt) GROUP BY tok)""".stripMargin

  private val bm25OracleBase: String = bm25OracleBaseFor("TRUE")

  private val sessionizeOracle: String =
    """WITH m AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms,
      |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
      |         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 1800000
      |      THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))),
      |s AS (
      |  SELECT user_id, ts_ms,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM m)
      |SELECT user_id, session_seq, min(ts_ms) AS session_start,
      |  max(ts_ms) AS session_end, count(*) AS n_events
      |FROM s GROUP BY 1, 2""".stripMargin

  private val qualityGateOracle: String =
    """WITH ranked AS (
      |  SELECT doc_id, lang,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY length(text) DESC, doc_id ASC) AS INTEGER) AS rank,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT doc_id, lang, rank FROM ranked WHERE rank <= ceil(0.3 * n)""".stripMargin

  private val bm25ScoredSuffix: String =
    """
      |SELECT qt.query_id, post.doc_id,
      |  round(sum(ln(1 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
      |    * (post.tf * (1.2 + 1))
      |    / (post.tf + 1.2 * ((1 - 0.75) + 0.75 * post.dl / stats.avgdl))), 6) AS score
      |FROM qt JOIN post ON qt.tok = post.tok
      |  JOIN dfq ON qt.tok = dfq.tok CROSS JOIN stats
      |GROUP BY qt.query_id, post.doc_id""".stripMargin

  private val bm25OracleScored: String = bm25OracleBase + bm25ScoredSuffix

  /** Shared by q_bm25_topk and q_bm25_topk_pruned (WAND-lite pruning is
    * exact): per-query top-3 by (6dp-rounded score desc, doc_id asc).
    */
  private val bm25TopKOracle: String = bm25OracleBase +
    """,
      |scored AS (
      |  SELECT qt.query_id, post.doc_id,
      |    round(sum(ln(1 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
      |      * (post.tf * (1.2 + 1))
      |      / (post.tf + 1.2 * ((1 - 0.75) + 0.75 * post.dl / stats.avgdl))), 6) AS score
      |  FROM qt JOIN post ON qt.tok = post.tok
      |    JOIN dfq ON qt.tok = dfq.tok CROSS JOIN stats
      |  GROUP BY qt.query_id, post.doc_id)
      |SELECT query_id, doc_id, score, rank FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank FROM scored)
      |WHERE rank <= 3""".stripMargin

  /** Shared by q_hybrid_rrf (in-memory rankers) and q_hybrid_stored (the
    * stored serving path — exact, so the fused output is identical):
    * BM25 top-10 + token-overlap top-10 per query, RRF-fused (k0=60),
    * fused top-5 per query.
    */
  private val hybridRrfOracle: String = bm25OracleBase +
    """,
      |scored AS (
      |  SELECT qt.query_id, post.doc_id,
      |    round(sum(ln(1 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
      |      * (post.tf * (1.2 + 1))
      |      / (post.tf + 1.2 * ((1 - 0.75) + 0.75 * post.dl / stats.avgdl))), 6) AS score
      |  FROM qt JOIN post ON qt.tok = post.tok
      |    JOIN dfq ON qt.tok = dfq.tok CROSS JOIN stats
      |  GROUP BY qt.query_id, post.doc_id),
      |lex AS (SELECT query_id, doc_id, rank FROM (
      |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id ASC) AS rank FROM scored)
      |  WHERE rank <= 10),
      |ov AS (SELECT query_id, doc_id, rank FROM (
      |  SELECT qt.query_id, post.doc_id, row_number() OVER (
      |      PARTITION BY qt.query_id
      |      ORDER BY count(*) DESC, post.doc_id ASC) AS rank
      |  FROM qt JOIN post ON qt.tok = post.tok
      |  GROUP BY qt.query_id, post.doc_id)
      |  WHERE rank <= 10),
      |fused AS (SELECT query_id, doc_id, sum(1.0 / (60 + CAST(rank AS DOUBLE))) AS rrf
      |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM ov)
      |  GROUP BY 1, 2)
      |SELECT query_id, doc_id, round(rrf, 6) AS rrf, fused_rank FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY rrf DESC, doc_id ASC) AS INTEGER) AS fused_rank FROM fused)
      |WHERE fused_rank <= 5""".stripMargin

  /** Shared by q_nb_classifier and q_nb_incr (merged integer counts ≡
    * full-retrain counts, so both rows produce identical doubles). The
    * arithmetic mirrors Scoring.naiveBayes* literally: every ln runs on
    * the same IEEE division both engines compute; score rounds to 6dp.
    */
  private val nbClassifierOracle: String =
    """WITH lab AS (SELECT doc_id, lower(text) AS t, length(text) > 300 AS y
      |  FROM documents WHERE doc_id % 2 = 0),
      |tok AS (SELECT y, unnest(
      |    list_filter(string_split_regex(t, '\s+'), x -> len(x) > 0)) AS token
      |  FROM lab),
      |pt AS (SELECT token,
      |    sum(CASE WHEN y THEN 1 ELSE 0 END) AS c_pos,
      |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS c_neg
      |  FROM tok GROUP BY 1),
      |tot AS (SELECT sum(c_pos) AS n_pos, sum(c_neg) AS n_neg, count(*) AS v
      |  FROM pt),
      |dc AS (SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS d_pos,
      |    sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS d_neg FROM lab),
      |consts AS (SELECT
      |    ln(CAST(d_pos AS DOUBLE)) - ln(CAST(d_neg AS DOUBLE)) AS prior,
      |    ln(CAST(n_neg + v AS DOUBLE)) - ln(CAST(n_pos + v AS DOUBLE)) AS unk_llr
      |  FROM dc, tot),
      |llr AS (SELECT token,
      |    ln(CAST(c_pos + 1 AS DOUBLE) / CAST(n_pos + v AS DOUBLE)) -
      |    ln(CAST(c_neg + 1 AS DOUBLE) / CAST(n_neg + v AS DOUBLE)) AS llr
      |  FROM pt, tot),
      |dt AS (SELECT doc_id, unnest(
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
      |  FROM documents WHERE doc_id % 2 = 1),
      |ts AS (SELECT d.doc_id, sum(coalesce(l.llr, c.unk_llr)) AS s
      |  FROM dt d LEFT JOIN llr l ON d.token = l.token CROSS JOIN consts c
      |  GROUP BY 1)
      |SELECT d.doc_id,
      |  round((SELECT prior FROM consts) + coalesce(ts.s, 0), 6) AS score,
      |  ((SELECT prior FROM consts) + coalesce(ts.s, 0)) > 0 AS pred
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
      |LEFT JOIN ts ON d.doc_id = ts.doc_id""".stripMargin

  /** Shared by q_corpus_stats and q_streaming_corpus_stats (the streamed
    * roll-forward sums the same integers).
    */
  private val corpusStatsOracle: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
      |  CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
      |    x -> len(x) > 0))) AS BIGINT) AS n_tokens
      |FROM documents GROUP BY 1, 2""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_source" ->
      "SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS ts_ms FROM events",

    "q_map" -> "SELECT event_id, value * 2 AS doubled FROM events",

    "q_filter" ->
      "SELECT event_id, user_id FROM events WHERE event_type = 'click'",

    "q_flatmap" ->
      """SELECT doc_id, w AS word FROM (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS w
        |  FROM documents)""".stripMargin,

    "q_collect" ->
      "SELECT user_id, value FROM events WHERE event_type = 'purchase'",

    "q_optionmap" ->
      """SELECT event_id, CAST(regexp_extract(props, '[0-9]{1,18}') AS BIGINT) AS k
        |FROM events WHERE regexp_matches(props, '[0-9]')""".stripMargin,

    "q_merge" ->
      """SELECT event_id, event_type FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, event_type FROM events WHERE event_type = 'purchase'""".stripMargin,

    "q_either" ->
      """SELECT 'L' AS side, event_id AS id FROM events WHERE event_type = 'signup'
        |UNION ALL
        |SELECT 'R' AS side, doc_id AS id FROM documents""".stripMargin,

    "q_sumbykey" ->
      """SELECT w AS word, count(*) AS cnt FROM (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS w
        |  FROM documents) GROUP BY w""".stripMargin,

    "q_mapkeys" ->
      "SELECT user_id % 10 AS bucket, count(*) AS cnt FROM events GROUP BY 1",

    "q_flatmapkeys" ->
      """SELECT k AS user_key, count(*) AS cnt FROM (
        |  SELECT user_id AS k FROM events
        |  UNION ALL SELECT user_id + 1000 AS k FROM events) GROUP BY k""".stripMargin,

    "q_mapvalues" ->
      "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id",

    "q_flatmapvalues" ->
      "SELECT user_id, count(*) * 2 AS cnt FROM events GROUP BY user_id",

    "q_filterkeys" ->
      "SELECT user_id, count(*) AS cnt FROM events WHERE user_id < 50 GROUP BY user_id",

    "q_filtervalues" ->
      "SELECT user_id, count(*) AS cnt FROM events WHERE value > 50.0 GROUP BY user_id",

    "q_keys" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",

    "q_values" ->
      "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id",

    "q_swap" ->
      "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id",

    "q_leftjoin" ->
      """SELECT e.event_id, e.user_id, c.c_name
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,

    "q_leftjoin_external" ->
      """SELECT e.event_id, e.user_id, c.c_name
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,

    "q_lookup" ->
      """SELECT e.user_id, c.c_mktsegment AS segment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin,

    // the oracle IS the naive non-equi join the operator rewrites away
    "q_range_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |ON c.user_id = p.user_id AND c.ts >= p.ts
        |  AND c.ts < p.ts + INTERVAL 1 HOUR""".stripMargin,

    // naive non-equi LEFT join: unmatched clicks keep a NULL purchase_id
    "q_range_join_left" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |ON c.user_id = p.user_id AND c.ts >= p.ts
        |  AND c.ts < p.ts + INTERVAL 1 HOUR""".stripMargin,

    // naive non-equi overlap join: [p, p+1h) and [c, c+30m) intersect
    "q_interval_overlap" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |ON p.user_id = c.user_id
        |  AND p.ts < c.ts + INTERVAL 30 MINUTE
        |  AND c.ts < p.ts + INTERVAL 1 HOUR""".stripMargin,

    "q_asof_join" ->
      """SELECT e.event_id, e.user_id, r.signup_id
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') e
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts AS signup_ts, max(event_id) AS signup_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts) r
        |ON e.user_id = r.user_id AND e.ts >= r.signup_ts""".stripMargin,

    "q_asof_summing" ->
      """SELECT e.event_id, e.user_id,
        |  (SELECT count(*) FROM events c
        |   WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts)
        |  AS clicks_before
        |FROM events e WHERE e.event_type = 'purchase'""".stripMargin,

    "q_batcher" ->
      """SELECT user_id, CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS batch_id,
        |  count(*) AS cnt FROM events GROUP BY 1, 2""".stripMargin,

    "q_batcher_calendar" ->
      """SELECT user_id,
        |  date_diff('day', DATE '1970-01-01',
        |    CAST(timezone('America/New_York', CAST(ts AS TIMESTAMPTZ)) AS DATE)) AS batch_id,
        |  count(*) AS cnt
        |FROM events GROUP BY user_id, batch_id""".stripMargin,

    "q_collectkeys" ->
      """SELECT upper(event_type) AS etype, count(*) AS cnt
        |FROM events WHERE event_type LIKE 'p%' GROUP BY 1""".stripMargin,

    "q_collectvalues" ->
      """SELECT user_id, round(sum(value - 100), 6) AS sumv
        |FROM events WHERE value > 100 GROUP BY 1""".stripMargin,

    "q_decayed" ->
      """WITH m AS (SELECT user_id, max(epoch_ms(ts)) AS tmax FROM events GROUP BY 1)
        |SELECT e.user_id, m.tmax AS last_ts_ms,
        |  round(sum(e.value * pow(2.0, (epoch_ms(e.ts) - m.tmax) / 604800000.0)), 6)
        |    AS decayed
        |FROM events e JOIN m ON e.user_id = m.user_id
        |GROUP BY e.user_id, m.tmax""".stripMargin,

    // per-user ms timestamps are unique in this data (no ties), so
    // latest-write-wins is deterministic and arg_max is an exact oracle
    "q_lastbytime" ->
      """SELECT user_id, epoch_ms(max(ts)) AS last_ts_ms,
        |  arg_max(event_type, ts) AS last_type
        |FROM events GROUP BY 1""".stripMargin,

    // Combined(daily, hourly, at=2024-01-15T00:00Z): boundaryBatch =
    // floorDiv(cut-1, day) = 19736, afterBase = floorDiv(cut, hour) = 473688,
    // so post-cut ids are (19736 + 1 - 473688) + hourly_id = -453951 + hourly_id
    "q_batcher_combined" ->
      """SELECT user_id,
        |  CASE WHEN epoch_ms(ts) < 1705276800000
        |    THEN CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT)
        |    ELSE -453951 + CAST(floor(epoch_ms(ts) / 3600000.0) AS BIGINT)
        |  END AS batch_id,
        |  count(*) AS cnt
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_sumbykey_delta" ->
      """WITH per_batch AS (
        |  SELECT user_id, CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS batch_id,
        |    count(*) AS delta
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, batch_id,
        |  CAST(sum(delta) OVER (PARTITION BY user_id ORDER BY batch_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS prior,
        |  delta
        |FROM per_batch""".stripMargin,

    "q_client_merge" ->
      "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id",

    "q_batch_merge" ->
      """WITH per_batch AS (
        |  SELECT user_id, CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS batch_id,
        |    count(*) AS delta
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, batch_id,
        |  CAST(sum(delta) OVER (PARTITION BY user_id ORDER BY batch_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT) AS prior,
        |  delta
        |FROM per_batch""".stripMargin,

    "q_lambda_merged" ->
      "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id",

    // takedown on the serving store: all-time counts over the RETAINED keys
    "q_store_delete" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |WHERE user_id % 5 <> 2 GROUP BY user_id""".stripMargin,

    // historical recompute: after the backfill, the two rewritten
    // snapshots must equal a per-batch recompute over the master dataset
    "q_backfill" ->
      """SELECT user_id, CAST(19768 AS BIGINT) AS batch_id, count(*) AS cnt
        |FROM events
        |WHERE CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) <= 19768
        |GROUP BY user_id
        |UNION ALL
        |SELECT user_id, CAST(19800 AS BIGINT) AS batch_id, count(*) AS cnt
        |FROM events GROUP BY user_id""".stripMargin,

    // takedown × recompute composition: a dirty backfill re-applies the
    // recorded revocations, so the served store is a recompute over the
    // retained users only
    "q_backfill_guard" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |WHERE user_id % 7 <> 3 GROUP BY user_id""".stripMargin,

    // 6 point gets through the clustered serving layout == all-data counts
    "q_client_get" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |WHERE user_id IN (
        |  SELECT user_id FROM events GROUP BY user_id ORDER BY user_id LIMIT 6)
        |GROUP BY user_id""".stripMargin,

    "q_window_service" ->
      """SELECT e.event_id, e.user_id,
        |  CASE WHEN r.signup_ts >= e.ts - INTERVAL 7 DAY THEN r.signup_id END AS signup_id
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') e
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts AS signup_ts, max(event_id) AS signup_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts) r
        |ON e.user_id = r.user_id AND e.ts >= r.signup_ts""".stripMargin,

    // gaps-and-islands with the half-open gap convention (diff >= gap
    // starts a new session); CAST the running sum (DuckDB window sum of
    // BIGINT is HUGEINT)
    "q_sessionize" -> sessionizeOracle,
    // the hot-key chunked form must emit IDENTICAL sessions
    "q_sessionize_presplit" -> sessionizeOracle,

    // each event covers the 7 day-aligned windows ending at-or-after it;
    // the lateral series reproduces Spark's window() explode exactly
    "q_sliding_window" ->
      """SELECT e.user_id, CAST(t.d AS BIGINT) AS window_day, count(*) AS cnt
        |FROM events e, UNNEST(generate_series(
        |  CAST(floor(epoch_ms(e.ts) / 86400000.0) AS BIGINT) - 6,
        |  CAST(floor(epoch_ms(e.ts) / 86400000.0) AS BIGINT))) AS t(d)
        |GROUP BY 1, 2""".stripMargin,

    // streamed sliding-window set == the same 7-window-per-event cover
    // (computed Spark-side); the oracle pins the distinct (user, window)
    // count over the fed slice
    "q_streaming_sliding" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_windows, TRUE AS stream_eq_batch
        |FROM (
        |  SELECT e.user_id, t.d FROM events e, UNNEST(generate_series(
        |    CAST(floor(epoch_ms(e.ts) / 86400000.0) AS BIGINT) - 6,
        |    CAST(floor(epoch_ms(e.ts) / 86400000.0) AS BIGINT))) AS t(d)
        |  WHERE e.user_id % 10 = 0 GROUP BY 1, 2)""".stripMargin,

    // streamed session set == batch gaps-and-islands set (computed
    // Spark-side); the oracle pins the session count over the fed slice
    "q_streaming_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 1800000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events WHERE user_id % 10 = 0
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)))
        |SELECT CAST(sum(is_new) AS BIGINT) AS n_sessions,
        |  TRUE AS stream_eq_batch
        |FROM m""".stripMargin,

    // unique-keyed service = plain left equi-join on the dimension shape;
    // empty service = typed null column
    "q_unique_service" ->
      """SELECT e.event_id, e.user_id, f.signup_event_id,
        |  CAST(NULL AS BIGINT) AS missing_val
        |FROM events e LEFT JOIN (
        |  SELECT user_id, CAST(min(event_id) AS BIGINT) AS signup_event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id) f
        |USING (user_id)""".stripMargin,

    "q_loop_join" ->
      """SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS prior_events
        |FROM events""".stripMargin,

    "q_loop_join_presplit" ->
      """SELECT event_id, user_id,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS prior_events
        |FROM events""".stripMargin,

    // the incremental driver's three roll-forward runs must reconstruct
    // the all-time totals exactly — no dropped or double-counted batches
    "q_incremental_driver" ->
      "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id",

    // a hole at dense batch 3 shrinks the plan to (1,2); the read returns
    // exactly those batches' rows; a request starting at the hole is None
    "q_availability" ->
      """WITH d AS (
        |  SELECT day, dense_rank() OVER (ORDER BY day) AS batch_id FROM (
        |    SELECT DISTINCT CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day
        |    FROM events))
        |SELECT CAST(1 AS BIGINT) AS planned_lo, CAST(2 AS BIGINT) AS planned_hi,
        |  (SELECT count(*) FROM events e
        |   JOIN d ON CAST(floor(epoch_ms(e.ts) / 86400000.0) AS BIGINT) = d.day
        |   WHERE d.batch_id <= 2) AS n_rows,
        |  TRUE AS hole_start_none""".stripMargin,

    // the name label is semantics-free; the shards and commutativity
    // options are Spark-computed invariants the oracle pins TRUE
    "q_name_options" ->
      """SELECT user_id, count(*) AS cnt, TRUE AS paths_equal, TRUE AS shards_ok
        |FROM events GROUP BY user_id""".stripMargin,

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
        |FROM events WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,

    "q_sumbykey_ordered" ->
      """SELECT user_id, string_agg(event_id, ',' ORDER BY event_id) AS event_ids
        |FROM events GROUP BY user_id""".stripMargin,

    // the chunked fold merges back to exactly the ordered concat
    "q_sumbykey_presplit" ->
      """SELECT user_id, string_agg(event_id, ',' ORDER BY event_id) AS event_ids
        |FROM events GROUP BY user_id""".stripMargin,

    "q_max_by" ->
      """SELECT user_id, event_id AS last_event FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin,

    "q_topk" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
        |  FROM events) WHERE rn <= 5""".stripMargin,

    "q_count_distinct" ->
      "SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type",

    // CAST(sum(..) AS BIGINT): DuckDB's sum(BIGINT) returns HUGEINT (int128),
    // which hash-mismatches Spark's LongType even when the values agree.
    "q_json_props" ->
      """SELECT event_type, count(*) AS n_hi, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |WHERE k >= 50 GROUP BY event_type""".stripMargin,

    // HLL invariant row: the exact count is recomputed in SQL; the
    // estimate must land within the 5% envelope for every key
    "q_hll" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, TRUE AS est_ok
        |FROM events GROUP BY event_type""".stripMargin,

    "q_cms" ->
      """SELECT event_type, user_id, TRUE AS cnt_ok
        |FROM events GROUP BY event_type, user_id""".stripMargin,

    // winnowing invariant: n_grams is recomputed exactly at the string
    // level; the fingerprint-count bound must hold for every doc
    "q_winnow" ->
      """SELECT doc_id,
        |  CASE WHEN len(toks) >= 3 THEN len(toks) - 2
        |       WHEN len(toks) > 0 THEN 1 ELSE 0 END AS n_grams,
        |  TRUE AS fp_ok
        |FROM (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents)""".stripMargin,

    // central moments: Spark merges partials pairwise (Pebay), the oracle
    // computes two-pass population moments — identical up to float ulps,
    // pinned by the 6dp rounding on both sides
    "q_moments" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n_events, avg(value) AS mu
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, m.n_events,
        |  round(m.mu, 6) AS mean_v,
        |  round(avg(pow(e.value - m.mu, 2)), 6) AS var_v,
        |  round(avg(pow(e.value - m.mu, 3))
        |    / pow(avg(pow(e.value - m.mu, 2)), 1.5), 6) AS skew_v,
        |  round(avg(pow(e.value - m.mu, 4))
        |    / pow(avg(pow(e.value - m.mu, 2)), 2) - 3.0, 6) AS kurt_v
        |FROM events e JOIN m USING (event_type)
        |GROUP BY e.event_type, m.n_events, m.mu""".stripMargin,

    // capacity >= distinct users per type => the sketch is exact, and the
    // oracle is the true ranking (ties broken by user_id on both sides)
    "q_heavy_hitters" ->
      """SELECT event_type, user_id, cnt FROM (
        |  SELECT event_type, user_id, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY count(*) DESC, user_id ASC) AS rn
        |  FROM events GROUP BY event_type, user_id) WHERE rn <= 3""".stripMargin,

    // the bucket of the ceil(q*n)-th smallest value is a deterministic
    // function of the exact rank-quantile; width 0.25 buckets have exact
    // binary bounds so the 6dp rounding is a no-op on both sides
    "q_quantile" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, CAST(p AS DOUBLE) AS p,
        |  round(0.25 * floor(value / 0.25), 6) AS lo,
        |  round(0.25 * (floor(value / 0.25) + 1), 6) AS hi
        |FROM r JOIN (VALUES (0.5), (0.9), (0.99)) AS ps(p) ON TRUE
        |WHERE rk = greatest(1, CAST(ceil(p * n) AS BIGINT))""".stripMargin,

    // Bloom no-false-negatives: every present pair must probe true,
    // independent of sketch parameters
    "q_bloom" ->
      """SELECT DISTINCT event_type, user_id, TRUE AS contained
        |FROM events""".stripMargin,

    "q_dedup_exact" ->
      "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",

    "q_dedup_exact_norm" ->
      """SELECT min(doc_id) AS doc_id FROM documents
        |GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))""".stripMargin,

    // q_minhash_cands is the VERIFIED stage, so exact Jaccard precision is
    // guaranteed by construction; matching the exact pair set then asserts
    // only banding RECALL, which is ~1 at the 0.5 threshold for this
    // banding config on near-dup corpora (recall law in ApproxOpsSpec)
    "q_minhash_cands" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |AND (CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |  ELSE 1.0 END) >= 0.5""".stripMargin,

    "q_dedup_minhash" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents))
        |SELECT doc_id FROM documents WHERE doc_id NOT IN (
        |  SELECT b.doc_id FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |  AND (CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    ELSE 1.0 END) >= 0.5)""".stripMargin,

    "q_dedup_embedding_lsh" ->
      """SELECT e.vec_id FROM embeddings e WHERE NOT EXISTS (
        |  SELECT 1 FROM embeddings o WHERE o.vec_id < e.vec_id
        |  AND list_cosine_similarity(o.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= 0.95)""".stripMargin,

    // first-occurrence ranking over literal 8-gram strings; Spark ranks
    // over xxhash64 of the same gram (position sets identical absent a
    // 64-bit collision)
    "q_exact_substr" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, i AS pos, array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |  FROM t, UNNEST(range(1, greatest(len(toks) - 6, 1))) AS u(i)),
        |flagged AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |    FROM w) WHERE rn > 1),
        |cover AS (
        |  SELECT DISTINCT f.doc_id, r.j
        |  FROM flagged f, UNNEST(range(f.pos, f.pos + 8)) AS r(j)),
        |tok AS (
        |  SELECT doc_id, toks[i] AS tok, i
        |  FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
        |kept AS (
        |  SELECT k.doc_id, k.tok, k.i
        |  FROM tok k LEFT JOIN cover c ON k.doc_id = c.doc_id AND k.i = c.j
        |  WHERE c.j IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text_clean,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.text_clean, '') AS text_clean,
        |  len(t.toks) - coalesce(a.n_kept, 0) AS n_removed
        |FROM t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "q_span_incr" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE doc_id % 5 = 0),
        |ct AS (
        |  SELECT list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE doc_id % 5 != 0),
        |cg AS (
        |  SELECT DISTINCT array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |  FROM ct, UNNEST(range(1, greatest(len(toks) - 6, 1))) AS u(i)),
        |w AS (
        |  SELECT doc_id, i AS pos, array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |  FROM t, UNNEST(range(1, greatest(len(toks) - 6, 1))) AS u(i)),
        |flagged AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, gram,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |    FROM w) x
        |  WHERE rn > 1 OR gram IN (SELECT gram FROM cg)),
        |cover AS (
        |  SELECT DISTINCT f.doc_id, r.j
        |  FROM flagged f, UNNEST(range(f.pos, f.pos + 8)) AS r(j)),
        |tok AS (
        |  SELECT doc_id, toks[i] AS tok, i
        |  FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
        |kept AS (
        |  SELECT k.doc_id, k.tok, k.i
        |  FROM tok k LEFT JOIN cover c ON k.doc_id = c.doc_id AND k.i = c.j
        |  WHERE c.j IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text_clean,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.text_clean, '') AS text_clean,
        |  len(t.toks) - coalesce(a.n_kept, 0) AS n_removed
        |FROM t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "q_pipeline_spans" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, i AS pos, array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |  FROM t, UNNEST(range(1, greatest(len(toks) - 6, 1))) AS u(i)),
        |flagged AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |    FROM w) WHERE rn > 1),
        |cover AS (
        |  SELECT DISTINCT f.doc_id, r.j
        |  FROM flagged f, UNNEST(range(f.pos, f.pos + 8)) AS r(j)),
        |tok AS (
        |  SELECT doc_id, toks[i] AS tok, i
        |  FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
        |kept AS (
        |  SELECT k.doc_id, k.tok, k.i
        |  FROM tok k LEFT JOIN cover c ON k.doc_id = c.doc_id AND k.i = c.j
        |  WHERE c.j IS NULL),
        |rebuilt AS (
        |  SELECT t.doc_id, coalesce(a.text_clean, '') AS text_clean
        |  FROM t LEFT JOIN (
        |    SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text_clean
        |    FROM kept GROUP BY doc_id) a USING (doc_id))
        |SELECT min(doc_id) AS doc_id FROM rebuilt
        |WHERE len(text_clean) > 0 GROUP BY text_clean""".stripMargin,

    // reachability closure via recursive CTE: a doc is dropped iff some
    // smaller id is reachable in the exact-jaccard>=0.5 pair graph
    "q_dedup_cc" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |  AND (CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    ELSE 1.0 END) >= 0.5),
        |edges AS (SELECT ida AS s, idb AS d FROM pairs
        |  UNION SELECT idb AS s, ida AS d FROM pairs),
        |reach(s, d) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
        |SELECT doc_id FROM documents WHERE doc_id NOT IN (
        |  SELECT DISTINCT s FROM reach WHERE d < s)""".stripMargin,

    // same reachability closure; then per component (min reachable id incl
    // self) elect the winner by (length desc, id asc) and emit the full
    // doc -> canonical mapping
    "q_dedup_canonical" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |  AND (CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    ELSE 1.0 END) >= 0.5),
        |edges AS (SELECT ida AS s, idb AS d FROM pairs
        |  UNION SELECT idb AS s, ida AS d FROM pairs),
        |reach(s, d) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
        |minreach AS (SELECT s AS doc_id, min(d) AS md FROM reach GROUP BY s),
        |comp AS (
        |  SELECT d.doc_id, least(d.doc_id, coalesce(m.md, d.doc_id)) AS comp
        |  FROM documents d LEFT JOIN minreach m USING (doc_id)),
        |winner AS (
        |  SELECT comp, doc_id AS canon_id FROM (
        |    SELECT c.comp, c.doc_id,
        |      row_number() OVER (PARTITION BY c.comp
        |        ORDER BY length(d.text) DESC, c.doc_id ASC) AS rn
        |    FROM comp c JOIN documents d USING (doc_id)) WHERE rn = 1)
        |SELECT c.doc_id, w.canon_id FROM comp c JOIN winner w USING (comp)""".stripMargin,

    "q_bm25" -> bm25OracleScored,

    // takedown: the oracle IS the rebuild-without-the-deleted-docs
    // computation — N/avgdl shift and df-derived idf changes included
    "q_bm25_delete" -> (bm25OracleBaseFor("doc_id % 7 <> 3") + bm25ScoredSuffix),

    // atomic replace of a poisoned slice: serving equals BM25 over the
    // TRUE corpus verbatim — q_bm25's oracle shared
    "q_bm25_replace" -> bm25OracleScored,


    // the incremental index, the pruned stored read, and the streaming
    // ingest MUST all score identically to the full rebuild — these rows
    // share the full-rebuild oracle verbatim
    "q_bm25_incr" -> bm25OracleScored,
    "q_bm25_stored" -> bm25OracleScored,
    "q_streaming_bm25" -> bm25OracleScored,

    "q_bm25_topk" -> bm25TopKOracle,

    // WAND-lite pruning is exact (docs that cannot reach or tie into the
    // top k are never scored), so the pruned row shares the oracle verbatim
    "q_bm25_topk_pruned" -> bm25TopKOracle,

    // stored serving (pruned read + WAND pruning) is exact, so the row
    // shares the top-k oracle verbatim
    "q_bm25_topk_stored" -> bm25TopKOracle,

    // blank docs (empty shingle sets) follow the STAR contract: one
    // (min blank id, other blank id, 1.0) row per extra blank — linear,
    // transitively equivalent to the quadratic clique (Dedup.emptyDocStar)
    "q_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents)),
        |ne AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
        |emp AS (SELECT doc_id FROM sh WHERE len(s) = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        |FROM ne a, ne b WHERE a.doc_id < b.doc_id AND jaccard >= 0.5
        |UNION ALL
        |SELECT (SELECT min(doc_id) FROM emp) AS id_a, e.doc_id AS id_b,
        |  1.0 AS jaccard
        |FROM emp e WHERE e.doc_id > (SELECT min(doc_id) FROM emp)""".stripMargin,

    "q_row_index" ->
      """SELECT event_id,
        |  row_number() OVER (ORDER BY ts, event_id) - 1 AS idx
        |FROM events""".stripMargin,

    "q_pack" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(s // 512 AS BIGINT) AS seq_id,
        |  CAST(s % 512 AS BIGINT) AS seq_offset
        |FROM c""".stripMargin,

    // docwise next-fit (Packing.packDocwise): groups of 4096 tokens by
    // exclusive prefix sum, a sequential next-fit fold per group (the
    // linear-recursion CTE walks every group in lockstep), then global
    // renumbering by per-group sequence counts — the exact Scala fold
    "q_pack_docwise" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |  FROM t),
        |g AS (SELECT doc_id, n_tokens, CAST(s // 4096 AS BIGINT) AS grp,
        |    row_number() OVER (PARTITION BY s // 4096 ORDER BY s, doc_id) AS rn
        |  FROM c),
        |p AS (
        |  SELECT grp, rn, doc_id, n_tokens,
        |    CAST(0 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS off,
        |    CAST(CASE WHEN n_tokens > 512 THEN 1 ELSE 0 END AS BIGINT) AS cur,
        |    CAST(CASE WHEN n_tokens > 512 THEN 0 ELSE n_tokens END AS BIGINT) AS fill
        |  FROM g WHERE rn = 1
        |  UNION ALL
        |  SELECT g.grp, g.rn, g.doc_id, g.n_tokens,
        |    CASE WHEN g.n_tokens > 512 THEN
        |           (CASE WHEN p.fill > 0 THEN p.cur + 1 ELSE p.cur END)
        |         WHEN p.fill + g.n_tokens <= 512 THEN p.cur
        |         ELSE p.cur + 1 END AS seq,
        |    CASE WHEN g.n_tokens > 512 OR p.fill + g.n_tokens > 512 THEN 0
        |         ELSE p.fill END AS off,
        |    CASE WHEN g.n_tokens > 512 THEN
        |           (CASE WHEN p.fill > 0 THEN p.cur + 2 ELSE p.cur + 1 END)
        |         WHEN p.fill + g.n_tokens <= 512 THEN p.cur
        |         ELSE p.cur + 1 END AS cur,
        |    CASE WHEN g.n_tokens > 512 THEN 0
        |         WHEN p.fill + g.n_tokens <= 512 THEN p.fill + g.n_tokens
        |         ELSE g.n_tokens END AS fill
        |  FROM g JOIN p ON g.grp = p.grp AND g.rn = p.rn + 1),
        |u AS (SELECT grp, max(seq) + 1 AS used FROM p GROUP BY grp),
        |b AS (SELECT grp, coalesce(sum(used) OVER (ORDER BY grp
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base FROM u)
        |SELECT p.doc_id, p.n_tokens, CAST(b.base + p.seq AS BIGINT) AS seq_id,
        |  CAST(p.off AS BIGINT) AS seq_offset
        |FROM p JOIN b ON p.grp = b.grp""".stripMargin,

    "q_shared_ngrams" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |ng AS (SELECT doc_id, list_distinct(
        |    CASE WHEN len(t) >= 3 THEN
        |      list_transform(range(1, len(t) - 1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
        |    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
        |    ELSE [] END) AS s FROM toks),
        |flat AS (SELECT doc_id, unnest(s) AS g FROM ng),
        |shared AS (SELECT g FROM flat GROUP BY g HAVING count(*) >= 2),
        |cnt AS (SELECT f.doc_id, count(*) AS n_shared
        |  FROM flat f JOIN shared USING (g) GROUP BY 1)
        |SELECT c.doc_id, c.n_shared, CAST(len(ng.s) AS BIGINT) AS n_grams,
        |  round(c.n_shared / CAST(len(ng.s) AS DOUBLE), 6) AS shared_frac
        |FROM cnt c JOIN ng USING (doc_id)""".stripMargin,

    "q_boilerplate" ->
      """WITH lines AS (SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line FROM documents),
        |freq AS (SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY 1)
        |  WHERE df >= 2),
        |rem AS (SELECT coalesce(list(line), []) AS r FROM freq)
        |SELECT d.doc_id,
        |  array_to_string(list_filter(string_split(d.text, chr(10)),
        |    l -> NOT list_contains(r.r, l)), chr(10)) AS clean_text
        |FROM documents d CROSS JOIN rem r""".stripMargin,

    "q_lm_score" ->
      """WITH tok AS (SELECT unnest(
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents WHERE doc_id % 2 = 0),
        |lm AS (SELECT token,
        |    -log2(count(*) / CAST((SELECT count(*) FROM tok) AS DOUBLE)) AS logp
        |  FROM tok GROUP BY token),
        |dt AS (SELECT doc_id, unnest(
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents WHERE doc_id % 2 = 1)
        |SELECT d.doc_id, round(avg(coalesce(lm.logp, 24.0)), 6) AS surprisal
        |FROM dt d LEFT JOIN lm ON d.token = lm.token GROUP BY 1""".stripMargin,

    "q_lm_score_bigram" ->
      """WITH ct AS (SELECT list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents WHERE doc_id % 2 = 0),
        |cbg AS (SELECT unnest(list_transform(range(1, len(t)),
        |    i -> {'p': t[i], 'w': t[i+1]})) AS bg
        |  FROM ct WHERE len(t) >= 2),
        |bgc AS (SELECT bg.p AS p, bg.w AS w, count(*) AS c FROM cbg GROUP BY 1, 2),
        |ctx AS (SELECT p, sum(c) AS n FROM bgc GROUP BY 1),
        |lm AS (SELECT bgc.p, bgc.w, -log2(c / CAST(n AS DOUBLE)) AS logp
        |  FROM bgc JOIN ctx ON bgc.p = ctx.p),
        |dbg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> {'p': t[i], 'w': t[i+1]})) AS bg
        |  FROM (SELECT doc_id, list_filter(
        |      string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |    FROM documents WHERE doc_id % 2 = 1)
        |  WHERE len(t) >= 2)
        |SELECT d.doc_id, round(avg(coalesce(lm.logp, 24.0)), 6) AS surprisal
        |FROM dbg d LEFT JOIN lm ON d.bg.p = lm.p AND d.bg.w = lm.w
        |GROUP BY 1""".stripMargin,

    // stage thresholds chosen so every stage drops documents at sf0.01;
    // near-dup stage leans on the same banding-recall argument as
    // q_minhash_cands (survivor pairs are a subset of the all-pairs set)
    "q_pipeline" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 != 0),
        |feat AS (SELECT doc_id, text,
        |  length(text) AS n_chars,
        |  CASE WHEN len(toks_l) > 0 THEN
        |    CAST(len(list_filter(toks_l, x -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','are','was','for','on',
        |       'with','as','at','by','it','be','this','that'], x))) AS DOUBLE) / len(toks_l)
        |    ELSE 0.0 END AS stop_ratio,
        |  CASE WHEN len(bg) > 0 THEN
        |    (len(bg) - len(list_distinct(bg))) / CAST(len(bg) AS DOUBLE)
        |    ELSE 0.0 END AS dup_bg
        |  FROM (SELECT doc_id, text, toks_l,
        |    CASE WHEN len(toks_l) >= 2 THEN
        |      list_transform(range(1, len(toks_l)), i -> concat_ws(' ', toks_l[i], toks_l[i+1]))
        |    WHEN len(toks_l) > 0 THEN [array_to_string(toks_l, ' ')]
        |    ELSE [] END AS bg
        |    FROM (SELECT doc_id, text,
        |      list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks_l
        |      FROM corpus))),
        |q AS (SELECT doc_id, text FROM feat
        |  WHERE n_chars >= 150 AND stop_ratio >= 0.02 AND dup_bg <= 0.08),
        |e AS (SELECT doc_id, text FROM q
        |  WHERE doc_id = (SELECT min(q2.doc_id) FROM q q2 WHERE q2.text = q.text)),
        |sh AS (SELECT doc_id, list_distinct(
        |    CASE WHEN len(t) >= 3 THEN
        |      list_transform(range(1, len(t) - 1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
        |    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |    FROM e)),
        |nd AS (SELECT a.doc_id, a.s FROM sh a WHERE NOT EXISTS (
        |  SELECT 1 FROM sh b WHERE b.doc_id < a.doc_id
        |  AND CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    ELSE 1.0 END >= 0.5)),
        |bench AS (SELECT DISTINCT unnest(s) AS g FROM (
        |  SELECT list_distinct(
        |    CASE WHEN len(t) >= 3 THEN
        |      list_transform(range(1, len(t) - 1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
        |    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |    FROM documents WHERE doc_id % 20 = 0))),
        |cont AS (SELECT doc_id FROM (
        |    SELECT d.doc_id, count(*) AS ov
        |    FROM (SELECT doc_id, unnest(s) AS g FROM nd) d
        |    JOIN bench b ON d.g = b.g GROUP BY 1)
        |  WHERE ov >= 5),
        |final AS (SELECT nd.doc_id,
        |    CAST(concat('0x', substr(md5(CAST(nd.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |      / 4294967296.0 AS u,
        |    CAST(concat('0x', substr(md5(CAST(nd.doc_id AS VARCHAR) || ':sample'), 1, 8)) AS UBIGINT)
        |      / 4294967296.0 AS us
        |  FROM nd WHERE nd.doc_id NOT IN (SELECT doc_id FROM cont))
        |SELECT doc_id,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        |FROM final WHERE us < 0.9""".stripMargin,

    "q_dedup_incr_exact" ->
      """WITH newb AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
        |keep AS (SELECT min(doc_id) AS doc_id, text FROM newb GROUP BY text)
        |SELECT doc_id FROM keep WHERE NOT EXISTS (
        |  SELECT 1 FROM documents c WHERE c.doc_id % 5 != 0 AND c.text = keep.text)""".stripMargin,

    // Bloom pre-filter never drops a true dup (no false negatives) and
    // false positives are removed by the verification anti-join, so the
    // result is exactly exactAgainst's
    "q_dedup_incr_bloom" ->
      """WITH newb AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
        |keep AS (SELECT min(doc_id) AS doc_id, text FROM newb GROUP BY text)
        |SELECT doc_id FROM keep WHERE NOT EXISTS (
        |  SELECT 1 FROM documents c WHERE c.doc_id % 5 != 0 AND c.text = keep.text)""".stripMargin,

    // same recall argument as q_minhash_cands: the verified stage matches
    // the exact cross-pair set because banding recall is ~1 at 0.5 here
    "q_dedup_incr_minhash" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents))
        |SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
        |  round(CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    ELSE 1.0 END, 6) AS jaccard
        |FROM sh a, sh b
        |WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0 AND jaccard >= 0.5""".stripMargin,

    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |ng AS (SELECT doc_id, list_distinct(
        |    CASE WHEN len(t) >= 3 THEN
        |      list_transform(range(1, len(t) - 1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
        |    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
        |    ELSE [] END) AS s FROM toks),
        |bench AS (SELECT DISTINCT unnest(s) AS g FROM ng WHERE doc_id % 20 = 0),
        |docng AS (SELECT doc_id, unnest(s) AS g FROM ng WHERE doc_id % 20 != 0)
        |SELECT d.doc_id, count(*) AS n_overlap
        |FROM docng d JOIN bench b ON d.g = b.g
        |GROUP BY 1 HAVING count(*) >= 5""".stripMargin,

    "q_repetition" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |ng AS (SELECT doc_id,
        |    CASE WHEN len(t) >= 2 THEN
        |      list_transform(range(1, len(t)), i -> concat_ws(' ', t[i], t[i+1]))
        |    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
        |    ELSE [] END AS s FROM toks),
        |ln AS (SELECT doc_id,
        |    list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0) AS ls
        |  FROM documents)
        |SELECT ng.doc_id,
        |  round(CASE WHEN len(ls) > 0 THEN
        |    (len(ls) - len(list_distinct(ls))) / CAST(len(ls) AS DOUBLE)
        |    ELSE 0.0 END, 6) AS dup_line_frac,
        |  round(CASE WHEN len(s) > 0 THEN
        |    (len(s) - len(list_distinct(s))) / CAST(len(s) AS DOUBLE)
        |    ELSE 0.0 END, 6) AS dup_bigram_frac,
        |  round(CASE WHEN len(s) > 0 THEN
        |    list_max(list_transform(list_distinct(s),
        |      g -> len(list_filter(s, x -> x = g)))) / CAST(len(s) AS DOUBLE)
        |    ELSE 0.0 END, 6) AS top_bigram_frac
        |FROM ng JOIN ln ON ng.doc_id = ln.doc_id""".stripMargin,

    "q_redact" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'
        |    || CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || repeat(' ip 8.8.8.8', CAST(doc_id % 3 AS INT)) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        |    '(\+\d{1,3}[-. ]?(\(\d{3}\)|\d{3})|\b\d{1,3}[-. ]?(\(\d{3}\)|\d{3})|\(\d{3}\)|\b\d{3})[-. ]?\d{3}[-. ]?\d{4}\b', '<PHONE>', 'g') AS clean,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |  len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
        |  len(regexp_extract_all(t,
        |    '(\+\d{1,3}[-. ]?(\(\d{3}\)|\d{3})|\b\d{1,3}[-. ]?(\(\d{3}\)|\d{3})|\(\d{3}\)|\b\d{3})[-. ]?\d{3}[-. ]?\d{4}\b')) AS n_phone
        |FROM p""".stripMargin,

    "q_sample_stratified" ->
      """SELECT event_id, event_type FROM events
        |WHERE CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |    / 4294967296.0
        |  < CASE event_type WHEN 'purchase' THEN 0.5 WHEN 'click' THEN 0.05
        |    WHEN 'view' THEN 0.2 ELSE 0.01 END""".stripMargin,

    "q_sample_mixture" ->
      """WITH c AS (SELECT lang AS s, count(*) AS n FROM documents GROUP BY 1),
        |r AS (SELECT s, least(1.0, CAST(300 AS DOUBLE) * w / n) AS rate FROM (
        |    SELECT s, n, CASE s WHEN 'en' THEN CAST(0.5 AS DOUBLE)
        |      WHEN 'fr' THEN CAST(0.2 AS DOUBLE) WHEN 'de' THEN CAST(0.2 AS DOUBLE)
        |      WHEN 'es' THEN CAST(0.1 AS DOUBLE) ELSE 0 END AS w FROM c)
        |  WHERE w > 0)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN r ON d.lang = r.s
        |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |    / 4294967296.0 < r.rate""".stripMargin,

    "q_sample_quota" ->
      """SELECT event_id, event_type FROM (
        |  SELECT event_id, event_type,
        |    row_number() OVER (PARTITION BY event_type ORDER BY
        |      CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |        / 4294967296.0,
        |      CAST(event_id AS VARCHAR)) AS rn
        |  FROM events) WHERE rn <= 150""".stripMargin,

    "q_split" ->
      """SELECT event_id,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT event_id,
        |  CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |    / 4294967296.0 AS u
        |FROM events)""".stripMargin,

    "q_vocab_coverage" ->
      """WITH f AS (SELECT word, count(*) AS n FROM (
        |    SELECT unnest(list_filter(
        |      string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS word
        |    FROM documents) GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM f),
        |c AS (SELECT word, n, coalesce(sum(n) OVER (ORDER BY n DESC, word ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef FROM f)
        |SELECT word, n FROM c, t
        |WHERE CAST(bef AS DOUBLE) < 0.8 * CAST(total AS DOUBLE)""".stripMargin,

    "q_hybrid_rrf" -> hybridRrfOracle,

    // the stored serving composition is exact, so it shares q_hybrid_rrf's
    // oracle verbatim (same rankers, same fusion arithmetic)
    "q_hybrid_stored" -> hybridRrfOracle,

    "q_fold_assign" ->
      """SELECT doc_id, CAST(floor(
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |    / 4294967296.0 * 5) AS INT) AS fold
        |FROM documents""".stripMargin,

    "q_sample_weighted" ->
      """SELECT doc_id, w FROM (
        |  SELECT doc_id, w, row_number() OVER (ORDER BY
        |      pow(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |        / 4294967296.0, 1.0 / CAST(w AS DOUBLE)) DESC,
        |      doc_id ASC) AS rn
        |  FROM (SELECT doc_id, length(text) AS w FROM documents WHERE length(text) > 0))
        |WHERE rn <= 200""".stripMargin,

    "q_epoch_shuffle" ->
      """SELECT doc_id, row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':7'), doc_id) - 1 AS pos
        |FROM documents""".stripMargin,

    "q_shard_assign" ->
      """WITH p AS (SELECT doc_id, row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':3'), doc_id) - 1 AS pos
        |  FROM documents)
        |SELECT doc_id, CAST(pos % 8 AS INT) AS shard, pos // 8 AS ord
        |FROM p""".stripMargin,

    "q_nb_classifier" -> nbClassifierOracle,

    // merged-counts model ≡ full-retrain model bit-for-bit (integer count
    // semigroup), so the incremental row shares the oracle verbatim
    "q_nb_incr" -> nbClassifierOracle,

    // 3-micro-batch streamed counts sum to the same integers, same model
    "q_streaming_nb" -> nbClassifierOracle,

    // parquet round-trips the model doubles bit-exactly: stored ≡ memory
    "q_nb_stored" -> nbClassifierOracle,

    "q_lm_score_backoff" ->
      """WITH ct AS (SELECT list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents WHERE doc_id % 2 = 0),
        |tg AS (SELECT g.p2 AS p2, g.p1 AS p1, g.w AS w, count(*) AS c3 FROM (
        |    SELECT unnest(list_transform(range(1, len(t) - 1),
        |      i -> {'p2': t[i], 'p1': t[i+1], 'w': t[i+2]})) AS g
        |    FROM ct WHERE len(t) >= 3) GROUP BY 1, 2, 3),
        |bg AS (SELECT bgp.prev AS prev, bgp.token AS token, count(*) AS c2 FROM (
        |    SELECT unnest(list_transform(range(1, len(t)),
        |      i -> {'prev': t[i], 'token': t[i+1]})) AS bgp
        |    FROM ct WHERE len(t) >= 2) GROUP BY 1, 2),
        |c1t AS (SELECT token, count(*) AS c1 FROM (
        |    SELECT unnest(t) AS token FROM ct) GROUP BY 1),
        |tot AS (SELECT sum(c1) AS N FROM c1t),
        |dpos AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |      i -> {'p2': t[i], 'p1': t[i+1], 'w': t[i+2]})) AS g
        |  FROM (SELECT doc_id, list_filter(
        |      string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |    FROM documents WHERE doc_id % 2 = 1) WHERE len(t) >= 3),
        |sp AS (SELECT d.doc_id,
        |    CASE WHEN tg.c3 IS NOT NULL THEN -log2(tg.c3 / CAST(bctx.c2 AS DOUBLE))
        |      WHEN b2.c2 IS NOT NULL THEN -log2(0.4 * (b2.c2 / CAST(cc.c1 AS DOUBLE)))
        |      WHEN cw.c1 IS NOT NULL THEN -log2(0.16 * (cw.c1 / CAST(tot.N AS DOUBLE)))
        |      ELSE 24.0 END AS surp
        |  FROM dpos d
        |  LEFT JOIN tg ON d.g.p2 = tg.p2 AND d.g.p1 = tg.p1 AND d.g.w = tg.w
        |  LEFT JOIN bg bctx ON d.g.p2 = bctx.prev AND d.g.p1 = bctx.token
        |  LEFT JOIN bg b2 ON d.g.p1 = b2.prev AND d.g.w = b2.token
        |  LEFT JOIN c1t cc ON d.g.p1 = cc.token
        |  LEFT JOIN c1t cw ON d.g.w = cw.token
        |  CROSS JOIN tot)
        |SELECT doc.doc_id, round(coalesce(s.m, 24.0), 6) AS surprisal
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) doc
        |LEFT JOIN (SELECT doc_id, avg(surp) AS m FROM sp GROUP BY 1) s
        |  ON doc.doc_id = s.doc_id""".stripMargin,

    "q_chunk" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |c AS (SELECT doc_id, t, len(t) AS n,
        |    CASE WHEN len(t) = 0 THEN 0 WHEN len(t) <= 32 THEN 1
        |      ELSE (len(t) - 32 + 24 - 1) // 24 + 1 END AS nc
        |  FROM d)
        |SELECT doc_id, CAST(i AS INT) AS chunk_id,
        |  CAST(len(list_slice(t, i * 24 + 1, least(i * 24 + 32, n))) AS INT)
        |    AS n_tokens,
        |  array_to_string(list_slice(t, i * 24 + 1, least(i * 24 + 32, n)), ' ')
        |    AS chunk_text
        |FROM c, unnest(range(nc)) AS u(i)""".stripMargin,

    "q_corpus_stats" -> corpusStatsOracle,

    // per-batch aggregates merge by key-wise integer sums, so the
    // streamed state equals the batch aggregation exactly
    "q_streaming_corpus_stats" -> corpusStatsOracle,

    // composition row: corpus size is the SQL-exact check; the packing/
    // sharding invariants are Spark-computed TRUE booleans (established
    // q_semdedup_hier pattern — each stage is fully oracled on its own)
    "q_export_pipeline" ->
      """SELECT count(*) AS n_docs, TRUE AS packed_all, TRUE AS budget_ok,
        |  TRUE AS ranks_balanced, TRUE AS ords_contiguous
        |FROM documents""".stripMargin,

    "q_embed_quant" ->
      """WITH m AS (SELECT vec_id, embedding,
        |    CAST(list_aggregate(list_transform(embedding,
        |      y -> abs(CAST(y AS DOUBLE))), 'max') AS DOUBLE) AS m
        |  FROM embeddings),
        |c AS (SELECT vec_id, m,
        |  CASE WHEN m > 0 THEN list_transform(embedding,
        |      y -> CAST(round(CAST(y AS DOUBLE) * 127.0 / m) AS TINYINT))
        |    ELSE list_transform(embedding, y -> CAST(0 AS TINYINT)) END AS codes
        |  FROM m)
        |SELECT vec_id,
        |  md5(array_to_string(list_transform(codes,
        |    x -> CAST(x AS VARCHAR)), ',')) AS codes_digest,
        |  round(m, 6) AS scale
        |FROM c""".stripMargin,

    // the on-disk shard layout reads back to exactly the seed-3/W=8
    // assignment, so the export row shares q_shard_assign's oracle
    "q_shard_export" ->
      """WITH p AS (SELECT doc_id, row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':3'), doc_id) - 1 AS pos
        |  FROM documents)
        |SELECT doc_id, CAST(pos % 8 AS INT) AS shard, pos // 8 AS ord
        |FROM p""".stripMargin,

    "q_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source FROM documents",

    "q_csv_roundtrip" ->
      "SELECT doc_id, text, lang, source FROM documents",

    // mirrors Scoring.naiveBayesMulti* literally: same Laplace lns, same
    // coalesce(sum) empty-doc handling, same (score desc, cls asc) argmax
    "q_langid_trained" ->
      """WITH lab AS (SELECT lang AS cls, lower(text) AS t
        |  FROM documents WHERE doc_id % 2 = 0),
        |tok AS (SELECT cls, unnest(
        |    list_filter(string_split_regex(t, '\s+'), x -> len(x) > 0)) AS token
        |  FROM lab),
        |ptc AS (SELECT token, cls, count(*) AS c FROM tok GROUP BY 1, 2),
        |nc AS (SELECT cls, sum(c) AS n FROM ptc GROUP BY 1),
        |v AS (SELECT count(DISTINCT token) AS v FROM ptc),
        |dcl AS (SELECT cls, count(*) AS d FROM lab GROUP BY 1),
        |dt AS (SELECT count(*) AS dt FROM lab),
        |cls AS (SELECT nc.cls,
        |    ln(CAST(dcl.d AS DOUBLE)) - ln(CAST(dt.dt AS DOUBLE)) AS prior,
        |    ln(1.0 / CAST(nc.n + v.v AS DOUBLE)) AS unk
        |  FROM nc JOIN dcl ON nc.cls = dcl.cls, v, dt),
        |lp AS (SELECT ptc.token, ptc.cls,
        |    ln(CAST(ptc.c + 1 AS DOUBLE) / CAST(nc.n + v.v AS DOUBLE)) AS logp
        |  FROM ptc JOIN nc ON ptc.cls = nc.cls, v),
        |docs2 AS (SELECT doc_id, lower(text) AS t
        |  FROM documents WHERE doc_id % 2 = 1),
        |dtok AS (SELECT doc_id, unnest(
        |    list_filter(string_split_regex(t, '\s+'), x -> len(x) > 0)) AS token
        |  FROM docs2),
        |base AS (SELECT d.doc_id, t.token FROM docs2 d
        |  LEFT JOIN dtok t ON d.doc_id = t.doc_id),
        |scored AS (SELECT b.doc_id, c.cls,
        |    min(c.prior) + coalesce(sum(CASE WHEN b.token IS NOT NULL
        |      THEN coalesce(lp.logp, c.unk) ELSE 0 END), 0) AS score
        |  FROM base b CROSS JOIN cls c
        |  LEFT JOIN lp ON lp.token = b.token AND lp.cls = c.cls
        |  GROUP BY 1, 2)
        |SELECT doc_id, cls AS pred_lang, round(score, 6) AS score
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, cls) AS rn FROM scored)
        |WHERE rn = 1""".stripMargin,

    "q_dedup_embedding" ->
      """SELECT e.vec_id FROM embeddings e WHERE NOT EXISTS (
        |  SELECT 1 FROM embeddings o WHERE o.vec_id < e.vec_id
        |  AND list_cosine_similarity(o.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= 0.95)""".stripMargin,

    "q_semdedup" ->
      """SELECT e.vec_id FROM embeddings e WHERE NOT EXISTS (
        |  SELECT 1 FROM embeddings o WHERE o.vec_id < e.vec_id
        |  AND list_cosine_similarity(o.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= 0.9)""".stripMargin,

    // production-k SemDeDup through the two-level coarse quantizer: the
    // corpus size is the genuine SQL check; the three booleans are
    // Spark-computed invariants (survivor containment, exhaustive-subset,
    // assignment agreement — see the queries entry)
    "q_semdedup_hier" ->
      """SELECT count(*) AS n_vecs, TRUE AS survivors_within_corpus,
        |  TRUE AS exact_kept_subset, TRUE AS agreement_ok, TRUE AS gap_ok
        |FROM embeddings""".stripMargin,

    "q_ann_brute" -> {
      val qvec = Array.tabulate(64)(i => math.sin(i + 1.0)).mkString("[", ", ", "]")
      s"""SELECT vec_id,
         |  round(list_cosine_similarity(embedding::DOUBLE[], $qvec::DOUBLE[]), 6) AS cosine_sim
         |FROM embeddings ORDER BY cosine_sim DESC, vec_id LIMIT 10""".stripMargin
    },

    "q_ann_ivf" ->
      """SELECT q_id, vec_id, cosine_sim FROM (
        |  SELECT q.vec_id AS q_id, e.vec_id,
        |    round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cosine_sim,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) DESC,
        |        e.vec_id) AS rn
        |  FROM embeddings e, embeddings q WHERE q.vec_id < 3) WHERE rn <= 5""".stripMargin,

    // planted-needle invariants (see the matching queries): the result
    // identity of an approximate index is engine-specific, but k rows
    // returned / all-distinct / needle-found are deterministic TRUE-column
    // facts, like q_hll's estimate-within-envelope row
    "q_ann_pq" ->
      """SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_ids,
        |  TRUE AS needle_found""".stripMargin,

    // each LSH query vector is a table row: it shares its own bucket, so
    // the self-hit at cosine 1.0 is deterministic
    "q_ann_lsh" ->
      """SELECT vec_id AS q_id, TRUE AS self_found, TRUE AS k_ok
        |FROM embeddings WHERE vec_id < 3""".stripMargin,

    // int8 preselect + exact re-rank: corpus size is the SQL check;
    // recall@10 vs brute and the k contract are Spark-computed in-row
    "q_ann_int8" ->
      """SELECT count(*) AS n_vecs, TRUE AS recall_ok, TRUE AS k_ok
        |FROM embeddings""".stripMargin,

    // the stored serving split returns EXACTLY the in-memory int8 rows
    // (same quantization + re-rank), so same_as_mem is a hard TRUE pin
    "q_ann_int8_stored" ->
      """SELECT count(*) AS n_vecs, TRUE AS recall_ok, TRUE AS k_ok,
        |  TRUE AS same_as_mem
        |FROM embeddings""".stripMargin,

    // takedown: invariants computed against the RETAINED corpus;
    // same_as_mem pins exact equality to the in-memory int8TopK over it
    "q_ann_delete" ->
      """SELECT count(*) AS n_vecs, TRUE AS recall_ok, TRUE AS k_ok,
        |  TRUE AS same_as_mem
        |FROM embeddings WHERE vec_id % 5 <> 2""".stripMargin,

    // atomic upsert correction: invariants against the FULL true corpus
    "q_ann_replace" ->
      """SELECT count(*) AS n_vecs, TRUE AS recall_ok, TRUE AS k_ok,
        |  TRUE AS same_as_mem
        |FROM embeddings""".stripMargin,

    // stored IVF lifecycle: n_vecs is the live corpus after the %7==3
    // takedown and the %11==0 fresh-id append; full-probe serve equals
    // the in-memory int8 path exactly, partition pruning and the pruned
    // k contract are hard TRUE pins audited in-row
    "q_ann_ivf_stored" ->
      """SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id % 7 <> 3)
        |  + (SELECT count(*) FROM embeddings WHERE vec_id % 11 = 0) AS BIGINT)
        |  AS n_vecs,
        |  TRUE AS recall_ok, TRUE AS k_ok, TRUE AS same_as_mem,
        |  TRUE AS prune_files_ok, TRUE AS pruned_k_ok""".stripMargin,

    // stored IVF-PQ lifecycle: n_vecs is the live corpus after the %7==3
    // takedown, the %11==0 fresh-id append, and the planted needle;
    // model-equality, needle, pruning, and the k contract are hard TRUE
    // pins audited in-row
    "q_ann_ivfpq_stored" ->
      """SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id % 7 <> 3)
        |  + (SELECT count(*) FROM embeddings WHERE vec_id % 11 = 0)
        |  + 1 AS BIGINT) AS n_vecs,
        |  TRUE AS same_as_mem, TRUE AS needle_ok,
        |  TRUE AS prune_files_ok, TRUE AS pruned_k_ok""".stripMargin,

    // MMR diversity re-rank: lambda-1-equals-top-k, first-pick, and
    // duplicate-never-second are theorems computed in-row over the
    // planted-copy candidate set
    "q_ann_mmr" ->
      """SELECT CAST(10 AS BIGINT) AS k_rows, TRUE AS first_is_copy,
        |  TRUE AS dup_not_second, TRUE AS lambda1_equals_topk,
        |  TRUE AS distinct_ok""".stripMargin,

    // the flat int8 tier's query-TABLE serve: one resolve + one codes
    // scan amortized across the table; self-hit, k contract, and exact
    // equality to the single-query loop are hard pins audited in-row
    "q_ann_int8_join" ->
      """SELECT CAST(vec_id AS BIGINT) AS q_id, TRUE AS self_found,
        |  TRUE AS k_ok, TRUE AS same_as_loop
        |FROM embeddings WHERE vec_id < 3""".stripMargin,

    // streaming IVF-PQ ingest: residuals encoded against the frozen
    // offline-trained model inside the writer lock; after the cadence
    // fold the full-probe serve equals the in-memory same-model path
    // exactly (identical codes -> identical ADC ranks -> identical
    // re-rank)
    "q_streaming_ivfpq" ->
      """SELECT count(*) AS n_vecs, TRUE AS same_as_mem, TRUE AS k_ok
        |FROM embeddings""".stripMargin,

    // query-TABLE serving over the stored IVF tier: every query is a
    // corpus row (self-hit at rank 1, cosine 1.0), the per-query k
    // contract holds, per-query equality to the single-query loop and
    // the union-of-probes pruning are hard TRUE pins audited in-row
    "q_ann_ivf_join" ->
      """SELECT CAST(vec_id AS BIGINT) AS q_id, TRUE AS self_found,
        |  TRUE AS k_ok, TRUE AS same_as_loop, TRUE AS prune_files_ok
        |FROM embeddings WHERE vec_id < 3""".stripMargin,

    // the same shape over the stored IVF-PQ tier (ADC scoring against
    // broadcast per-query lookup tables); the self-hit pin rides the
    // PLANTED needle query (vec_id = -1, in the store and the query
    // table) — a theorem by the q_ann_pq margin, where a natural row's
    // self-survival through the ADC cut is data (r18 advice)
    "q_ann_ivfpq_join" ->
      """SELECT CAST(vec_id AS BIGINT) AS q_id, TRUE AS k_ok,
        |  TRUE AS needle_self_found, TRUE AS same_as_loop,
        |  TRUE AS prune_files_ok
        |FROM embeddings WHERE vec_id < 3
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), TRUE, TRUE, TRUE, TRUE""".stripMargin,

    // frozen-model drift observability: occupied_rows is the corpus plus
    // the skewed fresh-id append (half the corpus re-pointed at one
    // direction); the clean/skewed warning flips and the compaction-
    // carried appended-mass fraction are hard pins computed in-row
    "q_ivf_drift" ->
      """SELECT CAST(16 AS INT) AS n_cells,
        |  CAST((SELECT count(*) FROM embeddings)
        |    + (SELECT count(*) FROM embeddings WHERE vec_id % 2 = 0)
        |    AS BIGINT) AS occupied_rows,
        |  TRUE AS clean_frac_zero, TRUE AS skew_cell_ok, TRUE AS warn_skewed,
        |  TRUE AS frac_ok, TRUE AS frac_survives_compact""".stripMargin,

    // streaming IVF ingest: micro-batch appends assign against the
    // offline-trained frozen centroids; after the cadence fold the
    // full-probe serve equals the one-shot in-memory int8 path exactly
    "q_streaming_ivf" ->
      """SELECT count(*) AS n_vecs, TRUE AS recall_ok, TRUE AS k_ok,
        |  TRUE AS same_as_mem
        |FROM embeddings""".stripMargin,

    // streaming ingest + compaction are exact (per-vector rows are
    // independent), so the lifecycle row pins the same four invariants
    "q_streaming_ann" ->
      """SELECT count(*) AS n_vecs, TRUE AS recall_ok, TRUE AS k_ok,
        |  TRUE AS same_as_mem
        |FROM embeddings""".stripMargin,

    // planted script/profile extremes have pinned guesses; the corpus row
    // asserts closed-label-set containment over every real document
    "q_langid" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, TRUE AS lang_ok
        |FROM (VALUES (-1, 'en'), (-2, 'de'), (-3, 'fr'), (-4, 'es'),
        |  (-5, 'it'), (-6, 'ja'), (-7, 'ko'), (-8, 'zh'), (-9, 'ru'),
        |  (-10, 'und'), (0, '__corpus')) AS t(doc_id, lang)""".stripMargin,

    "q_ann_ivfpq" ->
      """SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_ids,
        |  TRUE AS needle_found""".stripMargin,

    // the planted exact copy of the query scores cosine 1.0 and must
    // surface from its NSW shard's beam search
    "q_ann_nsw" ->
      """SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_ids,
        |  TRUE AS needle_found""".stripMargin,

    // codes-only serving form: the needle survives graph greediness AND
    // quantization (ADC margin argument, as q_ann_pq)
    "q_ann_nsw_coded" ->
      """SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_ids,
        |  TRUE AS needle_found""".stripMargin,

    // graph takedown: the retained needle serves at 1.0, the revoked one
    // and the revoked slice never surface
    "q_nsw_delete" ->
      """SELECT CAST(10 AS BIGINT) AS k, TRUE AS retained_needle,
        |  FALSE AS served_deleted""".stripMargin,

    // stored-graph takedown: one marks-only segment (asserted in-row),
    // reload serves the retained needle, never the revoked slice
    "q_nsw_delete_stored" ->
      """SELECT CAST(10 AS BIGINT) AS k, TRUE AS retained_needle,
        |  FALSE AS served_deleted""".stripMargin,

    // full stored-graph lifecycle: bootstrap → takedown → append (one
    // delta segment; marks keep applying) → compaction (deltas + marks
    // folded) → serve; the appended copy ranks first, the revoked
    // original never surfaces
    "q_nsw_lifecycle_stored" ->
      """SELECT CAST(10 AS BIGINT) AS k, TRUE AS appended_first,
        |  FALSE AS served_deleted""".stripMargin,

    // O(batch) stored append: one graphdelta-only segment ≤ |batch|·(m+1)
    // rows (asserted in-row), LWW reassembly ≡ full rebuild over both days
    "q_nsw_append_stored" ->
      """SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_ids,
        |  TRUE AS needle_found, TRUE AS append_eq_rebuild""".stripMargin,

    // stored HIERARCHICAL tier lifecycle: bootstrap → takedown (one mark
    // segment) → append (one delta segment, asserted in-row) → compaction
    // (hierarchy rebuilt, one segment) → serve; the appended copy ranks
    // first, the revoked original never surfaces
    "q_hnsw_lifecycle_stored" ->
      """SELECT CAST(10 AS BIGINT) AS k, TRUE AS appended_first,
        |  FALSE AS served_deleted""".stripMargin,

    // hierarchical form: the needle surfaces through the persisted
    // multi-layer index (greedy upper-layer descent + layer-0 beam)
    "q_ann_hnsw" ->
      """SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_ids,
        |  TRUE AS needle_found""".stripMargin,

    // codes-only hierarchical serving: needle survives quantization AND
    // graph greediness through every layer
    "q_ann_hnsw_coded" ->
      """SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_ids,
        |  TRUE AS needle_found""".stripMargin,

    // hierarchical incremental maintenance: day-2 needle surfaces and the
    // append-only insert equals the full rebuild exactly
    "q_ann_hnsw_incr" ->
      """SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_ids,
        |  TRUE AS needle_found, TRUE AS insert_eq_rebuild""".stripMargin,

    // incremental maintenance: the day-2 needle surfaces from the
    // incrementally-inserted index, and the append-only insert equals the
    // full rebuild exactly (adjacency included, computed Spark-side)
    "q_ann_nsw_incr" ->
      """SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_ids,
        |  TRUE AS needle_found, TRUE AS insert_eq_rebuild""".stripMargin,

    // every planted exact copy (identical text, larger id) must be dropped:
    // hamming 0 is banding-complete at any maxHamming, smallest id survives;
    // plants sit at max(doc_id)+1+doc_id so they outrank ANY real id
    "q_dedup_simhash" ->
      """SELECT (SELECT max(doc_id) FROM documents) + 1 + doc_id AS doc_id,
        |  TRUE AS planted_dropped
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS n_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_subwords
        |FROM documents""".stripMargin,

    // replays mixtureByTokens literally: same portable uniform, same
    // (u, doc_id-as-string) order, same exclusive per-domain prefix sum,
    // same epoch inequality e*T_d + excum < budget*w/Σw (Σw = 1.0 exact)
    "q_mixture_tokens" ->
      """WITH d AS (SELECT doc_id, source,
        |    len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS n_tokens,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |      / 4294967296.0 AS u
        |  FROM documents WHERE source IN ('src1', 'src2', 'src3')),
        |w(source, wt) AS (VALUES ('src1', 0.5), ('src2', 0.25), ('src3', 0.25)),
        |c AS (SELECT d.doc_id, d.source, d.n_tokens,
        |    CAST(6000 AS DOUBLE) * wt / 1.0 AS target,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY d.source
        |      ORDER BY u, CAST(doc_id AS VARCHAR)
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excum,
        |    sum(n_tokens) OVER (PARTITION BY d.source) AS dtot
        |  FROM d JOIN w ON d.source = w.source)
        |SELECT doc_id, source, n_tokens, CAST(e.e AS INT) AS epoch
        |FROM c CROSS JOIN (SELECT unnest(range(3)) AS e) e
        |WHERE CAST(e AS DOUBLE) * CAST(dtot AS DOUBLE)
        |  + CAST(excum AS DOUBLE) < target""".stripMargin,

    "q_quality" ->
      """SELECT doc_id, length(text) AS n_chars,
        |  round(CASE WHEN len(toks) > 0 THEN
        |    CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
        |    ELSE 0.0 END, 6) AS mean_word_len,
        |  round(CASE WHEN len(toks_l) > 0 THEN
        |    CAST(len(list_filter(toks_l, x -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','are','was','for','on',
        |       'with','as','at','by','it','be','this','that'], x))) AS DOUBLE) / len(toks_l)
        |    ELSE 0.0 END, 6) AS stopword_ratio,
        |  round(CASE WHEN length(text) > 0 THEN
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text)
        |    ELSE 0.0 END, 6) AS alpha_ratio
        |FROM (SELECT doc_id, text,
        |  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks,
        |  list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks_l
        |  FROM documents)""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,

    "q_corpus_diff" ->
      """WITH oldv AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
        |newv AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN md5(o.text) IS DISTINCT FROM md5(n.text) THEN 'changed'
        |       ELSE 'same' END AS status
        |FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id""".stripMargin,

    "q_bpe" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS n_words,
        |  TRUE AS roundtrip_ok, TRUE AS bounds_ok
        |FROM documents""".stripMargin,

    "q_quality_gate" -> qualityGateOracle,
    // the salted/rescued form must equal the plain cut exactly
    "q_quality_gate_salted" -> qualityGateOracle,

    "q_multimodal" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  CAST(ceil(octet_length(encode(text)) / 1024.0) AS BIGINT) AS n_frames,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin,

    // planted gray PNGs: geometry and constant pixel value are pure
    // functions of doc_id, so the REAL ImageIO decode is fully oracled
    // (round-5dp margin analysis: every v/255 sits >= 9.8e-8 from a
    // rounding boundary vs <= 3e-8 float representation error)
    "q_multimodal_decode" ->
      """SELECT doc_id, TRUE AS decoded,
        |  8 + doc_id % 16 AS width, 4 + doc_id % 8 AS height,
        |  CAST(1 AS BIGINT) AS bands,
        |  round(CAST(doc_id % 251 AS DOUBLE) / 255, 5) AS mean_value
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin,

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_revenue" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_top_users" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id
        |ORDER BY n_events DESC, user_id LIMIT 50""".stripMargin
  )
}
