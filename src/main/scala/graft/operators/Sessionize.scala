package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization — the classic gaps-and-islands operator an
  * events-to-training-data pipeline needs (per-entity activity sessions
  * with an inactivity gap), absent from the reference (whose aggregations
  * are batch/key-global: summingbird-core Producer.scala sumByKey) but a
  * first-class citizen of both engines here:
  *
  *  - [[sessionize]] (batch): lag + running-sum-of-starts + group — all
  *    windows PARTITIONED BY the entity, so the shuffle is one hash
  *    exchange on the key and each partition sorts only its own keys'
  *    rows; no global window, no driver-side state (plan-audited).
  *  - [[sessionizeStreaming]]: Structured Streaming's native
  *    `session_window` aggregation — merging session state per key in the
  *    state store, watermark-bounded, emitting a session once its gap
  *    closes. The gate row proves streamed sessions ≡ the batch operator
  *    on the same fed corpus.
  *
  * Tie handling: rows with equal timestamps always land in the same
  * session (gap 0), and the emitted per-session aggregates are
  * order-independent, so the operator is deterministic without a
  * tiebreak column.
  *
  * At 100 TB: sessions shuffle |events| rows once on the entity key —
  * the same shape as any keyed aggregation; session state in streaming
  * is one (key, open-session) row per active entity, evicted by the
  * watermark.
  */
object Sessionize {

  /** Batch sessionization over `(keyCol, tsCol)` rows: a new session
    * starts when the gap from the previous event of the SAME key reaches
    * `gapMs` (diff >= gapMs — the half-open `[last, last+gap)` convention
    * of Spark's `session_window`, so the batch and streaming forms agree
    * exactly). Emits one row per (key, session_seq) with session_start /
    * session_end (min/max event time) and n_events. `session_seq` is the
    * 1-based per-key session index in time order.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    df.select(col(keyCol), col(tsCol))
      .withColumn("__prev", lag(col(tsCol), 1).over(byTime))
      .withColumn("__new",
        (col("__prev").isNull || col(tsCol) - col("__prev") >= gapMs).cast("long"))
      .withColumn("session_seq", sum(col("__new")).over(byTime))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** [[sessionize]] for the hot-entity regime (a bot user carrying a
    * data-sized share of events): the plain form funnels each key's
    * whole history through one task's window sort. Here events first
    * chunk by time (`__chunk = floor(ts / chunkMs)`) so the level-1
    * windows partition by (key, chunk) — a hot key's sort parallelizes
    * across its time chunks — and level 2 runs the SAME gaps-and-islands
    * over the per-chunk sub-sessions (rows = sub-session count, smaller
    * than events by the mean events-per-(session ∩ chunk) factor).
    *
    * Exactness: chunks partition the time axis, so per key the ordered
    * concatenation of chunk event sequences is the full ordered
    * sequence; a within-chunk gap is handled at level 1, and a gap
    * between consecutive events straddling a chunk boundary is exactly
    * (next sub-session's first event − previous sub-session's last
    * event), which level 2 compares against the same half-open `>= gapMs`
    * rule — so sub-sessions merge iff the plain form would have merged
    * their events, transitively through the level-2 running sum. Same
    * associativity-chunking contract as the pre-split Summer
    * (KeyedGraftStream.sumByKeyAllTimePreSplit).
    *
    * Pick `chunkMs` well above `gapMs` (a chunk shorter than the gap
    * yields one sub-session per chunk and no level-1 reduction); the
    * default 100× keeps boundary sub-sessions rare.
    */
  def sessionizePreSplit(df: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long, chunkMs: Long = 0L): DataFrame = {
    val chunk = if (chunkMs > 0L) chunkMs else gapMs * 100L
    require(chunk >= gapMs,
      s"chunkMs ($chunk) must be >= gapMs ($gapMs) — smaller chunks cannot " +
        "contain even one gap and every sub-session escalates to level 2")
    val l1W = Window.partitionBy(col(keyCol), col("__chunk")).orderBy(col(tsCol))
    val subs = df.select(col(keyCol), col(tsCol))
      .withColumn("__chunk", floor(col(tsCol) / lit(chunk)))
      .withColumn("__prev", lag(col(tsCol), 1).over(l1W))
      .withColumn("__new",
        (col("__prev").isNull || col(tsCol) - col("__prev") >= gapMs).cast("long"))
      .withColumn("__sub", sum(col("__new")).over(l1W))
      .groupBy(col(keyCol), col("__chunk"), col("__sub"))
      .agg(min(col(tsCol)).as("__start"), max(col(tsCol)).as("__end"),
        count(lit(1)).as("__n"))
    val l2W = Window.partitionBy(col(keyCol)).orderBy(col("__start"))
    subs
      .withColumn("__prev_end", lag(col("__end"), 1).over(l2W))
      .withColumn("__new2",
        (col("__prev_end").isNull || col("__start") - col("__prev_end") >= gapMs)
          .cast("long"))
      .withColumn("session_seq", sum(col("__new2")).over(l2W))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(min(col("__start")).as("session_start"),
        max(col("__end")).as("session_end"),
        sum(col("__n")).as("n_events"))
  }

  /** Streaming sessionization via the native `session_window` aggregate:
    * `tsCol` must be a TIMESTAMP column on a streaming Dataset; sessions
    * merge in the state store as events arrive and emit (append mode)
    * once the watermark passes their close. Emits (key, session_start,
    * session_end, n_events) with the times in epoch millis, directly
    * comparable to [[sessionize]]'s columns (session_end here is the
    * LAST EVENT time, not Spark's end+gap window edge).
    */
  def sessionizeStreaming(df: DataFrame, keyCol: String, tsCol: String,
      gapMs: Long, watermark: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), s"$gapMs milliseconds"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
      .select(col(keyCol),
        (unix_millis(col("__first"))).as("session_start"),
        (unix_millis(col("__last"))).as("session_end"),
        col("n_events"))
}
