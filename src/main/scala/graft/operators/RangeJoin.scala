package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — "which intervals contain this
  * point": sessions × events, validity windows × observations, promo
  * windows × clicks. Spark has no native range-join operator: the naive
  * `a.join(b, a("p") >= b("s") && a("p") < b("e"))` plans as a broadcast
  * nested loop (or a cartesian product), both of which are quadratic
  * scans — a scale killer the moment neither side is tiny.
  *
  * This is the standard bucketization rewrite (the same trick behind
  * Databricks' range-join optimization and interval-join support in
  * stream processors, e.g. Flink's interval join — re-expressed on plain
  * DataFrame ops, no extension needed): pick a `bucketWidth` W in the
  * point's units,
  *
  *   - each point lands in bucket `floor(p / W)` (exactly one),
  *   - each interval [s, e) explodes to the buckets it overlaps,
  *     `floor(s/W) .. floor((e-1)/W)`,
  *   - the join is EQUI on bucket (plus any caller equi-keys, e.g. the
  *     user id), planned as a shuffled hash / sort-merge join, with the
  *     true containment `s <= p < e` as a residual post-join filter.
  *
  * Each matching (point, interval) pair meets in exactly ONE bucket (the
  * point's), so no dedup pass is needed. Cost: the interval side grows by
  * its mean span in buckets — choose W near the TYPICAL interval length
  * so most intervals explode to 1-2 rows; a pathologically long interval
  * costs span/W rows, never a cross product. Empty intervals (e <= s)
  * match nothing and are dropped before the explode; an interval wider
  * than `maxSpanBuckets` buckets (a corrupt sentinel end, or a W far
  * below the data's scale) raises a runtime error naming the span
  * instead of materializing an executor-killing sequence array.
  *
  * The reference has no interval operator (its joins are keyed lookups
  * and the time-ordered as-of, summingbird Service.scala leftJoin /
  * loopJoin); this covers the complementary containment shape. The
  * STREAMING form of the same containment is
  * [[graft.streaming.StreamingJoin.leftJoinBuffered]] — Structured
  * Streaming's native event-time range condition plays the bucket
  * rewrite's role there (state-store pruning by watermark).
  */
object RangeJoin {

  /** Default ceiling on buckets-per-interval (2^20): far above any sanely
    * configured span/W, low enough that a corrupt sentinel interval
    * (e.g. `end = Long.MaxValue`) fails with a clear message instead of
    * materializing a multi-billion-element `sequence` array that OOMs
    * the executor.
    */
  val DefaultMaxSpanBuckets: Long = 1L << 20

  /** Interval → covered-buckets explode, span-guarded: an interval
    * spanning more than `maxSpanBuckets` buckets raises a runtime error
    * naming the offending span (executor-side `raise_error`, so the scan
    * that first touches the bad row fails loudly).
    */
  private def spanGuardedBuckets(s: Column, e: Column, w: Column,
      maxSpanBuckets: Long): Column = {
    val lo = floor(s.cast("long") / w)
    val hi = floor((e.cast("long") - 1) / w)
    val span = hi - lo + 1
    explode(
      when(span <= lit(maxSpanBuckets), sequence(lo, hi))
        .otherwise(raise_error(concat_ws("",
          lit("RangeJoin: interval ["), s.cast("long").cast("string"),
          lit(", "), e.cast("long").cast("string"),
          lit(") spans "), span.cast("string"),
          lit(s" buckets > maxSpanBuckets=$maxSpanBuckets — corrupt/sentinel " +
            "interval or bucketWidth far below the interval scale")))))
  }

  /** Inner point-in-interval join. `points`/`intervals` column sets must
    * be disjoint (alias upstream if not). `equiKeys` adds equality
    * predicates (pointKey === intervalKey) into the bucket join key —
    * the usual "same user AND inside the window" shape.
    *
    * @param pt     point column on `points` (integral units: epoch
    *               millis/nanos, offsets, ...)
    * @param start  inclusive interval start on `intervals`
    * @param end    EXCLUSIVE interval end on `intervals`
    * @param bucketWidth bucket size in the same units; choose ~ the
    *               typical interval length
    */
  def pointInInterval(points: DataFrame, pt: Column,
      intervals: DataFrame, start: Column, end: Column,
      bucketWidth: Long, equiKeys: Seq[(Column, Column)] = Nil,
      maxSpanBuckets: Long = DefaultMaxSpanBuckets): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxSpanBuckets > 0, s"maxSpanBuckets must be > 0, got $maxSpanBuckets")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals share columns ${overlap.mkString(", ")} — alias them apart")
    val w = lit(bucketWidth)
    val p = points.withColumn("__rjb", floor(pt.cast("long") / w))
    val i = intervals
      .where(end.cast("long") > start.cast("long"))
      .withColumn("__rjb", spanGuardedBuckets(start, end, w, maxSpanBuckets))
    val joinCond = equiKeys.foldLeft(p("__rjb") === i("__rjb")) {
      case (acc, (pk, ik)) => acc && pk === ik
    }
    p.join(i, joinCond)
      .where(start.cast("long") <= pt.cast("long") &&
        pt.cast("long") < end.cast("long"))
      .drop("__rjb")
  }

  /** Interval-overlap join — "which intervals intersect": [s1,e1) and
    * [s2,e2) overlap iff `s1 < e2 && s2 < e1`. Same bucketization as
    * [[pointInInterval]], with the classic one-bucket-per-pair trick: an
    * overlapping pair shares every bucket in the intersection, so emit it
    * only in the FIRST bucket both cover — `max(floor(s1/W), floor(s2/W))`
    * — making the equi-join + filter emit each pair exactly once with no
    * dedup pass. Cost stays (span/W) rows per interval per side.
    */
  def intervalOverlap(left: DataFrame, lStart: Column, lEnd: Column,
      right: DataFrame, rStart: Column, rEnd: Column,
      bucketWidth: Long, equiKeys: Seq[(Column, Column)] = Nil,
      maxSpanBuckets: Long = DefaultMaxSpanBuckets): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(maxSpanBuckets > 0, s"maxSpanBuckets must be > 0, got $maxSpanBuckets")
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapCols.isEmpty,
      s"left and right share columns ${overlapCols.mkString(", ")} — alias them apart")
    val w = lit(bucketWidth)
    def exploded(df: DataFrame, s: Column, e: Column): DataFrame = df
      .where(e.cast("long") > s.cast("long"))
      .withColumn("__rjb", spanGuardedBuckets(s, e, w, maxSpanBuckets))
    val l = exploded(left, lStart, lEnd)
    val r = exploded(right, rStart, rEnd)
    val joinCond = equiKeys.foldLeft(l("__rjb") === r("__rjb")) {
      case (acc, (lk, rk)) => acc && lk === rk
    }
    l.join(r, joinCond)
      .where(lStart.cast("long") < rEnd.cast("long") &&
        rStart.cast("long") < lEnd.cast("long"))
      // first shared bucket: each overlapping pair is emitted exactly once
      .where(l("__rjb") === greatest(
        floor(lStart.cast("long") / w), floor(rStart.cast("long") / w)))
      .drop("__rjb")
  }

  /** Left variant: every point appears at least once; points inside no
    * interval carry nulls on the interval side. Same plan shape — the
    * unmatched remainder is recovered with one anti-join on the SAME
    * bucketed equi keys (never a second range scan).
    */
  def pointInIntervalLeft(points: DataFrame, pt: Column,
      intervals: DataFrame, start: Column, end: Column,
      bucketWidth: Long, equiKeys: Seq[(Column, Column)] = Nil,
      maxSpanBuckets: Long = DefaultMaxSpanBuckets): DataFrame = {
    val inner = pointInInterval(points, pt, intervals, start, end,
      bucketWidth, equiKeys, maxSpanBuckets)
    val matchedKeys = inner.select(points.columns.map(col).toIndexedSeq: _*)
    // NULL-SAFE anti-join: plain column-name equality is null-unsafe, so a
    // matched point carrying a null payload column would ALSO surface as a
    // spurious null-padded "unmatched" row
    val m = matchedKeys.toDF(points.columns.map(c => s"__m_$c").toIndexedSeq: _*)
    val antiCond = points.columns.map(c => points(c) <=> m(s"__m_$c")).reduce(_ && _)
    val unmatched = points.join(m, antiCond, "left_anti")
    val nulls = intervals.columns.foldLeft(unmatched) {
      case (df, c) => df.withColumn(c,
        lit(null).cast(intervals.schema(c).dataType))
    }
    inner.unionByName(nulls)
  }
}
