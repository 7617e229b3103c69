package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Range-join laws: bucketized equi-join + residual filter must equal
  * the naive non-equi join exactly, never duplicate a pair, honor the
  * half-open boundary, and plan WITHOUT a nested-loop/cartesian join.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val pts = {
    val s = spark; import s.implicits._
    Seq((1L, 5L, 10L), (2L, 5L, 25L), (3L, 6L, 100L), (4L, 5L, 999L),
      (5L, 7L, 0L), (6L, 5L, 24L)).toDF("pid", "puser", "p")
  }
  private lazy val ivs = {
    val s = spark; import s.implicits._
    // [10,25): contains 10, 24, not 25; [0,1000): spans many buckets;
    // [50,50): empty; [90,110): straddles a bucket edge at W=16
    Seq((100L, 5L, 10L, 25L), (200L, 5L, 0L, 1000L), (300L, 6L, 50L, 50L),
      (400L, 6L, 90L, 110L)).toDF("iid", "iuser", "s", "e")
  }

  private def naive(withKeys: Boolean) = {
    val cond0 = ivs("s") <= pts("p") && pts("p") < ivs("e")
    val cond = if (withKeys) cond0 && pts("puser") === ivs("iuser") else cond0
    pts.join(ivs, cond).select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("equals the naive non-equi join, half-open [s, e), across bucket widths") {
    for (w <- Seq(1L, 7L, 16L, 1000L, 100000L)) {
      val got = RangeJoin.pointInInterval(pts, col("p"), ivs, col("s"), col("e"),
        bucketWidth = w).select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == naive(withKeys = false), s"W=$w")
      assert(got.length == got.toSet.size, s"W=$w produced duplicate pairs")
    }
  }

  test("boundary: start inclusive, end exclusive; empty interval matches nothing") {
    val got = RangeJoin.pointInInterval(pts, col("p"), ivs, col("s"), col("e"),
      bucketWidth = 16).select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 100L)), "p=10 must match [10,25) (start inclusive)")
    assert(got.contains((6L, 100L)), "p=24 must match [10,25)")
    assert(!got.contains((2L, 100L)), "p=25 must NOT match [10,25) (end exclusive)")
    assert(!got.exists(_._2 == 300L), "empty interval [50,50) matches nothing")
  }

  test("a corrupt sentinel interval fails loudly at maxSpanBuckets, not as " +
      "an executor-side sequence allocation") {
    val s = spark; import s.implicits._
    // end = Long.MaxValue at W=16 would be a ~5.8e17-element sequence
    val poisoned = ivs.unionByName(
      Seq((500L, 5L, 0L, Long.MaxValue)).toDF("iid", "iuser", "s", "e"))
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, col("p"), poisoned, col("s"), col("e"),
        bucketWidth = 16).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxSpanBuckets")),
      s"wrong failure: ${msgs(ex).mkString(" | ")}")
    // sane intervals still pass under an explicit tight cap that the
    // widest real interval ([0,1000) at W=16 → 63 buckets) fits inside
    val got = RangeJoin.pointInInterval(pts, col("p"), ivs, col("s"), col("e"),
      bucketWidth = 16, maxSpanBuckets = 64L).select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive(withKeys = false))
  }

  test("equiKeys restrict matches to same-key pairs") {
    val got = RangeJoin.pointInInterval(pts, col("p"), ivs, col("s"), col("e"),
      bucketWidth = 16, equiKeys = Seq(col("puser") -> col("iuser")))
      .select(col("pid"), col("iid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive(withKeys = true))
    assert(!got.contains((3L, 200L)), "user-6 point must not match user-5 interval")
  }

  test("left variant: unmatched points survive with null interval columns") {
    val got = RangeJoin.pointInIntervalLeft(pts, col("p"), ivs, col("s"), col("e"),
      bucketWidth = 16, equiKeys = Seq(col("puser") -> col("iuser")))
    val byPid = got.collect().groupBy(_.getLong(0))
    // point 5 (user 7) matches nothing -> exactly one row, nulls
    assert(byPid(5L).length == 1 && byPid(5L).head.isNullAt(3))
    // matched points have NO null row
    assert(byPid(1L).forall(!_.isNullAt(3)))
    val inner = RangeJoin.pointInInterval(pts, col("p"), ivs, col("s"), col("e"),
      bucketWidth = 16, equiKeys = Seq(col("puser") -> col("iuser"))).count()
    assert(got.count() == inner + 1) // only point 5 is unmatched
  }

  private lazy val ivs2 = {
    val s = spark; import s.implicits._
    // [0,10) touches [10,25) (no overlap); [20,30) overlaps [10,25);
    // [5,995) long interval overlaps most; [40,41) tiny
    Seq((10L, 5L, 0L, 10L), (20L, 5L, 20L, 30L), (30L, 6L, 5L, 995L),
      (40L, 5L, 40L, 41L)).toDF("jid", "juser", "s2", "e2")
  }

  test("intervalOverlap equals the naive overlap join, exactly once per pair") {
    def naiveOv(withKeys: Boolean) = {
      // empty intervals overlap nothing (the naive < conditions alone
      // would vacuously match them against containing intervals)
      val cond0 = ivs("s") < ivs2("e2") && ivs2("s2") < ivs("e") &&
        ivs("e") > ivs("s") && ivs2("e2") > ivs2("s2")
      val cond = if (withKeys) cond0 && ivs("iuser") === ivs2("juser") else cond0
      ivs.join(ivs2, cond).select(col("iid"), col("jid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    for (w <- Seq(1L, 7L, 16L, 1000L)) {
      val got = RangeJoin.intervalOverlap(ivs, col("s"), col("e"),
        ivs2, col("s2"), col("e2"), bucketWidth = w)
        .select(col("iid"), col("jid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == naiveOv(withKeys = false), s"W=$w")
      assert(got.length == got.toSet.size,
        s"W=$w emitted a pair more than once: ${got.mkString(",")}")
    }
    // half-open: [0,10) and [10,25) touch but do NOT overlap
    val got16 = RangeJoin.intervalOverlap(ivs, col("s"), col("e"),
      ivs2, col("s2"), col("e2"), bucketWidth = 16)
      .select(col("iid"), col("jid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got16.contains((100L, 10L)))
    // keys restrict
    val keyed = RangeJoin.intervalOverlap(ivs, col("s"), col("e"),
      ivs2, col("s2"), col("e2"), bucketWidth = 16,
      equiKeys = Seq(col("iuser") -> col("juser")))
      .select(col("iid"), col("jid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keyed == naiveOv(withKeys = true))
  }

  test("plans as an equi join + residual filter — no nested loop, no cartesian") {
    val joined = RangeJoin.pointInInterval(pts, col("p"), ivs, col("s"), col("e"),
      bucketWidth = 16, equiKeys = Seq(col("puser") -> col("iuser")))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the naive spelling of the same query DOES nested-loop — the rewrite
    // is what removes it
    val naivePlan = pts.join(ivs, ivs("s") <= pts("p") && pts("p") < ivs("e"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
  }
}
