package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.algebra.{BF, CMS, HLL, Semigroup}
import graft.functions.{SketchAggregates => SK}

/** The native sketch aggregates must (a) agree bit-for-bit with the
  * semigroup value types they twin, (b) obey the sketches' mathematical
  * guarantees, and (c) be invariant to partitioning (the partial/final
  * merge is the semigroup merge).
  */
class SketchAggregatesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic pseudo-random stream: ~200 distinct items, zipfy-ish counts
  private def items: Seq[Long] =
    (1 to 5000).map(i => (HLL.fmix64(i.toLong) >>> 1) % 200)

  test("HLL aggregate registers equal the HLL semigroup's registers") {
    val ds = items.toDF("x")
    val aggRegs = ds.agg(SK.hllSketch(col("x")).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val sgRegs = items.map(HLL.ofLong(_)).reduce(HLL.hllSemigroup.plus).registers
    assert(aggRegs.toSeq == sgRegs.toSeq)
  }

  test("HLL estimate is within 5% of the true distinct count") {
    val n = 10000
    val xs = (1 to n).map(i => HLL.fmix64(i.toLong)) // n distinct values
    val est = xs.toDF("x").agg(SK.hllCountDistinct(col("x")).as("e"))
      .head().getLong(0)
    assert(math.abs(est - n.toDouble) / n < 0.05, s"estimate $est vs $n")
  }

  test("sketches are partitioning-invariant (merge = semigroup merge)") {
    val ds = items.toDF("x")
    def run(parts: Int) = ds.repartition(parts)
      .agg(SK.hllSketch(col("x")).as("h"), SK.cmsSketch(col("x")).as("c"))
      .head()
    val (one, many) = (run(1), run(7))
    assert(one.getAs[Array[Byte]]("h").toSeq == many.getAs[Array[Byte]]("h").toSeq)
    assert(one.getAs[Array[Byte]]("c").toSeq == many.getAs[Array[Byte]]("c").toSeq)
  }

  test("CMS aggregate equals the CMS semigroup and never under-counts, over-count within eps*N") {
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val packed = items.toDF("x").agg(SK.cmsSketch(col("x"), 5, 512).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val viaAgg = CMS.unpack(packed)
    val viaSg = items.map(CMS.ofLong(_, 1L, 5, 512)).reduce(CMS.cmsSemigroup.plus)
    assert(viaAgg.counts.toSeq == viaSg.counts.toSeq)
    assert(viaAgg.totalCount == items.size.toLong)
    val epsN = math.ceil(math.E / 512 * items.size).toLong
    exact.foreach { case (k, cnt) =>
      val est = CMS.estimateOfPacked(packed, k)
      assert(est >= cnt, s"under-count for $k: $est < $cnt")
      // per-item Markov bound holds with prob 1 - e^-depth; on this fixed
      // deterministic stream it holds for every item (empirical, stable)
      assert(est <= cnt + epsN, s"over-count for $k: $est > $cnt + $epsN")
    }
  }

  test("cmsEstimate/cmsTotal scalar expressions work columnar over grouped sketches") {
    val df = items.map(x => (x % 3, x)).toDF("g", "x")
    val out = df.groupBy(col("g")).agg(SK.cmsSketch(col("x")).as("sk"))
      .select(col("g"), SK.cmsEstimate(col("sk"), lit(0L)).as("est0"),
        SK.cmsTotal(col("sk")).as("n"))
      .collect()
    assert(out.map(_.getLong(2)).sum == items.size.toLong)
    out.foreach(r => assert(r.getLong(1) >= 0L))
  }

  test("null inputs are skipped, not counted") {
    val df = Seq[java.lang.Long](1L, null, 2L, null, 1L).toDF("x")
    val row = df.agg(SK.cmsSketch(col("x")).as("c"), SK.hllCountDistinct(col("x")).as("h")).head()
    assert(CMS.totalOfPacked(row.getAs[Array[Byte]]("c")) == 3L)
    assert(row.getLong(1) == 2L)
  }

  test("Bloom aggregate bits equal the BF semigroup's; partitioning-invariant") {
    val packed = items.toDF("x")
      .agg(SK.bloomFilter(col("x"), 1 << 14, 5).as("b"))
      .head().getAs[Array[Byte]]("b")
    val viaSg = items.map(BF.ofLong(_, 1 << 14, 5)).reduce(BF.bfSemigroup.plus)
    assert(BF.unpack(packed).bits.toSeq == viaSg.bits.toSeq)
    val repart = items.toDF("x").repartition(7)
      .agg(SK.bloomFilter(col("x"), 1 << 14, 5).as("b"))
      .head().getAs[Array[Byte]]("b")
    assert(repart.toSeq == packed.toSeq)
  }

  test("SpaceSaver aggregate: exact regime matches the value form; eviction keeps guarantees") {
    import graft.algebra.SpaceSaver
    // exact regime: capacity >= distinct => counts equal the semigroup fold
    val rows = items.toDF("x")
      .agg(SK.spaceSaver(col("x"), 256).as("hh"))
      .selectExpr("inline(hh)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaSg = items.map(SpaceSaver.one(256, _))
      .reduce(SpaceSaver.spaceSaverSemigroup[Long].plus)
    assert(rows.forall(_._3 == 0L))
    assert(rows.map(t => t._1 -> t._2).toMap ==
      viaSg.counters.view.mapValues(_._1).toMap)
    // descending (cnt, item-asc) order is part of the contract
    assert(rows.sortBy(t => (-t._2, t._1)).toSeq == rows.toSeq)
    // eviction regime via a tiny capacity, repartitioned (forces merges):
    // est >= true >= est - err, frequent items survive
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val small = items.toDF("x").repartition(7)
      .agg(SK.spaceSaver(col("x"), 16).as("hh"))
      .selectExpr("inline(hh)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(small.length <= 16)
    small.foreach { case (item, est, err) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est >= truth, s"under-count for $item: $est < $truth")
      assert(est - err <= truth, s"guarantee broken for $item")
    }
  }

  test("bad sketch parameters fail at construction, not per-row in executors") {
    intercept[IllegalArgumentException](SK.bloomFilter(col("x"), numBits = 0, k = 5))
    intercept[IllegalArgumentException](SK.bloomFilter(col("x"), numBits = 1 << 10, k = 0))
    intercept[IllegalArgumentException](BF.empty(numBits = -1))
  }

  test("bfContains: every inserted item probes true; absent items mostly false") {
    val df = items.toDF("x")
    val withSketch = df.distinct().crossJoin(
      df.agg(SK.bloomFilter(col("x"), 1 << 14, 5).as("b")))
    // no false negatives, asserted columnar through the scalar expression
    assert(withSketch.where(!SK.bfContains(col("b"), col("x"))).count() == 0L)
    // false-positive rate on disjoint probes stays near theory
    val probes = (1 to 5000).map(i => HLL.fmix64(-i.toLong)).toDF("x")
    val fps = probes.crossJoin(
        df.agg(SK.bloomFilter(col("x"), 1 << 14, 5).as("b")))
      .where(SK.bfContains(col("b"), col("x"))).count()
    assert(fps <= 25, s"fp count $fps out of 5000")
  }
}
