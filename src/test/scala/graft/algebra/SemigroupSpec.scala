package graft.algebra

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Algebra laws for every Semigroup instance the engine ships — mirrors the
  * reference's reliance on algebird's property-checked semigroups.
  */
class SemigroupSpec extends AnyFunSuite {

  private def associative[V](sg: Semigroup[V], gen: Random => V, name: String): Unit = {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val (a, b, c) = (gen(rnd), gen(rnd), gen(rnd))
      assert(sg.plus(sg.plus(a, b), c) == sg.plus(a, sg.plus(b, c)), s"$name associativity")
    }
  }

  private def commutativeIfDeclared[V](sg: Semigroup[V], gen: Random => V, name: String): Unit =
    if (sg.isCommutative) {
      val rnd = new Random(43)
      for (_ <- 1 to 200) {
        val (a, b) = (gen(rnd), gen(rnd))
        assert(sg.plus(a, b) == sg.plus(b, a), s"$name commutativity")
      }
    }

  test("long/int/double semigroups: associative + commutative") {
    associative[Long](Semigroup.longSemigroup, _.nextLong(1000000), "long")
    commutativeIfDeclared[Long](Semigroup.longSemigroup, _.nextLong(1000000), "long")
    associative[Int](Semigroup.intSemigroup, _.nextInt(100000), "int")
    // double assoc only holds approximately; use small ints as doubles
    associative[Double](Semigroup.doubleSemigroup, _.nextInt(1000).toDouble, "double")
  }

  test("set semigroup = union") {
    val sg = Semigroup.setSemigroup[Int]
    associative[Set[Int]](sg, r => Set.fill(r.nextInt(5))(r.nextInt(10)), "set")
    assert(sg.plus(Set(1, 2), Set(2, 3)) == Set(1, 2, 3))
  }

  test("list semigroup is concat and declared NON-commutative") {
    val sg = Semigroup.listSemigroup[Int]
    assert(!sg.isCommutative)
    associative[List[Int]](sg, r => List.fill(r.nextInt(4))(r.nextInt(10)), "list")
    assert(sg.plus(List(1), List(2)) == List(1, 2))
  }

  test("option semigroup lifts and keeps commutativity") {
    val sg = Semigroup.optionSemigroup[Long](Semigroup.longSemigroup)
    assert(sg.isCommutative)
    assert(sg.plus(Some(2L), Some(3L)) == Some(5L))
    assert(sg.plus(None, Some(3L)) == Some(3L))
    assert(sg.plus(Some(2L), None) == Some(2L))
    assert(sg.plus(None, None) == None)
  }

  test("map semigroup merges per key with value semigroup") {
    val sg = Semigroup.mapSemigroup[String, Long](Semigroup.longSemigroup)
    associative[Map[String, Long]](sg,
      r => Map.from(Seq.fill(r.nextInt(4))(s"k${r.nextInt(5)}" -> r.nextLong(100))), "map")
    assert(sg.plus(Map("a" -> 1L, "b" -> 2L), Map("b" -> 3L, "c" -> 4L)) ==
      Map("a" -> 1L, "b" -> 5L, "c" -> 4L))
  }

  test("map semigroup respects value-side NON-commutativity order") {
    // with a list value semigroup, plus(a, b) must concat a's list then b's
    val sg = Semigroup.mapSemigroup[String, List[Int]](Semigroup.listSemigroup)
    assert(!sg.isCommutative)
    val merged = sg.plus(Map("k" -> List(1)), Map("k" -> List(2), "j" -> List(9), "x" -> List(8)))
    assert(merged("k") == List(1, 2))
    // swapped sizes (bigger map on the right) must still preserve order
    val merged2 = sg.plus(Map("k" -> List(1), "j" -> List(0), "x" -> List(7)), Map("k" -> List(2)))
    assert(merged2("k") == List(1, 2))
  }

  test("tuple2 semigroup is componentwise") {
    implicit val l: Semigroup[Long] = Semigroup.longSemigroup
    val sg = Semigroup.tuple2Semigroup[Long, Long]
    assert(sg.plus((1L, 10L), (2L, 20L)) == (3L, 30L))
    assert(sg.isCommutative)
  }

  test("min/max semigroups") {
    assert(Semigroup.maxSemigroup[Long].plus(3L, 7L) == 7L)
    assert(Semigroup.minSemigroup[Long].plus(3L, 7L) == 3L)
    associative[Long](Semigroup.maxSemigroup[Long], _.nextLong(), "max")
  }

  test("lastByTime: latest write wins, left wins only when strictly later") {
    val sg = Semigroup.lastByTime[String]
    assert(sg.plus((1L, "a"), (2L, "b")) == ((2L, "b")))
    assert(sg.plus((2L, "a"), (1L, "b")) == ((2L, "a")))
    assert(sg.plus((2L, "a"), (2L, "b")) == ((2L, "b"))) // right wins ties (fold order)
    assert(!sg.isCommutative)
  }

  test("TopK semigroup: merge keeps global top-k, deterministic on ties") {
    val sg = TopK.topKSemigroup[Long]
    val a = TopK.one(3, 1.0, 10L)
    val b = TopK.one(3, 5.0, 20L)
    val c = TopK.one(3, 3.0, 30L)
    val d = TopK.one(3, 4.0, 40L)
    val merged = List(b, c, d).foldLeft(a)(sg.plus)
    assert(merged.items.map(_._2) == List(20L, 40L, 30L))
    associative[TopK[Long]](sg,
      r => TopK.one(3, r.nextInt(10).toDouble, r.nextLong(100)), "topk")
  }

  test("HLL: merge = union semantics; estimate within 5% at 10k distinct") {
    val rnd = new Random(7)
    val xs = Seq.fill(10000)(rnd.nextLong())
    val sg = HLL.hllSemigroup
    val sketch = xs.map(HLL.ofLong(_)).reduce(sg.plus)
    val est = sketch.estimate.toDouble
    assert(math.abs(est - xs.distinct.size) / xs.distinct.size < 0.05, s"estimate $est")
    // merge of halves == sketch of whole (register-wise max is exact)
    val (l, r) = xs.splitAt(5000)
    val merged = sg.plus(l.map(HLL.ofLong(_)).reduce(sg.plus), r.map(HLL.ofLong(_)).reduce(sg.plus))
    assert(merged.registers.toSeq == sketch.registers.toSeq)
  }

  test("Decayed: half-life decay and merge associativity at aligned timestamps") {
    val sg = Decayed.semigroup(halfLifeMs = 1000.0)
    val d = sg.plus(Decayed(0L, 8.0), Decayed(1000L, 0.0))
    assert(math.abs(d.value - 4.0) < 1e-9) // one half-life
    val a = Decayed(0L, 2.0); val b = Decayed(500L, 3.0); val c = Decayed(1500L, 4.0)
    val left = sg.plus(sg.plus(a, b), c); val right = sg.plus(a, sg.plus(b, c))
    assert(left.ts == right.ts && math.abs(left.value - right.value) < 1e-9)
  }

  test("sumOption: empty → None, order preserved for non-commutative") {
    assert(Semigroup.longSemigroup.sumOption(Nil) == None)
    assert(Semigroup.listSemigroup[Int].sumOption(Seq(List(1), List(2), List(3))) ==
      Some(List(1, 2, 3)))
  }

  test("QHist: exact mergeable histogram; quantile bounds always bracket the true quantile") {
    val sg = QHist.qhistSemigroup
    val rnd = new Random(46)
    val xs = Vector.fill(1000)(rnd.nextDouble() * 50 - 10)
    val w = 0.5
    associative[QHist](sg, r => QHist.of(r.nextDouble() * 50 - 10, w), "qhist")
    commutativeIfDeclared[QHist](sg, r => QHist.of(r.nextDouble() * 50 - 10, w), "qhist")
    val h = xs.map(QHist.of(_, w)).reduce(sg.plus)
    assert(h.n == xs.size)
    val sorted = xs.sorted
    for (q <- Seq(0.0, 0.01, 0.5, 0.9, 0.99, 1.0)) {
      val rank = math.max(1L, math.ceil(q * xs.size).toLong)
      val trueQ = sorted((rank - 1).toInt)
      val (lo, hi) = h.quantileBounds(q)
      assert(lo <= trueQ && trueQ < hi, s"q=$q: [$lo,$hi) misses $trueQ")
      assert(math.abs(hi - lo - w) < 1e-12) // accuracy is exactly the width
    }
  }

  test("Moments: any merge tree equals the direct two-pass formulas") {
    val rnd = new Random(44)
    val xs = Vector.fill(500)(rnd.nextDouble() * 100 - 30)
    val sg = Moments.momentsSemigroup
    // three different association orders over random split points
    val leftFold = xs.map(Moments.of).reduceLeft(sg.plus)
    val (l, r) = xs.splitAt(137)
    val pairTree = sg.plus(l.map(Moments.of).reduceLeft(sg.plus),
      r.map(Moments.of).reduceLeft(sg.plus))
    val n = xs.size.toDouble
    val mu = xs.sum / n
    val m2 = xs.map(x => math.pow(x - mu, 2)).sum
    val m3 = xs.map(x => math.pow(x - mu, 3)).sum
    val m4 = xs.map(x => math.pow(x - mu, 4)).sum
    for (m <- Seq(leftFold, pairTree)) {
      assert(m.n == xs.size)
      assert(math.abs(m.mean - mu) < 1e-9)
      assert(math.abs(m.m2 - m2) / m2 < 1e-9)
      assert(math.abs(m.m3 - m3) / math.abs(m3).max(1.0) < 1e-9)
      assert(math.abs(m.m4 - m4) / m4 < 1e-9)
      assert(math.abs(m.variance - m2 / n) < 1e-9)
      assert(math.abs(m.skewness - math.sqrt(n) * m3 / math.pow(m2, 1.5)) < 1e-9)
      assert(math.abs(m.kurtosis - (n * m4 / (m2 * m2) - 3.0)) < 1e-9)
    }
    // skewness sign tracks the tail
    val skewed = (1 to 100).map(_ => 1.0) ++ Seq(1000.0)
    val sk = skewed.map(Moments.of).reduceLeft(sg.plus)
    assert(sk.skewness > 0)
  }

  test("BF: no false negatives ever; OR-merge; fp rate near theory") {
    val sg = BF.bfSemigroup
    val inserted = (1L to 2000L).map(i => HLL.fmix64(i))
    val bf = inserted.map(BF.ofLong(_, 1 << 16, 5)).reduce(sg.plus)
    inserted.foreach(x => assert(bf.contains(x), s"false negative for $x"))
    // merge is bitwise OR, any association
    val (a, b) = inserted.splitAt(700)
    val merged = sg.plus(a.map(BF.ofLong(_, 1 << 16, 5)).reduce(sg.plus),
      b.map(BF.ofLong(_, 1 << 16, 5)).reduce(sg.plus))
    assert(merged.bits.toSeq == bf.bits.toSeq)
    // fp rate on 10k disjoint probes: theory (1-e^{-kn/m})^k ~ 2.4e-5 at
    // n=2000, m=65536, k=5; allow generous slack
    val probes = (1L to 10000L).map(i => HLL.fmix64(-i))
    val fps = probes.count(bf.contains)
    assert(fps <= 10, s"fp count $fps out of 10000")
    // fill-ratio cardinality estimate within 5%
    assert(math.abs(bf.approxSize - 2000.0) / 2000.0 < 0.05)
  }

  test("SpaceSaver: exact under capacity; eviction keeps Metwally guarantees") {
    implicit val ord: Ordering[Long] = Ordering.Long
    val sg = SpaceSaver.spaceSaverSemigroup[Long]
    val rnd = new Random(45)
    // zipfy stream over 40 items
    val stream = Vector.fill(3000)((math.pow(rnd.nextDouble(), 3) * 40).toLong)
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // capacity >= distinct => exact counts, zero error, any merge shape
    val big = stream.map(SpaceSaver.one(64, _)).reduce(sg.plus)
    assert(big.counters.size == exact.size)
    exact.foreach { case (k, c) => assert(big.counters(k) == ((c, 0L)), s"item $k") }
    // eviction regime: est >= true >= est - err for every reported item;
    // every item with true count > n/capacity must be present
    val cap = 8
    val small = stream.map(SpaceSaver.one(cap, _)).reduce(sg.plus)
    assert(small.counters.size <= cap)
    small.counters.foreach { case (k, (est, err)) =>
      val truth = exact.getOrElse(k, 0L)
      assert(est >= truth, s"under-count for $k: $est < $truth")
      assert(est - err <= truth, s"guarantee broken for $k: $est - $err > $truth")
    }
    val threshold = stream.size.toLong / cap
    exact.filter(_._2 > threshold).keys.foreach { k =>
      assert(small.counters.contains(k), s"frequent item $k evicted")
    }
    // merge order independence in the exact regime
    val (x, y) = stream.splitAt(1234)
    val viaSplit = sg.plus(x.map(SpaceSaver.one(64, _)).reduce(sg.plus),
      y.map(SpaceSaver.one(64, _)).reduce(sg.plus))
    assert(viaSplit.counters == big.counters)
  }
}
