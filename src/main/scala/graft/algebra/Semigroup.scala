package graft.algebra

/** Associative merge — the single algebraic requirement the engine places on
  * aggregated values, mirroring the reference's use of algebird semigroups as
  * the value algebra of `sumByKey` (reference: summingbird-core/src/main/scala/
  * com/twitter/summingbird/Producer.scala:331-334). Re-implemented from scratch
  * (no algebird): only the instances the engine actually needs.
  *
  * `isCommutative` is a *planner hint* (reference: summingbird-core/.../option/
  * Commutativity.scala:23-48): commutative values may be hash-aggregated in any
  * order (Spark's partial/final hash agg); non-commutative values must be folded
  * in event-time order (see [[graft.batch.BatchStore]] sorted-group path).
  */
trait Semigroup[V] extends Serializable {
  def plus(a: V, b: V): V
  def isCommutative: Boolean = false
  def sumOption(items: IterableOnce[V]): Option[V] = {
    val it = items.iterator
    if (!it.hasNext) None else Some(it.reduce(plus))
  }
  /** Catalyst aggregate expression equivalent to folding `plus` over a group,
    * when one exists (e.g. `sum` for the numeric semigroups). A planner fast
    * path: `sumByKey` uses it to stay in whole-stage-codegen hash aggregation
    * instead of the typed `reduceGroups` path — at scale that is the
    * difference between a columnar partial agg and per-row deserialization.
    * Only sound for commutative instances (Spark aggregates in any order).
    */
  def columnForm: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None
}

/** Semigroup with identity. */
trait Monoid[V] extends Semigroup[V] {
  def zero: V
  def sum(items: IterableOnce[V]): V = sumOption(items).getOrElse(zero)
}

object Semigroup {
  def apply[V](implicit sg: Semigroup[V]): Semigroup[V] = sg

  def from[V](commutative: Boolean)(f: (V, V) => V): Semigroup[V] =
    new Semigroup[V] {
      def plus(a: V, b: V): V = f(a, b)
      override def isCommutative: Boolean = commutative
    }

  implicit val longSemigroup: Monoid[Long] = new Monoid[Long] {
    def zero = 0L; def plus(a: Long, b: Long) = a + b
    override def isCommutative = true
    override def columnForm = Some(c => org.apache.spark.sql.functions.sum(c))
  }
  implicit val intSemigroup: Monoid[Int] = new Monoid[Int] {
    def zero = 0; def plus(a: Int, b: Int) = a + b
    override def isCommutative = true
    // Spark widens sum(int) to long; cast back to keep the value type stable
    override def columnForm = Some(c => org.apache.spark.sql.functions.sum(c).cast("int"))
  }
  implicit val doubleSemigroup: Monoid[Double] = new Monoid[Double] {
    def zero = 0.0; def plus(a: Double, b: Double) = a + b
    override def isCommutative = true
    override def columnForm = Some(c => org.apache.spark.sql.functions.sum(c))
  }
  implicit def setSemigroup[T]: Monoid[Set[T]] = new Monoid[Set[T]] {
    def zero = Set.empty[T]; def plus(a: Set[T], b: Set[T]) = a ++ b
    override def isCommutative = true
  }
  /** List concat — deliberately NON-commutative; exercises the ordered path. */
  implicit def listSemigroup[T]: Monoid[List[T]] = new Monoid[List[T]] {
    def zero = List.empty[T]; def plus(a: List[T], b: List[T]) = a ::: b
    override def isCommutative = false
  }
  implicit def optionSemigroup[V](implicit sg: Semigroup[V]): Monoid[Option[V]] =
    new Monoid[Option[V]] {
      def zero = None
      def plus(a: Option[V], b: Option[V]) = (a, b) match {
        case (Some(x), Some(y)) => Some(sg.plus(x, y))
        case (x, None)          => x
        case (None, y)          => y
      }
      override def isCommutative = sg.isCommutative
    }
  implicit def mapSemigroup[K, V](implicit sg: Semigroup[V]): Monoid[Map[K, V]] =
    new Monoid[Map[K, V]] {
      def zero = Map.empty[K, V]
      def plus(a: Map[K, V], b: Map[K, V]): Map[K, V] = {
        // fold smaller into larger: O(min) updates
        val (big, small, swapped) = if (a.size >= b.size) (a, b, false) else (b, a, true)
        small.foldLeft(big) { case (acc, (k, v)) =>
          acc.get(k) match {
            case Some(prev) =>
              val merged = if (swapped) sg.plus(v, prev) else sg.plus(prev, v)
              acc.updated(k, merged)
            case None => acc.updated(k, v)
          }
        }
      }
      override def isCommutative = sg.isCommutative
    }
  implicit def tuple2Semigroup[A, B](implicit sa: Semigroup[A], sb: Semigroup[B]): Semigroup[(A, B)] =
    new Semigroup[(A, B)] {
      def plus(x: (A, B), y: (A, B)) = (sa.plus(x._1, y._1), sb.plus(x._2, y._2))
      override def isCommutative = sa.isCommutative && sb.isCommutative
    }

  /** min/max — commutative, idempotent. */
  def minSemigroup[V](implicit ord: Ordering[V]): Semigroup[V] =
    from(commutative = true)(ord.min)
  def maxSemigroup[V](implicit ord: Ordering[V]): Semigroup[V] =
    from(commutative = true)(ord.max)

  /** Keep the value with the greatest timestamp; left wins ties (so that when
    * folded in event-time order, "latest write wins" holds). NON-commutative
    * on ties — declared non-commutative to route through the ordered path.
    */
  def lastByTime[V]: Semigroup[(Long, V)] = new Semigroup[(Long, V)] {
    def plus(a: (Long, V), b: (Long, V)) = if (b._1 >= a._1) b else a
    override def isCommutative = false
  }
}

/** Fixed-size top-K by a score, as a Semigroup *value* — how the reference
  * expresses top-k (a value type, not an operator; SURVEY §1.3). Elements are
  * (score, item) kept in descending score order, ties broken by item ordering
  * so the merge is deterministic and effectively commutative.
  */
final case class TopK[T](k: Int, items: List[(Double, T)])
object TopK {
  def one[T](k: Int, score: Double, item: T): TopK[T] = TopK(k, List(score -> item))
  implicit def topKSemigroup[T](implicit ord: Ordering[T]): Semigroup[TopK[T]] =
    new Semigroup[TopK[T]] {
      private val pairOrd: Ordering[(Double, T)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, ord)
      def plus(a: TopK[T], b: TopK[T]): TopK[T] = {
        val k = math.max(a.k, b.k)
        TopK(k, (a.items ::: b.items).sorted(pairOrd).take(k))
      }
      override def isCommutative = true
    }
}

/** Minimal dense HyperLogLog sketch as a Semigroup value (approx distinct-count
  * as a *value type*, mirroring the reference's use of algebird HLL; SURVEY
  * §1.3). 2^p registers, max-merge; standard bias-free E = alpha*m^2/sum(2^-r)
  * with small-range linear counting correction.
  */
final case class HLL(p: Int, registers: Array[Byte]) {
  def m: Int = 1 << p
  def estimate: Long = {
    val alpha = if (m == 16) 0.673 else if (m == 32) 0.697 else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0; var zeros = 0; var i = 0
    while (i < m) { val r = registers(i) & 0xff; sum += math.pow(2.0, -r); if (r == 0) zeros += 1; i += 1 }
    val e = alpha * m * m / sum
    val corrected = if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
    math.round(corrected)
  }
}
object HLL {
  def empty(p: Int = 12): HLL = HLL(p, new Array[Byte](1 << p))
  /** Estimate straight from a register array (p is implied by its length) —
    * shared by the HLL value type and the native
    * [[graft.functions.SketchAggregates]] aggregate (also its codegen target).
    */
  def estimateOf(registers: Array[Byte]): Long =
    HLL(java.lang.Integer.numberOfTrailingZeros(registers.length), registers).estimate
  def ofLong(x: Long, p: Int = 12): HLL = {
    val h = fmix64(x)
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (p - 1))) + 1).min(64 - p).toByte
    val regs = new Array[Byte](1 << p); regs(idx) = rank; HLL(p, regs)
  }
  def ofString(s: String, p: Int = 12): HLL =
    ofLong(s.foldLeft(1125899906842597L)((h, c) => 31 * h + c), p)
  /** murmur3 finalizer — standard public-domain integer mix. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }
  implicit val hllSemigroup: Semigroup[HLL] = new Semigroup[HLL] {
    def plus(a: HLL, b: HLL): HLL = {
      require(a.p == b.p, s"HLL precision mismatch: ${a.p} vs ${b.p}")
      val out = new Array[Byte](a.m); var i = 0
      while (i < a.m) { out(i) = if ((a.registers(i) & 0xff) >= (b.registers(i) & 0xff)) a.registers(i) else b.registers(i); i += 1 }
      HLL(a.p, out)
    }
    override def isCommutative = true
  }
}

/** Count-min sketch as a Semigroup value — the reference's other workhorse
  * sketch (algebird CMS, used for heavy-hitter / frequency stores; SURVEY
  * §1.3 "anything with a Semigroup is a legal value"). depth x width count
  * matrix; merge = element-wise add (commutative); point estimate = min
  * over rows (always an over-estimate, within eps*N with prob 1-delta for
  * width=ceil(e/eps), depth=ceil(ln(1/delta))).
  */
final case class CMS(depth: Int, width: Int, totalCount: Long, counts: Array[Long]) {
  def estimate(item: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(r * width + CMS.bucket(item, r, width))
      if (c < best) best = c
      r += 1
    }
    if (best == Long.MaxValue) 0L else best
  }
}
object CMS {
  def empty(depth: Int = 5, width: Int = 512): CMS =
    CMS(depth, width, 0L, new Array[Long](depth * width))
  def ofLong(item: Long, count: Long = 1L, depth: Int = 5, width: Int = 512): CMS = {
    val counts = new Array[Long](depth * width)
    var r = 0
    while (r < depth) { counts(r * width + bucket(item, r, width)) = count; r += 1 }
    CMS(depth, width, count, counts)
  }
  def bucket(item: Long, row: Int, width: Int): Int =
    (((HLL.fmix64(item + row * 0x9e3779b97f4a7c15L) >>> 1) % width)).toInt

  // ---- packed wire form (int depth, int width, longs: counts ++ total) ----
  // shared by the native SketchAggregates.cmsSketch aggregate and its
  // cmsEstimate scalar expression (codegen calls these static forwarders)

  def pack(depth: Int, width: Int, counts: Array[Long], total: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + counts.length * 8 + 8)
    bb.putInt(depth).putInt(width)
    var i = 0
    while (i < counts.length) { bb.putLong(counts(i)); i += 1 }
    bb.putLong(total)
    bb.array()
  }

  def unpack(bytes: Array[Byte]): CMS = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt; val width = bb.getInt
    val counts = new Array[Long](depth * width)
    var i = 0
    while (i < counts.length) { counts(i) = bb.getLong; i += 1 }
    CMS(depth, width, bb.getLong, counts)
  }

  def estimateOfPacked(bytes: Array[Byte], item: Long): Long = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt; val width = bb.getInt
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = bb.getLong(8 + (r * width + bucket(item, r, width)) * 8)
      if (c < best) best = c
      r += 1
    }
    if (best == Long.MaxValue) 0L else best
  }

  def totalOfPacked(bytes: Array[Byte]): Long =
    java.nio.ByteBuffer.wrap(bytes).getLong(bytes.length - 8)
  implicit val cmsSemigroup: Semigroup[CMS] = new Semigroup[CMS] {
    def plus(a: CMS, b: CMS): CMS = {
      require(a.depth == b.depth && a.width == b.width,
        s"CMS shape mismatch: ${a.depth}x${a.width} vs ${b.depth}x${b.width}")
      val out = new Array[Long](a.counts.length)
      var i = 0
      while (i < out.length) { out(i) = a.counts(i) + b.counts(i); i += 1 }
      CMS(a.depth, a.width, a.totalCount + b.totalCount, out)
    }
    override def isCommutative = true
  }
}

/** Central-moments accumulator as a Semigroup value (the reference's
  * algebird `Moments` — mean/variance/skewness/kurtosis as a mergeable
  * VALUE fed to a Summer, not an operator; SURVEY §1.3). Carries
  * (n, mean, m2, m3, m4) where mk = sum((x - mean)^k); merge is the
  * standard pairwise-update formula (Pebay, Sandia tech report
  * SAND2008-6212 — the same public formulas Spark's own central-moment
  * aggregates use), so partial aggregation across partitions is exact up
  * to float rounding.
  */
final case class Moments(n: Long, mean: Double, m2: Double, m3: Double, m4: Double) {
  def count: Long = n
  /** Population variance m2/n. */
  def variance: Double = if (n == 0) Double.NaN else m2 / n
  def stddev: Double = math.sqrt(variance)
  /** Population skewness g1 = sqrt(n) m3 / m2^1.5. */
  def skewness: Double =
    if (n == 0 || m2 == 0.0) Double.NaN else math.sqrt(n.toDouble) * m3 / math.pow(m2, 1.5)
  /** Excess kurtosis g2 = n m4 / m2^2 - 3. */
  def kurtosis: Double =
    if (n == 0 || m2 == 0.0) Double.NaN else n.toDouble * m4 / (m2 * m2) - 3.0
}
object Moments {
  val zero: Moments = Moments(0L, 0.0, 0.0, 0.0, 0.0)
  def of(x: Double): Moments = Moments(1L, x, 0.0, 0.0, 0.0)
  implicit val momentsSemigroup: Monoid[Moments] = new Monoid[Moments] {
    def zero: Moments = Moments.zero
    def plus(a: Moments, b: Moments): Moments = {
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        val na = a.n.toDouble; val nb = b.n.toDouble; val n = na + nb
        val d = b.mean - a.mean
        val d2 = d * d
        val mean = a.mean + d * nb / n
        val m2 = a.m2 + b.m2 + d2 * na * nb / n
        val m3 = a.m3 + b.m3 +
          d * d2 * na * nb * (na - nb) / (n * n) +
          3.0 * d * (na * b.m2 - nb * a.m2) / n
        val m4 = a.m4 + b.m4 +
          d2 * d2 * na * nb * (na * na - na * nb + nb * nb) / (n * n * n) +
          6.0 * d2 * (na * na * b.m2 + nb * nb * a.m2) / (n * n) +
          4.0 * d * (na * b.m3 - nb * a.m3) / n
        Moments(a.n + b.n, mean, m2, m3, m4)
      }
    }
    override def isCommutative = true
  }
}

/** Bloom filter as a Semigroup value (the reference's algebird `BF` —
  * approximate set membership as a mergeable VALUE; SURVEY §1.3). `numBits`
  * bit array (packed in longs), `k` probes per item via double hashing
  * (Kirsch–Mitzenmacher: pos_i = h1 + i*h2 mod m — two fmix64 calls per
  * item regardless of k). Merge = bitwise OR (commutative monoid).
  * Guarantee: NO false negatives, ever; false-positive rate ≈
  * (1 - e^{-kn/m})^k.
  */
final case class BF(numBits: Int, k: Int, bits: Array[Long]) {
  def contains(item: Long): Boolean = BF.containsBits(bits, numBits, k, item)
  def ones: Int = { var i = 0; var c = 0; while (i < bits.length) { c += java.lang.Long.bitCount(bits(i)); i += 1 }; c }
  /** Cardinality estimate -m/k ln(1 - X/m) from the fill ratio (Swamidass &
    * Baldi 2007); saturates to Long.MaxValue when every bit is set.
    */
  def approxSize: Long = {
    val x = ones
    if (x >= numBits) Long.MaxValue
    else math.round(-(numBits.toDouble / k) * math.log1p(-x.toDouble / numBits))
  }
}
object BF {
  def empty(numBits: Int = 1 << 16, k: Int = 5): BF = {
    require(numBits > 0 && k > 0, s"need numBits > 0 and k > 0, got $numBits, $k")
    BF(numBits, k, new Array[Long]((numBits + 63) >>> 6))
  }
  def ofLong(item: Long, numBits: Int = 1 << 16, k: Int = 5): BF = {
    val bf = empty(numBits, k)
    setBits(bf.bits, numBits, k, item)
    bf
  }
  def ofString(s: String, numBits: Int = 1 << 16, k: Int = 5): BF =
    ofLong(s.foldLeft(1125899906842597L)((h, c) => 31 * h + c), numBits, k)

  /** i-th probe position; shared by the value type and the native
    * [[graft.functions.SketchAggregates]] aggregate (codegen target).
    */
  def bitPos(item: Long, i: Int, numBits: Int): Int = {
    val h1 = HLL.fmix64(item)
    val h2 = HLL.fmix64(item + 0x9e3779b97f4a7c15L) | 1L // odd => full period
    (((h1 + i * h2) >>> 1) % numBits).toInt
  }
  def setBits(bits: Array[Long], numBits: Int, k: Int, item: Long): Unit = {
    var i = 0
    while (i < k) { val p = bitPos(item, i, numBits); bits(p >>> 6) |= 1L << (p & 63); i += 1 }
  }
  def containsBits(bits: Array[Long], numBits: Int, k: Int, item: Long): Boolean = {
    var i = 0
    while (i < k) {
      val p = bitPos(item, i, numBits)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  // ---- packed wire form (int numBits, int k, long words) ----
  def pack(numBits: Int, k: Int, bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + bits.length * 8)
    bb.putInt(numBits).putInt(k)
    var i = 0
    while (i < bits.length) { bb.putLong(bits(i)); i += 1 }
    bb.array()
  }
  def unpack(bytes: Array[Byte]): BF = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numBits = bb.getInt; val k = bb.getInt
    val bits = new Array[Long]((bytes.length - 8) / 8)
    var i = 0
    while (i < bits.length) { bits(i) = bb.getLong; i += 1 }
    BF(numBits, k, bits)
  }
  def containsPacked(bytes: Array[Byte], item: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numBits = bb.getInt; val k = bb.getInt
    var i = 0
    while (i < k) {
      val p = bitPos(item, i, numBits)
      if ((bb.getLong(8 + (p >>> 6) * 8) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  implicit val bfSemigroup: Semigroup[BF] = new Semigroup[BF] {
    def plus(a: BF, b: BF): BF = {
      require(a.numBits == b.numBits && a.k == b.k,
        s"BF shape mismatch: ${a.numBits}/${a.k} vs ${b.numBits}/${b.k}")
      val out = new Array[Long](a.bits.length)
      var i = 0
      while (i < out.length) { out(i) = a.bits(i) | b.bits(i); i += 1 }
      BF(a.numBits, a.k, out)
    }
    override def isCommutative = true
  }
}

/** Space-saving heavy-hitters sketch as a Semigroup value (the reference's
  * algebird `SpaceSaver` — bounded-memory top-k-by-frequency as a VALUE;
  * SURVEY §1.3). At most `capacity` counters of (count, err); a reported
  * count never under-counts the true count, `count - err` never
  * over-counts it, and any item with true frequency > n/capacity is
  * guaranteed present (Metwally et al., ICDT'05). Merge sums counters
  * present on both sides; an item absent from one side inherits that
  * side's worst-case undercount (its max evicted weight) as extra
  * count+err, then the union is trimmed back to `capacity` (largest
  * counts, ties broken by item ordering, so the trim is deterministic).
  * With `capacity` >= distinct items the sketch is EXACT (err 0) and
  * merge-order independent.
  *
  * ORDER-DEPENDENCE CAVEAT: once eviction starts (a side at capacity),
  * merge results depend on how the aggregation GROUPED the inputs — every
  * grouping's estimates stay within the (count, count−err) bounds above,
  * but they are not bit-identical across runs with different partition
  * shapes. `isCommutative = true` asserts the bounds survive reordering
  * (they do — the floors only grow), NOT bit-determinism; oracle rows over
  * this sketch must therefore either stay under capacity (exact regime)
  * or check invariants, never exact hashes. Mismatched capacities are
  * rejected like the reference's algebird SpaceSaver (`+` requires equal
  * capacity): silently taking max() would let two differently-sized
  * sketches merge into bounds neither side's error analysis covers.
  */
final case class SpaceSaver[T](capacity: Int, counters: Map[T, (Long, Long)]) {
  /** (item, estimate, maxError) descending by estimate; ties by item. */
  def topK(k: Int)(implicit ord: Ordering[T]): List[(T, Long, Long)] =
    counters.toList.map { case (t, (c, e)) => (t, c, e) }
      .sortBy { case (t, c, _) => (-c, t) }((Ordering.Tuple2(Ordering.Long, ord)))
      .take(k)
  /** Max weight any evicted item could have carried — what an absent item
    * may have accumulated before eviction (0 while under capacity).
    */
  def evictedBound: Long =
    if (counters.size < capacity) 0L
    else counters.valuesIterator.map(_._1).foldLeft(Long.MaxValue)(math.min)
}
object SpaceSaver {
  def one[T](capacity: Int, item: T): SpaceSaver[T] = {
    require(capacity > 0, s"capacity must be > 0, got $capacity")
    SpaceSaver(capacity, Map(item -> ((1L, 0L))))
  }
  implicit def spaceSaverSemigroup[T](implicit ord: Ordering[T]): Semigroup[SpaceSaver[T]] =
    new Semigroup[SpaceSaver[T]] {
      def plus(a: SpaceSaver[T], b: SpaceSaver[T]): SpaceSaver[T] = {
        require(a.capacity == b.capacity,
          s"SpaceSaver capacity mismatch: ${a.capacity} vs ${b.capacity}")
        val cap = a.capacity
        val (big, small) = if (a.counters.size >= b.counters.size) (a, b) else (b, a)
        val smallFloor = small.evictedBound
        val merged: Map[T, (Long, Long)] =
          if (smallFloor == 0L) {
            // The hot shape — the stream fold's per-event singleton (and any
            // under-capacity side): keys absent from `small` would gain
            // (+0, +0), so leave `big`'s map untouched and fold only
            // `small`'s entries in. O(|small|) per merge instead of
            // O(distinct) — this is what keeps the per-event aggregation
            // linear (the same trap the r4 HLL per-event allocation hit).
            val bigFloor = big.evictedBound
            small.counters.foldLeft(big.counters) { case (acc, (t, (c, e))) =>
              val (c0, e0) = acc.getOrElse(t, (bigFloor, bigFloor))
              acc.updated(t, (c0 + c, e0 + e))
            }
          } else {
            // both sides have evicted: every key needs both floors
            val bigFloor = big.evictedBound
            val keys = big.counters.keySet ++ small.counters.keySet
            keys.iterator.map { t =>
              val (bc, be) = big.counters.getOrElse(t, (bigFloor, bigFloor))
              val (sc, se) = small.counters.getOrElse(t, (smallFloor, smallFloor))
              t -> ((bc + sc, be + se))
            }.toMap
          }
        if (merged.size <= cap) SpaceSaver(cap, merged)
        else SpaceSaver(cap, merged.toList.sortBy { case (t, (c, _)) => (-c, t) }(
          Ordering.Tuple2(Ordering.Long, ord)).take(cap).toMap)
      }
      override def isCommutative = true
    }
}

/** Mergeable quantile histogram as a Semigroup value (the role algebird
  * `QTree` plays in the reference's jobs — latency/size percentiles as a
  * store VALUE; SURVEY §1.3). Fixed-resolution variant: values bucket to
  * `floor(x / width)`, merge sums per-bucket counts (commutative, exact —
  * unlike a sampling sketch, the histogram itself is deterministic).
  * [[quantileBounds]] returns the half-open bucket `[lo, hi)` holding the
  * `ceil(q*n)`-th smallest element — the true q-quantile ALWAYS lies
  * inside, so accuracy is `width`, not probabilistic. Bucket count is
  * bounded by value-range/width (algebird's QTree adapts its resolution
  * instead; at a fixed width the map stays small for any bounded metric —
  * latencies, sizes, scores).
  */
final case class QHist(width: Double, n: Long, buckets: Map[Long, Long]) {
  /** Bucket [lo, hi) of the ceil(q*n)-th smallest element (1-based rank,
    * q in [0,1]; q=0 means the minimum's bucket).
    */
  def quantileBounds(q: Double): (Double, Double) = {
    require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
    require(n > 0L, "quantile of an empty histogram")
    val rank = math.max(1L, math.ceil(q * n).toLong)
    val sorted = buckets.toArray.sortBy(_._1)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= rank) return (width * sorted(i)._1, width * (sorted(i)._1 + 1))
      i += 1
    }
    val last = sorted.last._1
    (width * last, width * (last + 1))
  }
}
object QHist {
  def of(x: Double, width: Double): QHist = {
    require(width > 0.0, s"width must be > 0, got $width")
    QHist(width, 1L, Map(math.floor(x / width).toLong -> 1L))
  }
  implicit val qhistSemigroup: Semigroup[QHist] = new Semigroup[QHist] {
    def plus(a: QHist, b: QHist): QHist = {
      require(a.width == b.width, s"QHist width mismatch: ${a.width} vs ${b.width}")
      val merged = b.buckets.foldLeft(a.buckets) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      QHist(a.width, a.n + b.n, merged)
    }
    override def isCommutative = true
  }
}

/** Exponentially time-decayed sum as a Semigroup value (reference expresses
  * decayed counters via algebird `DecayedValue`; SURVEY §1.3). `halfLifeMs`
  * fixed per instance; merge rescales the older side to the newer timestamp.
  */
final case class Decayed(ts: Long, value: Double)
object Decayed {
  def semigroup(halfLifeMs: Double): Semigroup[Decayed] = new Semigroup[Decayed] {
    private def scale(d: Decayed, to: Long): Double =
      d.value * math.pow(2.0, (d.ts - to) / halfLifeMs)
    def plus(a: Decayed, b: Decayed): Decayed = {
      val t = math.max(a.ts, b.ts)
      Decayed(t, scale(a, t) + scale(b, t))
    }
    override def isCommutative = true
  }
}
