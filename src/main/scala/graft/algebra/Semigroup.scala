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
