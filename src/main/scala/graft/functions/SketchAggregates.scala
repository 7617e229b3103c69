package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

import graft.algebra.{BF, CMS, HLL}

/** Native sketch AGGREGATES (SURVEY §7.3) — the allocation-free twins of the
  * [[graft.algebra.HLL]]/[[graft.algebra.CMS]] semigroup value types.
  *
  * The semigroup forms build a fresh register array PER EVENT (`HLL.ofLong`
  * allocates 4 KB a row) because a Semigroup can only combine values; that is
  * the right shape for store CONTENT (mergeable snapshots) but GC death in a
  * hot aggregation at scale. These `TypedImperativeAggregate`s keep ONE
  * mutable register set per grouping key per partition and fold rows into it
  * in place — Spark's partial aggregation then merges one sketch per
  * (key, partition), so allocation is O(keys), not O(events).
  *
  * Register/bucket arithmetic is shared with the semigroup implementations
  * (same `fmix64`, same rank/bucket functions), so a sketch built here merges
  * bit-for-bit with one built by the value types.
  *
  * Reference provenance: the reference expresses these as algebird HLL/CMS
  * *values* fed to a Summer (SURVEY §1.3); the aggregate form is this
  * engine's idiomatic-Spark expression of the same computation.
  */
object SketchAggregates {

  private def integralCheck(name: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs an integral child, got $other")
    }

  /** HyperLogLog over an integral column → BinaryType registers (2^p bytes).
    * Read the estimate with [[hllEstimate]]; merge sketches downstream by
    * re-aggregating with max per register if ever needed (the batch store
    * path keeps the HLL value type instead).
    */
  case class HllSketchAgg(
      child: Expression,
      p: Int = 12,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes(): TypeCheckResult = integralCheck(prettyName, child)

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        // identical arithmetic to HLL.ofLong, minus the per-row allocation
        val h = HLL.fmix64(v.asInstanceOf[Number].longValue)
        val idx = (h >>> (64 - p)).toInt
        val rest = h << p
        val rank =
          (java.lang.Long.numberOfLeadingZeros(rest | (1L << (p - 1))) + 1).min(64 - p)
        if (rank > (buf(idx) & 0xff)) buf(idx) = rank.toByte
      }
      buf
    }

    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Byte]): Any = buf
    override def serialize(buf: Array[Byte]): Array[Byte] = buf
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

    override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllSketchAgg =
      copy(child = newChildren.head)
    override def prettyName: String = "graft_hll_sketch"
  }

  /** Count-min sketch over an integral column → BinaryType packed
    * (depth, width, counts, total); point-estimate with [[cmsEstimate]],
    * total stream count with [[cmsTotal]].
    */
  case class CmsSketchAgg(
      child: Expression,
      depth: Int = 5,
      width: Int = 512,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes(): TypeCheckResult = integralCheck(prettyName, child)

    // buffer layout: counts(depth*width) ++ totalCount
    override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width + 1)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val item = v.asInstanceOf[Number].longValue
        var r = 0
        while (r < depth) { buf(r * width + CMS.bucket(item, r, width)) += 1L; r += 1 }
        buf(depth * width) += 1L
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any =
      CMS.pack(depth, width, java.util.Arrays.copyOf(buf, depth * width), buf(depth * width))

    override def serialize(buf: Array[Long]): Array[Byte] =
      CMS.pack(depth, width, java.util.Arrays.copyOf(buf, depth * width), buf(depth * width))

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val c = CMS.unpack(bytes)
      val buf = java.util.Arrays.copyOf(c.counts, depth * width + 1)
      buf(depth * width) = c.totalCount
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsSketchAgg =
      copy(child = newChildren.head)
    override def prettyName: String = "graft_cms_sketch"
  }

  /** Bloom filter over an integral column → BinaryType packed
    * (numBits, k, words); membership with [[bfContains]]. One mutable bit
    * array per grouping key per partition (the BF *value* form allocates
    * numBits/8 bytes per row); partial merges OR word-wise, bit-identical
    * to [[graft.algebra.BF]]'s semigroup (same probe positions).
    */
  case class BloomFilterAgg(
      child: Expression,
      numBits: Int = 1 << 16,
      k: Int = 5,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    require(numBits > 0 && k > 0,
      s"graft_bloom_filter needs numBits > 0 and k > 0, got $numBits, $k")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes(): TypeCheckResult = integralCheck(prettyName, child)

    override def createAggregationBuffer(): Array[Long] = new Array[Long]((numBits + 63) >>> 6)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) BF.setBits(buf, numBits, k, v.asInstanceOf[Number].longValue)
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def eval(buf: Array[Long]): Any = BF.pack(numBits, k, buf)
    override def serialize(buf: Array[Long]): Array[Byte] = BF.pack(numBits, k, buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = BF.unpack(bytes).bits

    override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomFilterAgg =
      copy(child = newChildren.head)
    override def prettyName: String = "graft_bloom_filter"
  }

  /** SpaceSaver heavy hitters over an integral column →
    * array<struct<item,cnt,err>> ordered by (cnt desc, item asc). One
    * mutable counter map per grouping key per partition (the
    * [[graft.algebra.SpaceSaver]] VALUE form pays a persistent-map fold
    * per event); identical merge semantics to the semigroup — absent
    * items inherit the other side's evicted bound as extra count+err —
    * so the exact regime (capacity >= distinct) matches the value form
    * entry-for-entry (asserted in SketchAggregatesSpec).
    */
  case class SpaceSaverAgg(
      child: Expression,
      capacity: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Array[Long]]] {

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(new StructType()
      .add("item", LongType).add("cnt", LongType).add("err", LongType), containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = integralCheck(prettyName, child)

    override def createAggregationBuffer(): java.util.HashMap[Long, Array[Long]] =
      new java.util.HashMap[Long, Array[Long]](capacity * 2)

    private def floorOf(m: java.util.HashMap[Long, Array[Long]]): Long =
      if (m.size < capacity) 0L
      else {
        var min = Long.MaxValue
        val it = m.values().iterator()
        while (it.hasNext) { val c = it.next()(0); if (c < min) min = c }
        min
      }

    override def update(m: java.util.HashMap[Long, Array[Long]], input: InternalRow): java.util.HashMap[Long, Array[Long]] = {
      val v = child.eval(input)
      if (v != null) {
        val item = v.asInstanceOf[Number].longValue
        val cur = m.get(item)
        if (cur != null) cur(0) += 1L
        else if (m.size < capacity) m.put(item, Array(1L, 0L))
        else {
          // classic SpaceSaver eviction: replace a min-count counter
          // (smallest item among mins, for a deterministic choice)
          var minC = Long.MaxValue; var minItem = 0L
          val it = m.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next(); val c = e.getValue()(0)
            if (c < minC || (c == minC && e.getKey < minItem)) { minC = c; minItem = e.getKey }
          }
          m.remove(minItem)
          m.put(item, Array(minC + 1L, minC))
        }
      }
      m
    }

    override def merge(a: java.util.HashMap[Long, Array[Long]], b: java.util.HashMap[Long, Array[Long]]): java.util.HashMap[Long, Array[Long]] = {
      val aFloor = floorOf(a); val bFloor = floorOf(b)
      val it = b.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = a.get(e.getKey)
        if (cur != null) { cur(0) += e.getValue()(0); cur(1) += e.getValue()(1) }
        else a.put(e.getKey, Array(aFloor + e.getValue()(0), aFloor + e.getValue()(1)))
      }
      if (bFloor > 0L) {
        // keys only in a inherit b's evicted bound
        val ia = a.entrySet().iterator()
        while (ia.hasNext) {
          val e = ia.next()
          if (!b.containsKey(e.getKey)) { e.getValue()(0) += bFloor; e.getValue()(1) += bFloor }
        }
      }
      if (a.size > capacity) {
        val sorted = sortedEntries(a)
        var i = capacity
        while (i < sorted.length) { a.remove(sorted(i)._1); i += 1 }
      }
      a
    }

    private def sortedEntries(m: java.util.HashMap[Long, Array[Long]]): Array[(Long, Array[Long])] = {
      val arr = new Array[(Long, Array[Long])](m.size)
      val it = m.entrySet().iterator()
      var i = 0
      while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
      java.util.Arrays.sort(arr, new java.util.Comparator[(Long, Array[Long])] {
        def compare(x: (Long, Array[Long]), y: (Long, Array[Long])): Int = {
          val c = java.lang.Long.compare(y._2(0), x._2(0))
          if (c != 0) c else java.lang.Long.compare(x._1, y._1)
        }
      })
      arr
    }

    override def eval(m: java.util.HashMap[Long, Array[Long]]): Any = {
      val sorted = sortedEntries(m)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        sorted.map { case (item, ce) => InternalRow(item, ce(0), ce(1)) }.toArray[Any])
    }

    override def serialize(m: java.util.HashMap[Long, Array[Long]]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + m.size * 24)
      bb.putInt(m.size)
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putLong(e.getKey).putLong(e.getValue()(0)).putLong(e.getValue()(1))
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Array[Long]] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val m = new java.util.HashMap[Long, Array[Long]](capacity * 2)
      var i = 0
      while (i < n) { m.put(bb.getLong, Array(bb.getLong, bb.getLong)); i += 1 }
      m
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaverAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaverAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSaverAgg =
      copy(child = newChildren.head)
    override def prettyName: String = "graft_space_saver"
  }

  /** Scalar: Bloom membership probe — false means DEFINITELY absent. */
  case class BfContains(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, LongType | IntegerType | ShortType | ByteType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_bf_contains needs (binary, integral), got $other")
      }
    override protected def nullSafeEval(sketch: Any, item: Any): Any =
      BF.containsPacked(sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[Number].longValue)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (s, i) => s"graft.algebra.BF.containsPacked($s, (long)($i))")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BfContains =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "graft_bf_contains"
  }

  /** Scalar: estimate from HLL registers (codegen'd static call). */
  case class HllEstimate(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"graft_hll_estimate needs binary, got ${child.dataType}")
    override protected def nullSafeEval(input: Any): Any =
      HLL.estimateOf(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.algebra.HLL.estimateOf($c)")
    override protected def withNewChildInternal(newChild: Expression): HllEstimate =
      copy(child = newChild)
    override def prettyName: String = "graft_hll_estimate"
  }

  /** Scalar: CMS point estimate of `item` (never under-counts). */
  case class CmsEstimate(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, LongType | IntegerType | ShortType | ByteType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_cms_estimate needs (binary, integral), got $other")
      }
    override protected def nullSafeEval(sketch: Any, item: Any): Any =
      CMS.estimateOfPacked(sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[Number].longValue)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (s, i) => s"graft.algebra.CMS.estimateOfPacked($s, (long)($i))")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CmsEstimate =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "graft_cms_estimate"
  }

  /** Scalar: total updates folded into a CMS sketch. */
  case class CmsTotal(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"graft_cms_total needs binary, got ${child.dataType}")
    override protected def nullSafeEval(input: Any): Any =
      CMS.totalOfPacked(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.algebra.CMS.totalOfPacked($c)")
    override protected def withNewChildInternal(newChild: Expression): CmsTotal =
      copy(child = newChild)
    override def prettyName: String = "graft_cms_total"
  }

  // ---- Column API ----

  def hllSketch(c: Column, p: Int = 12): Column =
    ColumnBridge.column(HllSketchAgg(ColumnBridge.expression(c), p).toAggregateExpression())
  def hllEstimate(c: Column): Column =
    ColumnBridge.column(HllEstimate(ColumnBridge.expression(c)))
  /** Convenience: approx distinct count as one aggregate column. */
  def hllCountDistinct(c: Column, p: Int = 12): Column = hllEstimate(hllSketch(c, p))

  def spaceSaver(c: Column, capacity: Int): Column =
    ColumnBridge.column(SpaceSaverAgg(ColumnBridge.expression(c), capacity).toAggregateExpression())

  def bloomFilter(c: Column, numBits: Int = 1 << 16, k: Int = 5): Column =
    ColumnBridge.column(BloomFilterAgg(ColumnBridge.expression(c), numBits, k).toAggregateExpression())
  def bfContains(sketch: Column, item: Column): Column =
    ColumnBridge.column(BfContains(ColumnBridge.expression(sketch), ColumnBridge.expression(item)))

  def cmsSketch(c: Column, depth: Int = 5, width: Int = 512): Column =
    ColumnBridge.column(CmsSketchAgg(ColumnBridge.expression(c), depth, width).toAggregateExpression())
  def cmsEstimate(sketch: Column, item: Column): Column =
    ColumnBridge.column(CmsEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(item)))
  def cmsTotal(sketch: Column): Column =
    ColumnBridge.column(CmsTotal(ColumnBridge.expression(sketch)))
}
