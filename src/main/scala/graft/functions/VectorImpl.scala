package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Imperative core of the vector ops behind
  * [[NativeExpressions.DotProduct]]/[[NativeExpressions.SumSquares]] —
  * shared by interpreted eval and generated code.
  *
  * Bit-identical to the HOF formulations: the fold runs left-to-right from
  * 0.0 in index order (exactly `aggregate(zip_with(a, b, _*_), 0.0, _+_)`),
  * elements widen to double before multiplying, and the HOF's
  * null-propagation is preserved — a null element, or a length mismatch
  * (where zip_with pads with null), nullifies the whole sum.
  *
  * Element types are dispatched by a small int tag resolved once at plan
  * time (0=float, 1=double, 2=int, 3=long, 4=byte) so the inner loop is a direct
  * primitive read, not a DataType match per element.
  */
object VectorImpl {
  final val TFloat = 0
  final val TDouble = 1
  final val TInt = 2
  final val TLong = 3
  final val TByte = 4 // int8 quantization codes

  @inline private def get(a: ArrayData, i: Int, t: Int): Double = t match {
    case TFloat  => a.getFloat(i).toDouble
    case TDouble => a.getDouble(i)
    case TInt    => a.getInt(i).toDouble
    case TLong   => a.getLong(i).toDouble
    case TByte   => a.getByte(i).toDouble
  }

  def dot(a: ArrayData, ta: Int, b: ArrayData, tb: Int): java.lang.Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na != nb) return null // zip_with pads with null -> null sum
    var acc = 0.0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    acc
  }

  /** Intersection size of two SORTED, DISTINCT long arrays by linear merge
    * — count-equal to `size(array_intersect(a, b))` (which builds a hash
    * set per invocation) on such inputs, at O(n+m) with zero allocation.
    * The dedup verification stages sort their shingle sets once per
    * document, so every candidate pair pays only the merge scan.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def sumSquares(a: ArrayData, ta: Int): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = get(a, i, ta)
      acc += x * x
      i += 1
    }
    acc
  }
}
