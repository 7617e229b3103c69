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
  * time (0=float, 1=double, 2=int, 3=long) so the inner loop is a direct
  * primitive read, not a DataType match per element.
  */
object VectorImpl {
  final val TFloat = 0
  final val TDouble = 1
  final val TInt = 2
  final val TLong = 3

  @inline private def get(a: ArrayData, i: Int, t: Int): Double = t match {
    case TFloat  => a.getFloat(i).toDouble
    case TDouble => a.getDouble(i)
    case TInt    => a.getInt(i).toDouble
    case TLong   => a.getLong(i).toDouble
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
