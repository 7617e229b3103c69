package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, built on Spark's
  * higher-order functions (`zip_with`, `aggregate`, `transform`) — fully
  * Catalyst-expressed, so vector similarity stays inside whole-stage codegen
  * with no UDF serialization per row.
  *
  * All math is carried out in DOUBLE precision regardless of the storage
  * element type, so results are deterministic and engine-portable.
  */
object VectorFunctions {

  /** Native codegen'd kernels ([[NativeExpressions.DotProduct]] /
    * [[NativeExpressions.SumSquares]]) — same left-to-right fold as the HOF
    * forms below, bit-identical results (law in ApproxOpsSpec), without the
    * per-element interpreted-lambda cost.
    */
  def dot(a: Column, b: Column): Column = NativeExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(NativeExpressions.sumSquares(a))

  /** Reference HOF formulations (the equality law's ground truth). */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private[graft] def normHof(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** L2-normalize (as array<double>); a zero vector passes through
    * un-scaled rather than dividing by zero.
    */
  def l2Normalize(v: Column): Column = {
    val n = norm(v)
    when(n > 0, transform(v, x => x.cast("double") / n))
      .otherwise(transform(v, x => x.cast("double")))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double"); diff * diff
      }),
      lit(0.0), (acc, x) => acc + x))

  /** Random-hyperplane LSH bucket id: sign bits of dot products against
    * `nBits` deterministic pseudo-random hyperplanes (seeded; reproducible
    * across runs/engines). Vectors in the same bucket are likely
    * cosine-similar — the scale path for similarity search: candidate
    * generation becomes an equi-join on the bucket id instead of a cross
    * join. Columnar: the hyperplanes are literal arrays.
    */
  def lshBucket(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(dim, nBits, seed)
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (plane, i)) =>
      val planeCol = array(plane.toIndexedSeq.map(lit(_)): _*)
      acc + when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
  }

  /** Symmetric int8 scalar quantization — the embedding-storage op that
    * cuts a serving index's memory 4x vs float32 (the standard first rung
    * below PQ: exact per-vector scale, no codebook to train). `codes` are
    * round(x · 127 / maxabs) as TINYINT, `scale` is maxabs — so dequant
    * is codes · scale / 127 and the per-element error is ≤ scale/254.
    * All arithmetic is double-precision and engine-portable (the oracle
    * replays it literally); a zero vector quantizes to all-zero codes.
    */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  def int8Quantize(v: Column): Column = {
    val m = int8Scale(v)
    when(m > 0,
      transform(v, x => round(x.cast("double") * lit(127.0) / m).cast("byte")))
      .otherwise(transform(v, _ => lit(0).cast("byte")))
  }

  def int8Dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale / lit(127.0))

  /** Approximate dot product straight on int8 codes (the ADC trick at
    * rung one): the native byte-array dot kernel (codes are integers, so
    * the accumulation is exact and order-independent in double), one
    * final rescale by scaleA · scaleB / 127².
    */
  def int8Dot(a: Column, scaleA: Column, b: Column, scaleB: Column): Column =
    NativeExpressions.dotProduct(a, b) * scaleA * scaleB / lit(16129.0)

  /** Reference HOF formulation of [[int8Dot]] (equality law's ground
    * truth, same fold).
    */
  private[graft] def int8DotHof(a: Column, scaleA: Column, b: Column,
      scaleB: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x) * scaleA * scaleB / lit(16129.0)

  /** Deterministic unit hyperplanes from splitmix64 — engine-portable. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    var state = seed
    def nextLong(): Long = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // Box-Muller over splitmix64 uniforms → gaussian components
    def nextGaussianPair(): (Double, Double) = {
      val u1 = (nextLong() >>> 11) * (1.0 / (1L << 53))
      val u2 = (nextLong() >>> 11) * (1.0 / (1L << 53))
      val r = math.sqrt(-2.0 * math.log(math.max(u1, 1e-300)))
      (r * math.cos(2 * math.Pi * u2), r * math.sin(2 * math.Pi * u2))
    }
    Array.fill(nBits) {
      val arr = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        val (g1, g2) = nextGaussianPair()
        arr(i) = g1
        if (i + 1 < dim) arr(i + 1) = g2
        i += 2
      }
      arr
    }
  }
}
