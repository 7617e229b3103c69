package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Imperative core of the MinHash signature — the shared implementation
  * behind [[NativeExpressions.minhashSig]]'s interpreted eval AND generated
  * code (same single-implementation discipline as TextFunctions).
  *
  * Produces BIT-IDENTICAL results to the Catalyst-HOF formulation
  * `aggregate(shingles, repeat(MaxValue), (acc, h) => zip_with(acc, 0..n-1,
  * (a, i) => least(a, xxhash64(i, h))))`: Spark's `xxhash64(i, h)` over two
  * long children folds `hashLong(h, hashLong(i, 42))`, so the per-index
  * seeds `hashLong(i, 42)` are precomputed once and the inner loop is one
  * `XXH64.hashLong` + compare per (shingle, index) — no per-element lambda
  * interpretation, no accumulator-array allocation per shingle.
  */
object MinHashImpl {
  private val SparkHashDefaultSeed = 42L

  @volatile private var cached: Array[Long] = Array.emptyLongArray

  /** seeds(i) = XXH64.hashLong(i, 42) — the state Spark's xxhash64 reaches
    * after hashing the leading index child.
    */
  def seeds(n: Int): Array[Long] = {
    val c = cached
    if (c.length >= n) c
    else {
      val s = Array.tabulate(n)(i => XXH64.hashLong(i.toLong, SparkHashDefaultSeed))
      cached = s
      s
    }
  }

  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Hashed w-shingle sequence from a token array — bit-identical to the
    * HOF `transform(sequence(1, n-w+1), i => xxhash64(concat_ws(" ",
    * slice(toks, i, w))))` with the short-doc fallback folded in:
    * `concat_ws` IS `UTF8String.concatWs`, and `xxhash64(string)` hashes
    * the UTF-8 bytes with seed 42 (`XXH64.hashUTF8String`). One tight loop,
    * no per-window interpreted lambda or slice-array allocation.
    */
  def shingleHashes(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val win = if (n < w) n else w
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](win)
    val out = new Array[Long](n - win + 1)
    var i = 0
    while (i <= n - win) {
      var j = 0
      while (j < win) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*),
        SparkHashDefaultSeed)
      i += 1
    }
    new GenericArrayData(out)
  }

  def signature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val s = seeds(numHashes)
    val acc = new Array[Long](numHashes)
    java.util.Arrays.fill(acc, Long.MaxValue)
    val len = shingles.numElements()
    var j = 0
    while (j < len) {
      val h = shingles.getLong(j)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(h, s(i))
        if (v < acc(i)) acc(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(acc)
  }
}
