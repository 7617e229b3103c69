package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.NativeExpressions

/** SQL surface for the engine's native expressions — the idiomatic
  * `SparkSessionExtensions` registration point: sessions built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` (or
  * `.withExtensions(new GraftExtensions)`) can call the codegen'd kernels
  * from plain SQL:
  *
  * {{{
  *   SELECT graft_langid(text), graft_simhash64(text) FROM documents
  *   SELECT graft_dot(embedding, other) / ...
  *   SELECT graft_minhash_sig(graft_shingle_hashes(tokens, 3), 64)
  * }}}
  *
  * Column-API users get the same expressions via
  * [[graft.functions.NativeExpressions]] without any registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo = {
    val _ = usage // kept for scaladoc readability at the call sites
    new ExpressionInfo("graft.functions.NativeExpressions", name)
  }

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_langid"),
      info("graft_langid", "_FUNC_(text) - n-gram/script language guess"),
      (es: Seq[Expression]) => NativeExpressions.LangId(es.head)))

    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "_FUNC_(text) - 64-bit simhash signature"),
      (es: Seq[Expression]) => NativeExpressions.SimHash64(es.head)))

    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "_FUNC_(a, b) - dot product of numeric arrays"),
      (es: Seq[Expression]) => NativeExpressions.DotProduct(es(0), es(1))))

    ext.injectFunction((FunctionIdentifier("graft_sumsq"),
      info("graft_sumsq", "_FUNC_(a) - sum of squares of a numeric array"),
      (es: Seq[Expression]) => NativeExpressions.SumSquares(es.head)))

    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "_FUNC_(tokens, w) - hashed w-shingle sequence"),
      (es: Seq[Expression]) => NativeExpressions.ShingleHashes(
        es.head, intArg(es(1), "graft_shingle_hashes"))))

    ext.injectFunction((FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig", "_FUNC_(shingles, n) - n-permutation MinHash signature"),
      (es: Seq[Expression]) => NativeExpressions.MinHashSig(
        es.head, intArg(es(1), "graft_minhash_sig"))))

    ext.injectFunction((FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count",
        "_FUNC_(a, b) - intersection size of sorted distinct bigint arrays"),
      (es: Seq[Expression]) => NativeExpressions.SortedIntersectCount(es(0), es(1))))
  }
}
