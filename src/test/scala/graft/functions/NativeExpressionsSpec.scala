package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Native expressions == their UDF twins on real documents, survive nulls,
  * and stay inside whole-stage codegen.
  */
class NativeExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("simhash/langid expressions equal the UDF implementations incl. nulls") {
    val s = spark; import s.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .union(Seq((-1L, null.asInstanceOf[String]), (-2L, "")).toDF("doc_id", "text"))
    val both = docs.select(col("doc_id"),
      NativeExpressions.simhash64(col("text")).as("sim_e"),
      TextFunctions.simhashUdf(col("text")).as("sim_u"),
      NativeExpressions.langId(col("text")).as("lang_e"),
      TextFunctions.langIdUdf(col("text")).as("lang_u"))
      .collect()
    assert(both.nonEmpty)
    both.filter(!_.isNullAt(1)).foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"simhash: $r")
      assert(r.getString(3) == r.getString(4), s"langid: $r")
    }
    // null input: the native expressions are SQL-strict (null in, null
    // out — framework-inlined); the closures absorbed null internally
    val nulls = both.filter(_.getLong(0) == -1L)
    assert(nulls.forall(r => r.isNullAt(1) && r.isNullAt(3)))
    assert(nulls.forall(r => r.getLong(2) == 0L && r.getString(4) == "und"))
  }

  test("native expressions stay in whole-stage codegen; the UDF form does not") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = docs.select(NativeExpressions.simhash64(col("text")).as("h"))
      .where(col("h") =!= 0)
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("*("), p) // codegen stage marker
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"), p)
    val viaUdf = docs.select(TextFunctions.simhashUdf(col("text")).as("h"))
    assert(viaUdf.queryExecution.executedPlan.toString.contains("UDF"))
  }
}
