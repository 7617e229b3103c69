package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The SparkSessionExtensions registration: every native expression is
  * callable from plain SQL in an extensions-configured session, with
  * results equal to the Column-API forms.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("native expressions are SQL-callable and equal the Column API") {
    val r = spark.sql(
      """SELECT
        |  graft_langid('the quick brown fox and the lazy dog they were') AS lang,
        |  graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dot,
        |  graft_sumsq(array(3.0D, 4.0D)) AS ss,
        |  graft_sorted_intersect_count(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS ic,
        |  size(graft_minhash_sig(graft_shingle_hashes(array('a','b','c','d'), 3), 16)) AS siglen,
        |  graft_simhash64('hello world hello') AS sim
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "en")
    assert(r.getDouble(1) == 32.0)
    assert(r.getDouble(2) == 25.0)
    assert(r.getInt(3) == 2)
    assert(r.getInt(4) == 16)
    // SQL simhash equals the Column-API expression on the same input
    import org.apache.spark.sql.functions._
    val viaColumn = spark.range(1).select(
      graft.functions.NativeExpressions.simhash64(lit("hello world hello"))).collect()(0).getLong(0)
    assert(r.getLong(5) == viaColumn)
  }

  test("SQL shingles+signature equal the Dedup column pipeline on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    docs.createOrReplaceTempView("ext_docs")
    import org.apache.spark.sql.functions._
    val sqlSide = spark.sql(
      """SELECT doc_id, graft_minhash_sig(array_distinct(
        |  graft_shingle_hashes(filter(split(lower(text), '\\s+'), t -> length(t) > 0), 3)), 64) AS sig
        |FROM ext_docs""".stripMargin)
    val colSide = docs.select(col("doc_id"),
      graft.operators.Dedup.minhashSignature(
        graft.operators.Dedup.shingleCol(col("text"), 3), 64).as("sig"))
    assert(sqlSide.exceptAll(colSide).count() == 0 && colSide.exceptAll(sqlSide).count() == 0)
  }
}
