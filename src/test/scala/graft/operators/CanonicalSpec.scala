package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Canonical-representative selection: the cluster policy layer over
  * connected components — keep the best-scored member per duplicate
  * cluster, ties to the smallest id; singletons map to themselves.
  */
class CanonicalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df(rows: (Long, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "score")
  }
  private def pairs(rows: (Long, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("id_a", "id_b")
  }

  private def mapping(docs: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Dedup.canonicalByScore(docs, p, "doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain a~b~c elects ONE winner for the whole component (best score)") {
    val docs = df(1L -> 10L, 2L -> 99L, 3L -> 50L, 9L -> 7L)
    val m = mapping(docs, pairs(1L -> 2L, 2L -> 3L))
    assert(m == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 9L -> 9L))
  }

  test("score ties break to the SMALLEST id") {
    val m = mapping(df(5L -> 10L, 6L -> 10L, 7L -> 10L), pairs(5L -> 6L, 6L -> 7L))
    assert(m == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("singletons (no pair) map to themselves, and every input row appears") {
    val docs = df(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val m = mapping(docs, pairs(2L -> 3L))
    assert(m.keySet == Set(1L, 2L, 3L))
    assert(m(1L) == 1L && m(2L) == 3L && m(3L) == 3L)
  }

  test("winner differs from min-id policy when the best doc has a larger id") {
    val docs = df(1L -> 1L, 2L -> 100L)
    val m = mapping(docs, pairs(1L -> 2L))
    assert(m(1L) == 2L) // minhashLshTransitive would have kept 1
  }

  test("minhashLshCanonical keeps exactly one best-scoring doc per dup cluster") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),            // near-dup of 2
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),  // longer twin
      (3L, "totally different content words here now"),
      (4L, "")                                                 // blank
    ).toDF("doc_id", "text").withColumn("score", length(col("text")))
    val kept = Dedup.minhashLshCanonical(docs, "text", "doc_id", "score",
      w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 1~2 cluster -> keep 2 (longer); 3 singleton; 4 blank singleton
    assert(kept == Set(2L, 3L, 4L))
    // same columns out as in
    assert(Dedup.minhashLshCanonical(docs, "text", "doc_id", "score",
      w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .columns.toSeq == docs.columns.toSeq)
  }

  test("kept set equals transitive dedup's CARDINALITY (one survivor per cluster)") {
    val s = spark; import s.implicits._
    val docs = (1L to 20L).map { i =>
      val t = if (i % 4 == 0) "shared duplicate body of text repeated verbatim"
              else s"unique document number $i with its own words ${i * 7}"
      (i, t)
    }.toDF("doc_id", "text").withColumn("score", col("doc_id") * 3 % 11)
    val canonical = Dedup.minhashLshCanonical(docs, "text", "doc_id", "score",
      w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5).count()
    val minId = Dedup.minhashLshTransitive(docs, "text", "doc_id",
      w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5).count()
    assert(canonical == minId)
  }
}
