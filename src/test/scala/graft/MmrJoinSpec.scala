package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Laws for the query-table MMR re-rank (round 19, r18 verdict #2):
  * mmrRerankJoin composes the diversity tail with the query-table serve
  * matrix, and its contract is per-query equality to the single-query
  * mmrRerank loop plus the lambda=1 reduction to plain top-k.
  */
class MmrJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // deterministic little corpus: 40 vectors in 8 dims, plus exact
  // duplicate pairs planted per query
  private def vec(seed: Int): Seq[Double] =
    Seq.tabulate(8)(d => math.sin(seed * 0.7 + d * 1.3))

  private lazy val corpus = {
    val s = spark; import s.implicits._
    val base = (0 until 40).map(i => (i.toLong, vec(i)))
    // two exact copies of each query direction, ids -(10q+1), -(10q+2)
    val copies = (0 until 3).flatMap { q =>
      Seq((-(10L * q + 1), vec(100 + q)), (-(10L * q + 2), vec(100 + q)))
    }
    (base ++ copies).toDF("vec_id", "embedding")
  }

  private lazy val queries = {
    val s = spark; import s.implicits._
    (0 until 3).map(q => (q.toLong, vec(100 + q))).toDF("q_id", "q_vec")
  }

  /** Oversampled per-query candidates from the exact query-table serve. */
  private def candidates(c: Int = 20) =
    Similarity.bruteForceTopKJoin(
      corpus, "embedding", "vec_id", queries, "q_vec", "q_id", c)

  test("per-query equality to the single-query mmrRerank loop") {
    val cands = candidates()
    val joined = Similarity.mmrRerankJoin(cands, "q_id", "vec_id",
      corpus, "embedding", "vec_id", queries, "q_vec", "q_id",
      k = 5, lambda = 0.3)
    for (q <- 0 until 3) {
      val qv = vec(100 + q).toArray
      val sub = cands.where(col("q_id") === q).select("vec_id")
        .join(corpus, "vec_id").select("vec_id", "embedding")
      val loop = Similarity.mmrRerank(sub, "embedding", "vec_id", qv,
        k = 5, lambda = 0.3)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
      val got = joined.where(col("q_id") === q)
        .select("vec_id", "cosine_sim", "mmr_rank")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
      assert(got === loop, s"query $q diverges from the single-query loop")
    }
  }

  test("lambda=1 reduces to bruteForceTopKJoin over the same candidates") {
    val cands = candidates()
    val joined = Similarity.mmrRerankJoin(cands, "q_id", "vec_id",
      corpus, "embedding", "vec_id", queries, "q_vec", "q_id",
      k = 5, lambda = 1.0)
      .select("q_id", "vec_id", "cosine_sim")
    // plain top-k restricted to each query's candidate set: rank within
    // the candidate pairs by (rounded score desc, id asc)
    val plain = Similarity.bruteForceTopKJoin(
        corpus.join(cands.select("vec_id").distinct(), "vec_id"),
        "embedding", "vec_id", queries, "q_vec", "q_id", 5)
      .join(cands.select("q_id", "vec_id"), Seq("q_id", "vec_id"))
      .select("q_id", "vec_id", "cosine_sim")
    // candidate sets here are per-query top-20 over the same corpus, so
    // the restricted plain top-5 equals the unrestricted one per query
    assert(joined.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(joined).count() === 0)
  }

  test("a duplicate of the first pick can never be second (lambda=0.3)") {
    val joined = Similarity.mmrRerankJoin(candidates(), "q_id", "vec_id",
      corpus, "embedding", "vec_id", queries, "q_vec", "q_id",
      k = 5, lambda = 0.3)
      .orderBy("q_id", "mmr_rank").collect()
    for (q <- 0L until 3L) {
      val ranks = joined.filter(_.getLong(0) == q)
      val first = ranks(0).getLong(1)
      val second = ranks(1).getLong(1)
      // the three cosine-1.0 rows for query q are -(10q+2) < -(10q+1);
      // ties break to the smaller id, so first is -(10q+2) and its exact
      // duplicate -(10q+1) scores 2*lambda - 1 < any distinct candidate
      assert(first === -(10L * q + 2))
      assert(second !== -(10L * q + 1),
        s"query $q picked the exact duplicate second")
    }
  }

  test("loud bounds: maxQueries, per-query maxCandidates, duplicate qids") {
    val cands = candidates()
    intercept[IllegalArgumentException] {
      Similarity.mmrRerankJoin(cands, "q_id", "vec_id",
        corpus, "embedding", "vec_id", queries, "q_vec", "q_id",
        k = 5, lambda = 0.3, maxQueries = 2)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrRerankJoin(cands, "q_id", "vec_id",
        corpus, "embedding", "vec_id", queries, "q_vec", "q_id",
        k = 5, lambda = 0.3, maxCandidates = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrRerankJoin(cands, "q_id", "vec_id",
        corpus, "embedding", "vec_id",
        queries.unionAll(queries), "q_vec", "q_id", k = 5, lambda = 0.3)
    }
  }

  test("empty query table serves the canonical empty frame") {
    val out = Similarity.mmrRerankJoin(candidates(), "q_id", "vec_id",
      corpus, "embedding", "vec_id", queries.where(col("q_id") < 0),
      "q_vec", "q_id", k = 5, lambda = 0.3)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("q_id", "vec_id", "cosine_sim", "mmr_rank"))
  }

  test("loud resolution: unresolvable candidate ids and stray query ids") {
    val s = spark; import s.implicits._
    val cands = candidates()
    intercept[IllegalArgumentException] {
      // candidate id 999 resolves nowhere in the corpus
      Similarity.mmrRerankJoin(
        cands.unionAll(Seq((0L, 999L, 0.0)).toDF("q_id", "vec_id", "cosine_sim")),
        "q_id", "vec_id", corpus, "embedding", "vec_id",
        queries, "q_vec", "q_id", k = 5, lambda = 0.3)
    }
    intercept[IllegalArgumentException] {
      // candidate rows for a query id the table does not carry
      Similarity.mmrRerankJoin(
        cands.unionAll(Seq((7L, 0L, 0.0)).toDF("q_id", "vec_id", "cosine_sim")),
        "q_id", "vec_id", corpus, "embedding", "vec_id",
        queries, "q_vec", "q_id", k = 5, lambda = 0.3)
    }
  }
}
