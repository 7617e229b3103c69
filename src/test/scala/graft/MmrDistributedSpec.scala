package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Laws for the executor-side query-table MMR (round 20, r19 verdict #2):
  * mmrRerankJoinDistributed runs the per-query greedy in
  * groupByKey.flatMapGroups — structural equality to the driver-side
  * mmrRerankJoin over random tables (same rows, SAME order), the driver
  * form's bounds and resolution checks re-stated per group, and the
  * one driver-form cap that does NOT carry over (maxQueries — the
  * distributed form's reason to exist) demonstrably absent.
  */
class MmrDistributedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vec(seed: Int): Seq[Double] =
    Seq.tabulate(8)(d => math.sin(seed * 0.7 + d * 1.3))

  private lazy val corpus = {
    val s = spark; import s.implicits._
    val base = (0 until 40).map(i => (i.toLong, vec(i)))
    val copies = (0 until 3).flatMap { q =>
      Seq((-(10L * q + 1), vec(100 + q)), (-(10L * q + 2), vec(100 + q)))
    }
    (base ++ copies).toDF("vec_id", "embedding")
  }

  private def queriesOf(n: Int) = {
    val s = spark; import s.implicits._
    (0 until n).map(q => (q.toLong, vec(100 + q))).toDF("q_id", "q_vec")
  }

  private def candidates(qs: org.apache.spark.sql.DataFrame, c: Int = 20) =
    Similarity.bruteForceTopKJoin(
      corpus, "embedding", "vec_id", qs, "q_vec", "q_id", c)

  private def run(cands: org.apache.spark.sql.DataFrame,
      qs: org.apache.spark.sql.DataFrame, k: Int, lambda: Double,
      dist: Boolean) =
    if (dist)
      Similarity.mmrRerankJoinDistributed(cands, "q_id", "vec_id",
        corpus, "embedding", "vec_id", qs, "q_vec", "q_id", k, lambda)
    else
      Similarity.mmrRerankJoin(cands, "q_id", "vec_id",
        corpus, "embedding", "vec_id", qs, "q_vec", "q_id", k, lambda)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq

  test("structural equality to mmrRerankJoin: same rows, same order") {
    for (lambda <- Seq(0.3, 0.7, 1.0); k <- Seq(3, 5)) {
      val qs = queriesOf(3)
      val cands = candidates(qs).localCheckpoint(true)
      val driver = rows(run(cands, qs, k, lambda, dist = false))
      val dist = rows(run(cands, qs, k, lambda, dist = true))
      assert(dist === driver, s"diverged at lambda=$lambda k=$k")
    }
  }

  test("a query table past the driver form's maxQueries runs distributed") {
    val qs = queriesOf(40)
    val cands = candidates(qs, c = 8).localCheckpoint(true)
    intercept[IllegalArgumentException] {
      Similarity.mmrRerankJoin(cands, "q_id", "vec_id", corpus, "embedding",
        "vec_id", qs, "q_vec", "q_id", k = 3, lambda = 0.5, maxQueries = 10)
    }
    val dist = run(cands, qs, k = 3, lambda = 0.5, dist = true)
    assert(dist.select("q_id").distinct().count() === 40L)
    // spot-check one query against the single-query greedy
    val sub = cands.where(col("q_id") === 7).select("vec_id")
      .join(corpus, "vec_id").select("vec_id", "embedding")
    val loop = Similarity.mmrRerank(sub, "embedding", "vec_id",
      vec(107).toArray, k = 3, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    val got = dist.where(col("q_id") === 7)
      .select("vec_id", "cosine_sim", "mmr_rank")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    assert(got === loop)
  }

  test("per-group bounds and resolution checks stay loud") {
    val s = spark; import s.implicits._
    val qs = queriesOf(3)
    val cands = candidates(qs).localCheckpoint(true)
    // per-query maxCandidates (group over cap)
    intercept[org.apache.spark.SparkException] {
      run(cands, qs, k = 3, lambda = 0.5, dist = true)
      Similarity.mmrRerankJoinDistributed(cands, "q_id", "vec_id",
        corpus, "embedding", "vec_id", qs, "q_vec", "q_id",
        k = 3, lambda = 0.5, maxCandidates = 3).collect()
    }
    // unresolvable candidate id — even when it is a query's ONLY row
    intercept[org.apache.spark.SparkException] {
      Similarity.mmrRerankJoinDistributed(
        cands.where(col("q_id") < 2)
          .unionAll(Seq((2L, 999L, 0.0)).toDF("q_id", "vec_id", "cosine_sim")),
        "q_id", "vec_id", corpus, "embedding", "vec_id",
        qs, "q_vec", "q_id", k = 3, lambda = 0.5).collect()
    }
    // stray query id (candidates name a query the table does not carry)
    intercept[org.apache.spark.SparkException] {
      Similarity.mmrRerankJoinDistributed(
        cands.unionAll(Seq((7L, 0L, 0.0)).toDF("q_id", "vec_id", "cosine_sim")),
        "q_id", "vec_id", corpus, "embedding", "vec_id",
        qs, "q_vec", "q_id", k = 3, lambda = 0.5).collect()
    }
    // duplicate query id
    intercept[org.apache.spark.SparkException] {
      Similarity.mmrRerankJoinDistributed(cands, "q_id", "vec_id",
        corpus, "embedding", "vec_id", qs.unionAll(qs), "q_vec", "q_id",
        k = 3, lambda = 0.5).collect()
    }
  }

  test("edge contracts match the driver form") {
    val qs = queriesOf(3)
    val cands = candidates(qs).localCheckpoint(true)
    // empty query table: canonical empty frame
    val out = Similarity.mmrRerankJoinDistributed(cands, "q_id", "vec_id",
      corpus, "embedding", "vec_id", qs.where(col("q_id") < 0),
      "q_vec", "q_id", k = 3, lambda = 0.5)
    assert(out.count() === 0)
    assert(out.columns.toSeq === Seq("q_id", "vec_id", "cosine_sim", "mmr_rank"))
    // a query with no candidate rows yields no output rows, loudly nothing
    val thin = rows(run(cands.where(col("q_id") < 2), qs, 3, 0.5, dist = true))
    val thinD = rows(run(cands.where(col("q_id") < 2), qs, 3, 0.5, dist = false))
    assert(thin === thinD)
    assert(!thin.exists(_._1 == 2L))
  }
}
