package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Maximal-marginal-relevance re-rank laws:
  *
  *  - lambda = 1 reduces EXACTLY to the plain cosine top-k over the
  *    candidate set (same rounded scores, same id tie-breaks);
  *  - diversity is real: an exact duplicate of the first pick carries a
  *    full (1-lambda) penalty and is deferred behind distinct
  *    candidates a plain top-k would rank below it;
  *  - the selection order is deterministic (score desc, id asc ties)
  *    and every pick is distinct;
  *  - k beyond the candidate count returns all candidates, no throw;
  *  - the bounded-set contract fails loudly (maxCandidates, duplicate
  *    candidate ids).
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dim = 8
  private def query: Array[Double] = Array.tabulate(dim)(i => math.sin(i + 1.0))

  /** Candidates: the exact query copy (id 1), its exact duplicate
    * (id 2), and spread-out distinct vectors (ids 10+).
    */
  private def cands = {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(31)
    val distinct = Seq.tabulate(12)(i =>
      ((10 + i).toLong, Array.fill(dim)(rnd.nextGaussian()).toSeq))
    (Seq((1L, query.toSeq), (2L, query.toSeq)) ++ distinct)
      .toDF("vec_id", "embedding")
  }

  private def ranks(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.orderBy("mmr_rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("lambda = 1 equals the plain cosine top-k over the candidates " +
      "exactly (rounded scores, id tie-breaks)") {
    val got = ranks(Similarity.mmrRerank(cands, "embedding", "vec_id",
      query, k = 8, lambda = 1.0))
    val plain = Similarity.bruteForceTopK(cands, "embedding", "vec_id",
        query, k = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == plain, s"mmr(1.0)=$got brute=$plain")
    // the two exact copies rank 1 and 2 under pure relevance
    assert(got.take(2).map(_._1) == Seq(1L, 2L))
  }

  test("diversity is real: the exact duplicate of the first pick is " +
      "demoted from the rank-2 a plain top-k gives it") {
    val got = ranks(Similarity.mmrRerank(cands, "embedding", "vec_id",
      query, k = 14, lambda = 0.3))
    assert(got.head._1 == 1L && got.head._2 == 1.0,
      s"first pick must be the pure-relevance argmax: $got")
    // THEOREM, not a data property: at rank 2 the duplicate's penalty is
    // a full cosine 1.0 (score 2λ−1 = −0.4) while any DISTINCT candidate
    // with relevance c scores λc − (1−λ)·c = (2λ−1)·c = −0.4c > −0.4 for
    // every c in (−1, 1) — so the copy can never be second at λ < 0.5
    // (deeper ranks are data-dependent: mutually-similar distinct pairs
    // can legitimately score below it)
    val dupRank = got.indexWhere(_._1 == 2L) + 1
    assert(dupRank > 2, s"duplicate must be demoted below plain rank 2: $got")
    assert(got.map(_._1).distinct.length == got.length)
  }

  test("k beyond the candidate count returns all candidates; bounded-set " +
      "contract fails loudly") {
    val all = ranks(Similarity.mmrRerank(cands, "embedding", "vec_id",
      query, k = 100, lambda = 0.5))
    assert(all.length == 14)
    val eMax = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(cands, "embedding", "vec_id", query,
        k = 5, lambda = 0.5, maxCandidates = 3)
    }
    assert(eMax.getMessage.contains("maxCandidates"))
    val eDup = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(cands.unionByName(cands.limit(1)), "embedding",
        "vec_id", query, k = 5, lambda = 0.5)
    }
    assert(eDup.getMessage.contains("duplicate"))
  }

  test("composes with a stored ANN serve: re-ranking the oversampled " +
      "candidate ids of an int8 stored serve is deterministic and keeps " +
      "the self-hit first") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(37)
    val corpus = (Seq((1L, query.toSeq), (2L, query.toSeq)) ++
        Seq.tabulate(60)(i => ((10 + i).toLong,
          Array.fill(dim)(rnd.nextGaussian()).toSeq)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr_store").toString
    try {
      Similarity.int8WriteIndex(corpus, "embedding", "vec_id", dir)
      // oversampled serve output = the bounded candidate set MMR expects
      val cands50 = Similarity.int8TopKStored(spark, dir, corpus,
        "embedding", "vec_id", query, k = 25, oversample = 2)
        .join(corpus, Seq("vec_id"))
        .select("vec_id", "embedding")
      val a = ranks(Similarity.mmrRerank(cands50, "embedding", "vec_id",
        query, k = 10, lambda = 0.3))
      val b = ranks(Similarity.mmrRerank(cands50, "embedding", "vec_id",
        query, k = 10, lambda = 0.3))
      assert(a == b, "deterministic")
      assert(a.head._1 == 1L && a.head._2 == 1.0)
      assert(!a.take(2).map(_._1).contains(2L),
        s"the duplicate must not follow its copy at lambda 0.3: $a")
    } finally graft.batch.BatchState.deleteDir(dir)
  }
}
