package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand-computed stupid-backoff arithmetic: each cascade rung (trigram
  * hit, bigram backoff, unigram backoff, unk) checked against by-hand
  * counts; short documents score the unk constant.
  */
class BackoffLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // corpus: "a b c a b d" -> trigrams: (a,b,c) (b,c,a) (c,a,b) (a,b,d)
  // bigrams: ab ab bc bd ca  (ab twice); unigrams: a2 b2 c1 d1, N=6
  private def corpus = Seq((100L, "a b c a b d")).toDF("doc_id", "text")

  test("each backoff rung matches the by-hand counts") {
    val docs = Seq(
      (1L, "a b c"),   // trigram (a,b,c): c3=1, ctx c(a,b)=2 -> S=1/2
      (2L, "b a b"),   // (b,a,b) unseen; bigram (a,b): c2=2, c(a)=2 -> 0.4*1
      (3L, "c c d"),   // (c,c,d) and bigram (c,d) unseen; unigram d: 0.16*(1/6)
      (4L, "c c z"),   // z unseen anywhere -> unk 24.0
      (5L, "a b")      // no trigram positions -> unk 24.0
    ).toDF("doc_id", "text")
    val got = Scoring.backoffSurprisal(docs, corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def lg(x: Double) = -math.log(x) / math.log(2.0)
    assert(math.abs(got(1L) - lg(1.0 / 2.0)) < 1e-12)
    assert(math.abs(got(2L) - lg(0.4 * (2.0 / 2.0))) < 1e-12)
    assert(math.abs(got(3L) - lg(0.16 * (1.0 / 6.0))) < 1e-12)
    assert(got(4L) == 24.0)
    assert(got(5L) == 24.0)
  }

  test("multi-position documents average the per-position surprisals") {
    // "a b c a" -> positions (a,b,c) [S=1/2] and (b,c,a) [c3=1, c(b,c)=1 -> S=1]
    val got = Scoring.backoffSurprisal(
      Seq((1L, "a b c a")).toDF("doc_id", "text"), corpus, "text", "doc_id")
      .collect().head.getDouble(1)
    val want = (-(math.log(0.5) / math.log(2.0)) + 0.0) / 2.0
    assert(math.abs(got - want) < 1e-12, s"$got vs $want")
  }
}
