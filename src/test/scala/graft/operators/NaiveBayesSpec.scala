package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand-traced arithmetic and merge laws for the Naive-Bayes quality
  * classifier: the model table matches a by-hand Laplace computation, the
  * mergeable-counts path is bit-identical to full retraining (integer
  * count semigroup), and scoring handles unseen tokens and empty docs.
  */
class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // pos docs: "good clean text", "good text"; neg: "bad spam", "spam spam link"
  private def labeled = Seq(
    (1L, "good clean text", true),
    (2L, "good text", true),
    (3L, "bad spam", false),
    (4L, "spam spam link", false)).toDF("doc_id", "text", "y")

  test("trained model matches hand-computed Laplace llr and consts") {
    val m = Scoring.naiveBayesTrain(labeled, "text", col("y"))
    // token counts: pos -> good 2, clean 1, text 2 (n_pos 5)
    //               neg -> bad 1, spam 3, link 1 (n_neg 5); vocab v = 6
    val nPos = 5.0 + 6.0
    val nNeg = 5.0 + 6.0
    def llr(cp: Long, cn: Long): Double =
      math.log((cp + 1).toDouble / nPos) - math.log((cn + 1).toDouble / nNeg)
    val got = m.tokenLlr.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = Map(
      "good" -> llr(2, 0), "clean" -> llr(1, 0), "text" -> llr(2, 0),
      "bad" -> llr(0, 1), "spam" -> llr(0, 3), "link" -> llr(0, 1))
    assert(got.keySet == want.keySet)
    want.foreach { case (t, v) => assert(got(t) == v, s"llr($t)") }
    val c = m.consts.collect().head
    assert(c.getDouble(0) == math.log(2.0) - math.log(2.0)) // prior: 2 vs 2 docs
    assert(c.getDouble(1) == math.log(nNeg) - math.log(nPos)) // unk_llr
  }

  test("scores separate the training documents; empty docs score the prior") {
    val m = Scoring.naiveBayesTrain(labeled, "text", col("y"))
    val docs = Seq((10L, "good clean text"), (11L, "spam spam link"),
      (12L, "unseen words only"), (13L, "")).toDF("doc_id", "text")
    val got = Scoring.naiveBayesScore(docs, m, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got(10L)._2 && got(10L)._1 > 0, "positive-looking doc must score > 0")
    assert(!got(11L)._2 && got(11L)._1 < 0, "negative-looking doc must score < 0")
    // three unseen tokens cost exactly 3 * unk_llr (+ zero prior here)
    val unk = m.consts.collect().head.getDouble(1)
    assert(math.abs(got(12L)._1 - 3 * unk) < 1e-12)
    assert(got(13L)._1 == 0.0, "empty doc scores exactly the (zero) prior")
  }

  test("multi-class: model matches hand-computed Laplace table; argmax separates and tie-breaks") {
    val lab = Seq(
      (1L, "hund hund katze", "de"),
      (2L, "hund haus", "de"),
      (3L, "dog dog cat", "en"),
      (4L, "dog house", "en")).toDF("doc_id", "text", "lang")
    val m = Scoring.naiveBayesMultiTrain(lab, "text", col("lang"))
    // de: hund 3, katze 1, haus 1 (n=5); en: dog 3, cat 1, house 1 (n=5)
    // vocab v = 6 (distinct tokens overall)
    val classes = m.classes.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(classes("de")._1 == math.log(2.0) - math.log(4.0))
    assert(classes("de")._2 == math.log(1.0 / 11.0))
    val lp = m.tokenLogp.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(lp(("hund", "de")) == math.log(4.0 / 11.0))
    assert(lp.get(("hund", "en")).isEmpty, "unseen-in-class pairs stay absent (unk at scoring)")
    val pred = Scoring.naiveBayesMultiPredict(
      Seq((10L, "hund katze"), (11L, "dog cat"), (12L, ""), (13L, "zzz unseen"))
        .toDF("doc_id", "text"), m, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(10L) == "de" && pred(11L) == "en")
    // empty doc: equal priors -> lexicographically smallest class wins
    assert(pred(12L) == "de")
    // all-unseen doc: equal unk costs and priors -> same deterministic tie
    assert(pred(13L) == "de")
  }

  test("a stored model scores bit-identically to the in-memory one") {
    val m = Scoring.naiveBayesTrain(labeled, "text", col("y"))
    val tmp = java.nio.file.Files.createTempDirectory("nb_store").toString
    Scoring.saveNaiveBayes(m, tmp)
    val stored = Scoring.loadNaiveBayes(spark, tmp)
    val docs = Seq((10L, "good clean text"), (11L, "spam unseen"), (12L, ""))
      .toDF("doc_id", "text")
    val a = Scoring.naiveBayesScore(docs, m, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Scoring.naiveBayesScore(docs, stored, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, s"stored model diverged: $a vs $b")
  }

  test("merged quarter counts are bit-identical to full retraining") {
    val a = labeled.where(col("doc_id") <= 2)
    val b = labeled.where(col("doc_id") > 2)
    val merged = Scoring.mergeNaiveBayesCounts(
      Scoring.naiveBayesCounts(a, "text", col("y")),
      Scoring.naiveBayesCounts(b, "text", col("y")))
    val full = Scoring.naiveBayesCounts(labeled, "text", col("y"))
    assert(merged.except(full).isEmpty && full.except(merged).isEmpty)
    // and the finalized models agree exactly (same integer inputs)
    val dc = labeled.agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("d_pos"),
      sum(when(!col("y"), 1L).otherwise(0L)).as("d_neg"))
    val mm = Scoring.naiveBayesFromCounts(merged, dc)
    val mf = Scoring.naiveBayesFromCounts(full, dc)
    assert(mm.tokenLlr.except(mf.tokenLlr).isEmpty &&
      mf.tokenLlr.except(mm.tokenLlr).isEmpty)
  }

  test("a one-class training split fails loudly, not with -Inf priors") {
    val s = spark; import s.implicits._
    val oneClass = labeled.where(col("y"))
    val m = Scoring.naiveBayesTrain(oneClass, "text", col("y"))
    val e = intercept[Exception] { m.consts.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("non-empty")),
      s"wanted the loud one-class message, got: ${msgs(e).mkString(" | ")}")
  }
}
