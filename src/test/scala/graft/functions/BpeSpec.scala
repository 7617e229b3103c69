package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** BPE trainer/encoder laws: hand-traced merges, deterministic
  * tie-breaks, the word-level roundtrip, and the token-count bounds the
  * gate row pins.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val W = Bpe.EndOfWord

  test("trainMergesLocal: hand-traced merges on a 2-word dictionary") {
    // "aa" x3 -> [a, a</w>]; "ab" x2 -> [a, b</w>]
    // pair counts: (a,a</w>)=3 beats (a,b</w>)=2; then (a,b</w>) remains
    val merges = Bpe.trainMergesLocal(Array("aa" -> 3L, "ab" -> 2L), 5)
    assert(merges == Seq("a" -> s"a$W", "a" -> s"b$W"))
  }

  test("count ties break lexicographically (deterministic training)") {
    val merges = Bpe.trainMergesLocal(Array("cd" -> 1L, "ab" -> 1L), 1)
    assert(merges == Seq("a" -> s"b$W"))
  }

  test("trainer stops early when no pairs remain (fully merged dictionary)") {
    val merges = Bpe.trainMergesLocal(Array("ab" -> 1L), 100)
    // "ab" -> [a, b</w>] -> one merge exhausts every pair
    assert(merges == Seq("a" -> s"b$W"))
  }

  test("encodeWord applies ranks greedily; zero merges = chars + sentinel") {
    assert(Bpe.encodeWord("abc", Map.empty).toSeq == Seq("a", "b", s"c$W"))
    val ranks = Map(("a", s"b$W") -> 0)
    assert(Bpe.encodeWord("ab", ranks).toSeq == Seq(s"ab$W"))
    // rank order wins over position: prefer the LOWEST rank anywhere
    val r2 = Map(("b", s"c$W") -> 0, ("a", "b") -> 1)
    assert(Bpe.encodeWord("abc", r2).toSeq == Seq("a", s"bc$W"))
  }

  test("roundtrip: decode(encode(text)) == lowercased space-normalized text") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "The low lower lowest"),
      (2L, "newest widest  low"),
      (3L, ""),
      (4L, "singleword")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(Bpe.wordFreq(docs, "text"), 50)
    val enc = Bpe.encodeUdf(merges)
    val got = docs.select(col("doc_id"), enc(col("text")).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(Bpe.decodeTokens(got(1L)) == "the low lower lowest")
    assert(Bpe.decodeTokens(got(2L)) == "newest widest low")
    assert(got(3L).isEmpty)
    assert(Bpe.decodeTokens(got(4L)) == "singleword")
  }

  test("token counts: n_words <= n_bpe <= n_nonspace_chars, shrinking with merges") {
    val s = spark; import s.implicits._
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, s"alpha beta gamma delta epsilon word$i")).toDF("doc_id", "text")
    val freq = Bpe.wordFreq(docs, "text")
    def totalTokens(numMerges: Int): Long = {
      val enc = Bpe.encodeUdf(Bpe.trainMerges(freq, numMerges))
      docs.select(size(enc(col("text"))).cast("long").as("n"))
        .agg(sum("n")).collect().head.getLong(0)
    }
    val words = docs.select(
      size(TextFunctions.tokens(lower(col("text")))).cast("long").as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    val chars = docs.select(
      length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    val t0 = totalTokens(0)
    val t50 = totalTokens(50)
    val t200 = totalTokens(200)
    assert(t0 == chars)               // no merges: every char a token
    assert(t200 >= words && t50 >= words)
    assert(t200 <= t50 && t50 <= t0)  // more merges never grow the count
    assert(t200 < t0)                 // and the common words really merged
  }

  test("wordFreq counts lowercased whitespace words exactly") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "A a b"), (2L, "a  B")).toDF("doc_id", "text")
    val got = Bpe.wordFreq(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L))
  }

  test("vocabCoverage keeps the minimal covering prefix, crossing word included") {
    val s = spark; import s.implicits._
    // a:5 b:3 c:1 d:1, total 10
    val freq = Seq(("a", 5L), ("b", 3L), ("c", 1L), ("d", 1L)).toDF("word", "n")
    def words(cov: Double) =
      Bpe.vocabCoverage(freq, cov).collect().map(_.getString(0)).toSet
    // before(b)=5 < 8 keeps b; before(c)=8 is NOT < 8 -> cut after b
    assert(words(0.8) == Set("a", "b"))
    // raising the target past the crossing admits c (tie c<d by word asc),
    // but not d (before(d)=9 >= 8.1)
    assert(words(0.81) == Set("a", "b", "c"))
    assert(words(1.0) == Set("a", "b", "c", "d"))
  }
}
