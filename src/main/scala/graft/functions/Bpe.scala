package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding — the tokenizer
  * side of a training-data pipeline (corpus-fitted subword vocabulary,
  * then per-document token counts/budgets for packing and sampling).
  *
  * The split of labor follows Sennrich et al. (ACL 2016) and every
  * production BPE trainer since: merges are learned from the WORD
  * FREQUENCY dictionary, not the corpus — so the only corpus-sized job is
  * one `groupBy(word).count()` hash aggregation ([[wordFreq]]), and
  * training itself runs driver-side over the (vocabulary-sized, capped)
  * frequency table in deterministic order. At 100 TB the frequency table
  * for lowercased whitespace words is millions of rows; `maxWords` caps
  * the training dictionary by (count desc, word asc) — the standard
  * practice, and a bounded `TakeOrdered` job like the PQ codebook sample.
  *
  * Encoding ([[encodeUdf]]) is per-row CPU work with no data exchange:
  * the merge ranks broadcast once (numMerges entries) and each word folds
  * through its merges independently. A Catalyst expression with codegen
  * would buy nothing here — the loop is data-dependent per word and the
  * UDF's cost is the algorithm's cost; the scale contract is that
  * encoding never shuffles and never looks beyond its own row.
  *
  * Determinism: pair counting uses exact Long counts; the best pair is
  * (count desc, pair lexicographic asc); encoding applies ranks
  * greedily (lowest rank first, leftmost occurrence first). Same corpus
  * -> same merges -> same tokens, on any cluster layout.
  */
object Bpe {

  /** End-of-word sentinel appended to each word's final symbol so merges
    * distinguish word-final from word-internal contexts ("est</w>" vs
    * "est"), as in the original formulation.
    */
  val EndOfWord = "</w>"

  /** (word, n) frequency table over lowercased whitespace tokens — the
    * single corpus-sized pass of BPE training.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** The smallest frequency-ranked vocabulary covering `coverage` of the
    * corpus token mass ("pick a vocab that covers 99.5% of tokens") —
    * the tokenizer-sizing decision input. A row survives iff the mass of
    * all STRICTLY higher-ranked words (count desc, word asc) is still
    * under coverage·total, so the crossing word is included and the
    * result is the minimal covering prefix.
    *
    * Scale: the cumulative mass comes from the distributed prefix sum
    * ([[graft.operators.Packing.withPrefixSum]]) over the descending
    * frequency order — a balanced range shuffle, NOT an unpartitioned
    * vocabulary-wide window (web-scale vocabularies are hundreds of
    * millions of rows).
    */
  def vocabCoverage(freq: DataFrame, coverage: Double): DataFrame = {
    require(coverage > 0.0 && coverage <= 1.0,
      s"coverage must be in (0, 1], got $coverage")
    val total = freq.agg(sum(col("n")).as("__total"))
    graft.operators.Packing.withPrefixSum(
        freq.select(col("word"), col("n")), col("n"), "__before",
        Seq(col("n").desc, col("word").asc))
      .crossJoin(broadcast(total))
      .where(col("__before").cast("double") <
        lit(coverage) * col("__total").cast("double"))
      .select(col("word"), col("n"))
  }

  /** Train `numMerges` merges from a word-frequency table (driver-side,
    * deterministic). `maxWords` bounds the dictionary: the top words by
    * (n desc, word asc) — one bounded sort job, never a full collect of
    * an unbounded vocabulary.
    */
  def trainMerges(freq: DataFrame, numMerges: Int,
      maxWords: Int = 100000): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val dict = freq.select(col("word").cast("string"), col("n").cast("long"))
      .orderBy(col("n").desc, col("word").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainMergesLocal(dict, numMerges)
  }

  /** The trainer itself, over an in-memory dictionary (exposed for laws). */
  def trainMergesLocal(dict: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    // each word as its symbol sequence; start from characters + sentinel
    var words: Array[(Array[String], Long)] = dict.map { case (w, n) =>
      val chars = w.map(_.toString).toArray
      if (chars.isEmpty) (chars, n)
      else { chars(chars.length - 1) += EndOfWord; (chars, n) }
    }.filter(_._1.nonEmpty)
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < numMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          j += 1
        }
      }
      if (counts.isEmpty) i = numMerges
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += joined; j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, n)
          }
        }
        i += 1
      }
    }
    merges.toSeq
  }

  /** Encode ONE word (already lowercased, no whitespace) to its BPE
    * symbols under `ranks` (merge pair -> rank; lower merges first).
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms = {
      val cs = word.map(_.toString).toArray
      cs(cs.length - 1) += EndOfWord
      cs
    }
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        val out = new Array[String](syms.length - 1)
        var k = 0
        var j2 = 0
        while (j2 < syms.length) {
          if (j2 == bestAt) { out(k) = syms(j2) + syms(j2 + 1); k += 1; j2 += 2 }
          else { out(k) = syms(j2); k += 1; j2 += 1 }
        }
        syms = out
      }
    }
    syms
  }

  /** Column of BPE tokens for a text column: lowercased whitespace words,
    * each encoded under the trained merges. Broadcast-closure UDF — per
    * row CPU only, no exchange (see object doc for why not an Expression).
    */
  def encodeUdf(merges: Seq[(String, String)]): Column => Column = {
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val f = udf { text: String =>
      if (text == null) Array.empty[String]
      else text.toLowerCase.split("\\s+").iterator.filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, ranks)).toArray
    }
    (c: Column) => f(c)
  }

  /** Reverse of [[encodeUdf]] at the word level: tokens concatenate back
    * to the space-joined lowercased words (the roundtrip law).
    */
  def decodeTokens(tokens: Seq[String]): String =
    tokens.mkString("").replace(EndOfWord, " ").trim
}
