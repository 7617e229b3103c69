package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (codegen'd, pushdown-friendly); closures appear only where a per-row
  * algorithm genuinely can't be expressed columnar (simhash bit-folding,
  * n-gram language model), and those stay inside one narrow projection —
  * no shuffle, no state.
  */
object TextFunctions {

  /** Whitespace tokenizer — single definition shared by every operator so
    * Spark results and oracle SQL agree exactly: split on runs of
    * whitespace, drop empties.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs, digit runs, and single non-space
    * punctuation — the standard pre-tokenization shape of GPT byte-pair
    * encoders. Match-counting (RE2-safe, no lookaround) so the same pattern
    * runs in Spark and oracle engines.
    */
  val SubwordPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(SubwordPattern), lit(0)))

  /** Deterministic document fingerprint: 64-bit xxhash of the
    * case/whitespace/punct-normalized text. Matches DuckDB via md5 of the
    * same normalization when oracle-checked (xxhash64 seeds differ across
    * engines; md5 is engine-stable).
    */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))
  def fingerprintMd5(text: Column): Column = md5(normalizedText(text))
  def fingerprint64(text: Column): Column = xxhash64(normalizedText(text))

  /** Quality scoring: the classic cheap pretraining filters (length, mean
    * word length, punctuation ratio, stopword ratio, alpha ratio) — cf. the
    * C4/Gopher-style heuristics. All columnar.
    */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "be", "this", "that")

  def charCount(text: Column): Column = length(text)
  def meanWordLength(text: Column): Column = {
    val tk = tokens(text)
    when(size(tk) > 0,
      aggregate(tk, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(tk))
      .otherwise(lit(0.0))
  }
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}]", "")))
        .cast("double") / length(text))
      .otherwise(lit(0.0))
  def stopwordRatio(text: Column): Column = {
    val tk = tokens(lower(text))
    when(size(tk) > 0,
      size(filter(tk, t => t.isin(EnglishStopwords.map(lit(_)): _*))).cast("double") / size(tk))
      .otherwise(lit(0.0))
  }
  def alphaRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Composite quality score in [0,1]: weighted blend of the heuristics,
    * tuned so typical clean English prose scores > 0.5.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(charCount(text).cast("double") / lit(500.0), lit(1.0))
    val wordLen = meanWordLength(text)
    val wordLenScore = when(wordLen.between(3.0, 10.0), 1.0).otherwise(0.3)
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctScore = when(punctRatio(text) < 0.2, 1.0).otherwise(0.2)
    round(lenScore * 0.25 + wordLenScore * 0.25 + stopScore * 0.25 + punctScore * 0.25, 6)
  }

  // --- PII redaction (the scrub pass before any corpus release; patterns
  // are RE2-safe — no lookaround, no backrefs — so the identical regex runs
  // in Spark (Java regex) and the DuckDB oracle (RE2), and would run in any
  // RE2-based scrubber). regexp_replace is codegen'd: the whole pass is a
  // narrow projection.

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // Anchoring rationale: the trailing \b plus a boundary at each head form
  // make over-long digit runs (16-digit cards, 14-digit timestamps)
  // unmatchable. The head is a four-way alternation because \b cannot
  // match before '+' or '(' (non-word chars on both sides) and RE2 has no
  // lookbehind: a '+CC' or '(NNN)' head anchors on its literal instead,
  // so "+1 555-123-4567" and "(555) 123-4567" redact whole — no leaked
  // '+' prefix — while the no-plus country-code form ("1-800-555-0199",
  // compact "15551234567") and bare digit runs anchor on the leading \b.
  val PhonePattern =
    "(\\+\\d{1,3}[-. ]?(\\(\\d{3}\\)|\\d{3})|\\b\\d{1,3}[-. ]?(\\(\\d{3}\\)|\\d{3})|\\(\\d{3}\\)|\\b\\d{3})[-. ]?\\d{3}[-. ]?\\d{4}\\b"
  val SsnPattern = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, "<EMAIL>")
  def redactIps(text: Column): Column =
    regexp_replace(text, Ipv4Pattern, "<IP>")
  def redactPhones(text: Column): Column =
    regexp_replace(text, PhonePattern, "<PHONE>")
  def redactSsns(text: Column): Column =
    regexp_replace(text, SsnPattern, "<SSN>")

  /** Full scrub. Order matters: emails first (an address can embed digit
    * runs a later pass would half-eat), then SSN before phone (an SSN is a
    * phone-shaped digit run with higher specificity).
    */
  def redactPii(text: Column): Column =
    redactPhones(redactSsns(redactIps(redactEmails(text))))

  /** Match counts per category — the audit metric (how much PII a source
    * carries decides whether it ships at all).
    */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(EmailPattern)).as("emails"),
    regexp_count(text, lit(Ipv4Pattern)).as("ips"),
    regexp_count(text, lit(SsnPattern)).as("ssns"),
    regexp_count(text, lit(PhonePattern)).as("phones"))

  // --- repetition metrics (the Gopher quality-filter family: Rae et al.
  // 2021 "Scaling Language Models", appendix A1.1 — docs dominated by
  // repeated lines / n-grams are boilerplate or spam and get dropped
  // before training). All columnar HOFs in one narrow projection: no
  // shuffle, no UDF, prunes to the text column.

  /** Non-empty lines (trimmed-empty lines dropped, content preserved). */
  def linesCol(text: Column): Column =
    filter(split(text, "\n"), l => length(trim(l)) > 0)

  /** Fraction of line occurrences that are repeats of another line —
    * `(count - distinct) / count`; 0.0 for empty docs.
    */
  def duplicateLineFraction(text: Column): Column = {
    val ls = linesCol(text)
    when(size(ls) > 0,
      (size(ls) - size(array_distinct(ls))).cast("double") / size(ls))
      .otherwise(lit(0.0))
  }

  /** Fraction of characters sitting in lines that occur more than once
    * (all occurrences counted, per the Gopher "duplicate line character
    * fraction" rule). Quadratic in lines-per-doc — bounded by document
    * size, still one codegen'd projection.
    */
  def duplicateLineCharFraction(text: Column): Column = {
    val ls = linesCol(text)
    val dupChars = aggregate(
      filter(ls, l => size(filter(ls, x => x === l)) > 1),
      lit(0L), (acc, l) => acc + length(l))
    val allChars = aggregate(ls, lit(0L), (acc, l) => acc + length(l))
    when(allChars > 0, dupChars.cast("double") / allChars).otherwise(lit(0.0))
  }

  /** Hashed word n-grams in document order (duplicates kept) — the
    * counting basis for the n-gram repetition rules. Shares [[tokens]]
    * with every other operator; hashing via the native ShingleHashes
    * kernel. Docs shorter than n tokens yield their full token run as one
    * n-gram; empty docs an empty array.
    */
  def wordNgramHashes(text: Column, n: Int): Column =
    NativeExpressions.shingleHashes(tokens(lower(text)), n)

  /** Fraction of n-gram occurrences that are repeats — `(count - distinct)
    * / count` over [[wordNgramHashes]]; 0.0 when no n-grams.
    */
  def duplicateNgramFraction(text: Column, n: Int): Column = {
    val ng = wordNgramHashes(text, n)
    when(size(ng) > 0,
      (size(ng) - size(array_distinct(ng))).cast("double") / size(ng))
      .otherwise(lit(0.0))
  }

  /** Occurrence share of the single most frequent n-gram (the Gopher
    * "top n-gram fraction"); 0.0 when no n-grams.
    */
  def topNgramFraction(text: Column, n: Int): Column = {
    val ng = wordNgramHashes(text, n)
    val topCount = array_max(
      transform(array_distinct(ng), g => size(filter(ng, x => x === g))))
    when(size(ng) > 0, topCount.cast("double") / size(ng)).otherwise(lit(0.0))
  }

  /** Character n-grams of the lowercased text — the feature for language ID.
    * Columnar: slice the string at every offset (substr is codegen'd).
    */
  def charNgrams(text: Column, n: Int): Column = {
    val s = lower(text)
    filter(
      transform(sequence(lit(1), greatest(length(s) - lit(n - 1), lit(1))),
        i => s.substr(i, lit(n))),
      g => length(g) === n)
  }

  /** Language ID: tiny trigram language profiles (top frequent trigrams per
    * language, public-knowledge stopword/trigram lists), scored per document
    * by profile hits. Implemented as one scalar closure over the string (no
    * shuffle); accurate enough to separate latin-script languages and CJK by
    * unicode range.
    */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng ", " to", "to ", "ion", " is", "is "),
    "de" -> Seq("en ", " de", "der", "er ", "ie ", " di", "die", "ein", "ich", "sch", "und", " un", "nd ", "ch ", "ung"),
    "fr" -> Seq(" de", "de ", "es ", " le", "le ", "ent", "nt ", "la ", " la", "tio", "ion", " et", "et ", "que", " qu"),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "el ", " el", "es ", " en", "en ", "ión", "ció", " co", "ado", "que"),
    "it" -> Seq(" di", "di ", "to ", " de", "la ", " la", "re ", "ell", " co", "ion", "one", "che", " ch", "ato", "nte"))

  private val cjk = "[\\u4e00-\\u9fff]".r
  private val hira = "[\\u3040-\\u30ff]".r
  private val hangul = "[\\uac00-\\ud7af]".r
  private val cyr = "[\\u0400-\\u04ff]".r

  def languageOf(text: String): String = {
    if (text == null || text.isEmpty) "und"
    else if (hira.findFirstIn(text).isDefined) "ja"
    else if (hangul.findFirstIn(text).isDefined) "ko"
    else if (cjk.findFirstIn(text).isDefined) "zh"
    else if (cyr.findFirstIn(text).isDefined) "ru"
    else {
      val t = " " + text.toLowerCase.replaceAll("[^\\p{L} ]", " ").replaceAll("\\s+", " ") + " "
      val grams = (0 to t.length - 3).foldLeft(Map.empty[String, Int]) { (m, i) =>
        val g = t.substring(i, i + 3); m.updated(g, m.getOrElse(g, 0) + 1)
      }
      val scored = LangProfiles.map { case (lang, profile) =>
        lang -> profile.iterator.map(g => grams.getOrElse(g, 0)).sum
      }
      val (best, score) = scored.maxBy { case (l, s) => (s, l) }
      if (score == 0) "und" else best
    }
  }

  /** Column form of [[languageOf]] — a deterministic scalar UDF (narrow, no
    * shuffle; codegen falls back to UDF call for just this projection).
    */
  val langIdUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(languageOf _)

  /** 64-bit SimHash over whitespace tokens: per-token 64-bit hash, signed
    * bit-vote fold. Scalar closure (per-row, no shuffle).
    */
  def simhash64(text: String): Long = {
    if (text == null) 0L
    else {
      val votes = new Array[Int](64)
      text.toLowerCase.split("\\s+").iterator.filter(_.nonEmpty).foreach { tok =>
        val h = graft.algebra.HLL.fmix64(tok.foldLeft(1125899906842597L)((a, c) => 31 * a + c))
        var i = 0
        while (i < 64) { if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1; i += 1 }
      }
      var out = 0L; var i = 0
      while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
      out
    }
  }
  val simhashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(simhash64 _)

  def hammingDistance64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Rolling (Rabin-Karp) hash fingerprints of token w-shingles — the
    * standard content-defined fingerprinting primitive. Returns the set of
    * shingle hashes (for winnowing pick min per window downstream).
    */
  def shingleHashes(text: String, w: Int): Array[Long] = {
    if (text == null) Array.empty
    else {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < w) {
        if (toks.isEmpty) Array.empty
        else Array(graft.algebra.HLL.fmix64(toks.mkString(" ").hashCode.toLong))
      } else
        (0 to toks.length - w).map { i =>
          graft.algebra.HLL.fmix64(toks.slice(i, i + w).mkString(" ").foldLeft(1125899906842597L)((a, c) => 31 * a + c))
        }.toArray
    }
  }
  def shingleUdf(w: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => shingleHashes(s, w))

  /** Winnowing fingerprint (Schleimer-Wilkerson-Aiken, SIGMOD'03 — the
    * MOSS document-fingerprint scheme): the distinct minima of every
    * `window`-length sliding window over the shingle-hash SEQUENCE.
    * Guarantees every match of length >= window + w - 1 tokens shares a
    * fingerprint, while keeping ~2/(window+1) of the shingles. Fully
    * columnar over a shingle-hash array column (see
    * [[graft.operators.Dedup.shingleCol]] for the hash sequence).
    */
  def winnow(shingleSeq: Column, window: Int): Column = {
    require(window > 0)
    val n = size(shingleSeq)
    array_distinct(
      when(n > window,
        transform(sequence(lit(1), n - lit(window - 1)),
          i => array_min(slice(shingleSeq, i, lit(window)))))
        .otherwise(when(n > 0, array(array_min(shingleSeq)))
          .otherwise(array().cast("array<bigint>"))))
  }
}
