package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Language-model quality scoring — the CCNet-style filter (Wenzek et al.,
  * LREC 2020): score each document by its mean per-token surprisal under a
  * language model trained on a trusted reference corpus; documents that
  * look nothing like the reference (high surprisal) are dropped or
  * down-weighted before training. The model here is the unigram LM — the
  * degenerate but embarrassingly-scalable case: the whole "model" is a
  * (token, -log2 p) table.
  *
  * 100 TB shape: the LM table is VOCABULARY-sized (millions of rows at
  * web scale, a few GB) — it broadcasts; scoring explodes documents to
  * (id, token) pairs, probes the broadcast map, and mean-aggregates on id
  * with partial aggregation. The corpus pass that builds the table is one
  * hash aggregation over token counts.
  */
object Scoring {

  /** (token, logp) table from a reference corpus: logp = -log2 of the
    * token's unigram probability. Tokens are [[TextFunctions.tokens]] of
    * the lowercased text — the same tokenizer as every other operator.
    */
  def unigramLm(corpus: DataFrame, textCol: String): DataFrame = {
    val counts = corpus
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("token"),
        (-log2(col("cnt").cast("double") / col("__total"))).as("logp"))
  }

  /** (prev, token, logp) conditional-bigram table: logp = -log2 of
    * P(token | prev) = c(prev, token) / c(prev as predecessor). Bigrams
    * never cross document boundaries. One step from [[unigramLm]] toward
    * the n-gram KenLM CCNet itself uses; same broadcast-table shape.
    */
  def bigramLm(corpus: DataFrame, textCol: String): DataFrame = {
    val bgCounts = corpus
      .select(explode(bigrams(col(textCol))).as("bg"))
      .groupBy(col("bg.prev").as("prev"), col("bg.token").as("token"))
      .agg(count(lit(1)).as("cnt"))
    val ctx = bgCounts.groupBy(col("prev")).agg(sum(col("cnt")).as("__n"))
    bgCounts.join(ctx, "prev")
      .select(col("prev"), col("token"),
        (-log2(col("cnt").cast("double") / col("__n"))).as("logp"))
  }

  /** Mean per-bigram surprisal under a [[bigramLm]] table; unseen bigrams
    * (including unseen contexts) cost `unkLogp` bits. Documents with fewer
    * than two tokens score `unkLogp`.
    */
  def bigramSurprisal(docs: DataFrame, lm: DataFrame, textCol: String,
      idCol: String, unkLogp: Double = 24.0): DataFrame =
    docs
      .select(col(idCol), explode_outer(bigrams(col(textCol))).as("bg"))
      .join(broadcast(lm),
        col("bg.prev") === col("prev") && col("bg.token") === col("token"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(avg(coalesce(col("logp"), lit(unkLogp))), lit(unkLogp))
        .as("surprisal"))

  /** array<struct<prev,token>> of in-document token bigrams; empty for
    * docs under two tokens (slice length would go negative unguarded).
    */
  private def bigrams(text: Column): Column = {
    val toks = TextFunctions.tokens(lower(text))
    when(size(toks) >= 2,
      arrays_zip(
        slice(toks, lit(1), size(toks) - 1).as("prev"),
        slice(toks, lit(2), size(toks) - 1).as("token")))
      .otherwise(array().cast("array<struct<prev:string,token:string>>"))
  }

  /** Stupid-backoff trigram LM scoring (Brants et al., EMNLP 2007 — the
    * web-scale LM that deliberately skips normalization): S(w | p2 p1) =
    * c3/c2ctx if the trigram was seen, else 0.4 · c2/c1ctx, else
    * 0.4² · c1/N, else a fixed unk cost. One n-gram order beyond
    * [[bigramLm]] and the standard poor-man's KenLM for CCNet-style
    * filtering.
    *
    * Scale note: the trigram table is POSITIONS-sized, not
    * vocabulary-sized — unlike the unigram/bigram tables it must not be
    * forced broadcast; the probe join is left to the planner (broadcast
    * at gate scale, shuffled hash at corpus scale — the join key
    * (p2, p1, w) is the shuffle key either way).
    */
  def backoffSurprisal(docs: DataFrame, corpus: DataFrame, textCol: String,
      idCol: String, unkLogp: Double = 24.0): DataFrame = {
    val tg = corpus.select(explode(trigrams(col(textCol))).as("g"))
      .groupBy(col("g.p2").as("p2"), col("g.p1").as("p1"),
        col("g.w").as("w"))
      .agg(count(lit(1)).as("c3"))
    val bg = corpus.select(explode(bigrams(col(textCol))).as("bg"))
      .groupBy(col("bg.prev").as("prev"), col("bg.token").as("token"))
      .agg(count(lit(1)).as("c2"))
    val uni = corpus
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c1"))
    val total = uni.agg(sum(col("c1")).as("__N"))
    val pos = docs.select(col(idCol), explode(trigrams(col(textCol))).as("g"))
      .select(col(idCol), col("g.p2").as("p2"), col("g.p1").as("p1"),
        col("g.w").as("w"))
    val scoredPos = pos
      .join(tg, Seq("p2", "p1", "w"), "left")
      .join(bg.select(col("prev").as("p2"), col("token").as("p1"),
        col("c2").as("cb_ctx")), Seq("p2", "p1"), "left")
      // bigram tables grow ~linearly with corpus positions, not vocabulary
      // — like the trigram probe above, both bigram joins are left to the
      // planner (broadcast at gate scale, shuffled hash at corpus scale)
      .join(bg.select(col("prev").as("p1"), col("token").as("w"),
        col("c2").as("cb")), Seq("p1", "w"), "left")
      .join(broadcast(uni.select(col("token").as("p1"), col("c1").as("c1_ctx"))),
        Seq("p1"), "left")
      .join(broadcast(uni.select(col("token").as("w"), col("c1").as("c1w"))),
        Seq("w"), "left")
      .crossJoin(broadcast(total))
      .withColumn("__s",
        when(col("c3").isNotNull,
          col("c3").cast("double") / col("cb_ctx").cast("double"))
        .when(col("cb").isNotNull,
          lit(0.4) * (col("cb").cast("double") / col("c1_ctx").cast("double")))
        .when(col("c1w").isNotNull,
          lit(0.16) * (col("c1w").cast("double") / col("__N").cast("double"))))
      .withColumn("__surp",
        when(col("__s").isNotNull, -log2(col("__s"))).otherwise(lit(unkLogp)))
    docs.select(col(idCol))
      .join(scoredPos.groupBy(col(idCol)).agg(avg(col("__surp")).as("surprisal")),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("surprisal"), lit(unkLogp)).as("surprisal"))
  }

  /** array<struct<p2,p1,w>> of in-document token trigrams; empty under
    * three tokens.
    */
  private def trigrams(text: Column): Column = {
    val toks = TextFunctions.tokens(lower(text))
    when(size(toks) >= 3,
      arrays_zip(
        slice(toks, lit(1), size(toks) - 2).as("p2"),
        slice(toks, lit(2), size(toks) - 2).as("p1"),
        slice(toks, lit(3), size(toks) - 2).as("w")))
      .otherwise(array().cast("array<struct<p2:string,p1:string,w:string>>"))
  }

  /** Mean per-token surprisal of each document under `lm` ((token, logp)).
    * Out-of-vocabulary tokens cost `unkLogp` bits (choose >= the table's
    * max — unseen should never score cheaper than rare). Lower = closer to
    * the reference corpus. Empty documents score `unkLogp`.
    */
  def surprisal(docs: DataFrame, lm: DataFrame, textCol: String,
      idCol: String, unkLogp: Double = 24.0): DataFrame =
    docs
      .select(col(idCol),
        explode_outer(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .join(broadcast(lm), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(avg(coalesce(col("logp"), lit(unkLogp))), lit(unkLogp))
        .as("surprisal"))

  /** Per-group quality gate: keep the best `frac` of each group's rows by
    * (`score` desc, `tieKey` asc) — "top 30% by quality per language",
    * the rank cut a curated release applies after scoring. Rank-based,
    * not threshold-based, deliberately: a percentile-threshold gate
    * inherits float-interpolation ambiguity exactly at the cut boundary,
    * while a rank cut is integer-exact, deterministic, and keeps
    * ceil(frac·n) rows per group by construction.
    *
    * Adds `rankOut` (the row's 1-based rank within its group). Scale: one
    * count aggregation broadcast back + one window PARTITIONED by group —
    * cost bounded by the largest group, the same contract as sessionize;
    * if one group dominates the corpus, pre-split by a salted subkey and
    * take per-split top-frac first (the [[Sampling.quota]] oversample
    * trick applies unchanged).
    */
  def topFractionByScore(df: DataFrame, group: Column, score: Column,
      tieKey: Column, frac: Double, rankOut: String = "rank"): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val withG = df.withColumn("__g", group)
    val counts = withG.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(score.desc, tieKey.asc)
    withG.join(broadcast(counts), "__g")
      .withColumn(rankOut, row_number().over(w))
      .where(col(rankOut) <= ceil(lit(frac) * col("__n")))
      .drop("__g", "__n")
  }

  /** [[topFractionByScore]] for the regime where one group carries a
    * data-sized share of the corpus: the plain form's per-group window
    * funnels that whole group through one task's sort. Here each group
    * first elects per-SALT candidates (`salts` hash shards, each keeping
    * its top ceil(oversample·K/salts) rows where K = ceil(frac·n)), and
    * the exact ranking window runs over the candidate union only —
    * ~oversample·K rows per group instead of n.
    *
    * Exactness is declarative, not probabilistic (the [[Sampling.quota]]
    * pattern): a salt that contributed its FULL cap to the winners while
    * holding more rows than the cap could be hiding better rows behind
    * the cut — any group with such a salt falls back to the exact
    * full-group ranking (one anti-join + re-rank of only those groups;
    * empty on every healthy run). If every salt contributed under its
    * cap, each salt's best non-elected candidate proves every
    * non-candidate ranks below all winners, so the result — ranks
    * included — is IDENTICAL to the plain form by construction.
    *
    * `saltOf` exposes the salt assignment for tests; the default hashes
    * the tie key.
    */
  def topFractionByScoreSalted(df: DataFrame, group: Column, score: Column,
      tieKey: Column, frac: Double, salts: Int = 16, oversample: Double = 2.0,
      rankOut: String = "rank",
      saltOf: Option[Column => Column] = None): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    require(salts >= 1 && oversample > 1.0, "need salts >= 1 and oversample > 1")
    val saltFn = saltOf.getOrElse((c: Column) => pmod(xxhash64(c), lit(salts)))
    val outCols = df.columns.toIndexedSeq.map(col) :+ col(rankOut)
    val withG = df.withColumn("__g", group)
    val counts = withG.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val withK = withG.join(broadcast(counts), "__g")
      .withColumn("__K", ceil(lit(frac) * col("__n")))
      .withColumn("__cap", ceil(lit(oversample) * col("__K") / lit(salts)))
      .withColumn("__salt", saltFn(tieKey))
    val saltW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g"), col("__salt")).orderBy(score.desc, tieKey.asc)
    val gW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(score.desc, tieKey.asc)
    val cands = withK.withColumn("__srn", row_number().over(saltW))
      .where(col("__srn") <= col("__cap"))
    val elected = cands.withColumn(rankOut, row_number().over(gW))
      .where(col(rankOut) <= col("__K"))
    // shortfall detection: (group, salt) pairs whose winner contribution
    // hit the cap with rows left uninspected behind it
    val saltCounts = withK.groupBy(col("__g"), col("__salt"))
      .agg(count(lit(1)).as("__m"))
    val short = elected.groupBy(col("__g"), col("__salt"))
      .agg(count(lit(1)).as("__w"), first(col("__cap")).as("__c"))
      .join(saltCounts, Seq("__g", "__salt"))
      .where(col("__w") >= col("__c") && col("__m") > col("__c"))
      .select(col("__g")).distinct()
    val healthy = elected.join(broadcast(short), Seq("__g"), "left_anti")
    val rescued = withK.join(broadcast(short), "__g")
      .withColumn(rankOut, row_number().over(gW))
      .where(col(rankOut) <= col("__K"))
    healthy.select(outCols: _*).unionByName(rescued.select(outCols: _*))
  }

  /** A trained multinomial Naive-Bayes text classifier: `tokenLlr` is the
    * vocabulary-sized (token, llr) table (llr = ln P(token|pos) −
    * ln P(token|neg), Laplace-smoothed), `consts` is ONE row
    * (prior, unk_llr). Both stay lazy DataFrames: training is pure
    * aggregation, so the model composes into a single plan with scoring
    * and nothing is collected to the driver.
    */
  final case class NaiveBayesModel(tokenLlr: DataFrame, consts: DataFrame)

  /** Per-(token, class) Laplace-count state of a Naive-Bayes trainer —
    * the MERGEABLE form: counts are plain sums, so two corpora's count
    * tables combine by key-wise addition (the engine's sumByKey shape)
    * and incremental retraining is exact, not approximate. Schema:
    * (token, c_pos, c_neg).
    */
  def naiveBayesCounts(labeled: DataFrame, textCol: String,
      label: Column): DataFrame =
    labeled
      .select(label.cast("boolean").as("__y"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("c_neg"))

  /** Key-wise sum of two [[naiveBayesCounts]] tables — adding a day's
    * labeled data to a stored model state is one outer-join-free union +
    * re-aggregate, the same roll-forward contract as the batch Summer.
    */
  def mergeNaiveBayesCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("token"))
      .agg(sum(col("c_pos")).as("c_pos"), sum(col("c_neg")).as("c_neg"))

  /** Finalize a counts table + document-class counts into a scoring model.
    * `docClassCounts` must be one row (d_pos, d_neg) — it is sums too, so
    * it merges across corpora the same way the token counts do. Both
    * classes must be non-empty (a one-class "classifier" is a constant).
    */
  def naiveBayesFromCounts(counts: DataFrame,
      docClassCounts: DataFrame): NaiveBayesModel = {
    // a degenerate one-class split would silently produce ln(0) = -Inf
    // priors and NaN scores downstream — fail loudly instead. The guard
    // lives IN the plan (raise_error on the one-row frame), so the model
    // stays a lazy composable DataFrame and the check costs nothing extra.
    val guarded = docClassCounts.select(
      when(col("d_pos") > 0 && col("d_neg") > 0, col("d_pos"))
        .otherwise(raise_error(concat(
          lit("naiveBayesFromCounts needs BOTH classes non-empty, got d_pos="),
          col("d_pos").cast("string"), lit(" d_neg="),
          col("d_neg").cast("string"),
          lit(" — a one-class training split is a constant, not a classifier"))))
        .as("d_pos"),
      col("d_neg"))
    // the totals and llr consumers share the counts aggregation's own
    // shuffle stage within one action (AQE stage reuse) — a checkpoint
    // here measured as pure extra-job overhead (round 20, tried+reverted)
    val totals = counts.agg(sum(col("c_pos")).as("n_pos"),
      sum(col("c_neg")).as("n_neg"), count(lit(1)).as("v"))
    val consts = totals.crossJoin(guarded).select(
      (log(col("d_pos").cast("double")) - log(col("d_neg").cast("double")))
        .as("prior"),
      (log((col("n_neg") + col("v")).cast("double")) -
        log((col("n_pos") + col("v")).cast("double"))).as("unk_llr"),
      col("n_pos"), col("n_neg"), col("v"))
    val tokenLlr = counts
      .crossJoin(broadcast(consts.select(col("n_pos"), col("n_neg"), col("v"))))
      .select(col("token"),
        (log((col("c_pos") + lit(1L)).cast("double") /
            (col("n_pos") + col("v")).cast("double")) -
          log((col("c_neg") + lit(1L)).cast("double") /
            (col("n_neg") + col("v")).cast("double"))).as("llr"))
    NaiveBayesModel(tokenLlr, consts.select(col("prior"), col("unk_llr")))
  }

  /** Train a multinomial Naive-Bayes quality classifier — the
    * fastText-style learned filter (a GPT-3/CCNet-lineage quality gate
    * trains a linear text classifier on a trusted-vs-crawl split and
    * keeps high-scoring documents; NB is that linear scorer with
    * closed-form training). `label` marks the positive class.
    *
    * 100 TB shape: training IS one token-count hash aggregation (plus a
    * 1-row doc count) — embarrassingly scalable, no iteration, no driver
    * state; the model is a vocabulary-sized broadcast table.
    */
  def naiveBayesTrain(labeled: DataFrame, textCol: String,
      label: Column): NaiveBayesModel = {
    val docCounts = labeled.agg(
      sum(when(label.cast("boolean"), 1L).otherwise(0L)).as("d_pos"),
      sum(when(!label.cast("boolean"), 1L).otherwise(0L)).as("d_neg"))
    naiveBayesFromCounts(naiveBayesCounts(labeled, textCol, label), docCounts)
  }

  /** Persist a trained model as two parquet tables (token_llr + consts)
    * — the serving artifact: a scorer process loads it without seeing
    * the training corpus, and doubles round-trip parquet bit-exactly,
    * so the stored model scores identically to the in-memory one
    * (law-pinned and gate-pinned via q_nb_stored's shared oracle).
    */
  def saveNaiveBayes(model: NaiveBayesModel, path: String): Unit = {
    model.tokenLlr.write.mode("overwrite").parquet(s"$path/token_llr")
    model.consts.write.mode("overwrite").parquet(s"$path/consts")
  }

  def loadNaiveBayes(spark: SparkSession, path: String): NaiveBayesModel =
    NaiveBayesModel(spark.read.parquet(s"$path/token_llr"),
      spark.read.parquet(s"$path/consts"))

  /** A trained MULTI-CLASS multinomial Naive-Bayes classifier:
    * `tokenLogp` is (token, cls, logp) — ln of the Laplace-smoothed
    * in-class token probability — and `classes` is one row per class
    * (cls, prior, unk): ln class prior and the ln-probability a token
    * unseen in that class costs. The trained-language-ID shape: classes
    * are languages, training is still pure aggregation.
    */
  final case class NaiveBayesMultiModel(tokenLogp: DataFrame, classes: DataFrame)

  /** Train a multi-class NB classifier from `classCol` labels — the
    * trained counterpart of the n-gram-heuristic language ID (and the
    * general "route documents to K buckets by example" learner). One
    * (token, class) count aggregation is the whole training run; the
    * model is (vocab × observed-classes)-sized and broadcasts.
    */
  def naiveBayesMultiTrain(labeled: DataFrame, textCol: String,
      classCol: Column): NaiveBayesMultiModel = {
    val lab = labeled.select(classCol.cast("string").as("cls"),
      lower(col(textCol)).as("__t"))
    val tok = lab.select(col("cls"),
      explode(TextFunctions.tokens(col("__t"))).as("token"))
    val ptc = tok.groupBy(col("token"), col("cls")).agg(count(lit(1)).as("c"))
    val nc = ptc.groupBy(col("cls")).agg(sum(col("c")).as("n"))
    val v = ptc.agg(countDistinct(col("token")).as("v"))
    val dcl = lab.groupBy(col("cls")).agg(count(lit(1)).as("d"))
    val dt = lab.agg(count(lit(1)).as("dt"))
    val classes = nc.join(dcl, "cls")
      .crossJoin(broadcast(v)).crossJoin(broadcast(dt))
      .select(col("cls"),
        (log(col("d").cast("double")) - log(col("dt").cast("double")))
          .as("prior"),
        log(lit(1.0) / (col("n") + col("v")).cast("double")).as("unk"))
    val tokenLogp = ptc.join(nc, "cls").crossJoin(broadcast(v))
      .select(col("token"), col("cls"),
        log((col("c") + lit(1L)).cast("double") /
          (col("n") + col("v")).cast("double")).as("logp"))
    NaiveBayesMultiModel(tokenLogp, classes)
  }

  /** Predict the argmax class per document (ties break to the
    * lexicographically smallest class — deterministic). Plan: explode →
    * small crossJoin with the class row set → broadcast (token, class)
    * probe → one hash aggregation per (doc, class) → a per-doc window
    * over |classes| rows. Documents with no tokens score each class its
    * prior.
    */
  def naiveBayesMultiPredict(docs: DataFrame, model: NaiveBayesMultiModel,
      textCol: String, idCol: String): DataFrame = {
    val dtok = docs.select(col(idCol),
      explode_outer(TextFunctions.tokens(lower(col(textCol)))).as("token"))
    val scored = dtok.crossJoin(broadcast(model.classes))
      .join(broadcast(model.tokenLogp), Seq("token", "cls"), "left")
      .groupBy(col(idCol), col("cls"))
      .agg((first(col("prior")) +
        coalesce(sum(when(col("token").isNotNull,
          coalesce(col("logp"), col("unk"))).otherwise(lit(0.0))), lit(0.0)))
        .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("cls").asc)
    scored.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(idCol), col("cls"), col("score"))
  }

  /** Score documents under a [[NaiveBayesModel]]: per-doc log-odds =
    * prior + Σ llr(token) (unseen tokens cost `unk_llr`), `pred` =
    * log-odds > 0. Same plan shape as [[surprisal]]: explode → broadcast
    * probe → hash re-aggregate on the id; documents with no tokens score
    * exactly the prior.
    */
  def naiveBayesScore(docs: DataFrame, model: NaiveBayesModel,
      textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol),
        explode_outer(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .join(broadcast(model.tokenLlr), Seq("token"), "left")
      .crossJoin(broadcast(model.consts))
      .groupBy(col(idCol))
      .agg((first(col("prior")) +
        coalesce(sum(when(col("token").isNotNull,
          coalesce(col("llr"), col("unk_llr"))).otherwise(lit(0.0))), lit(0.0)))
        .as("score"))
      .select(col(idCol), col("score"), (col("score") > lit(0.0)).as("pred"))
}
