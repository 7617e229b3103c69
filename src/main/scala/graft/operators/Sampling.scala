package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `df.sample()` draws from a per-partition RNG: re-running the job, adding
  * an executor, or compacting input files changes WHICH rows are kept — a
  * disaster for reproducible dataset releases. Everything here instead
  * derives a uniform [0, 1) value from the md5 of a caller-chosen stable
  * key, so membership is a pure function of the data: re-runs, re-shards
  * and other engines (the DuckDB oracle runs the identical arithmetic)
  * agree row-for-row. Sampling is a narrow codegen'd filter — no shuffle,
  * no state, pushes the key column read down to the scan.
  *
  * md5 (not xxhash64/murmur3) because it is the one hash every engine
  * spells identically; 8 hex digits = 32 uniform bits, plenty for sampling
  * rates down to ~1e-9.
  */
object Sampling {

  /** Uniform [0, 1) from the md5 of `key` — stable across runs, partitions
    * and engines. DuckDB equivalent:
    * `CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8) AS UBIGINT) / 4294967296.0`
    */
  def uniformCol(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** Keep each row with probability `fraction`, decided by `key`. Rows keep
    * or drop TOGETHER across datasets sharing the key — sampling users (not
    * events) falls out of keying by user id.
    */
  def sampled(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.where(uniformCol(key) < lit(fraction))

  /** Per-stratum rates: keep a row of stratum s with probability
    * `fractions(s)` (`default` for unlisted strata). The common shape:
    * downsample the dominant web crawl, keep all of the rare
    * high-quality source.
    */
  def stratified(df: DataFrame, stratum: Column, key: Column,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    val rate = fractions.foldLeft(lit(default)) { case (acc, (s, f)) =>
      when(stratum === lit(s), lit(f)).otherwise(acc)
    }
    df.where(uniformCol(key) < rate)
  }

  /** EXACTLY `k` rows per stratum — the k smallest key-uniforms, so
    * membership is as deterministic and engine-reproducible as [[sampled]]
    * ("give me exactly 100k documents per language, the same ones every
    * run"). Strata smaller than k are kept whole.
    *
    * Scale shape: ranking whole strata in one window funnels each stratum
    * through a single task (a language at 100 TB is not a window). Instead:
    * per-stratum counts (hash agg, broadcast), an OVERSAMPLED narrow filter
    * keeps ~`oversample`·k candidates per stratum, and the exact trim's
    * window runs over that small candidate set. A stratum whose candidate
    * pool still came up short (P ≈ exp(-k/3) at oversample=4 — checked
    * declaratively, not assumed) falls back to ranking its full rows; the
    * fallback union is empty on every healthy run and costs one anti-join.
    */
  def quota(df: DataFrame, stratum: Column, key: Column, k: Int,
      oversample: Double = 4.0): DataFrame = {
    require(k > 0 && oversample > 1.0, "need k > 0 and oversample > 1")
    val cols = df.columns.toIndexedSeq.map(col)
    val withU = df.withColumn("__s", stratum).withColumn("__u", uniformCol(key))
      .withColumn("__k", key.cast("string"))
    val counts = withU.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
    val cands = withU.join(broadcast(counts), "__s")
      .where(col("__u") < least(lit(1.0), lit(oversample * k) / col("__n")))
    def trim(rows: DataFrame): DataFrame = rows.withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("__s")).orderBy(col("__u"), col("__k"))))
      .where(col("__rn") <= k)
    val trimmed = trim(cands)
    // short = strata where the candidate pool missed the true top-k: fewer
    // candidates than min(k, n). Empty in practice; the plan stays lazy.
    val short = cands.groupBy(col("__s")).agg(count(lit(1)).as("__c"))
      .join(broadcast(counts), "__s")
      .where(col("__c") < least(lit(k.toLong), col("__n")))
      .select(col("__s"))
    val healthy = trimmed.join(broadcast(short), Seq("__s"), "left_anti")
    val rescued = trim(withU.join(broadcast(short), "__s"))
    healthy.select(cols: _*).unionByName(rescued.select(cols: _*))
  }

  /** Deterministic disjoint split assignment (train/val/test): label each
    * row by where its uniform falls in the cumulative weight ranges.
    * Weights need not sum to 1 — they are normalized. Every row gets
    * exactly one label, so the splits partition the dataset.
    */
  def splitCol(key: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "split weights must be positive")
    val total = weights.map(_._2).sum
    val u = uniformCol(key)
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    // last split is the `otherwise` so float edges can't drop a row
    weights.init.zip(cuts.init).foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), acc) => when(u < lit(cut), lit(name)).otherwise(acc)
    }
  }

  /** Target-mixture sampling — the data-mixing table of a pretraining run
    * ("60% web, 20% code, 20% books"): derive each stratum's keep rate from
    * its target SHARE of a `totalRows`-row output, `rate(s) = min(1,
    * totalRows · w(s) / n(s))`, and apply the same deterministic key-uniform
    * filter as [[stratified]]. A stratum that cannot supply its target
    * (rate capped at 1) is kept whole — redistributing its shortfall is a
    * policy choice left with the caller; unlisted strata drop.
    *
    * Weights are ABSOLUTE shares of `totalRows` (they need not sum to 1;
    * the expected output size is `totalRows · Σw`). They are deliberately
    * NOT normalized: dividing by Σw would inject an IEEE-rounded factor
    * (0.5+0.2+0.2+0.1 ≠ 1.0 in doubles) and break bit-reproducibility of
    * the rate against other engines running the same arithmetic.
    *
    * Scale shape: one small per-stratum count aggregate whose result
    * broadcasts back as the rate table; the filter itself stays the narrow
    * codegen'd uniform comparison. No driver-side collect.
    */
  def mixture(df: DataFrame, stratum: Column, key: Column,
      weights: Map[String, Double], totalRows: Long): DataFrame = {
    require(totalRows > 0, s"totalRows must be > 0, got $totalRows")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive")
    val wCol = weights.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
      when(col("__s") === lit(s), lit(w)).otherwise(acc)
    }
    val rates = df.groupBy(stratum.as("__s")).agg(count(lit(1)).as("__n"))
      .withColumn("__rate", least(lit(1.0), lit(totalRows.toDouble) * wCol / col("__n")))
      .where(col("__rate") > 0)
      .select(col("__s"), col("__rate"))
    df.join(broadcast(rates), stratum === col("__s"))
      .where(uniformCol(key) < col("__rate"))
      .drop("__s", "__rate")
  }

  /** Deterministic k-fold assignment (cross-validation / eval splits):
    * fold = floor(u · k) from the same portable key-uniform — every row
    * gets exactly one fold in [0, k), folds are ~equal-sized, and
    * membership survives re-runs, re-shards and engines like
    * [[splitCol]]. DuckDB: `CAST(floor(u * k) AS INT)`.
    */
  def foldCol(key: Column, k: Int): Column = {
    require(k > 0, s"k must be positive, got $k")
    floor(uniformCol(key) * lit(k)).cast("int")
  }

  /** Weighted sampling WITHOUT replacement, deterministically — the
    * Efraimidis–Spirakis (IPL 2006) exponential-key scheme: each row's
    * order key is u^(1/w) (u the portable key-uniform, w its weight);
    * the k largest keys are EXACTLY a weighted draw without replacement.
    * The quality-weighted downsample ("keep 1M docs, preferring higher
    * scores") with the same reproducibility contract as everything else
    * here. Rows with w <= 0 can never be drawn and are excluded.
    *
    * Scale: the order key is a narrow projection; top-k is
    * TakeOrderedAndProject (k rows leave each partition) — no global
    * sort, no shuffle of the payload.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.where(weight > 0)
      .withColumn("__wk", pow(uniformCol(key), lit(1.0) / weight.cast("double")))
      .orderBy(col("__wk").desc, key.asc)
      .limit(k)
      .drop("__wk")
  }

  /** Domain-weighted corpus composition to a TOKEN budget with
    * deterministic upsampling — the mixture table every pretraining run
    * is built from (the GPT-3 / Pile / LLaMA recipe: each source gets a
    * token share, scarce high-quality sources repeat for multiple epochs,
    * the crawl is truncated): domain d's target is
    * `tokenBudget · w_d / Σw`; within d, documents are taken in the
    * portable hash order ([[uniformCol]], key tie-break) until the
    * running token count reaches the target, wrapping into repeat epochs
    * (capped at `maxRepeat`) when the domain is smaller than its share.
    *
    * One membership rule covers truncation, exact fit, and upsampling: a
    * (document, epoch) pair survives iff
    * `epoch · T_d + exclusiveCumTokens(doc) < target_d` — so raising the
    * budget only ever ADDS pairs (monotone, law-pinned), membership is a
    * pure function of the data (re-runs/re-shards/engines agree
    * row-for-row), and each selected domain overshoots its target by
    * less than one document.
    *
    * Output: the input row + `epoch` (0-based). Unlisted domains drop.
    *
    * Scale shape: the running count is the shared distributed prefix sum
    * ([[Packing.withPrefixSum]]) over a range shuffle on (domain, u, key)
    * — balanced by sampling, NEVER a per-domain window (a web-crawl
    * domain at 100 TB is not a window partition); per-domain start
    * offsets and totals are domain-count-sized broadcasts, and the epoch
    * fan-out explodes a `sequence` capped at `maxRepeat` (selection
    * filters it back down before anything widens).
    */
  def mixtureByTokens(df: DataFrame, domain: Column, key: Column,
      tokens: Column, weights: Map[String, Double], tokenBudget: Long,
      maxRepeat: Int = 1): DataFrame = {
    require(tokenBudget > 0, s"tokenBudget must be > 0, got $tokenBudget")
    require(maxRepeat >= 1, s"maxRepeat must be >= 1, got $maxRepeat")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "mixture weights must be positive")
    val sumW = weights.values.sum
    // target_d as the SAME double expression the oracle spells:
    // budget * w / Σw, one multiply then one divide
    val targetCol = weights.foldLeft(lit(Double.NaN)) { case (acc, (s, w)) =>
      when(col("__dom") === lit(s),
        lit(tokenBudget.toDouble) * lit(w) / lit(sumW)).otherwise(acc)
    }
    val base = df
      .withColumn("__dom", domain.cast("string"))
      .where(weights.keys.foldLeft(lit(false))((acc, s) =>
        acc || col("__dom") === lit(s)))
      .withColumn("__tok", tokens.cast("long"))
      .withColumn("__u", uniformCol(key))
      .withColumn("__key", key.cast("string"))
    // global exclusive prefix sum in (domain, u, key) order; per-domain
    // exclusive cum = global minus the domain's start offset
    val cum = Packing.withPrefixSum(base, col("__tok"), "__gcum",
      Seq(col("__dom"), col("__u"), col("__key")))
    // aggregate totals from the prefix sum's CHECKPOINTED output, not from
    // `base` — a second pass over base would re-scan the corpus and
    // re-evaluate the md5 uniform the checkpoint already paid for
    val domTotals = cum.groupBy(col("__dom"))
      .agg(sum(col("__tok")).as("__dtot"))
      .withColumn("__dstart", coalesce(
        sum(col("__dtot")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("__dom"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__dom"), col("__dtot"), col("__dstart"))
    cum.join(broadcast(domTotals), "__dom")
      .withColumn("__excum", col("__gcum") - col("__dstart"))
      .withColumn("__target", targetCol)
      .select(col("*"), explode(sequence(lit(0), lit(maxRepeat - 1))).as("epoch"))
      .where(col("epoch").cast("double") * col("__dtot").cast("double") +
        col("__excum").cast("double") < col("__target"))
      .drop("__dom", "__tok", "__u", "__key", "__gcum", "__dtot",
        "__dstart", "__excum", "__target")
  }
}
