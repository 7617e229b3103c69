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
}
