package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two corpus versions — the decision input for
  * incremental processing: which documents a new crawl added, removed,
  * or changed (and so which downstream artifacts — spans, indexes, ANN
  * shards, dedup state — need maintenance), and how much survived
  * unchanged.
  *
  * Shape at scale: each side collapses to (id, 16-byte md5 digest)
  * BEFORE the join, so the full-outer shuffle carries digests, never
  * text — the same digest-only-shuffle rule as exact dedup. One shuffle
  * join on the id, one derived status column.
  */
object CorpusDiff {

  /** One row per id present in either version:
    * (`idCol`, status ∈ added | removed | changed | same).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence flags, not digest nullity, decide added/removed — a NULL
    // text md5s to NULL and must not masquerade as absence; digests
    // compare null-safely so (NULL, NULL) texts are "same"
    val o = oldDf.select(col(idCol), md5(col(textCol)).as("__old_d"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol), md5(col(textCol)).as("__new_d"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__old_d") <=> col("__new_d")), lit("changed"))
          .otherwise(lit("same")).as("status"))
  }

  /** The four counts in one row (added, removed, changed, same) — the
    * monitoring summary a nightly snapshot job alerts on.
    */
  def diffCounts(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy()
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "same", 1L).otherwise(0L)).as("n_same"))
}
