package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous 0-based row ids in a global order — the dataset-export
  * primitive (shard files with stable offsets, resumable readers,
  * example ids tied to corpus position).
  *
  * The naive `row_number() OVER (ORDER BY ...)` is an UNPARTITIONED window:
  * Spark funnels all 100 TB through ONE task. This instead:
  *
  *   1. range-partitions by the order columns (the sort shuffle Spark's
  *      own orderBy uses — balanced by sampling),
  *   2. counts rows per partition (cheap agg on partition id),
  *   3. prefix-sums those counts into per-partition offsets — a
  *      partition-COUNT-sized table (thousands of rows) that broadcasts,
  *   4. adds offset + intra-partition row_number (a window PARTITIONED by
  *      the physical partition id, so every window group is one balanced
  *      range slice, never the whole dataset).
  *
  * The order must be total (include a tiebreaker column) or ties make the
  * index nondeterministic — same contract as the reference's sorted folds.
  */
object RowIndex {

  /** Appends `indexCol` holding 0-based contiguous positions in
    * `order`-ascending order.
    */
  def withRowIndex(df: DataFrame, indexCol: String, order: Column*): DataFrame = {
    require(order.nonEmpty, "withRowIndex needs at least one order column")
    // materialize the range shuffle ONCE (plan-level exchange reuse does
    // not fire across the counts/join consumers under AQE — measured two
    // full range exchanges without this); both passes then read blocks.
    // Same lifecycle discipline as the dedup family's localCheckpoint.
    val ranged = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    // the offsets window IS global — but over partition COUNTS (thousands
    // of rows), not data; the data-sized window below is per-range-slice
    val intra = row_number().over(
      Window.partitionBy(col("__pid")).orderBy(order: _*))
    ranged.join(broadcast(offsets), "__pid")
      .withColumn(indexCol, col("__offset") + intra.cast("long") - lit(1L))
      .drop("__pid", "__offset")
  }
}
