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
    * `order`-ascending order. The 0-based index IS the exclusive running
    * count of 1s, so this delegates to the shared distributed-prefix-sum
    * primitive ([[Packing.withPrefixSum]]) — one implementation of the
    * range-shuffle/offsets/per-slice-window shape to maintain.
    */
  def withRowIndex(df: DataFrame, indexCol: String, order: Column*): DataFrame = {
    require(order.nonEmpty, "withRowIndex needs at least one order column")
    Packing.withPrefixSum(df, lit(1L), indexCol, order)
  }
}
