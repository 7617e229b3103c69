package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: lay the corpus out as one concatenated token
  * stream in a deterministic total order and chunk it into fixed-length
  * training sequences ("concat-and-chunk", the standard GPT-style packing).
  * Each document gets the sequence id and intra-sequence offset where its
  * first token lands; a document longer than the remaining room simply
  * straddles the boundary, exactly as the training loader would place it.
  *
  * The naive formulation is a cumulative sum over an UNPARTITIONED window —
  * one task scans 100 TB. This uses the same shape as
  * [[RowIndex.withRowIndex]]:
  *
  *   1. range-partition by the order columns (balanced by sampling),
  *   2. sum tokens per partition (cheap agg on partition id),
  *   3. prefix-sum those per-partition totals into starting offsets — a
  *      partition-COUNT-sized frame that broadcasts,
  *   4. per-partition exclusive running total (a window PARTITIONED by the
  *      physical partition id — every group is one balanced range slice).
  *
  * The order must be total (include a unique tiebreaker) or placement is
  * nondeterministic — same contract as [[RowIndex.withRowIndex]].
  */
object Packing {

  /** Appends `seqIdCol` (0-based id of the fixed-length sequence holding the
    * document's first token) and `offsetCol` (0-based position of that token
    * within the sequence) for packing into `seqLen`-token sequences in
    * `order`-ascending document order.
    */
  def packSequences(df: DataFrame, tokenCol: Column, seqLen: Long,
      order: Seq[Column], seqIdCol: String = "seq_id",
      offsetCol: String = "seq_offset"): DataFrame = {
    require(seqLen > 0, s"seqLen must be > 0, got $seqLen")
    require(order.nonEmpty, "packSequences needs at least one order column")
    val start = "__pack_start"
    val packed = withPrefixSum(df, tokenCol, start, order)
      .withColumn(seqIdCol, expr(s"`$start` div $seqLen"))
      .withColumn(offsetCol, pmod(col(start), lit(seqLen)))
    packed.drop(start)
  }

  /** Appends `outCol` holding the EXCLUSIVE global running total of `value`
    * in `order`-ascending order (0 for the first row), without a data-sized
    * unpartitioned window. Values are summed as longs.
    */
  def withPrefixSum(df: DataFrame, value: Column, outCol: String,
      order: Seq[Column]): DataFrame = {
    // materialize the range shuffle ONCE — same rationale as
    // RowIndex.withRowIndex (AQE does not reuse the exchange across the
    // totals/join consumers), same localCheckpoint lifecycle.
    val ranged = df.withColumn("__v", value.cast("long"))
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__v")), lit(0L)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    // the offsets window IS global — but over per-partition totals
    // (thousands of rows), never data
    val intra = coalesce(
      sum(col("__v")).over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    ranged.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__offset") + intra)
      .drop("__pid", "__offset", "__v")
  }
}
