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

  /** Document-boundary-aware ("docwise") packing: next-fit bin packing
    * that NEVER splits a document across sequences — the layout for
    * pipelines that forbid cross-document attention. Deterministic and
    * parallel via budgeted groups:
    *
    *   1. the exclusive token prefix sum `s` (same distributed shape as
    *      [[packSequences]]) assigns each document to group
    *      `s div groupBudget` — membership depends only on the data and
    *      the order, never on physical partitioning;
    *   2. within each group (≤ ~groupBudget tokens, so it folds in memory)
    *      documents are laid out in order by sequential NEXT-FIT: a doc
    *      that fits in the open sequence's remaining room is placed at the
    *      current fill, otherwise it opens a fresh sequence. A doc longer
    *      than `seqLen` gets a sequence of its own (oversized — callers
    *      truncate or filter upstream);
    *   3. local sequence ids renumber globally by an exclusive prefix sum
    *      of per-group sequence counts — a group-count-sized frame, the
    *      same broadcast-offsets shape as [[withPrefixSum]].
    *
    * Packing restarts at each group boundary, so waste beyond plain
    * next-fit is at most one partial sequence per ~groupBudget tokens —
    * negligible for groupBudget >> seqLen — and groups are the unit of
    * parallelism at 100 TB (no cross-partition sequential chain).
    *
    * Appends `seqIdCol` / `offsetCol`; every doc with n_tokens <= seqLen
    * satisfies offset + n_tokens <= seqLen (never split). `idCol` must be
    * a unique integral id (the fold's join-back key).
    */
  def packDocwise(df: DataFrame, idCol: String, tokenCol: Column,
      seqLen: Long, order: Seq[Column], groupBudget: Long,
      seqIdCol: String = "seq_id", offsetCol: String = "seq_offset"): DataFrame = {
    require(seqLen > 0, s"seqLen must be > 0, got $seqLen")
    require(groupBudget >= seqLen,
      s"groupBudget ($groupBudget) must be >= seqLen ($seqLen)")
    require(order.nonEmpty, "packDocwise needs at least one order column")
    val spark = df.sparkSession
    import spark.implicits._
    val start = "__pack_s"
    // (grp, s, id, tok): s is the within-group sort key (it increases with
    // `order` by construction; id breaks ties among zero-token docs)
    val rows = withPrefixSum(df, tokenCol, start, order)
      .select(expr(s"`$start` div $groupBudget").as("__grp"),
        col(start), col(idCol).cast("long").as("__id"),
        tokenCol.cast("long").as("__tok"))
      .as[(Long, Long, Long, Long)]
    val packed = rows.groupByKey(_._1).flatMapGroups { (grp, it) =>
      val docs = it.toArray.sortBy(r => (r._2, r._3))
      var cur = 0L
      var fill = 0L
      docs.iterator.map { case (_, _, id, tok) =>
        if (tok > seqLen) {
          val seq = if (fill > 0) cur + 1 else cur
          cur = seq + 1; fill = 0L
          (grp, id, seq, 0L)
        } else if (fill + tok <= seqLen) {
          val off = fill; fill += tok
          (grp, id, cur, off)
        } else {
          cur += 1; fill = tok
          (grp, id, cur, 0L)
        }
      }
    }.toDF("__grp", "__id", "__lseq", offsetCol)
      .localCheckpoint(true) // two consumers below (counts + join)
    // per-group sequence counts -> exclusive prefix sum. Emitted local ids
    // are contiguous from 0, so count = max + 1; the window is global but
    // over a GROUP-count-sized frame, never data
    val bases = packed.groupBy(col("__grp"))
      .agg((max(col("__lseq")) + 1).as("__used"))
      .withColumn("__base", coalesce(
        sum(col("__used")).over(
          Window.orderBy(col("__grp")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__grp"), col("__base"))
    val assign = packed.join(broadcast(bases), "__grp")
      .select(col("__id"), (col("__base") + col("__lseq")).as(seqIdCol),
        col(offsetCol))
    df.join(assign, df(idCol).cast("long") === assign("__id")).drop("__id")
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
