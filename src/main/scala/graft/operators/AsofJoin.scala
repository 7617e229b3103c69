package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Temporal (as-of) left join as a composable DataFrame operator — the
  * columnar rebuild of the reference's batch service join (`LookupJoin` via
  * summingbird-scalding/.../batch/BatchedService.scala:53-120): each left row
  * at time t is enriched with the right side's value as of t.
  *
  * Spark SQL has no as-of join; rather than a custom SparkPlan we compose
  * union + window (`last(..., ignoreNulls)` over a key-partitioned,
  * time-ordered, unbounded-preceding frame). Catalyst plans this as ONE
  * shuffle + sort per key — the same physical shape as a purpose-built as-of
  * merge join, and it participates in codegen, AQE, and column pruning.
  *
  * Tie-break at equal timestamps follows the reference's lookups-before-writes
  * rule (Service.scala:210-213) when `strict=true` (left sees right rows
  * strictly earlier); `strict=false` gives SQL-standard ASOF `>=` semantics
  * (right row at exactly t is visible), matching e.g. DuckDB's ASOF JOIN.
  *
  * Scale note: all left+right rows of one key meet in one sorted partition —
  * Spark's external sort spills, so hot keys degrade gracefully; for massive
  * skew pre-split hot keys by time range before calling.
  */
object AsofJoin {

  /** @param left       left (event) side
    * @param right      right (state-change) side
    * @param keys       equi-join key column names present on both sides
    * @param leftTime   left event-time column (sortable type; both sides must
    *                   use comparable types)
    * @param rightTime  right event-time column
    * @param rightVals  right value columns to carry (null when no match)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      strict: Boolean = false): DataFrame =
    joinWith(left, right, keys, leftTime, rightTime, rightVals, strict) {
      (w, v) => last(col(s"__rv_$v"), ignoreNulls = true).over(w)
    }

  /** As-of join where the right side is RUNNING-SUMMED up to t instead of
    * last-value — the reference's `LookupJoin.rightSumming` used when joining
    * against a store summed in the same job (Service.scala:128-137,
    * `storeDoesNotDependOnJoin` gate 61-76). Columnar: right values must be
    * numeric; the generic-Semigroup form is
    * [[graft.api.KeyedGraftStream.leftJoinAsof]] over pre-summed deltas.
    */
  def asofJoinSumming(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      strict: Boolean = false): DataFrame =
    joinWith(left, right, keys, leftTime, rightTime, rightVals, strict) {
      (w, v) => sum(col(s"__rv_$v")).over(w)
    }

  /** Shared scaffold: tag the two sides, align schemas, union, apply one
    * windowed fill expression per right value, keep only left rows.
    */
  private def joinWith(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      strict: Boolean)(fill: (WindowSpec, String) => Column): DataFrame = {

    val leftCols = left.columns
    require(rightVals.forall(right.columns.contains),
      s"missing rightVals in ${right.columns.mkString(",")}")

    // left rows tag 1, right rows tag 0 for >= semantics (right at equal t
    // visible); strict flips tags so rights at equal t sort after lefts.
    val (lTag, rTag) = if (strict) (0, 1) else (1, 0)
    val lside = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(lTag))
      .withColumns(rightVals.map(v => s"__rv_$v" -> lit(null)).toMap)
    val rside = right
      .select((keys.map(col) :+ col(rightTime).as("__t")) ++
        rightVals.map(v => col(v).as(s"__rv_$v")): _*)
      .withColumn("__tag", lit(rTag))
    // align schemas: right side lacks left-only columns
    val lOnly = leftCols.filterNot(keys.contains)
    val rAligned = rside.withColumns(
      lOnly.map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
    val ordered =
      leftCols.toIndexedSeq.map(col) ++ Seq(col("__t"), col("__tag")) ++
        rightVals.map(v => col(s"__rv_$v"))
    val unioned = lside.select(ordered: _*).unionByName(rAligned.select(ordered: _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, fill(w, v))
    }
    filled
      .where(col("__tag") === lit(lTag))
      .select((leftCols.toIndexedSeq.map(col) ++ rightVals.map(col)): _*)
  }
}
