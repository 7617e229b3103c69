package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's batch service zoo (summingbird-scalding/src/main/scala/
  * com/twitter/summingbird/scalding/service/), rebuilt as DataFrame
  * combinators over [[AsofJoin]]:
  *
  *  - [[windowed]] — BatchedWindowService / SimpleWindowService: only
  *    right-side writes within the trailing `window` of the lookup time are
  *    visible; older state expires to null.
  *  - [[uniqueKeyed]] — UniqueKeyedService: when service keys are unique
  *    (dimension-table shape) the temporal machinery collapses to a plain
  *    left equi-join, which Catalyst broadcasts when small.
  *  - [[empty]] — EmptyService: every lookup misses (null columns), used to
  *    satisfy a job graph with no service data yet.
  */
object BatchServices {

  /** Windowed as-of lookup: the as-of match is kept only when it happened at
    * or after `leftTime - window`. `window` is in the unit of the two time
    * columns (must be comparable numeric/timestamp types on both sides).
    * `rightTime` must not collide with a left column name.
    */
  def windowed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      window: Long, strict: Boolean = false): DataFrame = {
    require(!left.columns.contains(rightTime),
      s"rightTime '$rightTime' collides with a left column")
    val joined = AsofJoin.asofJoin(left, right, keys, leftTime, rightTime,
      rightVals :+ rightTime, strict)
    val stale = col(rightTime).isNull ||
      col(rightTime) < (col(leftTime) - lit(window))
    rightVals.foldLeft(joined) { (df, v) =>
      df.withColumn(v, when(stale, lit(null)).otherwise(col(v)))
    }.drop(rightTime)
  }

  /** Unique-keyed service: exact join, no temporal resolution needed. */
  def uniqueKeyed(left: DataFrame, service: DataFrame, keys: Seq[String]): DataFrame =
    left.join(service, keys, "left_outer")

  /** Empty service: carries null columns of the given (name, ddl-type). */
  def empty(left: DataFrame, rightVals: Seq[(String, String)]): DataFrame =
    rightVals.foldLeft(left) { case (df, (name, ddl)) =>
      df.withColumn(name, lit(null).cast(ddl))
    }
}
