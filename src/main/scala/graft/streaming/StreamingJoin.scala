package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed stream-stream leftJoin — the reference's
  * `leftJoin(stream, buffer)` (Producer.scala:396-399), which composes
  * `write(buffer)` + `leftJoin(buffer-as-service)`: right events are
  * buffered and each left event at time t sees right events for its key
  * within the trailing `windowMs` of t.
  *
  * In Structured Streaming this IS a watermarked stream-stream left-outer
  * join: Spark's state store plays the buffer, the event-time range
  * condition plays the window, and the watermark bounds buffer growth
  * (reference buffers are capacity-bounded caches; a watermark is the
  * event-time analogue). Unmatched left rows emit with nulls once the
  * watermark passes their join window — the standard outer-join completion
  * rule.
  */
object StreamingJoin {

  /** @param left        streaming DataFrame with TimestampType column `leftTs`
    * @param right       streaming DataFrame with TimestampType column `rightTs`
    * @param joinKeys    (leftCol, rightCol) equality pairs — use distinct
    *                    names per side; both sides' columns survive in the
    *                    output for the caller to select from
    * @param windowMs    right rows are visible for windowMs after their ts
    * @param watermarkMs max tolerated event-time lateness on both sides
    */
  def leftJoinBuffered(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      joinKeys: Seq[(String, String)],
      windowMs: Long, watermarkMs: Long): DataFrame = {
    val l = left.withWatermark(leftTs, s"$watermarkMs milliseconds")
    val r = right.withWatermark(rightTs, s"$watermarkMs milliseconds")
    val keyCond = joinKeys.map { case (lk, rk) => l(lk) === r(rk) }.reduce(_ && _)
    val timeCond = r(rightTs) <= l(leftTs) &&
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $windowMs MILLISECONDS")
    l.join(r, keyCond && timeCond, "left_outer")
  }
}
