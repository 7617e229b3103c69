package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of the exact-dedup family — ingest-time dedup for a
  * continuously arriving corpus (the online half of
  * [[graft.operators.Dedup.exact]] / [[graft.operators.Dedup.exactAgainst]]):
  * the first document with a given text digest passes, every later
  * byte-identical arrival is dropped, across micro-batches, with the digest
  * set carried in Spark's state store.
  *
  * Two state regimes:
  *  - unbounded ([[exact]]): one state row per distinct digest, forever —
  *    exact, but state grows with the corpus; right when the corpus is
  *    bounded or the run is batch-windowed.
  *  - watermarked ([[exactWithinHorizon]]): `dropDuplicatesWithinWatermark`
  *    expires digests older than the watermark horizon, so state is bounded
  *    by the horizon's arrival volume — the production shape for endless
  *    crawls, trading exactness for duplicates that re-arrive later than
  *    the horizon (which a periodic batch [[graft.operators.Dedup
  *    .exactAgainst]] pass against the accumulated corpus then catches:
  *    the same lambda split as sumByKey's online/offline stores).
  *
  * Only the 16-byte digest enters the state store, never the text.
  */
object StreamingDedup {

  /** Exact streaming dedup keyed by md5(textCol). */
  def exact(ds: DataFrame, textCol: String): DataFrame =
    ds.withColumn("__digest", md5(col(textCol)))
      .dropDuplicates("__digest")
      .drop("__digest")

  /** Bounded-state streaming dedup: duplicates arriving within
    * `horizon` (event time, per `eventTimeCol`'s watermark) are dropped;
    * state for older digests is reclaimed.
    */
  def exactWithinHorizon(ds: DataFrame, textCol: String,
      eventTimeCol: String, horizon: String): DataFrame =
    ds.withColumn("__digest", md5(col(textCol)))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")
}
