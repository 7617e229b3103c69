package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Streaming source/sink wiring — the glue the reference's Storm layer
  * hand-builds (SpoutSource StormPlatform.scala:87-99, SinkFn/
  * WritableStoreSink StormSink.scala) and Structured Streaming mostly
  * absorbs:
  *
  *  - [[timed]] attaches event time at the source exactly like the spout
  *    wrap to `(Timestamp, T)`;
  *  - [[fanout]] is the foreachBatch multi-sink: one streaming query, each
  *    micro-batch persisted once and handed to every writer — the
  *    WrittenProducer/AlsoProducer shape for streams (write a sink AND keep
  *    processing) without running the upstream twice.
  */
object StreamingIO {

  /** Wrap a (possibly streaming) Dataset with a TimeExtractor-style event
    * time, producing the engine's (tsMillis, value) stream shape.
    */
  def timed[T](ds: Dataset[T])(timeOf: T => Long)(
      implicit enc: Encoder[T]): Dataset[(Long, T)] = {
    implicit val pair: Encoder[(Long, T)] =
      Encoders.tuple(Encoders.scalaLong, enc)
    ds.map(t => (timeOf(t), t))
  }

  /** foreachBatch fan-out: every writer sees the same persisted micro-batch.
    * Returns the writer; caller sets options/trigger and calls `.start()`.
    *
    * State story (round 17, the replay-blindness audit the horizon Summer
    * prompted): fanout itself is STATELESS — queries built on it (the
    * stored-index/model maintenance machines: BM25 `appendToStored`, ANN
    * `int8AppendToStored`, NB count merges, corpus-stat roll-forwards)
    * hold ZERO Spark state-store state, so neither wall-clock TTL nor an
    * event-time horizon applies to them. Their durable state is the
    * stored index/model itself, which is the operator's OUTPUT and
    * inherently all-time: an index over the corpus must hold the corpus'
    * postings/codes, a classifier's counts are its sufficient statistic —
    * there is no per-key delta to reclaim, and the stores grow with
    * CORPUS size, not with replay depth (the decades probes measure
    * per-key streaming state; stored-index growth is measured by the
    * stored_read_amp probe arm instead). What replay/backfill threatens
    * here is DOUBLE-APPLY, not state growth — which the segment layer
    * answers with its replay guard (`SegmentedStore.batchApplied` /
    * `batchId`-keyed commits: a re-delivered micro-batch is a no-op), not
    * with a horizon. The machines that DO hold per-key state each carry
    * their own lever: sumByKey (wall TTL) beside sumByKeyWithinHorizon
    * (event-time horizon), minhash + its horizon form, sessionize
    * (watermark eviction), stream-stream join (watermark), exact dedup
    * (unbounded BY DESIGN — one row per distinct digest is the operator's
    * contract, with the watermarked form beside it).
    */
  def fanout[T](ds: Dataset[T])(
      writers: Seq[(Dataset[T], Long) => Unit]): DataStreamWriter[T] =
    ds.writeStream.foreachBatch { (batch: Dataset[T], id: Long) =>
      val pinned = batch.persist()
      try writers.foreach(w => w(pinned, id))
      finally { pinned.unpersist(); () }
    }
}
