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
    */
  def fanout[T](ds: Dataset[T])(
      writers: Seq[(Dataset[T], Long) => Unit]): DataStreamWriter[T] =
    ds.writeStream.foreachBatch { (batch: Dataset[T], id: Long) =>
      val pinned = batch.persist()
      try writers.foreach(w => w(pinned, id))
      finally { pinned.unpersist(); () }
    }
}
