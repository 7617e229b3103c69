package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.algebra.Semigroup
import graft.time.{Batcher, Timestamp}

/** Streaming half of `sumByKey` — the rebuild of the reference's online
  * Summer (summingbird-online/.../executor/Summer.scala:56-128 +
  * FinalFlatMap.scala:49-137) on Structured Streaming.
  *
  * State is keyed by (K, batchId) exactly like the reference's online stores
  * (`Mergeable[(K, BatchID), V]`, StormPlatform.scala:66-67), and each
  * micro-batch emits the reference Summer contract `(K, batch, (Option[V],
  * V))` = (state BEFORE this delta, the delta) — so downstream producers can
  * keep transforming, and the lambda-architecture client can merge these
  * deltas with the batch snapshot.
  *
  * The reference keeps UNBOUNDED state in external stores (memcached) with
  * the batch layer as correctness backstop (SURVEY §2.7); here state lives in
  * Spark's state store. `stateTtl` bounds it (ProcessingTimeTimeout): expired
  * (K, batch) state is dropped, and — as in the reference — the batch layer
  * recomputes authoritative values.
  */
object StreamingSum {

  def sumByKey[K, V](
      events: Dataset[(Long, K, V)],
      batcher: Batcher,
      stateTtl: Option[java.time.Duration] = None)(
      implicit sg: Semigroup[V], kEnc: Encoder[K], vEnc: Encoder[V]): Dataset[(K, Long, (Option[V], V))] = {

    implicit val kbEnc: Encoder[(K, Long)] = Encoders.tuple(kEnc, Encoders.scalaLong)
    implicit val rowEnc: Encoder[(Long, K, V)] =
      Encoders.tuple(Encoders.scalaLong, kEnc, vEnc)
    implicit val outEnc: Encoder[(K, Long, (Option[V], V))] =
      Encoders.tuple(kEnc, Encoders.scalaLong,
        graft.plans.GraftEncoders.priorDelta(vEnc))

    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    events
      .groupByKey(r => (r._2, batcher.batchOf(Timestamp(r._1)).id))
      .flatMapGroupsWithState[V, (K, Long, (Option[V], V))](
        OutputMode.Append(), timeout) {
        case ((k, batch), rows, state: GroupState[V]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // fold this micro-batch's rows in event-time order (cheap local
            // sort; micro-batch slices are small) for non-commutative V
            val vs =
              if (sg.isCommutative) rows.map(_._3)
              else rows.toSeq.sortBy(_._1).iterator.map(_._3)
            sg.sumOption(vs) match {
              case None => Iterator.empty
              case Some(delta) =>
                val prior = state.getOption
                state.update(prior.fold(delta)(p => sg.plus(p, delta)))
                stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
                Iterator.single((k, batch, (prior, delta)))
            }
          }
      }
  }
}
