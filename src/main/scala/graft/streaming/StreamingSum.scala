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

  /** [[sumByKey]] with an EVENT-TIME state horizon (round 16): state for a
    * (K, batch) group is reclaimed when the stream's WATERMARK — not the
    * wall clock — passes the group's newest event time, with `horizon` as
    * the watermark delay. A replay at 100× input speed therefore holds
    * state proportional to the horizon's ARRIVAL VOLUME, never the
    * all-time key space: wall-clock TTL ([[sumByKey]]'s `stateTtl`) is
    * useless under replay/backfill because a decade of history streams
    * through in minutes and nothing times out until the job's own clock
    * advances. Keyed exactly like
    * [[StreamingDedup.minhashCandidatesWithinHorizon]]: the timeout is
    * re-armed to the newest event the group has summed, so a batch whose
    * events the watermark has passed dies with its horizon.
    *
    * Same emitted contract as [[sumByKey]] — (K, batch, (state BEFORE this
    * delta, delta)) — and the same lambda split: an event arriving later
    * than the horizon re-opens the group from `None` prior (its earlier
    * state was reclaimed), so downstream deltas still sum to the true
    * total per (K, batch) while the batch layer remains the authority on
    * accumulated values, as in the reference (summingbird-online Summer +
    * batch backstop, SURVEY §2.7). Events are (event-time, K, V) with a
    * real TIMESTAMP first field — the watermark must ride the column
    * itself (an expression over it would strip the metadata).
    */
  def sumByKeyWithinHorizon[K, V](
      events: Dataset[(java.sql.Timestamp, K, V)],
      batcher: Batcher,
      horizon: String)(
      implicit sg: Semigroup[V], kEnc: Encoder[K], vEnc: Encoder[V]): Dataset[(K, Long, (Option[V], V))] = {

    implicit val kbEnc: Encoder[(K, Long)] = Encoders.tuple(kEnc, Encoders.scalaLong)
    implicit val stEnc: Encoder[(V, Long)] = Encoders.tuple(vEnc, Encoders.scalaLong)
    implicit val outEnc: Encoder[(K, Long, (Option[V], V))] =
      Encoders.tuple(kEnc, Encoders.scalaLong,
        graft.plans.GraftEncoders.priorDelta(vEnc))

    events
      .withWatermark("_1", horizon)
      .groupByKey(r => (r._2, batcher.batchOf(Timestamp(r._1.getTime)).id))
      .flatMapGroupsWithState[(V, Long), (K, Long, (Option[V], V))](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((k, batch), rows, state: GroupState[(V, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // commutative V: one streaming pass, tracking the newest event
            // time alongside the fold (sumOption drains the iterator, so
            // the tracker is complete when it returns); non-commutative V
            // pays the event-time sort, exactly like sumByKey
            val (summed, newestEvt) =
              if (sg.isCommutative) {
                var nw = Long.MinValue
                val s = sg.sumOption(rows.map { r =>
                  val t = r._1.getTime
                  if (t > nw) nw = t
                  r._3
                })
                (s, nw)
              } else {
                val sorted = rows.toSeq.sortBy(_._1.getTime)
                (sg.sumOption(sorted.iterator.map(_._3)),
                  if (sorted.isEmpty) Long.MinValue else sorted.last._1.getTime)
              }
            summed match {
              case None => Iterator.empty
              case Some(delta) =>
                val prior = state.getOption
                val newest = math.max(newestEvt,
                  prior.fold(Long.MinValue)(_._2))
                state.update((prior.fold(delta)(p => sg.plus(p._1, delta)), newest))
                // reclaim when the watermark (event time − horizon already
                // baked in) passes the newest event this group has summed.
                // Batch invocations have no watermark — some Spark versions
                // refuse the call there, hence the Try (matching the
                // horizon-dedup machine)
                val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L)
                scala.util.Try(state.setTimeoutTimestamp(math.max(newest, wm) + 1))
                Iterator.single((k, batch, (prior.map(_._1), delta)))
            }
          }
      }
  }
}
