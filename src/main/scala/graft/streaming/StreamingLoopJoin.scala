package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.algebra.Semigroup
import graft.plans.GraftEncoders

/** Streaming form of the loop join — the reference's hardest operator
  * (summingbird-scalding/.../Service.scala:196-269 `loopJoin`) in its ONLINE
  * shape: a leftJoin against a store whose content depends on the join
  * output, state carried in Spark's state store via
  * `flatMapGroupsWithState`, exactly the shape SURVEY §7.4 names.
  *
  * Per key the state is the running store value `Option[V]`; each event
  * first LOOKS UP the current state (emitting the joined row), then WRITES
  * `valueFn(u, state)` Semigroup-merged into the state — the same
  * lookups-before-writes fold as the batch [[graft.operators.LoopJoin]],
  * so on identical, event-time-ordered input the two produce identical
  * output (asserted in StreamingLoopJoinSpec, extending the engine's
  * batch ≡ streaming equivalence to this operator).
  *
  * Within a micro-batch, rows fold in event-time order (cheap local sort of
  * the group's slice); ACROSS micro-batches the fold is arrival-ordered —
  * the online approximation the reference's online platform makes too, with
  * the batch layer as the authoritative backstop.
  *
  * `initial` seeds per-key state from a prior store snapshot
  * (flatMapGroupsWithState initial-state support); `stateTtl` bounds state
  * exactly as in [[StreamingSum]].
  */
object StreamingLoopJoin {

  def loopJoin[K, U, V](
      events: Dataset[(Long, K, U)],
      initial: Option[Dataset[(K, V)]],
      valueFn: (U, Option[V]) => Option[V],
      stateTtl: Option[java.time.Duration] = None)(
      implicit sg: Semigroup[V], kEnc: Encoder[K], uEnc: Encoder[U],
      vEnc: Encoder[V]): Dataset[(Long, K, (U, Option[V]))] = {

    implicit val rowEnc: Encoder[(Long, K, U)] =
      Encoders.tuple(Encoders.scalaLong, kEnc, uEnc)
    implicit val kvEnc: Encoder[(K, V)] = Encoders.tuple(kEnc, vEnc)
    implicit val outEnc: Encoder[(Long, K, (U, Option[V]))] =
      Encoders.tuple(Encoders.scalaLong, kEnc,
        Encoders.tuple(uEnc, GraftEncoders.option(vEnc)))

    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    def fold(k: K, rows: Iterator[(Long, K, U)], state: GroupState[V])
        : Iterator[(Long, K, (U, Option[V]))] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // event-time order within the micro-batch slice (small; local sort)
        val sorted = rows.map(r => (r._1, r._3)).toSeq.sortBy(_._1)
        var st: Option[V] = state.getOption
        val out = sorted.map { case (t, u) =>
          val joined = (t, k, (u, st))         // lookup BEFORE write
          val written = valueFn(u, st)
          st = (st, written) match {
            case (Some(s), Some(w)) => Some(sg.plus(s, w))
            case (None, w)          => w
            case (s, None)          => s
          }
          joined
        }
        st.foreach(state.update)
        stateTtl.foreach(d => state.setTimeoutDuration(d.toMillis))
        out.iterator
      }
    }

    val grouped = events.groupByKey(_._2)
    initial match {
      case Some(snap) =>
        grouped.flatMapGroupsWithState[V, (Long, K, (U, Option[V]))](
          OutputMode.Append(), timeout,
          snap.groupByKey(_._1).mapValues(_._2)(vEnc))(fold)
      case None =>
        grouped.flatMapGroupsWithState[V, (Long, K, (U, Option[V]))](
          OutputMode.Append(), timeout)(fold)
    }
  }
}
