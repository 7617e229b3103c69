package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import graft.algebra.Semigroup
import graft.plans.{GraftEncoders, SortedGroups}

/** The reference's hardest operator: `leftJoin` against a store whose content
  * DEPENDS on the join output (summingbird-scalding/.../Service.scala:196-269
  * `loopJoin`; validity gates `isValidLoopJoin` 78-105; wired in
  * ScaldingPlatform.scala:430-469).
  *
  * Semantics, per key, in strict event-time order (lookups before writes at
  * equal timestamps, Service.scala:210-213):
  *   state: Option[V] = carried-in initial value (prior store snapshot)
  *   for each left event (t, u):
  *     emit joined (t, k, (u, state))           // the join output
  *     state += valueFn(u, state)               // Semigroup-merged store write
  * i.e., the store is the running Semigroup-sum of values computed FROM the
  * join output — a per-key scanLeft that no relational join can express.
  *
  * Physical plan: one shuffle on K + external sort (partition-by-key,
  * sort-within-partitions, streamed groups) — identical shape to the
  * reference's single grouped reduce, but with Spark's spillable sort, so a
  * hot key degrades to disk instead of OOM.
  *
  * The reference's validity analysis (only value-transforms allowed between
  * join output and store input) is enforced here BY CONSTRUCTION: `valueFn`
  * is exactly that transform, so no invalid graph is expressible.
  */
object LoopJoin {

  /** `events`: (tsMillis, key, leftValue). `initial`: prior store snapshot.
    * Returns the join output stream (ts, key, (leftValue, stateBefore)).
    * The final per-key state (the store) is recoverable by re-running the
    * fold over the output: use [[loopJoinWithStore]] to get both in one pass.
    */
  def loopJoin[K, U, V](
      events: Dataset[(Long, K, U)],
      initial: Option[Dataset[(K, V)]],
      valueFn: (U, Option[V]) => Option[V])(
      implicit sg: Semigroup[V], kEnc: Encoder[K], uEnc: Encoder[U],
      vEnc: Encoder[V]): Dataset[(Long, K, (U, Option[V]))] = {
    implicit val outEnc: Encoder[(Long, K, (U, Option[V]))] =
      Encoders.tuple(Encoders.scalaLong, kEnc,
        Encoders.tuple(uEnc, GraftEncoders.option(vEnc)))
    joinAndState(events, initial, valueFn).flatMap {
      case Left(row) => Iterator.single(row)
      case Right(_)  => Iterator.empty
    }
  }

  /** Join output + final store rows, distinguished by Either (Left = join
    * output row, Right = final (K, state) store row). One shuffle, one scan.
    */
  def joinAndState[K, U, V](
      events: Dataset[(Long, K, U)],
      initial: Option[Dataset[(K, V)]],
      valueFn: (U, Option[V]) => Option[V])(
      implicit sg: Semigroup[V], kEnc: Encoder[K], uEnc: Encoder[U],
      vEnc: Encoder[V]): Dataset[Either[(Long, K, (U, Option[V])), (K, V)]] = {

    // merge initial snapshot (tag=init, sorts first via Long.MinValue ts)
    implicit val uvEnc: Encoder[(Option[U], Option[V])] =
      Encoders.tuple(GraftEncoders.option(uEnc), GraftEncoders.option(vEnc))
    implicit val rowEnc: Encoder[(Long, K, (Option[U], Option[V]))] =
      Encoders.tuple(Encoders.scalaLong, kEnc, uvEnc)
    val evRows: Dataset[(Long, K, (Option[U], Option[V]))] =
      events.map(r => (r._1, r._2, (Option(r._3), Option.empty[V])))
    val allRows = initial match {
      case Some(snap) =>
        snap.map { case (k, v) => (Long.MinValue, k, (Option.empty[U], Option(v))) }.union(evRows)
      case None => evRows
    }

    // product-encoded Either (tag + nullable structs), not kryo: the
    // shuffle-adjacent scan output stays columnar (GraftEncoders.either)
    implicit val leftEnc: Encoder[(Long, K, (U, Option[V]))] =
      Encoders.tuple(Encoders.scalaLong, kEnc,
        Encoders.tuple(uEnc, GraftEncoders.option(vEnc)))
    implicit val rightEnc: Encoder[(K, V)] = Encoders.tuple(kEnc, vEnc)
    implicit val outEnc: Encoder[Either[(Long, K, (U, Option[V])), (K, V)]] =
      GraftEncoders.either(leftEnc, rightEnc)
    SortedGroups.perKeyTimeSorted(allRows) { (k: K, it: Iterator[(Long, (Option[U], Option[V]))]) =>
      var state: Option[V] = None
      val outs = it.flatMap {
        case (_, (None, init)) => state = init; Iterator.empty
        case (t, (Some(u), _)) =>
          val out = Left((t, k, (u, state)))
          val written = valueFn(u, state)
          state = (state, written) match {
            case (Some(s), Some(w)) => Some(sg.plus(s, w))
            case (None, w)          => w
            case (s, None)          => s
          }
          Iterator.single(out)
      }
      // Iterator.++ is call-by-name: `state` is read only after outs drains
      outs ++ state.map(s => Right((k, s))).iterator
    }()
  }
}
