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

  /** Hot-key escape hatch: the same join semantics as [[loopJoin]], but with
    * INTRA-key parallelism, for the common case where the written delta does
    * not depend on the looked-up state (`deltaFn: U => Option[V]` — e.g. the
    * running-counter / impression-sum shapes the reference's loopJoin is
    * typically used for, Service.scala:196-269). State-independent deltas make
    * the per-key scanLeft a prefix sum, which parallelizes:
    *
    *   1. chunk each key's events by a caller-supplied time bucket
    *      (`chunkOf`, e.g. `Batcher.ofHours(1).batchOf(_).id`) and fold each
    *      (key, chunk)'s deltas in time order — the hot key's volume now
    *      spreads over as many tasks as it has chunks;
    *   2. prefix-scan the per-chunk totals per key (rows = keys x chunks,
    *      tiny) to compute each chunk's seed state = initial (+) totals of all
    *      earlier chunks;
    *   3. run the verified [[loopJoin]] keyed by (key, chunk) with the seeds
    *      as the initial snapshot — per-chunk scans are independent tasks.
    *
    * Three shuffles instead of one, but none of them concentrates a hot key
    * on a single task, so wall-clock follows the LARGEST CHUNK rather than
    * the largest key. Use when one key's volume is so far above the median
    * that a single sorted group dominates the stage (the plain form never
    * OOMs — the sort spills — it just serializes that key's scan).
    *
    * Measured (local[8], 16 normal keys x 100k rows, 32 chunks, best of 4):
    * at a 10x-median hot key (1M rows, 38% of input) the plain form still
    * wins — 2.1 s vs 2.8 s — because idle cores absorb the skew and the
    * seed passes cost more than they save; at a 40x-median hot key (4M
    * rows, 71% of input) pre-split wins — 5.2 s vs 6.8 s — and the
    * chunked scan alone (pass 3) is 4.0 s, so the crossover moves further
    * in pre-split's favor as the hot key's share grows or per-event work
    * rises. SortedGroupsSpec's skew stress pins correctness of both forms
    * at 10x median.
    *
    * Associativity note: per-chunk totals fold in time order and chunks
    * combine in chunk order, so non-commutative semigroups are safe as long
    * as timestamps are distinct (equal-ts ordering is unspecified across
    * forms, exactly as in [[loopJoin]]). `chunkOf` must be monotone in ts
    * and must not return `Long.MinValue` (reserved for the initial
    * snapshot's virtual chunk).
    */
  def loopJoinPreSplit[K, U, V](
      events: Dataset[(Long, K, U)],
      initial: Option[Dataset[(K, V)]],
      deltaFn: U => Option[V],
      chunkOf: Long => Long)(
      implicit sg: Semigroup[V], kEnc: Encoder[K], uEnc: Encoder[U],
      vEnc: Encoder[V]): Dataset[(Long, K, (U, Option[V]))] = {
    implicit val kcEnc: Encoder[(K, Long)] = Encoders.tuple(kEnc, Encoders.scalaLong)
    implicit val optVEnc: Encoder[Option[V]] = GraftEncoders.option(vEnc)

    // 1. per-(key, chunk) delta totals, folded in time order (one shuffle on
    //    the composite key — the hot key spreads across its chunks)
    implicit val chunkedEnc: Encoder[(Long, (K, Long), U)] =
      Encoders.tuple(Encoders.scalaLong, kcEnc, uEnc)
    // materialized ONCE (localCheckpoint, ContextCleaner-managed blocks —
    // the RowIndex/withPrefixSum pattern): both the chunk-totals pass and
    // the final per-chunk scan read it, and without this the events
    // source is scanned and mapped twice
    val chunked: Dataset[(Long, (K, Long), U)] =
      events.map(r => (r._1, (r._2, chunkOf(r._1)), r._3)).localCheckpoint(true)
    implicit val totEnc: Encoder[(Long, K, Option[V])] =
      Encoders.tuple(Encoders.scalaLong, kEnc, optVEnc)
    val chunkTotals: Dataset[(Long, K, Option[V])] =
      SortedGroups.perKeyTimeSorted(chunked) { (kc: (K, Long), it: Iterator[(Long, U)]) =>
        var acc: Option[V] = None
        it.foreach { case (_, u) =>
          deltaFn(u).foreach(w => acc = Some(acc.fold(w)(sg.plus(_, w))))
        }
        // reshape to (chunk-as-ts, key, total) for the per-key prefix scan
        Iterator.single((kc._2, kc._1, acc))
      }()

    // 2. exclusive prefix per key over chunk totals (+ the initial snapshot
    //    as a chunk that sorts first) → each chunk's seed state
    val withInit = initial match {
      case Some(snap) =>
        snap.map { case (k, v) => (Long.MinValue, k, Option(v)) }.union(chunkTotals)
      case None => chunkTotals
    }
    implicit val seedEnc: Encoder[((K, Long), V)] = Encoders.tuple(kcEnc, vEnc)
    val seeds: Dataset[((K, Long), V)] =
      SortedGroups.perKeyTimeSorted(withInit) { (k: K, it: Iterator[(Long, Option[V])]) =>
        var run: Option[V] = None
        it.flatMap { case (chunk, tot) =>
          val seed = if (chunk == Long.MinValue) None else run.map(((k, chunk), _))
          run = (run, tot) match {
            case (Some(a), Some(b)) => Some(sg.plus(a, b))
            case (a, b)             => b.orElse(a)
          }
          seed.iterator
        }
      }()

    // 3. independent per-chunk scans, seeded — the verified loopJoin keyed by
    //    (key, chunk)
    loopJoin[(K, Long), U, V](chunked, Some(seeds), (u, _) => deltaFn(u))
      .map { case (t, (k, _), uv) => (t, k, uv) }(
        Encoders.tuple(Encoders.scalaLong, kEnc,
          Encoders.tuple(uEnc, optVEnc)))
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
