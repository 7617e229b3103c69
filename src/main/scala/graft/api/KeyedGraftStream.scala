package graft.api

import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

import graft.algebra.Semigroup
import graft.time.{Batcher, BatchID, Timestamp}
import graft.plans.{GraftEncoders, SortedGroups}

/** The keyed operator family — the reference's `KeyedProducer`
  * (Producer.scala:342-429) over `Dataset[(Long, K, V)]` (ts-millis, key,
  * value). Aggregation is `sumByKey` into a Semigroup, the reference's single
  * aggregation primitive (SURVEY §2.4).
  */
final class KeyedGraftStream[K, V](val ds: Dataset[(Long, K, V)],
    val shardHint: Option[Int] = None,
    val commutativeHint: Option[Boolean] = None)(
    implicit kEnc: Encoder[K], vEnc: Encoder[V]) extends Serializable {

  /** Per-name shards/Reducers option (reference ScaldingPlatform.scala:
    * 391-392, 534-539): request that the next key-shuffling aggregation use
    * exactly `shards` partitions. AQE normally picks this; the hint is the
    * explicit override for the cases it can't see in advance (a known-skewed
    * key domain, a store whose snapshot layout wants fixed parallelism).
    */
  def name(n: String, shards: Int): KeyedGraftStream[K, V] = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    new KeyedGraftStream(ds.as(n), Some(shards), commutativeHint)
  }
  /** Per-name commutativity option (reference `MonoidIsCommutative`,
    * option/Commutativity.scala:23-48): override the semigroup's declared
    * commutativity for the next aggregation. `commutative = true` lets a
    * conservatively-declared semigroup take the unordered hash-agg path
    * (the user asserts order-insensitivity, exactly the reference's
    * contract); `commutative = false` forces the event-time-ordered fold —
    * e.g. to make floating-point summation deterministic across runs.
    */
  def name(n: String, commutative: Boolean): KeyedGraftStream[K, V] =
    new KeyedGraftStream(ds.as(n), shardHint, Some(commutative))
  def name(n: String): KeyedGraftStream[K, V] =
    new KeyedGraftStream(ds.as(n), shardHint, commutativeHint)

  private implicit def tripleEnc: Encoder[(Long, K, V)] =
    Encoders.tuple(Encoders.scalaLong, kEnc, vEnc)
  private def triple[A: Encoder, B: Encoder]: Encoder[(Long, A, B)] =
    Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[A]], implicitly[Encoder[B]])

  /** keys / values / swap projections (Producer.scala:382,425,428) — pure
    * COLUMNAR projections (no closure): pruning and pushdown survive them.
    */
  def keys: GraftStream[K] = {
    implicit val e: Encoder[(Long, K)] = Encoders.tuple(Encoders.scalaLong, kEnc)
    new GraftStream(ds.select(col("_1"), col("_2")).as[(Long, K)])
  }
  def values: GraftStream[V] = {
    implicit val e: Encoder[(Long, V)] = Encoders.tuple(Encoders.scalaLong, vEnc)
    new GraftStream(ds.select(col("_1"), col("_3").as("_2")).as[(Long, V)])
  }
  def swap: KeyedGraftStream[V, K] = {
    implicit val e: Encoder[(Long, V, K)] = triple[V, K](vEnc, kEnc)
    new KeyedGraftStream(ds.select(col("_1"), col("_3").as("_2"), col("_2").as("_3")).as[(Long, V, K)], shardHint, commutativeHint)
  }

  /** Columnar filter over (`_1` = ts, `_2` = key, `_3` = value) — the
    * codegen'd twin of filterKeys/filterValues; pushes to the scan on a
    * columnar source.
    */
  def where(cond: Column): KeyedGraftStream[K, V] =
    new KeyedGraftStream(ds.filter(cond), shardHint, commutativeHint)

  /** Columnar re-key / re-value — the codegen'd twins of mapKeys/mapValues. */
  def selectKeys[K2: Encoder](keyCol: Column): KeyedGraftStream[K2, V] = {
    implicit val e: Encoder[(Long, K2, V)] = triple[K2, V]
    new KeyedGraftStream(ds.select(col("_1"), keyCol.as("_2"), col("_3")).as[(Long, K2, V)], shardHint, commutativeHint)
  }
  def selectValues[V2: Encoder](valueCol: Column): KeyedGraftStream[K, V2] = {
    implicit val e: Encoder[(Long, K, V2)] = triple[K, V2]
    new KeyedGraftStream(ds.select(col("_1"), col("_2"), valueCol.as("_3")).as[(Long, K, V2)], shardHint, commutativeHint)
  }

  /** Columnar flatMapKeys: `keysCol` is an ARRAY Column; each element becomes
    * a key paired with the row's value (explode — stays in codegen).
    */
  def explodeKeys[K2: Encoder](keysCol: Column): KeyedGraftStream[K2, V] = {
    implicit val e: Encoder[(Long, K2, V)] = triple[K2, V]
    new KeyedGraftStream(
      ds.select(col("_1"), explode(keysCol).as("_2"), col("_3")).as[(Long, K2, V)], shardHint, commutativeHint)
  }

  /** mapKeys / flatMapKeys re-key the stream (Producer.scala:374-375,405-406
    * → KeyFlatMappedProducer); the next aggregation shuffles on the new key.
    */
  def mapKeys[K2: Encoder](f: K => K2): KeyedGraftStream[K2, V] = {
    implicit val e: Encoder[(Long, K2, V)] = triple[K2, V]
    new KeyedGraftStream(ds.map(r => (r._1, f(r._2), r._3)), shardHint, commutativeHint)
  }
  def flatMapKeys[K2: Encoder](f: K => IterableOnce[K2]): KeyedGraftStream[K2, V] = {
    implicit val e: Encoder[(Long, K2, V)] = triple[K2, V]
    new KeyedGraftStream(ds.flatMap(r => f(r._2).iterator.map(k2 => (r._1, k2, r._3))), shardHint, commutativeHint)
  }

  /** mapValues / flatMapValues keep the key (Producer.scala:378-379,409-410 →
    * ValueFlatMappedProducer) — no re-shuffle needed downstream.
    */
  def mapValues[V2: Encoder](f: V => V2): KeyedGraftStream[K, V2] = {
    implicit val e: Encoder[(Long, K, V2)] = triple[K, V2]
    new KeyedGraftStream(ds.map(r => (r._1, r._2, f(r._3))), shardHint, commutativeHint)
  }
  def flatMapValues[V2: Encoder](f: V => IterableOnce[V2]): KeyedGraftStream[K, V2] = {
    implicit val e: Encoder[(Long, K, V2)] = triple[K, V2]
    new KeyedGraftStream(ds.flatMap(r => f(r._3).iterator.map(v2 => (r._1, r._2, v2))), shardHint, commutativeHint)
  }

  /** filterKeys / filterValues (Producer.scala:358-368). */
  def filterKeys(f: K => Boolean): KeyedGraftStream[K, V] =
    new KeyedGraftStream(ds.filter(r => f(r._2)), shardHint, commutativeHint)
  def filterValues(f: V => Boolean): KeyedGraftStream[K, V] =
    new KeyedGraftStream(ds.filter(r => f(r._3)), shardHint, commutativeHint)

  /** collectKeys / collectValues (Producer.scala:345-350). */
  def collectKeys[K2: Encoder](pf: PartialFunction[K, K2]): KeyedGraftStream[K2, V] =
    flatMapKeys(k => pf.lift(k))
  def collectValues[V2: Encoder](pf: PartialFunction[V, V2]): KeyedGraftStream[K, V2] =
    flatMapValues(v => pf.lift(v))

  /** Union; per-name hints combine SYMMETRICALLY: the merged stream takes
    * the max of the two shard hints (the union carries at least each
    * side's volume, so the larger parallelism request wins) and the AND of
    * the two commutativity overrides (an ordered-fold request on either
    * side must survive the merge — order sensitivity is contagious). A
    * hint set on only one side propagates unchanged.
    */
  def merge(other: KeyedGraftStream[K, V]): KeyedGraftStream[K, V] = {
    val shards = (shardHint, other.shardHint) match {
      case (Some(a), Some(b)) => Some(a max b)
      case (a, b)             => a.orElse(b)
    }
    val commutative = (commutativeHint, other.commutativeHint) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (a, b)             => a.orElse(b)
    }
    new KeyedGraftStream(ds.union(other.ds), shards, commutative)
  }

  def toStream(implicit kvEnc: Encoder[(K, V)]): GraftStream[(K, V)] = {
    implicit val e: Encoder[(Long, (K, V))] = Encoders.tuple(Encoders.scalaLong, kvEnc)
    new GraftStream(
      ds.select(col("_1"), struct(col("_2").as("_1"), col("_3").as("_2")).as("_2"))
        .as[(Long, (K, V))])
  }

  /** leftJoin against a static service (Producer.scala:388-389 →
    * LeftJoinedProducer): `(K, V) => (K, (V, Option[J]))`. A fully COLUMNAR
    * left equi-join — no closure touches the rows, so Catalyst broadcasts
    * small services, prunes columns, and keeps whole-stage codegen (the
    * reference's online multiGet lookup, FlatMapOperation.scala:113-137,
    * becomes a join). A missing match is a null field, which the Option
    * encoder reads back as None.
    */
  def leftJoinDs[J](service: Dataset[(K, J)])(
      implicit vjEnc: Encoder[(V, Option[J])]): KeyedGraftStream[K, (V, Option[J])] = {
    implicit val out: Encoder[(Long, K, (V, Option[J]))] =
      Encoders.tuple(Encoders.scalaLong, kEnc, vjEnc)
    val svc = service.toDF("__svc_k", "__svc_v")
    val joined = ds.toDF("_1", "_2", "_3")
      .join(svc, col("_2") === col("__svc_k"), "left_outer")
      .select(col("_1"), col("_2"),
        struct(col("_3").as("_1"), col("__svc_v").as("_2")).as("_3"))
    new KeyedGraftStream(joined.as[(Long, K, (V, Option[J]))], shardHint, commutativeHint)
  }

  /** leftJoin against a LIVE external service (reference online leftJoin,
    * FlatMapOperation.scala:113-137): per partition, open one connection,
    * batch keys into `multiGet`s of `batchSize`, and keep up to `maxWaiting`
    * lookups in flight (the MaxWaitingFutures analogue, AllOpts.scala:36-45)
    * — overlapping service latency with row processing while bounding the
    * memory held by outstanding responses. Results stream out in input
    * order; the connection closes on task completion (success or failure).
    *
    * Use [[leftJoinDs]] when the service is dataset-shaped — Catalyst then
    * plans a broadcast/shuffle join. This connector is for services that
    * only exist behind a lookup API.
    */
  def leftJoinExternal[W](
      service: ExternalService[K, W],
      batchSize: Int = 100,
      maxWaiting: Int = 4,
      lookupTimeout: scala.concurrent.duration.Duration = scala.concurrent.duration.Duration(30, "s"),
      retries: Int = 0,
      missOnFailure: Boolean = false)(
      implicit vwEnc: Encoder[(V, Option[W])]): KeyedGraftStream[K, (V, Option[W])] = {
    implicit val out: Encoder[(Long, K, (V, Option[W]))] =
      Encoders.tuple(Encoders.scalaLong, kEnc, vwEnc)
    require(batchSize >= 1 && maxWaiting >= 1, s"batchSize/maxWaiting must be >= 1")
    val joined = ds.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val conn = service.open()
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; conn.close() }
        // close when the task ends even if downstream stops consuming early
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))

        val inflight = new scala.collection.mutable.Queue[(Seq[(Long, K, V)], scala.concurrent.Future[Map[K, W]])]()
        // failure policy (reference OnlineExceptionHandler, online/option/
        // AllOpts.scala): re-issue a failed batch `retries` times on the
        // same connection; after that, `missOnFailure` degrades the batch
        // to misses (every key None) instead of failing the task — for
        // pipelines where the joined feature is best-effort. Default is
        // fail-the-task: Spark's task retry is the at-least-once backstop,
        // as the reference's acking is.
        def drainOne(): Iterator[(Long, K, (V, Option[W]))] = {
          val (batch, fut) = inflight.dequeue()
          val res =
            try scala.concurrent.Await.result(fut, lookupTimeout)
            catch { case scala.util.control.NonFatal(first) =>
              var out: Option[Map[K, W]] = None
              var last: Throwable = first
              var attempt = 0
              while (out.isEmpty && attempt < retries) {
                attempt += 1
                try out = Some(scala.concurrent.Await.result(
                  conn.multiGet(batch.map(_._2).distinct), lookupTimeout))
                catch { case scala.util.control.NonFatal(e) => last = e }
              }
              out.getOrElse {
                if (missOnFailure) Map.empty[K, W] else throw last
              }
            }
          batch.iterator.map(r => (r._1, r._2, (r._3, res.get(r._2))))
        }
        val pipelined = rows.grouped(batchSize).flatMap { batch =>
          inflight.enqueue((batch, conn.multiGet(batch.map(_._2).distinct)))
          if (inflight.size >= maxWaiting) drainOne() else Iterator.empty
        }
        val drainRest = new Iterator[(Long, K, (V, Option[W]))] {
          private var cur: Iterator[(Long, K, (V, Option[W]))] = Iterator.empty
          def hasNext: Boolean = {
            while (!cur.hasNext && inflight.nonEmpty) cur = drainOne()
            val h = cur.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): (Long, K, (V, Option[W])) = {
            if (!hasNext) throw new NoSuchElementException("drained")
            cur.next()
          }
        }
        pipelined ++ drainRest
      }
    }
    new KeyedGraftStream(joined, shardHint, commutativeHint)
  }

  /** Temporal (as-of) leftJoin against a change-stream service: each left
    * event at time t sees the service value as of t (strictly before t —
    * lookups-before-writes, reference LookupJoin via BatchedService.scala:
    * 53-120, tie-break Service.scala:210-213).
    */
  def leftJoinAsof[J](service: KeyedGraftStream[K, J])(
      implicit jEnc: Encoder[J], vjEnc: Encoder[(V, Option[J])]): KeyedGraftStream[K, (V, Option[J])] = {
    implicit val out: Encoder[(Long, K, (V, Option[J]))] =
      Encoders.tuple(Encoders.scalaLong, kEnc, vjEnc)
    implicit val mergedVal: Encoder[(Option[V], Option[J])] =
      Encoders.tuple(GraftEncoders.option(vEnc), GraftEncoders.option(jEnc))
    implicit val mergedEnc: Encoder[(Long, K, (Option[V], Option[J]))] =
      Encoders.tuple(Encoders.scalaLong, kEnc, mergedVal)
    val merged: Dataset[(Long, K, (Option[V], Option[J]))] =
      ds.map(r => (r._1, r._2, (Option(r._3), Option.empty[J])))
        .union(service.ds.map(r => (r._1, r._2, (Option.empty[V], Option(r._3)))))
    val out0 = SortedGroups.perKeyTimeSorted(merged) { (k: K, it: Iterator[(Long, (Option[V], Option[J]))]) =>
      var state: Option[J] = None
      it.flatMap { case (t, (lv, rv)) =>
        // left (lookup) rows sort before right (write) rows at equal t:
        // SortedGroups orders by (ts, isRight) via the tag below
        lv match {
          case Some(v) => Iterator.single((t, k, (v, state)))
          case None    => state = rv; Iterator.empty
        }
      }
    }(tagIsRight = r => r._3._1.isEmpty)
    new KeyedGraftStream(out0, shardHint, commutativeHint)
  }

  /** sumByKey — the single aggregation primitive (Producer.scala:412-422 →
    * Summer). Groups by (K, batch), Semigroup-sums V, and — true to the
    * reference's contract — emits `(K, batch, (Option[V], V))`: the value
    * BEFORE this batch's delta (all-time prior sum) and the delta itself.
    *
    * Physical plan: commutative semigroups take Spark's hash aggregation
    * (partial+final, no sort); non-commutative ones fold in event-time order
    * inside sorted groups (mirrors BatchedStore.scala:200-203). The prior
    * (Option[V]) is produced by a per-key scan over batches — one extra
    * narrow shuffle on K.
    */
  def sumByKey(batcher: Batcher)(implicit sg: Semigroup[V]): Dataset[(K, Long, (Option[V], V))] = {
    val perBatch: Dataset[(K, Long, V)] = sumDeltasPerBatch(batcher)
    // product-encoded (nullable struct), NOT kryo: store outputs stay
    // columnar/prunable (see GraftEncoders)
    implicit val outEnc: Encoder[(K, Long, (Option[V], V))] =
      Encoders.tuple(kEnc, Encoders.scalaLong, GraftEncoders.priorDelta(vEnc))
    // scan batches per key in order to compute the running prior
    val keyed = perBatch.map(r => (r._2, r._1, r._3)) // (batchAsTs, K, V)
    SortedGroups.perKeyTimeSorted(keyed, shardHint) { (k: K, it: Iterator[(Long, V)]) =>
      var prior: Option[V] = None
      it.map { case (batch, delta) =>
        val out = (k, batch, (prior, delta))
        prior = Some(prior.fold(delta)(p => sg.plus(p, delta)))
        out
      }
    }()
  }

  /** Per-(K, batch) Semigroup-summed deltas — the map-side/partial half of
    * sumByKey, without the prior scan. This is what the incremental
    * [[graft.batch.BatchStore]] merge consumes.
    */
  def sumDeltasPerBatch(batcher: Batcher)(implicit sg: Semigroup[V]): Dataset[(K, Long, V)] = {
    implicit val outEnc: Encoder[(K, Long, V)] =
      Encoders.tuple(kEnc, Encoders.scalaLong, vEnc)
    // the per-name MonoidIsCommutative option overrides the semigroup's
    // declaration (reference ScaldingPlatform.scala:391-392 reads the same
    // option to choose the physical aggregation)
    if (commutativeHint.getOrElse(sg.isCommutative)) sg.columnForm match {
      case Some(aggFn) =>
        // fast path: the semigroup has a native Catalyst aggregate — one
        // codegen'd hash aggregation (partial + final), fully columnar.
        // A shards hint pins the key exchange to exactly k partitions
        // (HashPartitioning on _k satisfies the (_k,_b) clustering, so the
        // aggregate adds no second exchange); without it, conf + AQE decide.
        val flat = ds.toDF("_ts", "_k", "_v")
        shardHint.fold(flat)(k => flat.repartition(k, col("_k")))
          .groupBy(col("_k"), batcher.batchIdColumn(col("_ts")).as("_b"))
          .agg(aggFn(col("_v")).as("_s"))
          .select(col("_k").as("_1"), col("_b").as("_2"), col("_s").as("_3"))
          .as[(K, Long, V)]
      case None =>
        implicit val kbEnc: Encoder[(K, Long)] = Encoders.tuple(kEnc, Encoders.scalaLong)
        ds.groupByKey(r => (r._2, batcher.batchOf(Timestamp(r._1)).id))
          .mapValues(_._3)(vEnc)
          .reduceGroups((a: V, b: V) => sg.plus(a, b))
          .map { case ((k, b), v) => (k, b, v) }
    } else {
      // non-commutative: fold strictly in event-time order within (K, batch)
      implicit val kbEnc2: Encoder[(K, Long)] = Encoders.tuple(kEnc, Encoders.scalaLong)
      implicit val inEnc: Encoder[(Long, (K, Long), V)] =
        Encoders.tuple(Encoders.scalaLong, kbEnc2, vEnc)
      val byKb: Dataset[(Long, (K, Long), V)] =
        ds.map(r => (r._1, (r._2, batcher.batchOf(Timestamp(r._1)).id), r._3))
      SortedGroups.perKeyTimeSorted(byKb, shardHint) { (kb: (K, Long), it: Iterator[(Long, V)]) =>
        val summed = it.map(_._2).reduce(sg.plus)
        Iterator.single((kb._1, kb._2, summed))
      }()
    }
  }

  /** All-time sumByKey with Batcher.unit — convenience matching the common
    * streaming-job shape. The final projection is columnar (no closure).
    */
  def sumByKeyAllTime(implicit sg: Semigroup[V], kvEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    sumDeltasPerBatch(Batcher.unit)
      .select(col("_1"), col("_3").as("_2")).as[(K, V)](kvEnc)

  /** Hot-key pre-split for the NON-COMMUTATIVE ordered fold — the
    * Summer counterpart of `LoopJoin.loopJoinPreSplit`: a single hot
    * (key, batch) group otherwise folds serially inside one task
    * (spill-safe but not parallel — the skew ceiling of the sorted-scan
    * path). Associativity rescues it: fold each `chunkOf(ts)` time chunk
    * of the key in event-time order IN PARALLEL, then fold the per-chunk
    * partials in chunk order — the result is identical by associativity
    * (the fold order over events is unchanged), and the hot key's scan
    * parallelism becomes the number of chunks it spans. Two sorted-group
    * shuffles; phase 2's input is one row per (key, batch, chunk).
    *
    * Commutative semigroups don't need this (hash aggregation already
    * combines map-side); use it when a non-commutative value (List
    * concat, lastByTime chains, Moments in strict order) meets a key
    * carrying a data-sized share of events.
    */
  def sumDeltasPerBatchPreSplit(batcher: Batcher, chunkOf: Long => Long)(
      implicit sg: Semigroup[V]): Dataset[(K, Long, V)] = {
    implicit val kbEnc: Encoder[(K, Long)] = Encoders.tuple(kEnc, Encoders.scalaLong)
    implicit val kbcEnc: Encoder[((K, Long), Long)] =
      Encoders.tuple(kbEnc, Encoders.scalaLong)
    implicit val p1InEnc: Encoder[(Long, ((K, Long), Long), V)] =
      Encoders.tuple(Encoders.scalaLong, kbcEnc, vEnc)
    implicit val p1OutEnc: Encoder[(K, Long, Long, V)] =
      Encoders.tuple(kEnc, Encoders.scalaLong, Encoders.scalaLong, vEnc)
    implicit val outEnc: Encoder[(K, Long, V)] =
      Encoders.tuple(kEnc, Encoders.scalaLong, vEnc)
    // phase 1: ordered fold within (key, batch, chunk) — the parallel unit
    val byKbc: Dataset[(Long, ((K, Long), Long), V)] = ds.map(r =>
      (r._1, ((r._2, batcher.batchOf(Timestamp(r._1)).id), chunkOf(r._1)), r._3))
    val partials: Dataset[(K, Long, Long, V)] =
      SortedGroups.perKeyTimeSorted(byKbc, shardHint) {
        (kbc: ((K, Long), Long), it: Iterator[(Long, V)]) =>
          Iterator.single((kbc._1._1, kbc._1._2, kbc._2, it.map(_._2).reduce(sg.plus)))
      }()
    // phase 2: fold the chunk partials per (key, batch) in chunk order —
    // one row per chunk, so even a fully-hot key scans trivially here
    val byKb: Dataset[(Long, (K, Long), V)] =
      partials.map(r => (r._3, (r._1, r._2), r._4))(
        Encoders.tuple(Encoders.scalaLong, kbEnc, vEnc))
    SortedGroups.perKeyTimeSorted(byKb, shardHint) {
      (kb: (K, Long), it: Iterator[(Long, V)]) =>
        Iterator.single((kb._1, kb._2, it.map(_._2).reduce(sg.plus)))
    }()
  }

  /** [[sumByKeyAllTime]] through the pre-split ordered fold. */
  def sumByKeyAllTimePreSplit(chunkOf: Long => Long)(
      implicit sg: Semigroup[V], kvEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    sumDeltasPerBatchPreSplit(Batcher.unit, chunkOf)
      .select(col("_1"), col("_3").as("_2")).as[(K, V)](kvEnc)

  /** Columnar aggregation escape hatch: sum the value column with an
    * arbitrary Catalyst AGGREGATE expression (e.g. a native sketch aggregate
    * from [[graft.functions.SketchAggregates]]) — for aggregations whose
    * semigroup form would allocate per event. One codegen'd hash agg; the
    * aggregate's own buffer semantics stand in for `plus`.
    */
  def sumByKeyAgg[V2: Encoder](aggFn: Column => Column): Dataset[(K, V2)] =
    sumByKeyAggDF(aggFn).as[(K, V2)](
      Encoders.tuple(kEnc, implicitly[Encoder[V2]]))

  /** [[sumByKeyAgg]] without the typed projection — for aggregate result
    * types with no natural Scala encoder (e.g. the array<struct> a
    * heavy-hitters sketch emits). Columns: `_1` = key, `_2` = aggregate.
    */
  def sumByKeyAggDF(aggFn: Column => Column): org.apache.spark.sql.DataFrame = {
    val flat = ds.toDF("_ts", "_k", "_v")
    shardHint.fold(flat)(k => flat.repartition(k, col("_k")))
      .groupBy(col("_k"))
      .agg(aggFn(col("_v")).as("_s"))
      .select(col("_k").as("_1"), col("_s").as("_2"))
  }
}
