package graft.plans

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col

/** Distributed secondary sort: partition by key, sort each partition by
  * (key, time, tag), then stream per-key groups through a function — WITHOUT
  * materializing a whole key's rows in memory. This replaces the reference's
  * reducer-side sorted folds (scalding `sortBy(Timestamp)` reduce,
  * BatchedStore.scala:200-203, and the LookupJoin/loopJoin scanLeft,
  * Service.scala:196-269) with `repartition + sortWithinPartitions +
  * mapPartitions` — Spark's external sort spills to disk, so a skewed key
  * never OOMs the executor.
  *
  * The group function receives a LAZY iterator; when its output is exhausted,
  * any unconsumed input rows of that group are drained before advancing —
  * so `it.map`/`it.flatMap`/early-`take` shapes are all safe.
  */
object SortedGroups {

  /** `ds` rows are (timeMs, key, value). `tagIsRight` orders rows at EQUAL
    * timestamps: rows with tag=false sort before tag=true (the reference's
    * lookups-before-writes tie-break, Service.scala:210-213).
    */
  /** `numShards` pins the key-exchange partition count (the per-name
    * Reducers/shards option); None leaves it to conf + AQE.
    */
  def perKeyTimeSorted[K, V, U](ds: Dataset[(Long, K, V)],
      numShards: Option[Int] = None)(
      f: (K, Iterator[(Long, V)]) => Iterator[U])(
      tagIsRight: ((Long, K, V)) => Boolean = (_: (Long, K, V)) => false)(
      implicit kEnc: Encoder[K], vEnc: Encoder[V], uEnc: Encoder[U]): Dataset[U] = {
    implicit val taggedEnc: Encoder[(Long, K, V, Int)] =
      Encoders.tuple(Encoders.scalaLong, kEnc, vEnc, Encoders.scalaInt)
    val tagged = ds.map(r => (r._1, r._2, r._3, if (tagIsRight(r)) 1 else 0))
    val sorted = numShards.fold(tagged.repartition(col("_2")))(
        k => tagged.repartition(k, col("_2")))
      .sortWithinPartitions(col("_2"), col("_1"), col("_4"))
    sorted.mapPartitions { it =>
      groupedFlat[(Long, K, V, Int), K, U](it, _._2, (k, rows) => f(k, rows.map(r => (r._1, r._3))))
    }
  }

  /** Lazily split a key-sorted iterator into per-key runs and flatMap `f`
    * over them. Advancing past a group drains its unconsumed rows.
    */
  def groupedFlat[A, K, U](it: Iterator[A], keyOf: A => K,
      f: (K, Iterator[A]) => Iterator[U]): Iterator[U] = new Iterator[U] {
    private val in = it.buffered
    private var curGroup: GroupIter = _
    private var curOut: Iterator[U] = Iterator.empty

    private final class GroupIter(val key: K) extends Iterator[A] {
      def hasNext: Boolean = in.hasNext && keyOf(in.head) == key
      def next(): A = { if (!hasNext) Iterator.empty.next(); in.next() }
      def drain(): Unit = while (hasNext) { in.next(); () }
    }

    private def advance(): Unit = {
      while (!curOut.hasNext && { if (curGroup != null) curGroup.drain(); in.hasNext }) {
        val g = new GroupIter(keyOf(in.head))
        curGroup = g
        curOut = f(g.key, g)
      }
    }
    def hasNext: Boolean = { advance(); curOut.hasNext }
    def next(): U = { advance(); curOut.next() }
  }
}
