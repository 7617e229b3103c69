package graft.algebra

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bridges any [[Semigroup]] to a Spark typed
  * `org.apache.spark.sql.expressions.Aggregator`, the idiomatic extension
  * point for custom aggregation over `Dataset`s. Spark runs it partial
  * (map-side combine) + final automatically — replacing the reference's
  * hand-built map-side caches (summingbird-online/.../executor/
  * FinalFlatMap.scala:49-137) with Tungsten hash aggregation.
  *
  * NOTE: only sound for COMMUTATIVE semigroups under hash aggregation (input
  * order is not preserved across partitions). Non-commutative values must go
  * through the ordered branch of
  * [[graft.api.KeyedGraftStream.sumDeltasPerBatch]], which folds in
  * event-time order inside sorted groups (mirrors the reference's
  * non-commutative reducer sort, BatchedStore.scala:200-203).
  */
class SemigroupAggregator[V](sg: Semigroup[V])(implicit venc: Encoder[V])
    extends Aggregator[V, Option[V], V] {
  def zero: Option[V] = None
  def reduce(buf: Option[V], v: V): Option[V] =
    buf match { case Some(b) => Some(sg.plus(b, v)); case None => Some(v) }
  def merge(a: Option[V], b: Option[V]): Option[V] = (a, b) match {
    case (Some(x), Some(y)) => Some(sg.plus(x, y))
    case (x, None)          => x
    case (None, y)          => y
  }
  def finish(buf: Option[V]): V =
    buf.getOrElse(throw new IllegalStateException("empty group"))
  def bufferEncoder: Encoder[Option[V]] = graft.plans.GraftEncoders.option[V]
  def outputEncoder: Encoder[V] = venc
}

/** Variant that aggregates the value component of (K, V) pairs — usable
  * directly after `groupByKey(_._1)`.
  */
class PairValueAggregator[K, V](sg: Semigroup[V])(implicit venc: Encoder[V])
    extends Aggregator[(K, V), Option[V], V] {
  private val inner = new SemigroupAggregator[V](sg)
  def zero: Option[V] = None
  def reduce(buf: Option[V], kv: (K, V)): Option[V] = inner.reduce(buf, kv._2)
  def merge(a: Option[V], b: Option[V]): Option[V] = inner.merge(a, b)
  def finish(buf: Option[V]): V = inner.finish(buf)
  def bufferEncoder: Encoder[Option[V]] = graft.plans.GraftEncoders.option[V]
  def outputEncoder: Encoder[V] = venc
}
