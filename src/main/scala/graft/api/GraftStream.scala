package graft.api

import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.algebra.Semigroup
import graft.time.{Batcher, BatchID}

/** The user-facing logical surface of the engine — the same operator family as
  * the reference's `Producer[P, T]` DSL (summingbird-core/.../Producer.scala:
  * 222-439), re-expressed as a thin fluent layer over `Dataset[(Long, T)]`
  * (event-time millis, value). Every operator delegates to a Catalyst-friendly
  * Dataset op, so fusion/pushdown/codegen come from Catalyst instead of the
  * reference's dagon rule engine (DagOptimizer.scala) — see SURVEY §4.1.
  *
  * Closure-based `map`/`filter`/`flatMap` are kept for API parity (the
  * reference's scalar layer is arbitrary Scala closures, SURVEY §2.6); for
  * columnar pipelines prefer the `where(Column)` passthrough (and plain
  * DataFrames via `toDF`) which stay in whole-stage codegen.
  */
sealed class GraftStream[T](val ds: Dataset[(Long, T)],
    val shardHint: Option[Int] = None)(implicit enc: Encoder[T])
    extends Serializable {
  private implicit def pairEnc: Encoder[(Long, T)] =
    Encoders.tuple(Encoders.scalaLong, enc)

  /** Input to the next closure expansion, pre-resharded when a
    * `name(_, shards = k)` hint is in scope (reference FlatMapShards,
    * ScaldingPlatform.scala:534-539): a round-robin exchange spreads a
    * skewed or under-partitioned source across k tasks BEFORE the expensive
    * closure runs. Without the hint, no exchange is added.
    */
  private def shardedDs: Dataset[(Long, T)] =
    shardHint.fold(ds)(k => ds.repartition(k))

  /** map (Producer.scala:256-258 → OptionMappedProducer). */
  def map[U: Encoder](f: T => U): GraftStream[U] =
    new GraftStream(ds.map { case (t, v) => (t, f(v)) }(
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[U]])))

  /** filter (Producer.scala:242-244). */
  def filter(f: T => Boolean): GraftStream[T] =
    new GraftStream(ds.filter(tv => f(tv._2)))

  /** collect = filter+map via partial function (Producer.scala:238-239). */
  def collect[U: Encoder](pf: PartialFunction[T, U]): GraftStream[U] =
    optionMap(pf.lift)

  /** optionMap: 0-or-1 output (Producer.scala:263-264 → OptionMappedProducer). */
  def optionMap[U: Encoder](f: T => Option[U]): GraftStream[U] = {
    implicit val out: Encoder[(Long, U)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[U]])
    new GraftStream(shardedDs.flatMap { case (t, v) => f(v).map((t, _)) })
  }

  /** flatMap: 0..n expansion (Producer.scala:270-271 → FlatMappedProducer).
    * Honors a pending `shards` hint (FlatMapShards) by resharding first.
    */
  def flatMap[U: Encoder](f: T => IterableOnce[U]): GraftStream[U] = {
    implicit val out: Encoder[(Long, U)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[U]])
    new GraftStream(shardedDs.flatMap { case (t, v) => f(v).iterator.map((t, _)) })
  }

  /** merge / ++ (Producer.scala:222,231 → MergedProducer) = union. Shard
    * hints combine symmetrically — max of the two requests (the union
    * carries at least each side's volume), one-sided hints propagate.
    */
  def merge(other: GraftStream[T]): GraftStream[T] = {
    val shards = (shardHint, other.shardHint) match {
      case (Some(a), Some(b)) => Some(a max b)
      case (a, b)             => a.orElse(b)
    }
    new GraftStream(ds.union(other.ds), shards)
  }
  def ++(other: GraftStream[T]): GraftStream[T] = merge(other)

  /** Columnar filter passthrough — stays fully inside Catalyst/codegen
    * (unlike the closure `filter`). The event time is column `_1`, the
    * value `_2` (fields of a product T as `_2.field`). On a
    * [[GraftStream.fromColumnar]] source, Catalyst collapses the
    * struct-field access and PUSHES the predicate to the scan.
    */
  def where(cond: Column): GraftStream[T] = new GraftStream(ds.filter(cond))

  /** Columnar map: replace the value with a Column expression (fields of a
    * product T are `_2.field`). The codegen'd twin of the closure `map` —
    * no deserialization, pruning/pushdown survive.
    */
  def selectValue[U: Encoder](valueCol: Column): GraftStream[U] = {
    implicit val out: Encoder[(Long, U)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[U]])
    new GraftStream(ds.select(col("_1"), valueCol.as("_2")).as[(Long, U)])
  }

  /** Columnar projection of the value side to a DataFrame: a product value's
    * struct is flattened back to real columns (pruning reaches the scan), a
    * scalar value becomes one column. `names` optionally renames positionally.
    */
  def valuesDF(names: String*): org.apache.spark.sql.DataFrame = {
    val flat =
      if (GraftStream.isProductEncoder(enc)) ds.select(col("_2.*"))
      else ds.select(col("_2"))
    if (names.isEmpty) flat else flat.toDF(names: _*)
  }

  /** Columnar upgrade to the keyed family: key and value given as Column
    * expressions over (`_1` = ts, `_2` = value) — the codegen'd twin of
    * [[asKeyedWith]].
    */
  def asKeyedCols[K: Encoder, V: Encoder](keyCol: Column, valueCol: Column): KeyedGraftStream[K, V] = {
    implicit val triple: Encoder[(Long, K, V)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[K]], implicitly[Encoder[V]])
    new KeyedGraftStream(
      ds.select(col("_1"), keyCol.as("_2"), valueCol.as("_3")).as[(Long, K, V)],
      shardHint)
  }

  /** either: tagged union (Producer.scala:280-282). Product-encoded as
    * (isRight, nullable left, nullable right) — see
    * [[graft.plans.GraftEncoders.either]] — so the union stays columnar
    * instead of carrying kryo blobs through downstream shuffles.
    */
  def either[U: Encoder](other: GraftStream[U]): GraftStream[Either[T, U]] = {
    implicit val eitherEnc: Encoder[Either[T, U]] =
      graft.plans.GraftEncoders.either(enc, implicitly[Encoder[U]])
    map[Either[T, U]](Left(_)).merge(other.map[Either[T, U]](Right(_)))
  }

  /** write: side-effecting sink, pass-through (Producer.scala:277 →
    * WrittenProducer). In Spark this is simply a second action on the same
    * plan; persist first if the upstream is expensive (the reference's
    * fan-out `.fork`, ScaldingPlatform.scala:343-359 ≈ `.persist`).
    */
  def write(sink: GraftSink[T]): TailStream[T] = { sink.write(ds); new TailStream(ds) }

  /** name: option-scope label (Producer.scala:228). The bare form is a pure
    * label (Catalyst owns physical planning); the `shards` overload is the
    * one per-name option AQE cannot infer (reference NamedProducer → options
    * map, ScaldingPlatform.scala:391-392; FlatMapShards 534-539): it
    * requests a specific parallelism, honored by the NEXT sharding-aware
    * operator — a closure flatMap/optionMap reshards its input round-robin
    * to k tasks; carried into the keyed family (via asKeyed*), the next
    * aggregation shuffles on the key into exactly k partitions.
    */
  def name(n: String): GraftStream[T] = new GraftStream(ds.as(n), shardHint)
  def name(n: String, shards: Int): GraftStream[T] = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    new GraftStream(ds.as(n), Some(shards))
  }

  /** lookup: enrich the whole element by a keyed service
    * (Producer.scala:252-253): `T => (T, Option[V])`. A fully COLUMNAR left
    * equi-join: no closure touches the rows, so Catalyst broadcasts small
    * services, prunes columns, and keeps whole-stage codegen. A missing
    * match surfaces as a null field, which the Option encoder reads as None.
    */
  def lookup[V](service: Dataset[(T, V)])(
      implicit tvEnc: Encoder[(T, Option[V])]): GraftStream[(T, Option[V])] = {
    implicit val out: Encoder[(Long, (T, Option[V]))] =
      Encoders.tuple(Encoders.scalaLong, tvEnc)
    val svc = service.toDF("__svc_k", "__svc_v")
    val joined = ds.toDF("_1", "_2")
      .join(svc, col("_2") === col("__svc_k"), "left_outer")
      .select(col("_1"),
        struct(col("_2").as("_1"), col("__svc_v").as("_2")).as("_2"))
    new GraftStream(joined.as[(Long, (T, Option[V]))])
  }

  /** Upgrade to the keyed operator family — the reference's implicit
    * `Producer[(K,V)] => KeyedProducer` (Producer.scala:60-68). T is a pair,
    * so its struct fields are `_1`/`_2` — a pure columnar projection.
    */
  def asKeyed[K, V](implicit ev: T <:< (K, V), kEnc: Encoder[K], vEnc: Encoder[V]): KeyedGraftStream[K, V] = {
    implicit val triple: Encoder[(Long, K, V)] =
      Encoders.tuple(Encoders.scalaLong, kEnc, vEnc)
    new KeyedGraftStream(
      ds.select(col("_1"), col("_2._1").as("_2"), col("_2._2").as("_3")).as[(Long, K, V)],
      shardHint)
  }

  def asKeyedWith[K, V](kf: T => K, vf: T => V)(
      implicit kEnc: Encoder[K], vEnc: Encoder[V]): KeyedGraftStream[K, V] = {
    implicit val triple: Encoder[(Long, K, V)] =
      Encoders.tuple(Encoders.scalaLong, kEnc, vEnc)
    new KeyedGraftStream(ds.map { case (t, x) => (t, kf(x), vf(x)) }, shardHint)
  }

  def toDF(): org.apache.spark.sql.DataFrame = ds.toDF("ts_ms", "value")
}

/** A stream whose side effects are already planned — returned by `write`.
  * Mirrors the reference's `TailProducer` (Producer.scala:292-311): `also`
  * is only available HERE, so sequencing a tail that never wrote (whose
  * effects would be silently dropped, since Spark plans are lazy) is a
  * compile error instead of quiet data loss. Sinks in this engine write
  * eagerly when `write` is called, so by the time `also` runs this branch's
  * effects are complete; `also` is the explicit sequencing point combining
  * two tails into one logical job (in Spark, two actions in one app).
  */
final class TailStream[T](ds0: Dataset[(Long, T)])(implicit enc0: Encoder[T])
    extends GraftStream[T](ds0) {
  /** also: plan `this` as a side tail, emit `result` (Producer.scala:297-300
    * AlsoProducer — multi-output jobs).
    */
  def also[U](result: GraftStream[U]): GraftStream[U] = result
}

object GraftStream {
  /** Source (Producer.scala:54,286-287): wrap a Dataset, extracting event time
    * with a `TimeExtractor`-style function (TimeExtractor.scala:24-38).
    */
  def from[T: Encoder](ds: Dataset[T])(timeOf: T => Long): GraftStream[T] = {
    implicit val pair: Encoder[(Long, T)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[T]])
    new GraftStream(ds.map(t => (timeOf(t), t)))
  }

  private[api] def isProductEncoder(enc: Encoder[_]): Boolean =
    classOf[Product].isAssignableFrom(enc.clsTag.runtimeClass)

  /** COLUMNAR source — the scale-path twin of [[from]]: the (ts, value) pair
    * is built as a Catalyst projection (the event time as a Column, the value
    * as a struct of the dataset's columns) instead of a closure `map`.
    * Filters applied via `where(col("_2.field") ...)` collapse through the
    * struct and PUSH DOWN to the scan — with the closure form every row is
    * decoded before the first predicate runs, which at 100 TB means reading
    * row groups a pushed filter would skip.
    */
  def fromColumnar[T](ds: Dataset[T], tsCol: Column)(implicit enc: Encoder[T]): GraftStream[T] = {
    implicit val pair: Encoder[(Long, T)] =
      Encoders.tuple(Encoders.scalaLong, enc)
    val valueCol =
      if (isProductEncoder(enc)) struct(ds.columns.toIndexedSeq.map(col): _*)
      else col(ds.columns.head)
    new GraftStream(ds.select(tsCol.cast("long").as("_1"), valueCol.as("_2")).as[(Long, T)])
  }

  /** Source from a DataFrame with an event-time column (TimestampType),
    * staying columnar: `tsCol` is converted to epoch millis in Catalyst.
    */
  def fromDF(df: org.apache.spark.sql.DataFrame, tsCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("ts_ms", unix_millis(col(tsCol)))

  /** Replay a [[GraftSink.parquet]] batched sink as a source — the
    * reference's `BatchedSink.readStream` (summingbird-scalding/.../batch/
    * BatchedSink.scala): the written (ts_ms, value) rows come back as a
    * stream; partition pruning on `batch_id=` dirs applies to any time
    * filter pushed on top.
    */
  def fromBatchedSink[T: Encoder](spark: SparkSession, path: String): GraftStream[T] = {
    implicit val pair: Encoder[(Long, T)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[T]])
    new GraftStream(
      spark.read.parquet(path).select(col("ts_ms"), col("value"))
        .toDF("_1", "_2").as[(Long, T)])
  }

  /** STREAMING replay of a batched sink — `readStream` over the sink
    * directory (the reference's spout-from-files shape): existing batches
    * replay first, newly landed files arrive as later micro-batches. File
    * streaming sources need an explicit schema; it is derived from the
    * value encoder (primitives wrote a scalar `value` column, products a
    * struct).
    */
  def fromBatchedSinkStream[T: Encoder](spark: SparkSession, path: String): GraftStream[T] = {
    import org.apache.spark.sql.types._
    implicit val pair: Encoder[(Long, T)] =
      Encoders.tuple(Encoders.scalaLong, implicitly[Encoder[T]])
    // the sink wrote ds.toDF("ts_ms", "value") from Dataset[(Long, T)] —
    // the tuple encoder's second field IS the value column's exact type
    // (scalar for primitives, struct for products; no name-based guessing)
    val valueType = pair.schema.fields(1).dataType
    val schema = StructType(Seq(
      StructField("ts_ms", LongType), StructField("value", valueType)))
    new GraftStream(
      spark.readStream.schema(schema).parquet(path)
        .select(col("ts_ms"), col("value")).toDF("_1", "_2").as[(Long, T)])
  }
}

/** Sink abstraction (reference `Sink`, Platform.scala / BatchedSink.scala). */
trait GraftSink[T] extends Serializable {
  def write(ds: Dataset[(Long, T)]): Unit
}
object GraftSink {
  /** Time-partitioned parquet append (reference BatchedSink semantics). */
  def parquet[T](path: String, batcher: Batcher): GraftSink[T] = new GraftSink[T] {
    def write(ds: Dataset[(Long, T)]): Unit =
      ds.toDF("ts_ms", "value")
        .withColumn("batch_id", batcher.batchIdColumn(col("ts_ms")))
        .write.mode("append").partitionBy("batch_id").parquet(path)
  }
  /** Idempotent batch-committed parquet sink: each touched `batch_id=N`
    * partition is OVERWRITTEN atomically (dynamic partition overwrite), so
    * re-running a failed or replayed job converges to the same sink state
    * instead of appending duplicates — the effect of the reference's
    * version-state-managed sinks (BatchedSink under HDFSState; a retry
    * rewrites the version rather than double-writing). Use [[parquet]] when
    * the source itself is append-only between runs and duplication is
    * impossible; use this when runs may overlap or retry.
    */
  def committedParquet[T](path: String, batcher: Batcher): GraftSink[T] = new GraftSink[T] {
    def write(ds: Dataset[(Long, T)]): Unit =
      ds.toDF("ts_ms", "value")
        .withColumn("batch_id", batcher.batchIdColumn(col("ts_ms")))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(path)
  }

  /** In-memory collecting sink for tests. */
  def memory[T](): MemorySink[T] = new MemorySink[T]
  final class MemorySink[T] extends GraftSink[T] {
    @transient val buf = new scala.collection.mutable.ArrayBuffer[(Long, T)]
    def write(ds: Dataset[(Long, T)]): Unit = buf ++= ds.collect()
  }
}
