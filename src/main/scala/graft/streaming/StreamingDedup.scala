package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Dedup
import graft.plans.GraftEncoders

/** Streaming form of the exact-dedup family — ingest-time dedup for a
  * continuously arriving corpus (the online half of
  * [[graft.operators.Dedup.exact]] / [[graft.operators.Dedup.exactAgainst]]):
  * the first document with a given text digest passes, every later
  * byte-identical arrival is dropped, across micro-batches, with the digest
  * set carried in Spark's state store.
  *
  * Two state regimes:
  *  - unbounded ([[exact]]): one state row per distinct digest, forever —
  *    exact, but state grows with the corpus; right when the corpus is
  *    bounded or the run is batch-windowed.
  *  - watermarked ([[exactWithinHorizon]]): `dropDuplicatesWithinWatermark`
  *    expires digests older than the watermark horizon, so state is bounded
  *    by the horizon's arrival volume — the production shape for endless
  *    crawls, trading exactness for duplicates that re-arrive later than
  *    the horizon (which a periodic batch [[graft.operators.Dedup
  *    .exactAgainst]] pass against the accumulated corpus then catches:
  *    the same lambda split as sumByKey's online/offline stores).
  *
  * Only the 16-byte digest enters the state store, never the text.
  */
object StreamingDedup {

  /** Exact streaming dedup keyed by md5(textCol). */
  def exact(ds: DataFrame, textCol: String): DataFrame =
    ds.withColumn("__digest", md5(col(textCol)))
      .dropDuplicates("__digest")
      .drop("__digest")

  /** Bounded-state streaming dedup: duplicates arriving within
    * `horizon` (event time, per `eventTimeCol`'s watermark) are dropped;
    * state for older digests is reclaimed.
    */
  def exactWithinHorizon(ds: DataFrame, textCol: String,
      eventTimeCol: String, horizon: String): DataFrame =
    ds.withColumn("__digest", md5(col(textCol)))
      .withWatermark(eventTimeCol, horizon)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming MinHash-LSH NEAR-dup candidates — ingest-time counterpart of
    * [[graft.operators.Dedup.minhashCandidates]]: each arriving document's
    * banded signature probes per-bucket state (the ids previously seen in
    * that (band, bandHash) bucket) and emits a candidate pair per bucket
    * mate, as (smaller id, larger id). Signature/banding use the IDENTICAL
    * columnar expressions as the batch pipeline, so on the same corpus the
    * emitted pair SET equals the batch candidate set (asserted in
    * StreamingDedupSpec) — candidates may repeat across bands/micro-batches
    * (append mode cannot retro-dedup); like all LSH candidates they carry
    * false positives and feed a downstream verification, which dedups.
    *
    * State per bucket is an id array capped at `maxBucket` (a hot bucket —
    * boilerplate-heavy near-identical docs — would otherwise grow state and
    * emit O(n²) pairs); arrivals past the cap still pair against the
    * remembered ids but are not themselves remembered. Only ids live in the
    * state store (native bigint array), never text or signatures.
    *
    * Blank documents (empty shingle sets) mirror the batch star contract
    * ([[graft.operators.Dedup.candidatesFromShingles]]): they bypass the
    * banded buckets (their identical all-MaxValue signatures would turn
    * every band bucket into a blank clique) and route to ONE dedicated
    * state key remembering only the minimum blank id seen so far; each
    * later blank emits a single pair against that minimum. When the
    * minimum blank id arrives no later than the other blanks (ascending
    * feeds; any corpus without blanks), the emitted set equals the batch
    * star exactly; under adversarial arrival orders it is a union of
    * stars — still linear and transitively equivalent.
    */
  /** Bounded-state form of [[minhashCandidates]] — the endless-crawl
    * regime, completing the exact/exactWithinHorizon pairing for near-dup:
    * band-bucket state remembers only ids whose event time is inside the
    * watermark `horizon`, so state tracks the horizon's arrival volume
    * instead of the whole corpus (the one state shape in the engine that
    * otherwise grows with corpus size). Eviction is two-tier:
    * per-arrival, a probed bucket drops remembered entries older than the
    * current watermark; idle buckets are reclaimed WHOLE by event-time
    * timeout when the watermark passes their newest entry. A duplicate
    * arriving later than the horizon emits no pair here — the periodic
    * batch backstop ([[graft.operators.Dedup.minhashVerifiedPairs]] over
    * the accumulated corpus) catches it, the same lambda split as
    * [[exactWithinHorizon]]. State stores (id, eventMillis) pairs —
    * still never text or signatures.
    *
    * Blank documents keep the single-min-id star key; the remembered
    * minimum also ages out past the horizon.
    */
  def minhashCandidatesWithinHorizon(ds: DataFrame, textCol: String,
      idCol: String, eventTimeCol: String, horizon: String,
      w: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      maxBucket: Int = 256): Dataset[(Long, Long)] = {
    val numHashes = bands * rowsPerBand
    // the event-time column itself must survive into the stateful
    // operator's input (an expression over it would strip the watermark
    // metadata and fail the event-time-timeout analysis check) — the
    // plain alias keeps it
    val base = ds.withWatermark(eventTimeCol, horizon)
      .select(col(idCol).cast("long").as("__id"),
        col(eventTimeCol).as("__ts"),
        Dedup.shingleCol(col(textCol), w).as("__shg"))
    val sig = base.where(size(col("__shg")) > 0).select(col("__id"),
      col("__ts"), Dedup.minhashSignature(col("__shg"), numHashes).as("__sig"))
    val blank = base.where(size(col("__shg")) === 0)
      .select(col("__id"), col("__ts"), lit(-1).as("__band"), lit(0).as("__bandhash"))
    val banded = sig.select(col("__id"), col("__ts"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
        .as(Seq("__band", "__bandhash")))
      .union(blank)
    implicit val rowEnc: Encoder[(Long, java.sql.Timestamp, Int, Int)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP,
        Encoders.scalaInt, Encoders.scalaInt)
    implicit val keyEnc: Encoder[(Int, Int)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    implicit val pairEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    // state: interleaved [id0, ts0, id1, ts1, ...] — native long array
    implicit val stateEnc: Encoder[Array[Long]] = GraftEncoders.longArray
    banded.as[(Long, java.sql.Timestamp, Int, Int)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((band, _), rows, state) =>
          // batch invocations have no watermark (withWatermark is a no-op
          // there): 0 disables eviction, matching the unbounded operator
          val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(0L)
          val priorAll = state.getOption.getOrElse(Array.empty[Long])
          // evict remembered entries the watermark has passed
          val prior = priorAll.grouped(2).filter(_.apply(1) >= wm).toArray
          if (state.hasTimedOut) {
            // idle bucket, every entry aged out with it (the timeout was
            // set past the newest entry)
            if (prior.isEmpty) state.remove()
            else state.update(prior.flatten)
            Iterator.empty
          } else {
            val newRows = rows.map(r => (r._1, r._2.getTime)).toArray
              .groupBy(_._1).map { case (id, ts) => (id, ts.map(_._2).max) }
              .toArray.sortBy(_._1)
            val out = Seq.newBuilder[(Long, Long)]
            val updated: Array[Array[Long]] =
              if (band == -1) {
                // blank star: remember the min id inside the horizon only
                var cur: Option[(Long, Long)] =
                  prior.headOption.map(e => (e(0), e(1)))
                newRows.foreach { case (id, ts) =>
                  cur match {
                    case Some((mid, mts)) if mid != id =>
                      out += ((math.min(mid, id), math.max(mid, id)))
                      cur = Some(if (id < mid) (id, ts) else (mid, math.max(mts, ts)))
                    case Some((mid, mts)) if mid == id =>
                      cur = Some((mid, math.max(mts, ts)))
                    case _ => cur = Some((id, ts))
                  }
                }
                cur.toArray.map { case (i, t) => Array(i, t) }
              } else {
                val priorIds = prior.map(_.apply(0)).toSet
                val bucket = scala.collection.mutable.ArrayBuffer.from(prior)
                newRows.foreach { case (id, ts) =>
                  if (!priorIds.contains(id)) {
                    bucket.foreach { p =>
                      if (p(0) != id)
                        out += ((math.min(p(0), id), math.max(p(0), id)))
                    }
                    if (bucket.length < maxBucket) bucket += Array(id, ts)
                  }
                }
                bucket.toArray
              }
            if (updated.isEmpty) state.remove()
            else {
              state.update(updated.flatten)
              // reclaim the whole bucket when the watermark passes its
              // newest remembered arrival (+horizon is already baked into
              // the watermark definition). Batch runs have no watermark —
              // timeouts never fire there and some Spark versions refuse
              // the call, hence the Try.
              val newest = updated.iterator.map(_.apply(1)).max
              scala.util.Try(state.setTimeoutTimestamp(math.max(newest, wm) + 1))
            }
            out.result().iterator
          }
      }
  }

  def minhashCandidates(ds: DataFrame, textCol: String, idCol: String,
      w: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      maxBucket: Int = 256): Dataset[(Long, Long)] = {
    val numHashes = bands * rowsPerBand
    // signature once per row, then band explosion — the same expressions
    // (and therefore the same bucket keys) as Dedup.candidatesFromShingles
    val base = ds.select(col(idCol).cast("long").as("__id"),
      Dedup.shingleCol(col(textCol), w).as("__shg"))
    val sig = base.where(size(col("__shg")) > 0).select(col("__id"),
      Dedup.minhashSignature(col("__shg"), numHashes).as("__sig"))
    val blank = base.where(size(col("__shg")) === 0)
      .select(col("__id"), lit(-1).as("__band"), lit(0).as("__bandhash"))
    val banded = sig.select(col("__id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)))
        .as(Seq("__band", "__bandhash")))
      .union(blank)
    implicit val rowEnc: Encoder[(Long, Int, Int)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaInt)
    implicit val keyEnc: Encoder[(Int, Int)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    implicit val pairEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val stateEnc: Encoder[Array[Long]] = GraftEncoders.longArray
    banded.as[(Long, Int, Int)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((band, _), rows, state) =>
          val prior = state.getOption.getOrElse(Array.empty[Long])
          // sort for a deterministic in-batch fold order
          val newIds = rows.map(_._1).toArray.distinct.sorted
          val out = Seq.newBuilder[(Long, Long)]
          if (band == -1) {
            // blank-document star: remember ONLY the running minimum id;
            // each later blank pairs against it (linear, never a clique)
            var minId = if (prior.nonEmpty) prior(0) else Long.MaxValue
            newIds.foreach { id =>
              if (id != minId) {
                if (minId != Long.MaxValue)
                  out += ((math.min(minId, id), math.max(minId, id)))
                minId = math.min(minId, id)
              }
            }
            if (minId != Long.MaxValue) state.update(Array(minId))
          } else {
            val bucket = scala.collection.mutable.ArrayBuffer.from(prior)
            newIds.foreach { id =>
              if (!prior.contains(id)) {
                bucket.foreach { p =>
                  if (p != id) out += ((math.min(p, id), math.max(p, id)))
                }
                if (bucket.length < maxBucket) bucket += id
              }
            }
            state.update(bucket.toArray)
          }
          out.result().iterator
      }
  }
}
