package graft.time

/** Event time in milliseconds since epoch — value class mirroring the
  * reference's `Timestamp` (summingbird-batch/.../Timestamp.scala:24-84).
  * In DataFrame-land event time is just a `TimestampType` column; this class
  * exists for driver-side interval/batch arithmetic.
  */
final case class Timestamp(millis: Long) extends AnyVal with Ordered[Timestamp] {
  def compare(that: Timestamp): Int = java.lang.Long.compare(millis, that.millis)
  def +(ms: Long): Timestamp = Timestamp(millis + ms)
  def -(ms: Long): Timestamp = Timestamp(millis - ms)
  def next: Timestamp = Timestamp(millis + 1)
  def prev: Timestamp = Timestamp(millis - 1)
}
object Timestamp {
  val Min: Timestamp = Timestamp(Long.MinValue)
  val Max: Timestamp = Timestamp(Long.MaxValue)
  def max(a: Timestamp, b: Timestamp): Timestamp = if (a >= b) a else b
  def min(a: Timestamp, b: Timestamp): Timestamp = if (a <= b) a else b
}

/** Totally-ordered batch identifier (reference: summingbird-batch/.../
  * BatchID.scala:50-162). Batch IDs are load-bearing: store snapshots are
  * versioned per BatchID and the client-side lambda merge ranges over them.
  */
final case class BatchID(id: Long) extends AnyVal with Ordered[BatchID] {
  def compare(that: BatchID): Int = java.lang.Long.compare(id, that.id)
  def next: BatchID = BatchID(id + 1)
  def prev: BatchID = BatchID(id - 1)
  def +(n: Long): BatchID = BatchID(id + n)
  def -(n: Long): BatchID = BatchID(id - n)
}
object BatchID {
  /** All batches in [start, end] inclusive. */
  def range(start: BatchID, end: BatchID): Iterator[BatchID] =
    (start.id to end.id).iterator.map(BatchID(_))
}

/** Half-open time interval [start, end) in millis. Mirrors the reference's
  * `Interval[Timestamp]` usage in the batch planner (ScaldingPlatform.scala's
  * state-monad over intervals); the rebuild only needs the half-open form.
  */
final case class Interval(startMs: Long, endMs: Long) {
  require(startMs <= endMs, s"bad interval [$startMs, $endMs)")
  def isEmpty: Boolean = startMs == endMs
  def contains(t: Long): Boolean = t >= startMs && t < endMs
  def intersect(o: Interval): Interval = {
    val s = math.max(startMs, o.startMs); val e = math.min(endMs, o.endMs)
    if (s >= e) Interval(s, s) else Interval(s, e)
  }
  def union(o: Interval): Option[Interval] =
    if (endMs < o.startMs || o.endMs < startMs) None
    else Some(Interval(math.min(startMs, o.startMs), math.max(endMs, o.endMs)))
}

/** Buckets event time into contiguous batches (reference: summingbird-batch/
  * .../Batcher.scala:118-226). The engine's incremental-view unit: stores
  * snapshot per batch; streaming keys state by (K, batch).
  */
trait Batcher extends Serializable {
  def batchOf(t: Timestamp): BatchID
  def earliestTimeOf(b: BatchID): Timestamp
  /** Earliest time of the next batch = exclusive upper bound of b. */
  def latestTimeOf(b: BatchID): Timestamp = earliestTimeOf(b.next)
  def toInterval(b: BatchID): Interval =
    Interval(earliestTimeOf(b).millis, latestTimeOf(b).millis)
  /** Smallest batch range [lo, hi] covering the interval (any overlap). */
  def cover(i: Interval): (BatchID, BatchID) =
    (batchOf(Timestamp(i.startMs)), batchOf(Timestamp(math.max(i.startMs, i.endMs - 1))))
  /** Batches entirely contained in the interval, or None if none fit. */
  def batchesCoveredBy(i: Interval): Option[(BatchID, BatchID)] = {
    val lo0 = batchOf(Timestamp(i.startMs))
    val lo = if (earliestTimeOf(lo0).millis >= i.startMs) lo0 else lo0.next
    val hi0 = batchOf(Timestamp(i.endMs - 1))
    val hi = if (latestTimeOf(hi0).millis <= i.endMs) hi0 else hi0.prev
    if (lo > hi) None else Some((lo, hi))
  }
  /** SQL expression computing the batch id from a millis-epoch column; must
    * agree exactly with `batchOf`. Overridden per implementation so the same
    * batching runs inside Catalyst (codegen'd) rather than in a UDF.
    */
  def batchIdColumn(tsMillis: org.apache.spark.sql.Column): org.apache.spark.sql.Column
}

object Batcher {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Civil wall clock of an epoch-millis instant in `zoneId`, as
    * millis-since-epoch OF THE LOCAL DATETIME (i.e. instant + zone offset) —
    * `java.time.LocalDateTime.ofInstant` in integer arithmetic, INDEPENDENT
    * of spark.sql.session.timeZone. `from_utc_timestamp` shifts the internal
    * micros by `zoneId`'s offset at that instant (a pure function of the
    * instant — no wall-clock ambiguity), and `unix_millis` reads the
    * internal value back without any session-tz rendering. A TIMESTAMP_NTZ
    * round-trip (convert_timezone) would instead pass through the session
    * zone's wall clock, which mis-resolves instants inside the session
    * zone's own DST fall-back overlap hour (asserted in
    * CalendarBatcherSpec's non-UTC-session case).
    */
  private[time] def civilMillis(tsMillis: Column, zoneId: String): Column =
    unix_millis(from_utc_timestamp(timestamp_millis(tsMillis), zoneId))

  /** Fixed-duration batches (reference MillisecondBatcher, Batcher.scala:51-70).
    * Uses floorDiv so pre-epoch times bucket correctly.
    */
  final case class Millis(durationMs: Long) extends Batcher {
    require(durationMs > 0)
    def batchOf(t: Timestamp): BatchID = BatchID(Math.floorDiv(t.millis, durationMs))
    def earliestTimeOf(b: BatchID): Timestamp = Timestamp(b.id * durationMs)
    def batchIdColumn(tsMillis: Column): Column =
      floor(tsMillis / lit(durationMs)).cast("long")
  }

  def ofMillis(ms: Long): Batcher = Millis(ms)
  def ofMinutes(n: Long): Batcher = Millis(n * 60L * 1000L)
  def ofHours(n: Long): Batcher = Millis(n * 3600L * 1000L)
  def ofDays(n: Long): Batcher = Millis(n * 24L * 3600L * 1000L)

  /** Single all-time batch for pure-streaming jobs (reference Batcher.unit,
    * Batcher.scala:76-115): everything is batch 0.
    */
  case object Unit extends Batcher {
    def batchOf(t: Timestamp): BatchID = BatchID(0L)
    def earliestTimeOf(b: BatchID): Timestamp =
      if (b.id <= 0) Timestamp.Min else Timestamp.Max
    override def latestTimeOf(b: BatchID): Timestamp =
      if (b.id < 0) Timestamp.Min else Timestamp.Max
    def batchIdColumn(tsMillis: Column): Column = lit(0L)
  }
  def unit: Batcher = Unit

  /** Calendar-aligned batches in a civil timezone (reference
    * CalendarBatcher, summingbird-batch/.../CalendarBatcher.scala:120-132):
    * batch = days (or hours) since epoch IN THE ZONE, so batch boundaries
    * track local midnight across DST transitions — a 23- or 25-hour civil
    * day is one batch, which fixed-duration Millis cannot express.
    * `batchIdColumn` runs the same calendar arithmetic inside Catalyst
    * (session-tz-independent: see [[Batcher.civilMillis]]),
    * property-checked against `batchOf` across DST boundaries and under
    * non-UTC session timezones.
    */
  sealed abstract class Calendar(zoneId: String) extends Batcher {
    protected val zone: java.time.ZoneId = java.time.ZoneId.of(zoneId)
  }

  final case class CalendarDays(zoneId: String) extends Calendar(zoneId) {
    def batchOf(t: Timestamp): BatchID = BatchID(
      java.time.LocalDate.ofInstant(java.time.Instant.ofEpochMilli(t.millis), zone).toEpochDay)
    def earliestTimeOf(b: BatchID): Timestamp = Timestamp(
      java.time.LocalDate.ofEpochDay(b.id).atStartOfDay(zone).toInstant.toEpochMilli)
    def batchIdColumn(tsMillis: Column): Column =
      floor(Batcher.civilMillis(tsMillis, zoneId) / lit(86400000L)).cast("long")
  }

  final case class CalendarHours(zoneId: String) extends Calendar(zoneId) {
    // civil hours since epoch: epochDay*24 + local hour-of-day. During a
    // DST fall-back both UTC occurrences of the repeated civil hour share
    // one batch (a 25-hour civil day spans 24 batch ids, one of them
    // two-UTC-hours long); a spring-forward skips the id of the nonexistent
    // hour — calendar semantics, exactly like the reference's day/hour
    // CalendarBatcher.
    def batchOf(t: Timestamp): BatchID = {
      val ldt = java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(t.millis), zone)
      BatchID(ldt.toLocalDate.toEpochDay * 24L + ldt.getHour)
    }
    def earliestTimeOf(b: BatchID): Timestamp = {
      val day = Math.floorDiv(b.id, 24L); val hour = Math.floorMod(b.id, 24L).toInt
      Timestamp(java.time.LocalDate.ofEpochDay(day).atTime(hour, 0)
        .atZone(zone).toInstant.toEpochMilli) // overlap -> earlier offset
    }
    // epochDay*24 + hourOfDay == floorDiv(civil local millis, 1 hour)
    def batchIdColumn(tsMillis: Column): Column =
      floor(Batcher.civilMillis(tsMillis, zoneId) / lit(3600000L)).cast("long")
  }

  def calendarDays(zone: String): Batcher = CalendarDays(zone)
  def calendarHours(zone: String): Batcher = CalendarHours(zone)

  /** Switch batchers at a boundary (reference CombinedBatcher): `before` for
    * t < at, `after` for t >= at. The `after` ids are offset so ids stay
    * monotone across the switch.
    */
  final case class Combined(before: Batcher, after: Batcher, at: Timestamp) extends Batcher {
    // at = Timestamp.Min would be the degenerate everything-after config and
    // at.prev below would wrap to Timestamp.Max; use the `after` batcher
    // directly for that case instead.
    require(at > Timestamp.Min,
      "Combined(at = Timestamp.Min) is degenerate: use `after` directly")
    // Last batch holding any time strictly before the cut (reference
    // CombinedBatcher.scala:33 uses batchOf(upper.prev)+1 for the first
    // post-cut batch). Using batchOf(at) directly skips an id whenever the
    // cut lands exactly on a `before`-batch boundary.
    private val boundaryBatch = before.batchOf(at.prev)
    private val afterBase = after.batchOf(at)
    def batchOf(t: Timestamp): BatchID =
      if (t < at) before.batchOf(t)
      else BatchID(boundaryBatch.id + 1 + (after.batchOf(t).id - afterBase.id))
    def earliestTimeOf(b: BatchID): Timestamp =
      if (b <= boundaryBatch) before.earliestTimeOf(b)
      else Timestamp.max(at, after.earliestTimeOf(BatchID(afterBase.id + (b.id - boundaryBatch.id - 1))))
    def batchIdColumn(tsMillis: Column): Column =
      when(tsMillis < lit(at.millis), before.batchIdColumn(tsMillis))
        .otherwise(lit(boundaryBatch.id + 1 - afterBase.id) + after.batchIdColumn(tsMillis))
  }
}
