package graft.batch

/** Shared log-structured-segment layout under a [[BatchState]] commit log
  * — the one crash-consistency pattern every stored, incrementally
  * maintained artifact in the engine uses (BM25 postings, int8 ANN codes):
  *
  *   path/_graft_state.json   commit log: committed segment ids
  *   path/seg=N/<payload>     one directory per committed mutation
  *
  * Every mutation (bootstrap, append, compaction) writes a fresh `seg=N`
  * dir and becomes visible only via an atomic commit-log rename — no
  * data-directory renames (object stores fake those as copy+delete), no
  * torn multi-file mutations (everything in a segment commits together).
  * A writer dying mid-segment leaves an uncommitted dir readers never
  * resolve; the next writer of that id overwrites it. Reference
  * semantics: summingbird-batch VersionedBatchStore.scala:62-143 (write
  * everything into a NEW version, flip a tiny marker last).
  *
  * Writer exclusivity: mutations assume ONE writer at a time (streaming
  * paths serialize through foreachBatch; compaction runs on the same
  * owner's maintenance cadence). The contract is ENFORCED best-effort by
  * [[withWriterLock]] — a lease file under the store root that turns a
  * second concurrent mutator into a loud error instead of a silent
  * commit-log race (create-if-absent is atomic on HDFS; object stores
  * get best-effort semantics, documented there).
  *
  * Readers are safe against appends. Against compaction, the sweep is
  * age-gatable: `sweepGraceMs = 0` (the default) deletes superseded
  * segments immediately after the commit-log flip — correct when no
  * reader scans across a maintenance window; a positive grace TOMBSTONES
  * superseded segments instead and only deletes them once the tombstone
  * is older than the grace, so a reader that resolved the pre-compaction
  * segment list finishes its scan (size the grace above the longest
  * reader's runtime — the standard object-store deletion grace).
  */
object SegmentedStore {

  def segDir(path: String, id: Long): String = s"$path/seg=$id"

  def committedSegs(path: String): List[Long] =
    BatchState.read(path).committed.sorted

  /* Segment-id namespace: ORDINAL mutations (bootstrap, non-replayed
   * append, compaction) take ODD ids; streaming micro-batch appends take
   * the EVEN id `2 * (batchId + 1)` — a pure function of the Structured
   * Streaming batch id, which is what makes replayed batches IDEMPOTENT:
   * an at-least-once re-delivery after a post-commit crash maps to an
   * already-committed id and is skipped instead of double-appended. The
   * two ranges can never collide. Re-pointing a NEW streaming checkpoint
   * (batch ids restart at 0) at an existing index requires a compaction
   * (folds every segment into one odd id, sweeping the evens for reuse)
   * AND an explicit [[resetStreamingReplayGuard]] — the applied-batch
   * high-water mark deliberately survives compaction, so without the
   * reset the fresh checkpoint's restarted batch ids would read as
   * already-applied replays and be skipped.
   */

  /** The id the next ORDINAL mutation should write into: the first odd id
    * past the newest committed segment (crashed writers' orphan dirs get
    * overwritten).
    */
  def nextId(path: String): Long = {
    val n = committedSegs(path).lastOption.getOrElse(0L) + 1
    if (n % 2 == 0) n + 1 else n
  }

  /** The deterministic segment id of streaming micro-batch `batchId`. */
  def batchSegId(batchId: Long): Long = {
    require(batchId >= 0, s"batchId must be >= 0, got $batchId")
    2L * (batchId + 1)
  }

  /** Whether streaming batch `batchId` is already applied — the replay
    * guard an at-least-once foreachBatch sink checks before appending.
    * TWO sources of truth, because compaction folds the even streaming
    * segment ids out of the commit log: segment-id membership catches a
    * replay before any compaction; the `maxAppliedBatch` high-water mark
    * (raised atomically with each streaming commit, carried forward by
    * [[commitReplaceAll]]) catches a replay whose segment has since been
    * compacted away — without it, a crash between the foreachBatch
    * return and the checkpoint offset commit, followed by a compaction,
    * would double-append the replayed batch.
    */
  def batchApplied(path: String, batchId: Long): Boolean = {
    val st = BatchState.read(path)
    st.committed.contains(batchSegId(batchId)) ||
      batchId <= st.maxAppliedStreamBatch
  }

  /** Commit `id` as an ADDITIONAL live segment (the append shape). */
  def commitAppend(path: String, id: Long): Unit = {
    StoreFs.clearTombstone(segDir(path, id))
    BatchState.commit(path, graft.time.BatchID(id))
  }

  /** Commit streaming micro-batch `batchId`'s segment AND raise the
    * applied-batch high-water mark in the SAME atomic commit-log flip —
    * the two must never tear apart, or a replay window reopens.
    */
  def commitStreamingAppend(path: String, batchId: Long): Unit = {
    StoreFs.clearTombstone(segDir(path, batchSegId(batchId)))
    val st = BatchState.read(path)
    BatchState.write(path, BatchState(
      (batchSegId(batchId) :: st.committed).distinct.sorted,
      math.max(st.maxAppliedStreamBatch, batchId)))
  }

  /** Forget the applied-batch high-water mark — ONLY for deliberately
    * re-pointing a NEW streaming checkpoint (batch ids restart at 0) at
    * this index, after a compaction, with the old stream stopped. Never
    * call it for the same checkpoint: it reopens the replay window the
    * mark exists to close.
    */
  def resetStreamingReplayGuard(path: String): Unit = {
    val st = BatchState.read(path)
    BatchState.write(path, st.copy(maxAppliedStreamBatch = -1L))
  }

  /** Commit `id` as the ONLY live segment (bootstrap / compaction), then
    * sweep every other `seg=` dir (age-gated when `sweepGraceMs > 0`).
    * The applied-batch high-water mark is carried forward — compaction
    * must not erase replay-guard evidence.
    */
  def commitReplaceAll(path: String, id: Long, sweepGraceMs: Long = 0L): Unit = {
    val st = BatchState.read(path)
    // a reused id (crashed writer's orphan, or a segment cycling back
    // through tombstoned-then-rewritten) must not inherit a stale
    // tombstone — it would cut the NEXT grace window short
    StoreFs.clearTombstone(segDir(path, id))
    BatchState.write(path, BatchState(List(id), st.maxAppliedStreamBatch))
    sweepUncommitted(path, sweepGraceMs)
  }

  /** Sweep every `seg=*` dir not in the commit log: uncommitted partials
    * from a crashed writer and segments superseded by a compaction.
    *
    * `sweepGraceMs = 0`: delete immediately (test/local default — no
    * concurrent readers). `sweepGraceMs > 0`: two-phase via
    * [[StoreFs.sweepDir]] — a dead segment is first TOMBSTONED (its data
    * stays readable for any in-flight scan that resolved the old segment
    * list), and deleted only by a later sweep that finds the tombstone
    * older than the grace. Sweeps run on every maintenance call, so
    * tombstones age out on the compaction cadence.
    */
  def sweepUncommitted(path: String, sweepGraceMs: Long = 0L): Unit = {
    val live = committedSegs(path).map(id => s"seg=$id").toSet
    StoreFs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg=") &&
        !live.contains(s.getPath.getName))
      .foreach(s => StoreFs.sweepDir(s.getPath.toString, sweepGraceMs))
  }

  /* Delete-segment coverage: segment IDS alone cannot order a delete
   * against streaming appends — even ids are pinned by batch id while
   * odd ids follow the commit log, so two takedowns landing between
   * micro-batches take ids that LEAPFROG the next even id (bootstrap 1,
   * batches 0,1 → 2,4; delete → 5; delete → 7; batch 2 → 6 < 7). A
   * delete must therefore record WHICH segments it applies to: exactly
   * the segments committed when its victim set was computed. Readers
   * apply each delete set only to rows from its covered segments, which
   * is also what makes append-after-delete correct with no compaction —
   * a re-appended id lands in a segment no earlier delete covers.
   */

  /** Coverage-marker file name inside a delete segment's `deletes/` dir
    * (underscore-prefixed: parquet readers ignore it, and it commits
    * atomically with the segment on the log flip).
    */
  val DeleteCoversName = "_graft_covers.json"

  /** Record the committed-segment set delete segment `id` applies to.
    * Call AFTER the delete-set parquet write (an `overwrite` parquet
    * write clears the directory first) and before the commit.
    */
  def writeDeleteCovers(path: String, id: Long, covers: Seq[Long]): Unit =
    StoreFs.writeAtomic(s"${segDir(path, id)}/deletes/$DeleteCoversName",
      covers.mkString("{\"covers\":[", ",", "]}").getBytes("UTF-8"))

  /** The covered-segment set of delete segment `id`; None for a delete
    * written before coverage markers existed — readers fall back to
    * covering every other committed segment (the pre-marker semantics,
    * under which re-adding a deleted id needs a compaction first).
    */
  def readDeleteCovers(path: String, id: Long): Option[List[Long]] = {
    val f = s"${segDir(path, id)}/deletes/$DeleteCoversName"
    if (!StoreFs.exists(f)) None
    else Some("-?\\d+".r
      .findAllIn(new String(StoreFs.readBytes(f), "UTF-8"))
      .map(_.toLong).toList)
  }

  /** Run `body` (a mutation — payload write + commit) holding the store's
    * single-writer lease; see [[WriterLease.withLock]] for semantics.
    */
  def withWriterLock[A](path: String, leaseTimeoutMs: Long = 600000L)(body: => A): A =
    WriterLease.withLock(path, leaseTimeoutMs)(body)

  /** Shared self-scheduling compaction guard (round 17): the one body
    * behind every tier's `*CompactIfFragmented`. Cheap unlocked pre-check
    * first — below the threshold the cadence call costs one commit-log
    * read and takes no lock — then the threshold is RE-CHECKED inside the
    * writer lock before `compactLocked` runs, so a second maintenance
    * driver arriving AFTER the first's fold committed (the sequential
    * overlapping-cadence case) reads the folded segment count and skips
    * the redundant O(index) rebuild. A driver arriving while the first
    * still HOLDS the lease fails loudly there ([[WriterLease.withLock]]
    * throws on a live lock — the single-writer contract; same-instant
    * maintenance is a scheduling bug, not a benign serialization).
    * `compactLocked` must NOT take the lock itself ([[WriterLease]] is
    * non-reentrant by design). Returns whether a compaction ran.
    */
  def compactIfFragmentedLocked(path: String, maxSegments: Int)(
      compactLocked: => Unit): Boolean = {
    require(maxSegments >= 1, s"maxSegments must be >= 1, got $maxSegments")
    if (committedSegs(path).length <= maxSegments) false
    else withWriterLock(path) {
      val stillFragmented = committedSegs(path).length > maxSegments
      if (stillFragmented) compactLocked
      stillFragmented
    }
  }

  /** Whether `dir` holds at least one parquet file — a segment written
    * from an empty batch has none (only a write marker) and readers must
    * skip it or schema inference fails.
    */
  def hasParquetFiles(dir: String): Boolean = StoreFs.hasParquetFiles(dir)
}
