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
  * owner's maintenance cadence). Readers are safe against appends;
  * compaction sweeps superseded segments immediately after its commit,
  * so a reader mid-scan across a compaction can lose files on a local
  * FS — on an object store the standard mitigation is a deletion grace
  * period.
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
   * first — it folds every segment into one odd id and sweeps the evens
   * for reuse.
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

  /** Whether streaming batch `batchId` is already committed — the replay
    * guard an at-least-once foreachBatch sink checks before appending.
    */
  def batchApplied(path: String, batchId: Long): Boolean =
    committedSegs(path).contains(batchSegId(batchId))

  /** Commit `id` as an ADDITIONAL live segment (the append shape). */
  def commitAppend(path: String, id: Long): Unit =
    BatchState.commit(path, graft.time.BatchID(id))

  /** Commit `id` as the ONLY live segment (bootstrap / compaction), then
    * sweep every other `seg=` dir.
    */
  def commitReplaceAll(path: String, id: Long): Unit = {
    BatchState.write(path, BatchState(List(id)))
    sweepUncommitted(path)
  }

  /** Delete every `seg=*` dir not in the commit log: uncommitted partials
    * from a crashed writer and segments superseded by a compaction.
    */
  def sweepUncommitted(path: String): Unit = {
    val live = committedSegs(path).map(id => s"seg=$id").toSet
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("seg=") &&
        !live.contains(f.getName))
      .foreach(f => BatchState.deleteDir(f.toString))
  }

  /** Whether `dir` holds at least one parquet file — a segment written
    * from an empty batch has none (only a write marker) and readers must
    * skip it or schema inference fails. Local-FS listing;
    * `FileSystem.listStatus` on a cluster, same note as
    * [[BatchState.deleteDir]].
    */
  def hasParquetFiles(dir: java.io.File): Boolean = {
    val kids = Option(dir.listFiles()).getOrElse(Array.empty)
    kids.exists(f => f.isFile && f.getName.endsWith(".parquet")) ||
      kids.exists(f => f.isDirectory && hasParquetFiles(f))
  }
}
