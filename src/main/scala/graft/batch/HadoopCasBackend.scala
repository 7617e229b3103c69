package graft.batch

/** Real filesystem-backed [[StoreFs.CasBackend]] — conditional single-object
  * overwrite built from the two Hadoop-FS primitives whose exactness the
  * store already rests on ([[StoreFs.createExclusive]] and
  * [[StoreFs.renameExclusive]]), so the SAME construction is exact wherever
  * the lease is exact:
  *
  *  - '''HDFS / local FS''': `create(overwrite=false)` is atomic → the
  *    per-path CAS mutex is exact → compare-and-swap is exact.
  *  - '''S3A on Hadoop ≥ 3.4.1''': exclusive create maps to a conditional
  *    PUT (`If-None-Match: *`, `fs.s3a.create.conditional.enabled`, default
  *    on) → exact there too.
  *  - '''older S3A / GCS''': best-effort, same residual class as the lease
  *    (documented in [[WriterLease]]); the acquisition read-back below
  *    turns a same-instant double-create into a loud loss for one side.
  *
  * Construction: `compareAndSwap(path, expected, bytes)` takes a short
  * per-path mutex at `path.__cas_lock` (exclusive create of a unique
  * token + read-back verify), then read-compare-write: the current object
  * must byte-equal `expected` (`None` = must not exist) or the call
  * returns false and writes nothing. A lock whose holder died is broken
  * after `lockTimeoutMs` by [[WriterLease.breakStale]]'s atomic-rename
  * discipline (one of N same-instant breakers wins; never delete+create).
  * A lock merely HELD by a live racer is waited out with backoff up to
  * `acquireWaitMs` — contention on the mutex is not a CAS loss (the loss
  * verdict comes only from the content comparison), so two back-to-back
  * flips serialize instead of spuriously aborting; only a lock that can
  * be neither acquired nor broken within the wait throws.
  *
  * Wiring (round 17): DEFAULT-ON. [[StoreFs.ensureDefaultCasBackend]]
  * installs this backend automatically at every driver entry point
  * ([[BatchDriver.runIncremental]], `graft.Verify`, `graft.Bench`) unless
  * a backend is already installed or `-Dgraft.cas.default=off` /
  * `SPARK_GRAFT_CAS_DEFAULT=off` opts out. Custom backends (e.g. a pure
  * etag-conditional adapter) still install explicitly via
  * `StoreFs.installCasBackend(...)` and are never overridden.
  * With the backend installed every `BatchState.write` flip upgrades to
  * compare-and-swap against the log content the writer read (see
  * `BatchState.write`), closing the last same-instant-flip residual the
  * lease layers only shrink. The reference's equivalent discipline is
  * HDFSState's versioned-dir commit (summingbird-batch-hadoop/src/main/
  * scala/com/twitter/summingbird/batch/state/HDFSState.scala:80-150),
  * which rides HDFS's atomic rename; this backend generalizes it to any
  * Hadoop FS with exact create-if-absent.
  *
  * Lock files live NEXT TO the target object (`<path>.__cas_lock`), never
  * inside a store directory listing readers scan — the commit log is a
  * single `_graft_state.json`, so the lock is `_graft_state.json.__cas_lock`
  * and invisible to snapshot/segment resolution.
  */
class HadoopCasBackend(
    lockTimeoutMs: Long = 30000L,
    acquireWaitMs: Long = 10000L) extends StoreFs.CasBackend {
  require(lockTimeoutMs > 0, s"lockTimeoutMs must be > 0, got $lockTimeoutMs")
  require(acquireWaitMs > 0, s"acquireWaitMs must be > 0, got $acquireWaitMs")

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def lockFor(path: String) = s"$path.__cas_lock"

  // lock reads shared with WriterLease — one protocol, one read shape
  private def readLock(lock: String): Option[String] = WriterLease.readLock(lock)

  /** Test seam: runs after the mutex is acquired and the comparison made,
    * immediately before the ownership re-verify + write — the stall
    * window the zombie-writer law simulates. No-op in production.
    */
  protected def beforeWrite(): Unit = ()

  /** Acquire the per-path CAS mutex: spin on exclusive create with
    * backoff, breaking a stale (dead-holder) lock via the atomic-rename
    * break. Returns the unique token the lock carries for this owner.
    */
  private def acquire(lock: String): String = {
    val deadline = System.currentTimeMillis() + acquireWaitMs
    var backoffMs = 2L
    while (System.currentTimeMillis() < deadline) {
      val now = System.currentTimeMillis()
      val heldMs = StoreFs.modificationTime(lock)
      if (heldMs > 0L && now - heldMs > lockTimeoutMs) {
        // dead holder: break by atomic rename (exactly one breaker wins;
        // a loss here just means someone else cleared the way — loop)
        try WriterLease.breakStale(lock, lock, heldMs)
        catch { case _: IllegalStateException => () }
      } else if (heldMs == 0L) {
        val token = s"${java.lang.ProcessHandle.current().pid()}-" +
          s"${System.nanoTime()}-${seq.incrementAndGet()}"
        val created =
          try { StoreFs.createExclusive(lock, token.getBytes("UTF-8")); true }
          catch { case _: java.io.IOException => false } // lost the create race
        // read-back verify: on a non-exclusive-create FS a same-instant
        // second creator may have landed over us — loud loss for one side
        if (created && readLock(lock).contains(token)) return token
      }
      Thread.sleep(backoffMs)
      backoffMs = math.min(backoffMs * 2, 50L)
    }
    throw new IllegalStateException(
      s"HadoopCasBackend: could not acquire $lock within $acquireWaitMs ms " +
      s"(held and neither released nor stale past $lockTimeoutMs ms). " +
      "Another CAS holder is live or the filesystem is wedged; aborting " +
      "loudly rather than reporting a spurious compare failure")
  }

  override def compareAndSwap(path: String, expected: Option[Array[Byte]],
      bytes: Array[Byte]): Boolean = {
    val lock = lockFor(path)
    val token = acquire(lock)
    try {
      val cur = if (StoreFs.exists(path)) Some(StoreFs.readBytes(path)) else None
      val ok = (cur, expected) match {
        case (None, None)       => true
        case (Some(a), Some(b)) => java.util.Arrays.equals(a, b)
        case _                  => false
      }
      if (ok) {
        beforeWrite()
        // ownership re-verify immediately before the write (the
        // WriterLease.verifyHeldForCommit discipline): a holder stalled
        // past lockTimeoutMs whose lock a racer broke and re-acquired
        // must abort LOUDLY here, not silently clobber the racer's
        // committed object with a comparison made before the stall. The
        // residual shrinks to the verify-to-write instant, same as the
        // lease's verify-to-rename — exact-or-loud, never silent.
        if (!readLock(lock).contains(token))
          throw new IllegalStateException(
            s"HadoopCasBackend: lock $lock lost before the write — this " +
            "holder stalled past the lock timeout and a racer broke and " +
            "re-acquired it. Aborting; the racer's object stays intact")
        StoreFs.writeAtomic(path, bytes)
      }
      ok
    } finally {
      // owner-checked release: never delete a lock a breaker re-issued
      if (readLock(lock).contains(token)) StoreFs.deleteRecursive(lock)
    }
  }
}
