package graft.batch

/** Single-writer lease over a store directory — the enforcement of the
  * one-writer-at-a-time contract both store layouts share
  * ([[SegmentedStore]] mutations, [[BatchStore]] snapshot commits;
  * reference semantics: one batch job owns a VersionedBatchStore's
  * version lifecycle, summingbird-batch-hadoop HDFSState).
  *
  * A second concurrent mutator fails LOUDLY instead of racing the commit
  * log. The lease self-expires: a lock older than `leaseTimeoutMs` (a
  * writer that died without releasing) is broken and re-acquired — the
  * break is an atomic RENAME ([[breakStale]]), so on atomic-rename
  * filesystems exactly one of N same-instant breakers wins and the rest
  * fail loudly (delete+create would reopen the very race the lease
  * closes).
  *
  * Exactness is layered, because filesystems differ in what their
  * create-if-absent actually guarantees:
  *
  *  1. '''create-if-absent''' ([[StoreFs.createExclusive]]): atomic and
  *     exact on HDFS and the local FS; on S3A it maps to a conditional
  *     PUT (`If-None-Match: *`) on Hadoop ≥ 3.4.1 with
  *     `fs.s3a.create.conditional.enabled` (the default there), making
  *     it exact too; on older S3A / GCS connectors it is best-effort
  *     (two same-instant creators can both "succeed").
  *  2. '''acquisition read-back''': after the create, the lock is read
  *     back and must carry exactly this acquirer's unique token — on a
  *     non-exclusive-create FS, a same-instant second acquirer that
  *     silently overwrote the file turns into a loud loss for one side.
  *  3. '''commit-time re-verify''' ([[verifyHeldForCommit]], called by
  *     `BatchState.write` — the single choke point every commit-log
  *     flip goes through): immediately before the flip, the lease must
  *     still be this writer's. A zombie writer whose lease was broken
  *     (timeout) and re-acquired by a live one aborts at its flip
  *     instead of clobbering the log. Uncommitted data a zombie wrote
  *     stays invisible (segments/snapshots surface only via the log).
  *  4. '''owner-checked release''': the lock is deleted on exit only if
  *     it still carries this writer's token — releasing a lock that a
  *     racer now owns would silently hand out a third lease.
  *
  * Residual window on FSes WITHOUT exclusive create: both acquirers
  * read back their own write before the other's lands AND both reach
  * their commit flip inside the same verify-to-rename instant. True
  * closure there needs the FS's own conditional write — for the lease
  * that is layer 1 (S3A's conditional create), and for the FLIP itself
  * it is [[StoreFs.CasBackend]] (round 15): with a conditional-PUT
  * backend installed, `BatchState.write` compare-and-swaps against the
  * log content this writer read, so two same-instant flips resolve
  * exactly. The layers above shrink the window from "any overlap of two
  * mutations" to "same-instant interleaving twice in a row" even
  * without one.
  */
object WriterLease {

  val LockName = "_graft_writer.lock"

  // store-root -> this thread's lease token while a withLock body runs.
  // Driver-side mutations run (and commit) on the acquiring thread, so a
  // ThreadLocal map keys the re-verification without changing any
  // commit-helper signature.
  private val held = new ThreadLocal[Map[String, String]] {
    override def initialValue(): Map[String, String] = Map.empty
  }

  private val seq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Current content of a lock file, None when absent/unreadable — shared
    * with [[HadoopCasBackend]] so both lock protocols read locks the same
    * way (one hardening fix covers both).
    */
  private[batch] def readLock(lock: String): Option[String] =
    if (!StoreFs.exists(lock)) None
    else scala.util.Try(new String(StoreFs.readBytes(lock), "UTF-8")).toOption

  /** Break a lease observed stale at mtime `observedMs` by ATOMIC RENAME
    * to a unique grave name — never delete+create, whose TOCTOU lets two
    * breakers interleave (A deletes+creates; B deletes A's FRESH lock and
    * creates its own) so both pass the acquisition read-back even on an
    * exact-create filesystem. A rename moves the whole file or fails:
    *
    *  - rename fails (source gone): another breaker won — fail loudly.
    *  - rename wins but the grave's mtime differs from the staleness
    *    observation: the file moved was a racer's FRESH lease acquired
    *    between our staleness read and our rename (rename preserves
    *    mtime, so same-file ⇔ same mtime). Restore it and fail loudly;
    *    if the restore itself races, the racer aborts loudly at its
    *    commit-time re-verify — exact-or-loud, never silent.
    *
    * Object stores fake rename as copy+delete, so two same-instant
    * breakers can both "win" there — the non-exclusive-create residual
    * class, caught by the read-back + commit re-verify layers as before.
    */
  private[batch] def breakStale(path: String, lock: String, observedMs: Long): Unit = {
    // narrow the steal window BEFORE touching the file: a lock whose
    // mtime no longer matches the staleness observation is a racer's
    // FRESH lease (typically the break winner's own re-acquisition) —
    // fail loudly without renaming it. The rename path below still
    // handles the residual TOCTOU (steal-and-restore, exact-or-loud),
    // but going through it for a lease that is ALREADY visibly fresh
    // costs the racer its acquisition for nothing; on a fast local FS
    // that systematically starved every acquirer in the N-breaker race
    // law. An absent lock (mtime 0) falls through to the rename, whose
    // source-gone failure is the correct loud verdict for that case.
    val preMs = StoreFs.modificationTime(lock)
    if (preMs != 0L && preMs != observedMs)
      throw new IllegalStateException(
        s"WriterLease($path): the lease at $lock was re-acquired between this " +
        "writer's staleness observation and its break — another writer holds it now")
    val grave = s"$lock.broken.${System.nanoTime()}-${seq.incrementAndGet()}"
    if (!StoreFs.renameExclusive(lock, grave))
      throw new IllegalStateException(
        s"WriterLease($path): lost the stale-lease break race for $lock — " +
        "another writer broke and re-acquired it first")
    if (StoreFs.modificationTime(grave) != observedMs) {
      // best-effort restore of the racer's fresh lease; if a THIRD
      // acquirer already created a new lock (restore target exists) or
      // the restore races, delete the grave instead — the displaced
      // racer aborts loudly at its commit-time re-verify (exact-or-loud)
      // and no *.broken.* file is ever left behind
      if (scala.util.Try(StoreFs.renameExclusive(grave, lock)).getOrElse(false))
        ()
      else StoreFs.deleteRecursive(grave)
      throw new IllegalStateException(
        s"WriterLease($path): the lease at $lock was re-acquired between this " +
        "writer's staleness observation and its break — another writer holds it now")
    }
    StoreFs.deleteRecursive(grave)
  }

  def withLock[A](path: String, leaseTimeoutMs: Long = 600000L)(body: => A): A = {
    require(leaseTimeoutMs > 0, s"leaseTimeoutMs must be > 0, got $leaseTimeoutMs")
    val lock = s"$path/$LockName"
    val now = System.currentTimeMillis()
    val heldMs = StoreFs.modificationTime(lock)
    if (heldMs > 0L && now - heldMs <= leaseTimeoutMs)
      throw new IllegalStateException(
        s"WriterLease($path): another writer holds $lock " +
        s"(age ${now - heldMs} ms, lease $leaseTimeoutMs ms). Mutations require a " +
        "single writer; if the owner is dead the lease expires on its own")
    if (heldMs > 0L) breakStale(path, lock, heldMs) // stale: break the dead lease
    val token =
      s"""{"pid":"${java.lang.ProcessHandle.current().pid()}","acquiredMs":$now,""" +
        s""""token":"${System.nanoTime()}-${seq.incrementAndGet()}"}"""
    StoreFs.createExclusive(lock, token.getBytes("UTF-8"))
    // acquisition read-back (layer 2): on an FS whose create-if-absent is
    // not exclusive, a same-instant acquirer may have overwritten us.
    // A LATE stale-breaker can also transiently steal-and-restore this
    // fresh lease (rename to its grave, see the mtime mismatch, rename
    // back — breakStale's residual TOCTOU, exact-or-loud but not
    // instantaneous), so a missing/foreign read gets a brief re-read
    // window before the acquisition is declared lost: a steal restores
    // OUR token (the rename moved our file), a genuine overwrite never
    // does.
    if (!readLock(lock).contains(token)) {
      var tries = 0
      while (!readLock(lock).contains(token) && tries < 50) {
        Thread.sleep(2); tries += 1
      }
      if (!readLock(lock).contains(token)) {
        // final owner-checked cleanup before declaring the acquisition
        // lost: a late stale-breaker's restore can land our token back
        // AFTER the retry window, which would orphan a fresh-looking
        // lease that blocks every writer until leaseTimeoutMs. One more
        // read-then-delete-iff-ours shrinks that window to the instant
        // between this check and the breaker's restore (the residual is
        // bounded by the lease timeout, as before).
        if (readLock(lock).contains(token)) StoreFs.deleteRecursive(lock)
        throw new IllegalStateException(
          s"WriterLease($path): lost the acquisition race for $lock — another " +
          "writer's lease landed over this one (non-exclusive-create filesystem)")
      }
    }
    held.set(held.get + (path -> token))
    try body
    finally {
      held.set(held.get - path)
      // the conditional-flip tag for this store dies with the lease: a
      // pooled driver thread must not retain every log it read forever
      BatchState.forgetRead(path)
      // owner-checked release (layer 4): never delete a racer's lease
      if (readLock(lock).contains(token)) StoreFs.deleteRecursive(lock)
    }
  }

  /** Re-verify, immediately before a commit-log flip for `path`, that the
    * lease this thread acquired is still the one on disk — a zombie whose
    * lease timed out and was re-acquired aborts its commit loudly here
    * instead of racing the live writer's log. No-op when the flip runs
    * outside any [[withLock]] (read-only helpers, replay-guard resets in
    * tests): the lease is an enforcement layer, not a required calling
    * convention for every state write.
    */
  def verifyHeldForCommit(path: String): Unit =
    held.get.get(path).foreach { token =>
      val lock = s"$path/$LockName"
      if (!readLock(lock).contains(token))
        throw new IllegalStateException(
          s"WriterLease($path): lease lost before commit — $lock no longer " +
          "carries this writer's token (lease expired and was re-acquired, " +
          "or a racer on a non-exclusive-create filesystem overwrote it). " +
          "Aborting the commit-log flip; uncommitted data stays invisible")
    }
}
