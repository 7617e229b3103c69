package graft.batch

/** Best-effort single-writer lease over a store directory — the
  * enforcement of the one-writer-at-a-time contract both store layouts
  * share ([[SegmentedStore]] mutations, [[BatchStore]] snapshot commits;
  * reference semantics: one batch job owns a VersionedBatchStore's
  * version lifecycle, summingbird-batch-hadoop HDFSState).
  *
  * A second concurrent mutator fails LOUDLY instead of racing the commit
  * log. The lease self-expires: a lock older than `leaseTimeoutMs` (a
  * writer that died without releasing) is broken and re-acquired.
  * Atomicity is the filesystem's create-if-absent — exact on HDFS/local,
  * best-effort on object stores without conditional writes (two
  * simultaneous acquirers in the same millisecond could both proceed
  * there; the lease is a guard rail for operational mistakes — two
  * maintenance jobs, a re-deployed streaming query next to its zombie —
  * not a distributed lock service).
  */
object WriterLease {

  val LockName = "_graft_writer.lock"

  def withLock[A](path: String, leaseTimeoutMs: Long = 600000L)(body: => A): A = {
    require(leaseTimeoutMs > 0, s"leaseTimeoutMs must be > 0, got $leaseTimeoutMs")
    val lock = s"$path/$LockName"
    val now = System.currentTimeMillis()
    val held = StoreFs.modificationTime(lock)
    if (held > 0L && now - held <= leaseTimeoutMs)
      throw new IllegalStateException(
        s"WriterLease($path): another writer holds $lock " +
        s"(age ${now - held} ms, lease $leaseTimeoutMs ms). Mutations require a " +
        "single writer; if the owner is dead the lease expires on its own")
    if (held > 0L) StoreFs.deleteRecursive(lock) // stale: break the dead lease
    StoreFs.createExclusive(lock,
      s"""{"pid":"${java.lang.ProcessHandle.current().pid()}","acquiredMs":$now}"""
        .getBytes("UTF-8"))
    try body finally StoreFs.deleteRecursive(lock)
  }
}
