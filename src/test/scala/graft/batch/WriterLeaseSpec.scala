package graft.batch

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.time.BatchID

/** Object-store-semantics mock: a local filesystem whose
  * `create(overwrite = false)` silently overwrites — the non-exclusive
  * create older S3A/GCS connectors give — registered under the
  * `graftmock:` scheme. Everything else behaves like the local FS, so
  * the lease laws exercise exactly the one guarantee that differs.
  */
class NonExclusiveCreateFs extends RawLocalFileSystem {
  override def getScheme: String = "graftmock"
  override def getUri: URI = URI.create("graftmock:///")
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
}

/** FileContext binding for the mock scheme (the commit-log flip renames
  * through FileContext).
  */
class GraftMockAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new NonExclusiveCreateFs, conf,
    "graftmock", false)

/** WriterLease exactness layers per [[WriterLease]]'s scaladoc:
  * create-if-absent (exact on the local FS), acquisition read-back and
  * commit-time re-verify (the backstops on non-exclusive-create object
  * stores, pinned here against the graftmock FS), owner-checked release.
  */
class WriterLeaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mockPath(prefix: String): String = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftmock.impl", classOf[NonExclusiveCreateFs].getName)
    hc.set("fs.AbstractFileSystem.graftmock.impl",
      classOf[GraftMockAbstractFs].getName)
    "graftmock://" + java.nio.file.Files.createTempDirectory(prefix).toString
  }

  test("exact-create FS: a second createExclusive throws at the filesystem") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lease_exact").toString
    StoreFs.createExclusive(s"$dir/x", "a".getBytes("UTF-8"))
    intercept[java.io.IOException](
      StoreFs.createExclusive(s"$dir/x", "b".getBytes("UTF-8")))
    StoreFs.deleteRecursive(dir)
  }

  test("graftmock FS really is non-exclusive (the premise of the laws below)") {
    val dir = mockPath("graft_lease_mock0")
    StoreFs.createExclusive(s"$dir/x", "a".getBytes("UTF-8"))
    // no throw — and last-writer-wins, exactly the object-store behavior
    StoreFs.createExclusive(s"$dir/x", "b".getBytes("UTF-8"))
    assert(new String(StoreFs.readBytes(s"$dir/x"), "UTF-8") == "b")
    StoreFs.deleteRecursive(dir)
  }

  test("commit-time re-verify: a racer overwriting the lease on a " +
      "non-exclusive-create FS aborts this writer's commit flip loudly, " +
      "and release never deletes the racer's lock") {
    val dir = mockPath("graft_lease_mock1")
    val lock = s"$dir/${WriterLease.LockName}"
    val ex = intercept[IllegalStateException] {
      WriterLease.withLock(dir) {
        // the racer's create(overwrite=false) silently lands over ours —
        // possible only because graftmock is non-exclusive
        StoreFs.createExclusive(lock, """{"pid":"racer"}""".getBytes("UTF-8"))
        // our commit flip must now abort instead of clobbering the log
        BatchState.commit(dir, BatchID(1))
      }
    }
    assert(ex.getMessage.contains("lease lost before commit"), ex.getMessage)
    // nothing committed...
    assert(BatchState.read(dir).committed.isEmpty, "aborted flip still committed")
    // ...and the owner-checked release left the RACER's lease in place
    assert(new String(StoreFs.readBytes(lock), "UTF-8").contains("racer"),
      "release deleted a lock this writer no longer owned")
    StoreFs.deleteRecursive(dir)
  }

  test("uncontended lease on the mock FS: acquire, commit, release") {
    val dir = mockPath("graft_lease_mock2")
    WriterLease.withLock(dir)(BatchState.commit(dir, BatchID(7)))
    assert(BatchState.read(dir).committed == List(7L))
    assert(!StoreFs.exists(s"$dir/${WriterLease.LockName}"), "lease not released")
    StoreFs.deleteRecursive(dir)
  }

  test("commit-time verify is a no-op outside any lease (read-side helpers " +
      "and replay-guard resets keep working)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lease_nolock").toString
    BatchState.commit(dir, BatchID(3))
    assert(BatchState.read(dir).committed == List(3L))
    StoreFs.deleteRecursive(dir)
  }

  // ---- stale-lease break exactness (round 15: the break is an atomic
  // rename, closing the delete+create TOCTOU where two breakers could
  // interleave so both passed the acquisition read-back) ----

  private def agedLock(dir: String, ageMs: Long): (String, Long) = {
    val lock = s"$dir/${WriterLease.LockName}"
    StoreFs.createExclusive(lock, """{"pid":"dead"}""".getBytes("UTF-8"))
    val mtime = System.currentTimeMillis() - ageMs
    java.nio.file.Files.setLastModifiedTime(
      java.nio.file.Paths.get(lock.stripPrefix("file:")),
      java.nio.file.attribute.FileTime.fromMillis(mtime))
    (lock, StoreFs.modificationTime(lock))
  }

  test("breakStale: breaking the lock actually observed succeeds and removes it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_break_ok").toString
    val (lock, observed) = agedLock(dir, 10_000_000L)
    WriterLease.breakStale(dir, lock, observed)
    assert(!StoreFs.exists(lock), "stale lock not removed")
    StoreFs.deleteRecursive(dir)
  }

  test("breakStale: a racer's FRESH lease acquired between observation and " +
      "break is restored, and this breaker fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_break_fresh").toString
    val (lock, observed) = agedLock(dir, 10_000_000L)
    // the racer breaks + re-acquires first: the lock at the path is now a
    // FRESH lease with a different mtime
    StoreFs.deleteRecursive(lock)
    StoreFs.createExclusive(lock, """{"pid":"racer"}""".getBytes("UTF-8"))
    val ex = intercept[IllegalStateException](
      WriterLease.breakStale(dir, lock, observed))
    assert(ex.getMessage.contains("re-acquired between"), ex.getMessage)
    assert(new String(StoreFs.readBytes(lock), "UTF-8").contains("racer"),
      "the racer's fresh lease was not restored")
    StoreFs.deleteRecursive(dir)
  }

  test("breakStale: a lock already renamed away (another breaker won) fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_break_gone").toString
    val lock = s"$dir/${WriterLease.LockName}"
    StoreFs.mkdirs(dir)
    val ex = intercept[IllegalStateException](
      WriterLease.breakStale(dir, lock, 12345L))
    assert(ex.getMessage.contains("lost the stale-lease break race"), ex.getMessage)
    StoreFs.deleteRecursive(dir)
  }

  test("concurrent acquirers over a stale lease: bodies never overlap " +
      "(exact-create FS; losers fail loudly)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_break_race").toString
    agedLock(dir, 10_000_000L)
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlapped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        try WriterLease.withLock(dir, leaseTimeoutMs = 1000L) {
          if (active.incrementAndGet() != 1) overlapped.set(true)
          ran.incrementAndGet()
          Thread.sleep(30)
          active.decrementAndGet()
          ()
        } catch { case _: IllegalStateException | _: java.io.IOException => () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(ran.get() >= 1, "no acquirer ever won the stale break")
    assert(!overlapped.get(), "two lease bodies ran concurrently")
    StoreFs.deleteRecursive(dir)
  }

  test("lease x CAS composition: on a non-exclusive-create FS where BOTH " +
      "acquirers pass the read-back, the conditional flip still saves the " +
      "log — the racer loses loudly at CAS even past every lease layer") {
    val dir = mockPath("graft_lease_cas")
    val lock = s"$dir/${WriterLease.LockName}"
    // a CAS backend with S3-conditional-PUT semantics (write-through)
    StoreFs.installCasBackend(new StoreFs.CasBackend {
      override def compareAndSwap(path: String, expected: Option[Array[Byte]],
          bytes: Array[Byte]): Boolean = synchronized {
        val cur = if (StoreFs.exists(path)) Some(StoreFs.readBytes(path)) else None
        val ok = (cur, expected) match {
          case (None, None)       => true
          case (Some(a), Some(b)) => java.util.Arrays.equals(a, b)
          case _                  => false
        }
        if (ok) StoreFs.writeAtomic(path, bytes)
        ok
      }
    })
    try {
      // the racer simulates the documented residual window: it lands its
      // lease over ours (possible only on graftmock), flips, then its own
      // overwrite is replaced by OUR original lock content again — so
      // when we reach our flip, every lease layer reads clean (the lock
      // carries our token) and ONLY the conditional flip can catch that
      // the log moved under us
      val racer = new Thread(() => {
        BatchState.read(dir)
        val ours = StoreFs.readBytes(lock)
        StoreFs.createExclusive(lock, """{"pid":"racer"}""".getBytes("UTF-8"))
        BatchState.commit(dir, graft.time.BatchID(7))
        StoreFs.createExclusive(lock, ours) // graftmock: silent overwrite
      })
      val ex = intercept[IllegalStateException] {
        WriterLease.withLock(dir) {
          val st = BatchState.read(dir)
          racer.start(); racer.join()
          BatchState.write(dir, st.copy(committed = List(1L)))
        }
      }
      assert(ex.getMessage.contains("conditional commit-log flip lost"),
        ex.getMessage)
      // the racer's commit survives whole; ours never landed
      assert(BatchState.read(dir).committed == List(7L))
    } finally {
      StoreFs.clearCasBackend()
      StoreFs.deleteRecursive(dir)
    }
  }

  test("a zombie whose lease expired and was re-acquired aborts at its flip " +
      "on ANY filesystem (commit-time re-verify, local FS here)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lease_zombie").toString
    val lock = s"$dir/${WriterLease.LockName}"
    val ex = intercept[IllegalStateException] {
      WriterLease.withLock(dir) {
        // the zombie's lease times out; a live writer breaks + re-acquires
        // (simulated: replace the lock as WriterLease's stale-break does)
        StoreFs.deleteRecursive(lock)
        StoreFs.createExclusive(lock, """{"pid":"live"}""".getBytes("UTF-8"))
        BatchState.commit(dir, BatchID(1))
      }
    }
    assert(ex.getMessage.contains("lease lost before commit"), ex.getMessage)
    assert(BatchState.read(dir).committed.isEmpty)
    assert(new String(StoreFs.readBytes(lock), "UTF-8").contains("live"))
    StoreFs.deleteRecursive(dir)
  }
}
