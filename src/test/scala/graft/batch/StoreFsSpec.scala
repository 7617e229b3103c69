package graft.batch

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the Hadoop-FileSystem-backed store maintenance layer. These run
  * against the Hadoop LOCAL filesystem — the same `FileSystem` code path a
  * cluster deployment exercises on HDFS/S3A, just with `file://` resolution
  * (the point of the port: one implementation, no local/cluster fork).
  */
class StoreFsSpec extends AnyFunSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_storefs_").toString

  test("writeAtomic creates, overwrites, and leaves no temp files behind") {
    val dir = tmpDir()
    val f = s"$dir/sub/_state.json"
    StoreFs.writeAtomic(f, "v1".getBytes("UTF-8"))
    assert(new String(StoreFs.readBytes(f), "UTF-8") == "v1")
    StoreFs.writeAtomic(f, "v2-longer".getBytes("UTF-8"))
    assert(new String(StoreFs.readBytes(f), "UTF-8") == "v2-longer")
    val leftovers = StoreFs.listStatus(s"$dir/sub")
      .map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"temp files not cleaned: ${leftovers.mkString(",")}")
    StoreFs.deleteRecursive(dir)
  }

  test("writeAtomic under a racing reader: the file reads OLD or NEW, " +
      "never missing, never torn (the local-FS flip is rename(2), not " +
      "Hadoop's delete-then-rename overwrite)") {
    // regression hammer for the flip race law's catch: FileContext
    // .rename(OVERWRITE) on the local FS deletes the destination before
    // renaming, so a racing BatchState.read resolved an existing store
    // as EMPTY mid-flip. 400 flips with a full-speed reader reliably
    // hit a delete-then-rename window; the NIO ATOMIC_MOVE flip never
    // exposes one.
    val dir = tmpDir()
    val f = s"$dir/_state.json"
    val legal = (0 until 400).map(i => s"content-$i").toSet
    StoreFs.writeAtomic(f, "content-0".getBytes("UTF-8"))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reader = new Thread(() => {
      while (!stop.get() && bad.get() == null) {
        if (!StoreFs.exists(f)) bad.set("MISSING")
        else {
          val s = try new String(StoreFs.readBytes(f), "UTF-8")
                  catch { case e: Throwable => s"READ FAILED: $e" }
          if (!legal.contains(s)) bad.set(s)
        }
      }
    })
    reader.start()
    try (1 until 400).foreach(i =>
      StoreFs.writeAtomic(f, s"content-$i".getBytes("UTF-8")))
    finally { stop.set(true); reader.join() }
    assert(bad.get() == null,
      s"racing reader observed an illegal state: ${bad.get()}")
    StoreFs.deleteRecursive(dir)
  }

  test("listStatus on a missing path is empty, not an exception") {
    assert(StoreFs.listStatus(s"${tmpDir()}/never-created").isEmpty)
  }

  test("exists / mkdirs / deleteRecursive round-trip") {
    val dir = tmpDir()
    val nested = s"$dir/a/b/c"
    assert(!StoreFs.exists(nested))
    StoreFs.mkdirs(nested)
    assert(StoreFs.exists(nested))
    StoreFs.writeAtomic(s"$nested/x.bin", Array[Byte](1, 2, 3))
    StoreFs.deleteRecursive(s"$dir/a")
    assert(!StoreFs.exists(s"$dir/a"))
    assert(StoreFs.exists(dir))
    StoreFs.deleteRecursive(dir)
  }

  test("hasParquetFiles sees nested parquet and ignores markers") {
    val dir = tmpDir()
    StoreFs.mkdirs(s"$dir/seg=1/postings/tb=0")
    StoreFs.writeAtomic(s"$dir/seg=1/postings/_SUCCESS", Array.empty[Byte])
    assert(!StoreFs.hasParquetFiles(s"$dir/seg=1/postings"))
    StoreFs.writeAtomic(s"$dir/seg=1/postings/tb=0/part-0.parquet", Array[Byte](0))
    assert(StoreFs.hasParquetFiles(s"$dir/seg=1/postings"))
    assert(!StoreFs.hasParquetFiles(s"$dir/seg=2"))
    StoreFs.deleteRecursive(dir)
  }

  test("modificationTime is 0 for missing paths and sane for present ones") {
    val dir = tmpDir()
    assert(StoreFs.modificationTime(s"$dir/nope") == 0L)
    StoreFs.mkdirs(s"$dir/seg=1")
    val t = StoreFs.modificationTime(s"$dir/seg=1")
    assert(t > 0L && t <= System.currentTimeMillis() + 60000L)
    StoreFs.deleteRecursive(dir)
  }

  test("BatchState on StoreFs: commit/read/write/delete round-trip") {
    val dir = tmpDir()
    assert(BatchState.read(dir) == BatchState(Nil))
    BatchState.commit(dir, graft.time.BatchID(3))
    BatchState.commit(dir, graft.time.BatchID(1))
    assert(BatchState.read(dir).committed == List(1L, 3L))
    BatchState.write(dir, BatchState(List(7L)))
    assert(BatchState.read(dir).committed == List(7L))
    BatchState.deleteDir(dir)
    assert(!StoreFs.exists(dir))
  }

  // ---- conditional commit-log flip (round 15): where the store offers a
  // conditional PUT (S3A If-Match on Hadoop >= 3.4.1), the flip upgrades
  // to compare-and-swap against the content this writer read — the last
  // lease residual (two writers reaching their flips inside the same
  // verify-to-rename instant) closes exactly. Mocked here with an
  // in-memory CAS store that writes through to the local FS. ----

  /** S3-conditional-PUT semantics mock: one atomic compare-and-swap per
    * path, write-through to the real FS so readers keep working.
    */
  private class MockCas extends StoreFs.CasBackend {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    override def compareAndSwap(path: String, expected: Option[Array[Byte]],
        bytes: Array[Byte]): Boolean = synchronized {
      attempts.incrementAndGet()
      val cur = if (StoreFs.exists(path)) Some(StoreFs.readBytes(path)) else None
      val ok = (cur, expected) match {
        case (None, None)       => true
        case (Some(a), Some(b)) => java.util.Arrays.equals(a, b)
        case _                  => false
      }
      if (ok) StoreFs.writeAtomic(path, bytes)
      ok
    }
  }

  /** The same-instant double-flip law, over ANY backend — run below
    * against both the in-memory mock and the real [[HadoopCasBackend]]
    * on the local FS (the same `FileSystem` code path HDFS exercises).
    */
  private def sameInstantFlipLaw(cas: StoreFs.CasBackend): Unit = {
    val dir = tmpDir()
    BatchState.commit(dir, graft.time.BatchID(1))
    StoreFs.installCasBackend(cas)
    try {
      val readBarrier = new java.util.concurrent.CountDownLatch(2)
      val firstWrote = new java.util.concurrent.CountDownLatch(1)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      // writer A: read, wait until both have read, flip first
      val a = new Thread(() => {
        val st = BatchState.read(dir)
        readBarrier.countDown(); readBarrier.await()
        try BatchState.write(dir, st.copy(committed = (2L :: st.committed).sorted))
        catch { case t: Throwable => errors.add(t) }
        firstWrote.countDown()
      })
      // writer B: read at the same instant, flip strictly after A
      val b = new Thread(() => {
        val st = BatchState.read(dir)
        readBarrier.countDown(); readBarrier.await(); firstWrote.await()
        try BatchState.write(dir, st.copy(committed = (3L :: st.committed).sorted))
        catch { case t: Throwable => errors.add(t) }
      })
      a.start(); b.start(); a.join(); b.join()
      assert(errors.size == 1, s"expected exactly one loud loser, got: $errors")
      assert(errors.peek().isInstanceOf[IllegalStateException])
      assert(errors.peek().getMessage.contains("conditional commit-log flip lost"))
      // the winner's flip landed whole; the loser changed nothing
      assert(BatchState.read(dir).committed == List(1L, 2L))
    } finally {
      StoreFs.clearCasBackend()
      BatchState.deleteDir(dir)
    }
  }

  private def rmwChainLaw(cas: StoreFs.CasBackend): Unit = {
    val dir = tmpDir()
    StoreFs.installCasBackend(cas)
    try {
      BatchState.commit(dir, graft.time.BatchID(1))
      BatchState.commit(dir, graft.time.BatchID(2))
      val st = BatchState.read(dir)
      BatchState.write(dir, st.copy(gens = Map(1L -> 1L)))
      assert(BatchState.read(dir) ==
        BatchState(List(1L, 2L), -1L, Map(1L -> 1L)))
    } finally {
      StoreFs.clearCasBackend()
      BatchState.deleteDir(dir)
    }
  }

  test("conditional flip (mock CAS): two same-instant commit-log flips " +
      "resolve exactly — one wins, one loses loudly; the log is never torn") {
    val cas = new MockCas
    sameInstantFlipLaw(cas)
    assert(cas.attempts.get() == 2)
  }

  test("conditional flip (mock CAS): an uncontended read-modify-write " +
      "chain keeps working (each write refreshes the expected content)") {
    rmwChainLaw(new MockCas)
  }

  // ---- round 16: the REAL filesystem-backed CasBackend — the same laws,
  // no mock. HadoopCasBackend builds CAS from exclusive-create + atomic
  // rename, so on the local FS (≡ HDFS semantics) these are exact. ----

  test("conditional flip (HadoopCasBackend): two same-instant flips " +
      "resolve exactly on the real FS — one wins, one loses loudly") {
    sameInstantFlipLaw(new HadoopCasBackend())
  }

  test("conditional flip (HadoopCasBackend): uncontended read-modify-write " +
      "chain works on the real FS") {
    rmwChainLaw(new HadoopCasBackend())
  }

  test("HadoopCasBackend: N threads CAS-incrementing one object — every " +
      "increment lands exactly once, losers retry from a fresh read") {
    val dir = tmpDir()
    val obj = s"$dir/counter"
    val cas = new HadoopCasBackend()
    val threads = 4
    val perThread = 5
    val pool = (1 to threads).map { _ =>
      new Thread(() => {
        var done = 0
        while (done < perThread) {
          val cur = if (StoreFs.exists(obj)) Some(StoreFs.readBytes(obj)) else None
          val n = cur.map(b => new String(b, "UTF-8").toInt).getOrElse(0)
          if (cas.compareAndSwap(obj, cur, (n + 1).toString.getBytes("UTF-8")))
            done += 1
          // a loss re-reads and retries — two winners from the same base
          // would surface as a LOST increment in the final-count law below
        }
      })
    }
    pool.foreach(_.start()); pool.foreach(_.join())
    assert(new String(StoreFs.readBytes(obj), "UTF-8").toInt == threads * perThread)
    // no lock file left behind after the last release
    assert(!StoreFs.exists(s"$obj.__cas_lock"))
    StoreFs.deleteRecursive(dir)
  }

  test("HadoopCasBackend: a holder stalled past the lock timeout whose " +
      "lock a racer broke ABORTS LOUDLY at its write — never a silent " +
      "clobber of the racer's committed object") {
    val dir = tmpDir()
    val obj = s"$dir/state"
    StoreFs.writeAtomic(obj, "v1".getBytes("UTF-8"))
    val racer = new HadoopCasBackend(lockTimeoutMs = 200L)
    // the stalling holder: mid-CAS (after its compare, before its write)
    // it sleeps past its own lock timeout while the racer breaks the lock
    // and lands a competing flip
    val zombie = new HadoopCasBackend(lockTimeoutMs = 200L) {
      override protected def beforeWrite(): Unit = {
        Thread.sleep(400L)
        assert(racer.compareAndSwap(obj, Some("v1".getBytes("UTF-8")),
          "racer".getBytes("UTF-8")), "racer's CAS should win")
      }
    }
    val e = intercept[IllegalStateException] {
      zombie.compareAndSwap(obj, Some("v1".getBytes("UTF-8")),
        "zombie".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("lost before the write"))
    // the racer's committed object is intact
    assert(new String(StoreFs.readBytes(obj), "UTF-8") == "racer")
    StoreFs.deleteRecursive(dir)
  }

  test("HadoopCasBackend: a dead holder's lock is broken after the " +
      "timeout and the CAS proceeds; a live lock is waited out") {
    val dir = tmpDir()
    val obj = s"$dir/state"
    StoreFs.writeAtomic(obj, "v1".getBytes("UTF-8"))
    // simulate a crashed holder: a lock file whose mtime is past timeout
    val lock = s"$obj.__cas_lock"
    StoreFs.createExclusive(lock, "dead-holder".getBytes("UTF-8"))
    new java.io.File(lock).setLastModified(System.currentTimeMillis() - 120000L)
    val cas = new HadoopCasBackend(lockTimeoutMs = 1000L, acquireWaitMs = 5000L)
    assert(cas.compareAndSwap(obj, Some("v1".getBytes("UTF-8")),
      "v2".getBytes("UTF-8")))
    assert(new String(StoreFs.readBytes(obj), "UTF-8") == "v2")
    assert(!StoreFs.exists(lock))
    // a FRESH (live) lock is not broken: the acquire waits, then aborts
    // loudly — never a silent false (which would read as "content moved")
    StoreFs.createExclusive(lock, "live-holder".getBytes("UTF-8"))
    val impatient = new HadoopCasBackend(lockTimeoutMs = 60000L, acquireWaitMs = 300L)
    val e = intercept[IllegalStateException] {
      impatient.compareAndSwap(obj, Some("v2".getBytes("UTF-8")),
        "v3".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("could not acquire"))
    assert(new String(StoreFs.readBytes(obj), "UTF-8") == "v2")
    StoreFs.deleteRecursive(dir)
  }
}
