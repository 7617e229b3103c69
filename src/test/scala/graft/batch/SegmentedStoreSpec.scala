package graft.batch

import org.scalatest.funsuite.AnyFunSuite

/** Crash-consistency laws for the shared segment layout that don't need a
  * SparkSession: the deletion grace period (tombstoned two-phase sweep)
  * and the single-writer lease. The end-to-end forms (a real reader
  * mid-scan across a compaction; a streaming replay after compaction) live
  * in RetrievalSpec / Int8QuantSpec.
  */
class SegmentedStoreSpec extends AnyFunSuite {

  private def freshStore(segs: Long*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_segstore_").toString
    segs.foreach { id =>
      StoreFs.mkdirs(SegmentedStore.segDir(dir, id))
      StoreFs.writeAtomic(s"${SegmentedStore.segDir(dir, id)}/part-0.parquet",
        Array[Byte](1))
    }
    BatchState.write(dir, BatchState(segs.toList.sorted))
    dir
  }

  test("graceful sweep is two-phase: tombstone first, delete only after the grace") {
    val dir = freshStore(1L, 2L, 4L)
    // compact: seg=5 becomes the only live segment, grace = 1 hour
    StoreFs.mkdirs(SegmentedStore.segDir(dir, 5L))
    StoreFs.writeAtomic(s"${SegmentedStore.segDir(dir, 5L)}/part-0.parquet", Array[Byte](1))
    SegmentedStore.commitReplaceAll(dir, 5L, sweepGraceMs = 3600000L)
    // phase 1: superseded segments still on disk (a reader holding the
    // pre-compaction list can finish), tombstoned
    for (id <- Seq(1L, 2L, 4L)) {
      assert(StoreFs.exists(SegmentedStore.segDir(dir, id)),
        s"seg=$id deleted inside the grace window")
      assert(StoreFs.exists(s"${SegmentedStore.segDir(dir, id)}/_graft_tombstone"),
        s"seg=$id not tombstoned")
    }
    // a repeat sweep inside the grace still deletes nothing
    SegmentedStore.sweepUncommitted(dir, 3600000L)
    assert(StoreFs.exists(SegmentedStore.segDir(dir, 1L)))
    // phase 2: age the tombstones past the grace, next sweep deletes
    for (id <- Seq(1L, 2L, 4L)) {
      val tomb = new java.io.File(
        s"${SegmentedStore.segDir(dir, id)}/_graft_tombstone")
      assert(tomb.setLastModified(System.currentTimeMillis() - 7200000L))
    }
    SegmentedStore.sweepUncommitted(dir, 3600000L)
    for (id <- Seq(1L, 2L, 4L))
      assert(!StoreFs.exists(SegmentedStore.segDir(dir, id)),
        s"seg=$id survived past its grace")
    assert(StoreFs.exists(SegmentedStore.segDir(dir, 5L)), "live segment swept")
    StoreFs.deleteRecursive(dir)
  }

  test("grace 0 (the default) still sweeps immediately") {
    val dir = freshStore(1L, 2L)
    StoreFs.mkdirs(SegmentedStore.segDir(dir, 3L))
    SegmentedStore.commitReplaceAll(dir, 3L)
    assert(!StoreFs.exists(SegmentedStore.segDir(dir, 1L)))
    assert(!StoreFs.exists(SegmentedStore.segDir(dir, 2L)))
    StoreFs.deleteRecursive(dir)
  }

  test("a re-committed segment id does not inherit a stale tombstone") {
    val dir = freshStore(1L)
    // seg=2 (streaming batch 0) superseded and tombstoned by a compaction
    StoreFs.mkdirs(SegmentedStore.segDir(dir, 2L))
    StoreFs.writeAtomic(s"${SegmentedStore.segDir(dir, 2L)}/part-0.parquet", Array[Byte](1))
    SegmentedStore.commitStreamingAppend(dir, 0L)
    StoreFs.mkdirs(SegmentedStore.segDir(dir, 3L))
    StoreFs.writeAtomic(s"${SegmentedStore.segDir(dir, 3L)}/part-0.parquet", Array[Byte](1))
    SegmentedStore.commitReplaceAll(dir, 3L, sweepGraceMs = 3600000L)
    assert(StoreFs.exists(s"${SegmentedStore.segDir(dir, 2L)}/_graft_tombstone"))
    // new checkpoint re-points at the index: reset + batch 0 reuses seg=2
    SegmentedStore.resetStreamingReplayGuard(dir)
    StoreFs.writeAtomic(s"${SegmentedStore.segDir(dir, 2L)}/part-1.parquet", Array[Byte](2))
    SegmentedStore.commitStreamingAppend(dir, 0L)
    assert(!StoreFs.exists(s"${SegmentedStore.segDir(dir, 2L)}/_graft_tombstone"),
      "live re-committed segment still carries the old tombstone — its next " +
      "grace window would be cut short")
    assert(SegmentedStore.committedSegs(dir) == List(2L, 3L))
    StoreFs.deleteRecursive(dir)
  }

  test("writer lock: a second concurrent mutator fails loudly, not silently") {
    val dir = freshStore(1L)
    SegmentedStore.withWriterLock(dir) {
      val ex = intercept[IllegalStateException] {
        SegmentedStore.withWriterLock(dir) { fail("second writer ran") }
      }
      assert(ex.getMessage.contains("_graft_writer.lock"))
    }
    // released on exit: the next writer acquires freely
    assert(SegmentedStore.withWriterLock(dir) { 42 } == 42)
    StoreFs.deleteRecursive(dir)
  }

  test("writer lock: released on body failure; a stale lease is broken") {
    val dir = freshStore(1L)
    intercept[RuntimeException] {
      SegmentedStore.withWriterLock(dir) { throw new RuntimeException("boom") }
    }
    assert(!StoreFs.exists(s"$dir/_graft_writer.lock"), "lock leaked on failure")
    // a dead writer's lease (older than the timeout) is broken, not fatal
    StoreFs.createExclusive(s"$dir/_graft_writer.lock", "{}".getBytes("UTF-8"))
    assert(new java.io.File(s"$dir/_graft_writer.lock")
      .setLastModified(System.currentTimeMillis() - 3600000L))
    assert(SegmentedStore.withWriterLock(dir, leaseTimeoutMs = 1000L) { 7 } == 7)
    StoreFs.deleteRecursive(dir)
  }
}
