package graft.batch

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.algebra.Semigroup
import graft.time.BatchID

/** Snapshot retention (reference VersionedBatchStore.scala:40,105) and the
  * declared-start boundary (reference InitialBatchedStore.scala:28-45).
  */
class BatchStoreRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private implicit val sg: Semigroup[Long] = Semigroup.longSemigroup

  private def snapshotDirs(path: String): Set[String] = {
    val d = new java.io.File(path)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSet
  }

  test("versionsToKeep=2: five merges leave exactly the two newest snapshots, newest still serves") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_retention_").toString
    val store = new BatchStore[String, Long](dir, versionsToKeep = 2)
    (1L to 5L).foreach { b =>
      store.merge(spark, Seq(("k", b, b)).toDS(), BatchID(b)).count()
    }
    assert(snapshotDirs(dir) == Set("batch_id=4", "batch_id=5"))
    assert(store.state.committed == List(4L, 5L))
    val (last, snap) = store.readLast(spark).get
    assert(last == BatchID(5))
    assert(snap.collect().toMap == Map("k" -> 15L)) // 1+2+3+4+5 survived the pruning
  }

  test("default retention keeps every snapshot") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_retention_all_").toString
    val store = new BatchStore[String, Long](dir)
    (1L to 3L).foreach { b =>
      store.merge(spark, Seq(("k", b, 1L)).toDS(), BatchID(b)).count()
    }
    assert(snapshotDirs(dir) == Set("batch_id=1", "batch_id=2", "batch_id=3"))
  }

  test("retentionGraceMs: a reader holding a pruned snapshot completes across " +
      "the sweep; tombstones age out on the prune cadence") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_retention_grace_").toString
    val store = new BatchStore[String, Long](dir, versionsToKeep = 2,
      retentionGraceMs = 3600000L)
    (1L to 2L).foreach { b =>
      store.merge(spark, Seq(("k", b, b)).toDS(), BatchID(b)).count()
    }
    // reader pins the OLDEST snapshot's file listing before the next merges
    // prune it out of the commit log
    val oldReader = store.readLast(spark, BatchID(1)).get._2
    (3L to 4L).foreach { b =>
      store.merge(spark, Seq(("k", b, b)).toDS(), BatchID(b)).count()
    }
    assert(store.state.committed == List(3L, 4L))
    // graced: the pruned dirs are tombstoned, not deleted — the old reader
    // still completes with the pre-prune contents
    assert(oldReader.collect().toMap == Map("k" -> 1L),
      "reader lost its snapshot inside the grace window")
    assert(snapshotDirs(dir) == Set("batch_id=1", "batch_id=2", "batch_id=3", "batch_id=4"))
    // age the tombstones past the grace; the next prune-triggering merge sweeps
    for (b <- Seq(1L, 2L)) {
      val tomb = new java.io.File(s"$dir/batch_id=$b/_graft_tombstone")
      assert(tomb.exists(), s"batch_id=$b not tombstoned")
      assert(tomb.setLastModified(System.currentTimeMillis() - 7200000L))
    }
    store.merge(spark, Seq(("k", 5L, 5L)).toDS(), BatchID(5)).count()
    // 1 and 2 aged out and are deleted; 3 was dropped by THIS prune and
    // enters its own grace window (tombstoned, still on disk)
    assert(snapshotDirs(dir) == Set("batch_id=3", "batch_id=4", "batch_id=5"),
      "expired snapshots survived (or in-grace snapshot deleted) in the post-grace sweep")
    assert(new java.io.File(s"$dir/batch_id=3/_graft_tombstone").exists())
    assert(store.readLast(spark).get._2.collect().toMap == Map("k" -> 15L))
  }

  test("writeSnapshot holds the single-writer lease: a concurrent mutator fails loudly") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_lease_").toString
    val store = new BatchStore[String, Long](dir)
    WriterLease.withLock(dir) {
      val ex = intercept[IllegalStateException] {
        store.merge(spark, Seq(("k", 1L, 1L)).toDS(), BatchID(1)).count()
      }
      assert(ex.getMessage.contains("_graft_writer.lock"))
    }
    // lease released: the same merge now commits
    store.merge(spark, Seq(("k", 1L, 1L)).toDS(), BatchID(1)).count()
    assert(store.readLast(spark).get._2.collect().toMap == Map("k" -> 1L))
  }

  test("merge leaves no cache entry behind (r6 verdict: persist must be released)") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_cache_").toString
    val store = new BatchStore[String, Long](dir)
    val out = store.merge(spark, Seq(("k", 1L, 2L), ("j", 1L, 3L)).toDS(), BatchID(1))
    // output is fully usable after the merge returns...
    assert(out.collect().map(r => (r._1, r._3)).toMap ==
      Map("k" -> (None, 2L), "j" -> (None, 3L)))
    // ...and the internal persist was released (no per-merge cache leak)
    assert(spark.sharedState.cacheManager.isEmpty,
      "BatchStore.merge leaked a cache entry")
  }

  test("firstNonZero: refuse reads before the boundary, empty at exactly the boundary") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_fnz_").toString
    val store = new BatchStore[String, Long](dir, firstNonZero = Some(BatchID(10)))

    // reading through batch 9 (boundary - 1) is the legal empty-at-start read
    assert(store.readLast(spark, BatchID(9)).isEmpty)
    // reading through batch 8 is before the store existed: fail fast
    intercept[IllegalStateException](store.readLast(spark, BatchID(8)))
    // merging a batch before the start fails fast too (via readLast(upTo.prev))
    intercept[IllegalStateException](
      store.merge(spark, Seq(("k", 9L, 1L)).toDS(), BatchID(9)).count())

    // the first merge at exactly the boundary works, and a stray delta below
    // the declared start is out of contract and excluded from the fold
    store.merge(spark, Seq(("k", 9L, 100L), ("k", 10L, 1L)).toDS(), BatchID(10)).count()
    assert(store.readLast(spark).get._2.collect().toMap == Map("k" -> 1L))
  }
}
