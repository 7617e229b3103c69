package graft.batch

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.algebra.Semigroup
import graft.time.BatchID

/** [[BatchStore.deleteKeys]] laws: the takedown path for the serving
  * store. Delete ≡ recompute-over-retained-events on EVERY retained
  * version (not just the newest), generations flip atomically in the
  * commit log, superseded generation dirs sweep (graced like retention),
  * the clustered point-read layout survives the rewrite, and a
  * post-delete merge re-introduces only the key's NEW deltas.
  */
class BatchStoreDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private implicit def sg: Semigroup[Long] = Semigroup.longSemigroup

  private def dirsOf(path: String): Set[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSet

  test("deleteKeys: every retained version serves the store minus the keys; " +
      "generations flip in one commit; superseded dirs are swept") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_delk").toString
    val store = new BatchStore[String, Long](dir)
    // two merged versions: through batch 1 (a=1, b=1), through batch 2
    // (a=2, b=1, c=5)
    store.merge(spark, Seq(("a", 1L, 1L), ("b", 1L, 1L)).toDS(), BatchID(1)).count()
    store.merge(spark, Seq(("a", 2L, 1L), ("c", 2L, 5L)).toDS(), BatchID(2)).count()

    store.deleteKeys(spark, Seq("a", "zzz")) // absent key: harmless

    // newest version: recompute over retained events
    assert(store.readLast(spark).get._2.collect().toMap ==
      Map("b" -> 1L, "c" -> 5L))
    // HISTORICAL version must not serve the revoked key either
    assert(store.readLast(spark, BatchID(1)).get._2.collect().toMap ==
      Map("b" -> 1L))
    // one atomic flip: both batches at generation 1, old dirs swept
    val st = BatchState.read(dir)
    assert(st.committed == List(1L, 2L) && st.gens == Map(1L -> 1L, 2L -> 1L), st)
    assert(dirsOf(dir) == Set("batch_id=1.g1", "batch_id=2.g1"), dirsOf(dir))

    // a second delete bumps generations again (rewrite-of-rewrite)
    store.deleteKeys(spark, Seq("c"))
    assert(store.readLast(spark).get._2.collect().toMap == Map("b" -> 1L))
    assert(BatchState.read(dir).gens == Map(1L -> 2L, 2L -> 2L))
    assert(dirsOf(dir) == Set("batch_id=1.g2", "batch_id=2.g2"))

    // post-delete merge: the deleted key's NEW deltas fold from an empty
    // prior (takedown removes accumulated state, not the key's future)
    val out = store.merge(spark, Seq(("a", 3L, 7L)).toDS(), BatchID(3))
      .collect().map(r => (r._1, r._3)).toMap
    assert(out("a") == (None -> 7L), out)
    assert(store.readLast(spark).get._2.collect().toMap ==
      Map("a" -> 7L, "b" -> 1L))
    BatchState.deleteDir(dir)
  }

  test("deleteKeys on a key-clustered store: layout preserved, point reads " +
      "prune, ClientStore.get of a deleted key returns None") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_delkc").toString
    val store = new BatchStore[Long, Long](dir, keyBuckets = Some(4))
    store.merge(spark,
      (1L to 20L).map(k => (k, 1L, k * 10L)).toDS(), BatchID(1)).count()
    store.deleteKeys(spark, Seq(7L, 13L))
    // every kb= bucket dir exists in the new generation (the point-read
    // hole guard must keep passing)
    val gen1 = s"$dir/batch_id=1.g1"
    assert((0 until 4).forall(i => new java.io.File(s"$gen1/kb=$i").isDirectory))
    // pruned point read of a surviving key
    assert(store.readLastForKey(spark, 8L).get._2.collect().toMap == Map(8L -> 80L))
    // deleted key: snapshot row gone
    assert(store.readLastForKey(spark, 7L).get._2.collect().isEmpty)
    // end-to-end serving: no online deltas -> None; with a post-delete
    // online delta the key serves ONLY the new delta
    val noDeltas = spark.emptyDataset[(Long, Long, Long)]
    assert(graft.client.ClientStore.get(spark, store, noDeltas, 7L).isEmpty)
    assert(graft.client.ClientStore.get(spark, store, noDeltas, 8L).contains(80L))
    val newDeltas = Seq((7L, 2L, 3L)).toDS()
    assert(graft.client.ClientStore.get(spark, store, newDeltas, 7L).contains(3L))
    BatchState.deleteDir(dir)
  }

  test("deleteKeys respects the retention grace: superseded generations " +
      "tombstone first, delete only after the grace") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_delkg").toString
    val store = new BatchStore[String, Long](dir, retentionGraceMs = 3600000L)
    store.merge(spark, Seq(("a", 1L, 1L), ("b", 1L, 2L)).toDS(), BatchID(1)).count()
    store.deleteKeys(spark, Seq("a"))
    // old generation tombstoned, still on disk for in-flight readers
    assert(dirsOf(dir) == Set("batch_id=1", "batch_id=1.g1"))
    assert(new java.io.File(s"$dir/batch_id=1/${StoreFs.TombstoneName}").exists())
    assert(store.readLast(spark).get._2.collect().toMap == Map("b" -> 2L))
    // age the tombstone past the grace; the next maintenance sweep deletes
    assert(new java.io.File(s"$dir/batch_id=1/${StoreFs.TombstoneName}")
      .setLastModified(System.currentTimeMillis() - 7200000L))
    store.deleteKeys(spark, Seq("b"))
    assert(!dirsOf(dir).contains("batch_id=1"), dirsOf(dir))
    assert(store.readLast(spark).get._2.collect().isEmpty)
    BatchState.deleteDir(dir)
  }

  test("deleteKeys of never-present keys rewrites NOTHING but still records " +
      "the revocation intent (a master backfill could recompute an era " +
      "retention dropped); re-delivery of the same request changes nothing") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_delkn").toString
    val store = new BatchStore[String, Long](dir)
    store.merge(spark, Seq(("a", 1L, 1L)).toDS(), BatchID(1)).count()
    store.deleteKeys(spark, Seq("ghost"))
    val st = BatchState.read(dir)
    assert(st.gens.isEmpty, "ghost delete bumped a generation")
    assert(dirsOf(dir) == Set("batch_id=1"), dirsOf(dir))
    assert(st.revokedIds == List(1L), "revocation intent not recorded")
    // the recorded intent guards a dirty master recompute of the era
    store.backfill(spark,
      Seq(("a", 1L, 1L), ("ghost", 1L, 9L)).toDS(), BatchID(1))
    assert(store.readLast(spark).get._2.collect().toMap == Map("a" -> 1L))
    // idempotent: the same request (same keys, no newer cutoff) is a no-op
    val after = BatchState.read(dir)
    store.deleteKeys(spark, Seq("ghost"))
    assert(BatchState.read(dir) == after, "re-delivered ghost delete mutated the log")
    BatchState.deleteDir(dir)
  }

  test("streaming takedown feed: deleteKeys in foreachBatch converges, and " +
      "a re-delivered revocation batch is a natural no-op") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = Files.createTempDirectory("graft_store_delks").toString
    val store = new BatchStore[Long, Long](dir)
    store.merge(spark,
      (1L to 10L).map(k => (k, 1L, k)).toDS(), BatchID(1)).count()
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val writer = ms.toDS().writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Long], _: Long) =>
        val keys = b.collect().toSeq // takedown-sized by contract
        if (keys.nonEmpty) store.deleteKeys(spark, keys)
      }
    val query = writer.start()
    try {
      ms.addData(3L); query.processAllAvailable()
      ms.addData(7L); query.processAllAvailable()
    } finally query.stop()
    // at-least-once re-delivery of the first revocation: already-deleted
    // keys fail the membership check, so nothing is rewritten
    val before = BatchState.read(dir)
    store.deleteKeys(spark, Seq(3L))
    assert(BatchState.read(dir) == before, "re-delivered revocation mutated the log")
    assert(store.readLast(spark).get._2.collect().toMap ==
      (1L to 10L).filterNot(k => k == 3L || k == 7L).map(k => k -> k).toMap)
    BatchState.deleteDir(dir)
  }

  // ---- round 15: Dataset-scale deleteKeys (mass revocation) ----

  test("deleteKeys(Dataset): a 100k-key revocation rewrites via anti-join " +
      "with no driver materialization, and revoked point-reads return None") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_delkd").toString
    val store = new BatchStore[Long, Long](dir, keyBuckets = Some(4))
    store.merge(spark,
      (1L to 1000L).map(k => (k, 1L, k)).toDS(), BatchID(1)).count()
    // the victim set never exists driver-side: a lazy range-derived Dataset
    val victims = s.range(1L, 200000L).filter(org.apache.spark.sql.functions
      .col("id") % 3 === 0).as[Long]
    store.deleteKeys(victims)
    assert(BatchState.read(dir).gens == Map(1L -> 1L))
    val served = store.readLast(spark).get._2.collect().toMap
    assert(served == (1L to 1000L).filterNot(_ % 3 == 0).map(k => k -> k).toMap)
    assert(store.readLastForKey(spark, 9L).get._2.collect().isEmpty)
    assert(store.readLastForKey(spark, 10L).get._2.collect().toMap == Map(10L -> 10L))
    BatchState.deleteDir(dir)
  }

  test("deleteKeys(Dataset) plan law: the rewrite is a join against the key " +
      "frame — no LocalRelation/LocalTableScan of a collected key set") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_delkp").toString
    val store = new BatchStore[Long, Long](dir)
    store.merge(spark, Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDS(), BatchID(1)).count()
    val victims = s.range(0L, 100000L).as[Long]
    val plan = store.antiJoinKeys(
        s.read.parquet(store.snapshotDir(BatchID(1))), store.keyFrame(victims))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Join") && plan.toLowerCase.contains("leftanti"), plan)
    assert(!plan.contains("LocalTableScan") && !plan.contains("LocalRelation"),
      s"key set materialized driver-side:\n$plan")
    assert(plan.contains("Range"), s"key side should scan the lazy range:\n$plan")
    BatchState.deleteDir(dir)
  }

  test("deleteKeys no-op guard probes ALL retained versions: a key present " +
      "only in an OLDER snapshot (non-cumulative writeSnapshot store) still " +
      "triggers the rewrite") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_delko").toString
    val store = new BatchStore[String, Long](dir)
    // writeSnapshot is a public API: arbitrary per-batch content, NOT
    // cumulative — "old" exists only in batch 1
    store.writeSnapshot(BatchID(1), Seq(("old", 1L), ("b", 2L)).toDS())
    store.writeSnapshot(BatchID(2), Seq(("b", 3L)).toDS())
    store.deleteKeys(spark, Seq("old"))
    // the rewrite ran (generations bumped) and the HISTORICAL read no
    // longer serves the revoked key
    assert(BatchState.read(dir).gens == Map(1L -> 1L, 2L -> 1L))
    assert(store.readLast(spark, BatchID(1)).get._2.collect().toMap ==
      Map("b" -> 2L))
    BatchState.deleteDir(dir)
  }

  test("cumulativeSnapshots store: the no-op guard probes ONLY the newest " +
      "version — takedowns still rewrite all history, never-present keys " +
      "still no-op the log's gens") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_delcum").toString
    val store = new BatchStore[String, Long](dir, cumulativeSnapshots = true)
    // merge-maintained: every older version's key set ⊆ the newest's
    store.merge(spark, Seq(("a", 1L, 1L), ("b", 1L, 2L)).toDS(), BatchID(1)).count()
    store.merge(spark, Seq(("c", 2L, 3L)).toDS(), BatchID(2)).count()
    // present key: the newest-only probe hits, the rewrite covers ALL
    // retained versions (history must not serve the key either)
    store.deleteKeys(spark, Seq("a"))
    assert(BatchState.read(dir).gens == Map(1L -> 1L, 2L -> 1L))
    assert(store.readLast(spark, BatchID(1)).get._2.collect().toMap ==
      Map("b" -> 2L))
    assert(store.readLast(spark).get._2.collect().toMap ==
      Map("b" -> 2L, "c" -> 3L))
    // re-delivered + never-present: one newest probe, no generation bump
    // (the revocation record for "zz" still lands — intent outlives data)
    val gensBefore = BatchState.read(dir).gens
    store.deleteKeys(spark, Seq("a", "zz"))
    assert(BatchState.read(dir).gens == gensBefore,
      "no-op takedown rewrote snapshots on a cumulative store")
    BatchState.deleteDir(dir)
  }

  test("deleteKeys refuses an empty key set and an empty store") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_delke").toString
    val store = new BatchStore[String, Long](dir)
    intercept[IllegalArgumentException](store.deleteKeys(spark, Seq("a")))
    store.merge(spark, Seq(("a", 1L, 1L)).toDS(), BatchID(1)).count()
    intercept[IllegalArgumentException](store.deleteKeys(spark, Nil))
    BatchState.deleteDir(dir)
  }
}
