package graft.batch

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.algebra.Semigroup
import graft.time.BatchID

/** [[BatchStore.backfill]] laws: historical recompute from corrected
  * deltas — the lambda architecture's human-fault-tolerance move. A
  * backfilled store serves, at EVERY retained batch, exactly what a fresh
  * store merged with the corrected deltas throughout would serve;
  * snapshots before `from` stay byte-untouched at generation 0; the
  * rewrite is one atomic generation flip with superseded dirs swept
  * (graced like retention); deltas outside the replay span are ignored;
  * non-commutative values fold in batch order; the clustered point-read
  * layout survives; and the ENFORCED [[BatchStore.deleteKeys]] interplay
  * holds: recorded takedowns are re-applied to dirty delta streams by
  * default, with `allowResurrect = true` as the explicit escape hatch.
  */
class BatchStoreBackfillSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private implicit def sg: Semigroup[Long] = Semigroup.longSemigroup

  private def dirsOf(path: String): Set[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSet

  // corrected per-(key, batch) deltas used across tests:
  //   b1: a=1, b=1   b2: a=2, c=5   b3: b=3
  private def corrected: Seq[(String, Long, Long)] =
    Seq(("a", 1L, 1L), ("b", 1L, 1L), ("a", 2L, 2L), ("c", 2L, 5L), ("b", 3L, 3L))

  test("backfill ≡ fresh store merged with corrected deltas, at every " +
      "retained batch; earlier snapshots untouched; one generation flip") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_bf").toString
    val store = new BatchStore[String, Long](dir)
    // batch 1 merged correct; batch 2 ran CORRUPTED (double-counted + a
    // ghost key that should never have existed); batch 3 correct
    store.merge(spark, Seq(("a", 1L, 1L), ("b", 1L, 1L)).toDS(), BatchID(1)).count()
    store.merge(spark, Seq(("a", 2L, 4L), ("c", 2L, 10L), ("ghost", 2L, 9L)).toDS(),
      BatchID(2)).count()
    store.merge(spark, Seq(("b", 3L, 3L)).toDS(), BatchID(3)).count()
    assert(store.readLast(spark).get._2.collect().toMap ==
      Map("a" -> 5L, "b" -> 4L, "c" -> 10L, "ghost" -> 9L))

    store.backfill(spark, corrected.toDS(), BatchID(2))

    // the oracle: a fresh store merged correct throughout
    val oracleDir = Files.createTempDirectory("graft_store_bfo").toString
    val oracle = new BatchStore[String, Long](oracleDir)
    oracle.merge(spark, Seq(("a", 1L, 1L), ("b", 1L, 1L)).toDS(), BatchID(1)).count()
    oracle.merge(spark, Seq(("a", 2L, 2L), ("c", 2L, 5L)).toDS(), BatchID(2)).count()
    oracle.merge(spark, Seq(("b", 3L, 3L)).toDS(), BatchID(3)).count()
    for (b <- 1L to 3L)
      assert(store.readLast(spark, BatchID(b)).get._2.collect().toMap ==
        oracle.readLast(spark, BatchID(b)).get._2.collect().toMap, s"batch $b")
    // the ghost key is gone from history, not just the newest snapshot
    assert(!store.readLast(spark, BatchID(2)).get._2.collect().toMap.contains("ghost"))

    // untouched base + one atomic flip: batch 1 still generation 0,
    // batches 2..3 at generation 1, superseded dirs swept
    val st = BatchState.read(dir)
    assert(st.committed == List(1L, 2L, 3L) && st.gens == Map(2L -> 1L, 3L -> 1L), st)
    assert(dirsOf(dir) == Set("batch_id=1", "batch_id=2.g1", "batch_id=3.g1"), dirsOf(dir))

    // a post-backfill merge folds from the corrected snapshot
    val out = store.merge(spark, Seq(("a", 4L, 1L)).toDS(), BatchID(4))
      .collect().map(r => (r._1, r._3)).toMap
    assert(out("a") == (Some(3L) -> 1L), out)
    BatchState.deleteDir(dir)
    BatchState.deleteDir(oracleDir)
  }

  test("deltas outside (priorBatch, maxCommitted] are ignored: a poison row " +
      "at or below the retained base does not double-fold") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_bfp").toString
    val store = new BatchStore[String, Long](dir)
    store.merge(spark, Seq(("a", 1L, 1L)).toDS(), BatchID(1)).count()
    store.merge(spark, Seq(("a", 2L, 100L)).toDS(), BatchID(2)).count()
    // corrected stream carries batch-1 history too (master-dataset replays
    // often do) plus a row beyond the last committed batch — both ignored:
    // batch 1's value comes from the retained base snapshot
    store.backfill(spark,
      Seq(("a", 1L, 777L), ("a", 2L, 2L), ("a", 9L, 999L)).toDS(), BatchID(2))
    assert(store.readLast(spark).get._2.collect().toMap == Map("a" -> 3L))
    assert(store.readLast(spark, BatchID(1)).get._2.collect().toMap == Map("a" -> 1L))
    BatchState.deleteDir(dir)
  }

  test("no retained base below `from`: the fold starts empty and the deltas " +
      "must cover the whole history (versionsToKeep=1 store)") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_bfr").toString
    val store = new BatchStore[String, Long](dir, versionsToKeep = 1)
    store.merge(spark, Seq(("a", 1L, 1L), ("b", 1L, 1L)).toDS(), BatchID(1)).count()
    store.merge(spark, Seq(("a", 2L, 4L)).toDS(), BatchID(2)).count() // corrupt
    store.merge(spark, Seq(("b", 3L, 3L)).toDS(), BatchID(3)).count()
    assert(BatchState.read(dir).committed == List(3L)) // retention kept only b3
    // `from` predates retention: only b3 is rewritable, and the corrected
    // stream must replay from the very beginning
    store.backfill(spark, corrected.toDS(), BatchID(2))
    assert(store.readLast(spark).get._2.collect().toMap ==
      Map("a" -> 3L, "b" -> 4L, "c" -> 5L))
    BatchState.deleteDir(dir)
  }

  test("non-commutative values fold in batch order") {
    val s = spark; import s.implicits._
    implicit val cat: Semigroup[String] =
      Semigroup.from(commutative = false)((a: String, b: String) => a + b)
    val dir = Files.createTempDirectory("graft_store_bfn").toString
    val store = new BatchStore[String, String](dir)
    store.merge(spark, Seq(("k", 1L, "x")).toDS(), BatchID(1)).count()
    store.merge(spark, Seq(("k", 2L, "??"), ("k", 3L, "!!")).toDS(), BatchID(3)).count()
    store.backfill(spark,
      Seq(("k", 2L, "b"), ("k", 3L, "c")).toDS(), BatchID(2))
    assert(store.readLast(spark).get._2.collect().toMap == Map("k" -> "xbc"))
    assert(store.readLast(spark, BatchID(1)).get._2.collect().toMap == Map("k" -> "x"))
    BatchState.deleteDir(dir)
  }

  test("key-clustered store: layout preserved, point reads serve the " +
      "corrected value through the pruned path") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_bfc").toString
    val store = new BatchStore[Long, Long](dir, keyBuckets = Some(4))
    store.merge(spark, (1L to 20L).map(i => (i, 1L, 1L)).toDS(), BatchID(1)).count()
    store.merge(spark, (1L to 20L).map(i => (i, 2L, 100L)).toDS(), BatchID(2)).count()
    store.backfill(spark,
      ((1L to 20L).map(i => (i, 1L, 1L)) ++ (1L to 20L).map(i => (i, 2L, 2L))).toDS(),
      BatchID(2))
    // every kb= bucket dir present at the new generation; point read prunes
    val st = BatchState.read(dir)
    assert(st.gens == Map(2L -> 1L), st)
    val snap2 = s"$dir/batch_id=2.g1"
    assert((0 until 4).forall(i => new java.io.File(s"$snap2/kb=$i").isDirectory))
    val got = store.readLastForKey(spark, 7L).get._2.collect().toMap
    assert(got == Map(7L -> 3L), got)
    BatchState.deleteDir(dir)
  }

  test("retention grace: superseded generations tombstone instead of " +
      "deleting, and a later sweep past the grace removes them") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_bfg").toString
    val store = new BatchStore[String, Long](dir, retentionGraceMs = 3600L * 1000L)
    store.merge(spark, Seq(("a", 1L, 5L)).toDS(), BatchID(1)).count()
    store.backfill(spark, Seq(("a", 1L, 1L)).toDS(), BatchID(1))
    // the superseded generation-0 dir survives (tombstoned) inside the grace
    assert(dirsOf(dir) == Set("batch_id=1", "batch_id=1.g1"), dirsOf(dir))
    assert(store.readLast(spark).get._2.collect().toMap == Map("a" -> 1L))
    BatchState.deleteDir(dir)
  }

  test("guards: empty store, `from` beyond the newest commit, `from` before " +
      "firstNonZero — all refuse loudly") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_bfe").toString
    val store = new BatchStore[String, Long](dir)
    intercept[IllegalArgumentException](
      store.backfill(spark, corrected.toDS(), BatchID(1)))
    store.merge(spark, Seq(("a", 1L, 1L)).toDS(), BatchID(1)).count()
    intercept[IllegalArgumentException](
      store.backfill(spark, corrected.toDS(), BatchID(2)))
    val bounded = new BatchStore[String, Long](
      Files.createTempDirectory("graft_store_bfe2").toString,
      firstNonZero = Some(BatchID(5)))
    bounded.merge(spark, Seq(("a", 5L, 1L)).toDS(), BatchID(5)).count()
    intercept[IllegalArgumentException](
      bounded.backfill(spark, corrected.toDS(), BatchID(3)))
    BatchState.deleteDir(dir)
    BatchState.deleteDir(bounded.path)
  }

  test("deleteKeys interplay (ENFORCED, round 15): backfill with an " +
      "uncleansed delta stream RE-APPLIES recorded takedowns by default; " +
      "allowResurrect=true is the explicit escape hatch") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_bfd").toString
    val store = new BatchStore[String, Long](dir)
    store.merge(spark, Seq(("a", 1L, 1L), ("b", 1L, 1L)).toDS(), BatchID(1)).count()
    store.merge(spark, Seq(("a", 2L, 2L), ("b", 2L, 5L)).toDS(), BatchID(2)).count()
    store.deleteKeys(spark, Seq("a"))
    assert(store.readLast(spark).get._2.collect().toMap == Map("b" -> 6L))
    assert(BatchState.read(dir).revokedIds == List(1L))
    // DIRTY replay (the corrected stream still carries the revoked key):
    // the guard drops a's deltas — a stays absent from EVERY rewritten
    // version while b's correction lands
    store.backfill(spark,
      Seq(("a", 1L, 1L), ("b", 1L, 1L), ("a", 2L, 2L), ("b", 2L, 7L)).toDS(),
      BatchID(1))
    assert(store.readLast(spark).get._2.collect().toMap == Map("b" -> 8L))
    assert(store.readLast(spark, BatchID(1)).get._2.collect().toMap ==
      Map("b" -> 1L))
    // the explicit escape hatch deliberately re-admits the revoked key
    store.backfill(spark,
      Seq(("a", 1L, 1L), ("b", 1L, 1L), ("a", 2L, 2L), ("b", 2L, 7L)).toDS(),
      BatchID(1), allowResurrect = true)
    assert(store.readLast(spark).get._2.collect().toMap ==
      Map("a" -> 3L, "b" -> 8L))
    BatchState.deleteDir(dir)
  }

  test("revocation record: re-delivered takedowns add no digest sets; a " +
      "later delete of fresh keys appends one; the record survives " +
      "generation rewrites") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_bfr").toString
    val store = new BatchStore[String, Long](dir)
    store.merge(spark,
      Seq(("a", 1L, 1L), ("b", 1L, 1L), ("c", 1L, 1L)).toDS(), BatchID(1)).count()
    store.deleteKeys(spark, Seq("a"))
    assert(BatchState.read(dir).revokedIds == List(1L))
    // re-delivery: membership guard no-ops, no new digest set
    store.deleteKeys(spark, Seq("a"))
    assert(BatchState.read(dir).revokedIds == List(1L))
    // fresh victim (plus an already-revoked one): ONE new set with only
    // the fresh digests
    store.deleteKeys(spark, Seq("a", "b"))
    assert(BatchState.read(dir).revokedIds.sorted == List(1L, 2L))
    // both takedowns guard a dirty backfill
    store.backfill(spark,
      Seq(("a", 1L, 1L), ("b", 1L, 1L), ("c", 1L, 9L)).toDS(), BatchID(1))
    assert(store.readLast(spark).get._2.collect().toMap == Map("c" -> 9L))
    BatchState.deleteDir(dir)
  }

  test("the revocation guard is TIME-SCOPED: deltas a key earned AFTER its " +
      "takedown replay untouched through a dirty backfill, and a " +
      "RE-revocation after re-admission raises the cutoff") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_bft").toString
    val store = new BatchStore[String, Long](dir)
    store.merge(spark, Seq(("a", 1L, 1L), ("b", 1L, 1L)).toDS(), BatchID(1)).count()
    store.deleteKeys(spark, Seq("a")) // cutoff = batch 1
    // the key legitimately re-enters with NEW events (the deleteKeys
    // contract: accumulated state gone, the future untouched)
    store.merge(spark, Seq(("a", 2L, 4L)).toDS(), BatchID(2)).count()
    assert(store.readLast(spark).get._2.collect().toMap ==
      Map("a" -> 4L, "b" -> 1L))
    // dirty full-history backfill: a's PRE-cutoff delta drops, its
    // post-cutoff delta replays — the takedown must not eat the new era
    store.backfill(spark,
      Seq(("a", 1L, 1L), ("b", 1L, 1L), ("a", 2L, 4L)).toDS(), BatchID(1))
    assert(store.readLast(spark, BatchID(1)).get._2.collect().toMap ==
      Map("b" -> 1L))
    assert(store.readLast(spark).get._2.collect().toMap ==
      Map("a" -> 4L, "b" -> 1L))
    // re-revocation after re-admission: the new cutoff (batch 2) lands
    // and the SAME dirty backfill now drops both eras
    store.deleteKeys(spark, Seq("a"))
    assert(BatchState.read(dir).revokedIds.size == 2, "re-revocation not recorded")
    store.backfill(spark,
      Seq(("a", 1L, 1L), ("b", 1L, 1L), ("a", 2L, 4L)).toDS(), BatchID(1))
    assert(store.readLast(spark).get._2.collect().toMap == Map("b" -> 1L))
    BatchState.deleteDir(dir)
  }

  test("pre-cutoff (kd-only) revocation dirs read as ub = MaxValue — guard " +
      "ALL history, union with new-format dirs, and migrate through " +
      "compactRevoked") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{col, xxhash64}
    val dir = Files.createTempDirectory("graft_store_bfold").toString
    val store = new BatchStore[String, Long](dir)
    store.merge(spark,
      Seq(("a", 1L, 1L), ("b", 1L, 1L), ("c", 1L, 1L)).toDS(), BatchID(1)).count()
    // fabricate a record the PREVIOUS release wrote: digest only, no ub
    Seq("a").toDF("k").select(xxhash64(col("k")).as("kd"))
      .write.parquet(s"$dir/_graft_revoked/rev=1")
    BatchState.write(dir, BatchState.read(dir).copy(revokedIds = List(1L)))
    // a new-format takedown lands beside it: mixed schemas must union
    store.deleteKeys(spark, Seq("b"))
    assert(BatchState.read(dir).revokedIds.sorted == List(1L, 2L))
    store.backfill(spark,
      Seq(("a", 1L, 1L), ("b", 1L, 1L), ("c", 1L, 9L)).toDS(), BatchID(1))
    assert(store.readLast(spark).get._2.collect().toMap == Map("c" -> 9L))
    // the fold migrates the old record to (kd, ub = max committed batch
    // at migration, here 1) — existing history stays guarded exactly
    assert(store.compactRevoked(spark, maxDirs = 1))
    store.backfill(spark,
      Seq(("a", 1L, 1L), ("b", 1L, 1L), ("c", 1L, 9L)).toDS(), BatchID(1))
    assert(store.readLast(spark).get._2.collect().toMap == Map("c" -> 9L))
    // ...but the key's FUTURE is freed (the MaxValue shim guarded it):
    // a re-admitted legacy key's post-migration deltas survive a dirty
    // backfill of the new era
    store.merge(spark, Seq(("a", 2L, 4L)).toDS(), BatchID(2)).count()
    store.backfill(spark, Seq(("a", 2L, 4L), ("c", 2L, 1L)).toDS(), BatchID(2))
    assert(store.readLast(spark).get._2.collect().toMap ==
      Map("a" -> 4L, "c" -> 10L),
      "migrated legacy bound still guards the key's future")
    // ...and a re-revocation can now LAND (MaxValue covered every future
    // cutoff, so the bound could never be re-recorded)
    val revsBefore = BatchState.read(dir).revokedIds.size
    store.deleteKeys(spark, Seq("a"))
    assert(BatchState.read(dir).revokedIds.size == revsBefore + 1,
      "re-revocation of a migrated legacy key was swallowed as covered")
    assert(store.readLast(spark).get._2.collect().toMap == Map("c" -> 10L))
    BatchState.deleteDir(dir)
  }

  test("compactRevoked folds the digest record without changing its " +
      "content: the guard is identical before and after, later takedowns " +
      "append fresh dirs, and the fold is a no-op below the threshold") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_store_bfc").toString
    val store = new BatchStore[String, Long](dir)
    store.merge(spark,
      Seq(("a", 1L, 1L), ("b", 1L, 1L), ("c", 1L, 1L), ("d", 1L, 2L)).toDS(),
      BatchID(1)).count()
    store.deleteKeys(spark, Seq("a"))
    store.deleteKeys(spark, Seq("b"))
    store.deleteKeys(spark, Seq("c"))
    assert(BatchState.read(dir).revokedIds.sorted == List(1L, 2L, 3L))
    assert(!store.compactRevoked(spark, maxDirs = 8), "folded below threshold")
    assert(store.compactRevoked(spark, maxDirs = 2))
    assert(BatchState.read(dir).revokedIds == List(4L))
    assert(new java.io.File(s"$dir/_graft_revoked").listFiles()
      .count(_.getName.startsWith("rev=")) == 1, "superseded rev dirs not swept")
    // guard identical after the fold: all three takedowns still re-apply
    store.backfill(spark,
      Seq(("a", 1L, 5L), ("b", 1L, 5L), ("c", 1L, 5L), ("d", 1L, 7L)).toDS(),
      BatchID(1))
    assert(store.readLast(spark).get._2.collect().toMap == Map("d" -> 7L))
    // a later takedown appends a fresh dir past the folded id
    store.deleteKeys(spark, Seq("d"))
    assert(BatchState.read(dir).revokedIds.sorted == List(4L, 5L))
    BatchState.deleteDir(dir)
  }
}
