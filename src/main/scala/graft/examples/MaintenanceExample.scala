package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algebra.Semigroup
import graft.batch.BatchStore
import graft.operators.Retrieval
import graft.time.BatchID

/** The operations runbook for a long-lived deployment — every
  * maintenance verb the serving store and the stored indexes support,
  * exercised end-to-end with self-checking asserts. The reference's
  * VersionedBatchStore (summingbird-scalding/.../store/
  * VersionedBatchStore.scala:62-143) provides the versioning these verbs
  * build on but none of the verbs themselves; a production lambda
  * deployment needs all of them:
  *
  *   KV serving store ([[graft.batch.BatchStore]]):
  *     1. incremental `merge` (the normal nightly roll-forward),
  *     2. `deleteKeys` — takedown / right-to-be-forgotten: every retained
  *        version rewritten without the keys, one atomic flip,
  *     3. `backfill` — historical recompute after a buggy merge: the
  *        poisoned snapshots rewritten from corrected master-dataset
  *        deltas, earlier snapshots untouched.
  *
  *   Stored BM25 index ([[graft.operators.Retrieval]]):
  *     4. bootstrap + incremental `appendToStored` ingest,
  *     5. `deleteFromStored` — takedown (delete ≡ rebuild-without, no
  *        index rewrite; re-add needs no compaction),
  *     6. `replaceInStored` — ATOMIC correction of a poisoned batch
  *        (corrected postings + victim delete-set + exact stats delta on
  *        ONE commit-log flip — no delete-then-append serving gap),
  *     7. `compactIfFragmented` — the self-scheduling physical fold.
  *
  *   Round-15 additions:
  *     8. `deleteKeys(Dataset[K])` — MASS revocation (anti-join rewrite,
  *        victims never collected to the driver),
  *     9. the backfill RESURRECTION GUARD — a dirty master replay cannot
  *        silently re-serve a revoked key (with `allowResurrect` as the
  *        explicit escape hatch),
  *    10. the stored GRAPH-ANN lifecycle
  *        ([[graft.operators.Similarity]].nsw*Stored) — takedown as one
  *        tiny mark segment, append carrying marks forward, compaction
  *        folding them physically.
  *
  * Run: `sbt "runMain graft.examples.MaintenanceExample"`.
  */
object MaintenanceExample {

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .appName("graft-maintenance")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sg: Semigroup[Long] = Semigroup.longSemigroup

    // 0. (round 17) CAS is DEFAULT-ON: every driver entry point installs
    //    the filesystem-backed backend via ensureDefaultCasBackend, so
    //    every commit-log flip below is compare-and-swap against the
    //    content the writer read — two same-instant flips resolve exactly
    //    (one wins, one aborts loudly) on any FS with exact
    //    create-if-absent (HDFS/local; S3A >= 3.4.1). Explicit install
    //    remains for custom backends (e.g. an etag-conditional adapter);
    //    opt out entirely with -Dgraft.cas.default=off.
    graft.batch.StoreFs.ensureDefaultCasBackend()

    // ------------------------------------------------------------------
    // KV serving store: merge, takedown, backfill
    // ------------------------------------------------------------------
    val storeDir = Files.createTempDirectory("graft_maint_store_").toString
    val store = new BatchStore[String, Long](storeDir)

    // 1. three nightly merges — but night 2's job ran a buggy transform
    //    that double-counted every event
    store.merge(spark, Seq(("alice", 1L, 3L), ("bob", 1L, 1L)).toDS(), BatchID(1)).count()
    store.merge(spark, Seq(("alice", 2L, 4L), ("carol", 2L, 2L)).toDS(), BatchID(2)).count() // bug: true deltas were 2 and 1
    store.merge(spark, Seq(("bob", 3L, 5L)).toDS(), BatchID(3)).count()
    println("after merges:   " + store.readLast(spark).get._2.collect().sortBy(_._1).toSeq)

    // 2. takedown: carol revokes — every retained version rewritten
    store.deleteKeys(spark, Seq("carol"))
    require(store.readLast(spark).get._2.filter(_._1 == "carol").isEmpty,
      "takedown left the revoked key visible")
    require(store.readLast(spark, BatchID(2)).get._2.filter(_._1 == "carol").isEmpty,
      "takedown left the revoked key in HISTORY")
    println("after takedown: " + store.readLast(spark).get._2.collect().sortBy(_._1).toSeq)

    // 3. backfill: the night-2 bug is found; recompute from the master
    //    dataset — deliberately DIRTY here (carol's deltas still ride
    //    along): the recorded revocation re-applies, so carol stays gone
    //    without any cleansing of the replay stream (round 15; pass
    //    allowResurrect = true to deliberately re-admit her)
    store.backfill(spark,
      Seq(("alice", 2L, 2L), ("carol", 2L, 1L), ("bob", 3L, 5L)).toDS(), BatchID(2))
    val healed = store.readLast(spark).get._2.collect().sortBy(_._1).toSeq
    println("after backfill: " + healed)
    require(healed == Seq(("alice", 5L), ("bob", 6L)),
      s"backfill did not heal the night-2 bug (or resurrected carol): $healed")
    require(store.readLast(spark, BatchID(1)).get._2.collect().toMap ==
      Map("alice" -> 3L, "bob" -> 1L), "backfill touched pre-bug history")

    // 8. mass revocation: a whole id cohort revokes at once — the victim
    //    set is a (lazy) Dataset, rewritten via anti-join, never collected
    val bigDir = Files.createTempDirectory("graft_maint_big_").toString
    val big = new BatchStore[Long, Long](bigDir)
    big.merge(spark, (1L to 1000L).map(k => (k, 1L, k)).toDS(), BatchID(1)).count()
    big.deleteKeys(spark.range(0L, 1000000L).filter(col("id") % 2 === 0)
      .as[Long])
    require(big.readLast(spark).get._2.count() == 500L,
      "mass revocation missed rows")
    println("mass revocation: 1M-key Dataset anti-joined, 500 retained ✓")

    // ------------------------------------------------------------------
    // Stored BM25 index: ingest, takedown, atomic correction, compaction
    // ------------------------------------------------------------------
    val idxDir = Files.createTempDirectory("graft_maint_idx_").toString
    val day1 = Seq((1L, "spark merges windows"), (2L, "lazy dog sleeps")).toDF("doc_id", "text")
    // day 2's crawler bug stapled junk onto every document
    val day2Poisoned = Seq((3L, "quick fox zzjunk zzjunk"), (4L, "spark joins zzjunk")).toDF("doc_id", "text")
    val day2True = Seq((3L, "quick fox"), (4L, "spark joins")).toDF("doc_id", "text")

    // 4. bootstrap + incremental ingest
    Retrieval.writeIndex(Retrieval.buildIndex(day1, "text", "doc_id"), idxDir, tokenBuckets = 4)
    Retrieval.appendToStored(spark, idxDir, 4, day2Poisoned, "text", "doc_id")

    // 5. takedown: doc 2 is revoked — no index rewrite, one delete segment
    Retrieval.deleteFromStored(spark, idxDir, Seq(2L).toDF("doc_id"))

    // 6. ATOMIC correction of the poisoned day-2 batch: corrected
    //    postings + victim delete-set + exact stats delta, one flip —
    //    readers never see a window where docs 3 and 4 are missing
    Retrieval.replaceInStored(spark, idxDir, 4, day2True, "text", "doc_id")

    // 7. physical fold on the maintenance cadence
    Retrieval.compactIfFragmented(spark, idxDir, tokenBuckets = 4, maxSegments = 2)

    val queries = Seq((0, "spark zzjunk"), (1, "quick dog")).toDF("query_id", "qtext")
    val served = Retrieval.bm25FromStored(spark, idxDir, 4, queries,
      "qtext", "query_id", "doc_id")
    val truth = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(day1.where(col("doc_id") =!= 2).unionByName(day2True),
        "text", "doc_id"),
      queries, "qtext", "query_id")
    require(served.exceptAll(truth).isEmpty && truth.exceptAll(served).isEmpty,
      "maintained index diverged from a rebuild of the retained+corrected corpus")
    require(served.where(col("doc_id") === 2).isEmpty, "revoked doc served")
    println("index after ingest → takedown → atomic replace → compaction " +
      "≡ clean rebuild ✓")

    // ------------------------------------------------------------------
    // Stored graph-ANN index (round 15): takedown = one mark segment;
    // append carries marks forward; compaction folds them physically
    // ------------------------------------------------------------------
    import graft.operators.Similarity
    val annDir = Files.createTempDirectory("graft_maint_ann_").toString
    val rnd = new scala.util.Random(3)
    val corpus = Seq.tabulate(60)(i => (i.toLong, Array.fill(8)(rnd.nextGaussian()).toSeq))
    val q = corpus(5)._2.toArray
    Similarity.nswWriteIndex(
      Similarity.nswBuild(corpus.toDF("vec_id", "embedding"), "embedding", "vec_id",
        nParts = 2), annDir)
    Similarity.nswDeleteFromStored(spark, annDir, Seq(5L).toDF("vec_id"))
    Similarity.nswAppendToStored(spark, annDir,
      Seq((100L, q.toSeq)).toDF("vec_id", "embedding"), "embedding", "vec_id",
      nParts = 2)
    val ids = Similarity.nswSearchBuilt(Similarity.readNswIndex(spark, annDir),
        "embedding", "vec_id", q, k = 5, nParts = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    require(ids.head == 100L && !ids.contains(5L),
      s"graph takedown/append broke serving: $ids")
    // 11. (round 16) the self-scheduling fold — the hook a driver
    //     maintenance cadence (BatchDriver.Maintenance `hooks`) calls
    //     nightly: no-op until delta/mark segments pass the threshold
    require(!Similarity.nswCompactIfFragmented(spark, annDir, "embedding",
      "vec_id", nParts = 2, maxSegments = 8), "unexpected early fold")
    Similarity.nswCompactStored(spark, annDir, "embedding", "vec_id", nParts = 2)
    require(Similarity.readNswIndex(spark, annDir).count() == 60L,
      "compaction did not fold the tombstone")
    println("graph index: takedown (one mark segment) → append (one " +
      "O(batch) delta segment) → compaction (folded) ✓")

    graft.batch.BatchState.deleteDir(storeDir)
    graft.batch.BatchState.deleteDir(bigDir)
    graft.batch.BatchState.deleteDir(idxDir)
    graft.batch.BatchState.deleteDir(annDir)
    graft.batch.StoreFs.clearCasBackend()
    spark.stop()
  }
}
