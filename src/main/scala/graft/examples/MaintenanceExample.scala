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
    //    dataset (carol stays revoked because the corrected deltas were
    //    cleansed — the documented master-dataset contract)
    store.backfill(spark, Seq(("alice", 2L, 2L), ("bob", 3L, 5L)).toDS(), BatchID(2))
    val healed = store.readLast(spark).get._2.collect().sortBy(_._1).toSeq
    println("after backfill: " + healed)
    require(healed == Seq(("alice", 5L), ("bob", 6L)),
      s"backfill did not heal the night-2 bug: $healed")
    require(store.readLast(spark, BatchID(1)).get._2.collect().toMap ==
      Map("alice" -> 3L, "bob" -> 1L), "backfill touched pre-bug history")

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

    graft.batch.BatchState.deleteDir(storeDir)
    graft.batch.BatchState.deleteDir(idxDir)
    spark.stop()
  }
}
