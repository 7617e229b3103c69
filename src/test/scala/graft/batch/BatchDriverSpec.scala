package graft.batch

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.algebra.Semigroup
import graft.time.BatchID

/** The incremental run loop: plans only available batches, rolls the
  * snapshot forward run by run, never reprocesses committed batches, and
  * refuses to jump a gap.
  */
class BatchDriverSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private implicit val sg: Semigroup[Long] = Semigroup.longSemigroup

  // source partition batch b: rows (key = "k" + (i % 3), weight 1) * (b + 1)
  private def writeBatch(root: String, b: Long): Unit = {
    val s = spark; import s.implicits._
    (0 until (b.toInt + 1) * 3).map(i => (s"k${i % 3}", 1L))
      .toDF("key", "w").write.parquet(s"$root/batch_id=$b")
  }

  private def pipeline(df: org.apache.spark.sql.DataFrame) = {
    val s = spark; import s.implicits._
    df.groupBy(col("key"), col("batch_id").cast("long"))
      .agg(sum(col("w")).as("d"))
      .select(col("key"), col("batch_id").cast("long"), col("d").cast("long"))
      .as[(String, Long, Long)]
  }

  test("incremental runs: available prefix only, roll forward, gap stops the plan") {
    val s = spark; import s.implicits._
    val src = Files.createTempDirectory("graft_driver_src_").toString
    val storeDir = Files.createTempDirectory("graft_driver_store_").toString
    val store = new BatchStore[String, Long](storeDir)

    // run 1: batches 0..1 exist, request through 5 -> runs 0..1
    writeBatch(src, 0L); writeBatch(src, 1L)
    assert(BatchDriver.runIncremental(spark, src, store, BatchID(5))(pipeline)
      == BatchDriver.Ran(BatchID(0), BatchID(1)))
    assert(store.state.lastCommitted(BatchID(99)).contains(BatchID(1)))
    // snapshot = batches 0+1: key k0 gets 1 + 2 = 3 (per key)
    assert(store.readLast(spark).get._2.collect().toMap
      == Map("k0" -> 3L, "k1" -> 3L, "k2" -> 3L))

    // run 2: batch 2 appears plus a gap then 4 -> runs ONLY 2
    writeBatch(src, 2L); writeBatch(src, 4L)
    assert(BatchDriver.runIncremental(spark, src, store, BatchID(5))(pipeline)
      == BatchDriver.Ran(BatchID(2), BatchID(2)))
    assert(store.readLast(spark).get._2.collect().toMap
      == Map("k0" -> 6L, "k1" -> 6L, "k2" -> 6L))

    // run 3: still a gap at 3 -> nothing to do, snapshot untouched
    assert(BatchDriver.runIncremental(spark, src, store, BatchID(5))(pipeline)
      == BatchDriver.NothingToDo)

    // run 4: the gap fills -> 3..4 in one run; totals = batches 0..4
    writeBatch(src, 3L)
    assert(BatchDriver.runIncremental(spark, src, store, BatchID(5))(pipeline)
      == BatchDriver.Ran(BatchID(3), BatchID(4)))
    assert(store.readLast(spark).get._2.collect().toMap
      == Map("k0" -> 15L, "k1" -> 15L, "k2" -> 15L))

    // run 5: everything committed -> idempotent no-op
    assert(BatchDriver.runIncremental(spark, src, store, BatchID(4))(pipeline)
      == BatchDriver.NothingToDo)
  }

  test("maintenance cadence: one driver run folds a fragmented index and " +
      "stacked revocation records, semantics unchanged") {
    val s = spark; import s.implicits._
    val src = Files.createTempDirectory("graft_drvm_src_").toString
    val storeDir = Files.createTempDirectory("graft_drvm_store_").toString
    val store = new BatchStore[String, Long](storeDir)

    // nightly merges, then TEN takedowns — each stacks one revocation-
    // digest dir (the guard reads their union)
    writeBatch(src, 0L); writeBatch(src, 1L)
    assert(BatchDriver.runIncremental(spark, src, store, BatchID(1))(pipeline)
      == BatchDriver.Ran(BatchID(0), BatchID(1)))
    (0 until 10).foreach(i => store.deleteKeys(spark, Seq(s"gone$i")))
    assert(BatchState.read(storeDir).revokedIds.size == 10)

    // a FRAGMENTED stored BM25 index maintained beside the store:
    // bootstrap + 3 appends = 4 segments
    import graft.operators.Retrieval
    val idxDir = Files.createTempDirectory("graft_drvm_idx_").toString
    Retrieval.writeIndex(Retrieval.buildIndex(
      Seq((1L, "spark merges windows")).toDF("doc_id", "text"),
      "text", "doc_id"), idxDir, tokenBuckets = 4)
    (2L to 4L).foreach { i =>
      Retrieval.appendToStored(spark, idxDir, 4,
        Seq((i, s"incremental document number $i about spark")).toDF("doc_id", "text"),
        "text", "doc_id")
    }
    assert(SegmentedStore.committedSegs(idxDir).size == 4)

    // ONE driver run with the maintenance cadence on: merge commits batch
    // 2, then the revocation dirs fold and the index compacts — no
    // separate operations job
    writeBatch(src, 2L)
    val maint = BatchDriver.Maintenance(
      revokedMaxDirs = Some(8),
      hooks = Seq(Retrieval.compactIfFragmented(_, idxDir, tokenBuckets = 4,
        maxSegments = 2)))
    assert(BatchDriver.runIncremental(spark, src, store, BatchID(2), maint)(pipeline)
      == BatchDriver.Ran(BatchID(2), BatchID(2)))

    // folded layouts
    assert(BatchState.read(storeDir).revokedIds.size == 1,
      "revocation-digest dirs did not fold")
    assert(SegmentedStore.committedSegs(idxDir).size == 1,
      "fragmented index did not compact")

    // semantics unchanged: totals include the new batch, the fold kept
    // every revocation live (a dirty backfill replay still cannot
    // resurrect), and the compacted index serves the same corpus
    assert(store.readLast(spark).get._2.collect().toMap
      == Map("k0" -> 6L, "k1" -> 6L, "k2" -> 6L))
    store.backfill(spark,
      Seq(("gone3", 1L, 99L), ("k0", 1L, 1L)).toDS(), BatchID(1))
    val healed = store.readLast(spark).get._2.collect().toMap
    assert(!healed.contains("gone3"), "folded revocation lost its guard")
    val queries = Seq((0, "spark document")).toDF("query_id", "qtext")
    val served = Retrieval.bm25FromStored(spark, idxDir, 4, queries,
      "qtext", "query_id", "doc_id")
    val truth = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(
        (1L to 4L).map(i => (i, if (i == 1) "spark merges windows"
          else s"incremental document number $i about spark"))
          .toDF("doc_id", "text"), "text", "doc_id"),
      queries, "qtext", "query_id")
    assert(served.exceptAll(truth).isEmpty && truth.exceptAll(served).isEmpty,
      "compacted index diverged from the clean rebuild")

    BatchState.deleteDir(storeDir)
    BatchState.deleteDir(idxDir)
    BatchState.deleteDir(src)
  }

  test("default-on CAS: a fresh driver run flips the commit log through " +
       "the real backend with no explicit wiring; opt-out respected") {
    val src = Files.createTempDirectory("graft_driver_cas_src_").toString
    val storeDir = Files.createTempDirectory("graft_driver_cas_store_").toString
    val prev = StoreFs.currentCasBackend
    StoreFs.clearCasBackend()
    try {
      // opt-out law first (backend still empty): the sysprop keeps the
      // rename path, loudly
      System.setProperty("graft.cas.default", "off")
      try {
        StoreFs.ensureDefaultCasBackend()
        assert(StoreFs.currentCasBackend.isEmpty,
          "opt-out must leave the rename path in place")
      } finally System.clearProperty("graft.cas.default")

      // default-on law: runIncremental with NO wiring installs the real
      // backend and the commit lands through it
      val s = spark; import s.implicits._
      writeBatch(src, 0L)
      val store = new BatchStore[String, Long](storeDir)
      assert(BatchDriver.runIncremental(spark, src, store, BatchID(0))(pipeline)
        == BatchDriver.Ran(BatchID(0), BatchID(0)))
      assert(StoreFs.currentCasBackend.exists(_.isInstanceOf[HadoopCasBackend]),
        "fresh driver run did not install the default CAS backend")
      assert(store.state.lastCommitted(BatchID(99)).contains(BatchID(0)),
        "commit did not land through the CAS flip")

      // never-override law: an explicitly installed backend survives
      val mock = new StoreFs.CasBackend {
        def compareAndSwap(p: String, e: Option[Array[Byte]],
            b: Array[Byte]): Boolean = true
      }
      StoreFs.installCasBackend(mock)
      StoreFs.ensureDefaultCasBackend()
      assert(StoreFs.currentCasBackend.contains(mock),
        "ensureDefaultCasBackend overrode an explicit backend")
    } finally {
      prev match {
        case Some(b) => StoreFs.installCasBackend(b)
        case None => StoreFs.clearCasBackend()
      }
      BatchState.deleteDir(storeDir)
      BatchState.deleteDir(src)
    }
  }
}
