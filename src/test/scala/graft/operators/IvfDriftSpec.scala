package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.batch.BatchState

/** Frozen-model drift observability for the cell-partitioned stored
  * tiers (round 18, r17 verdict #3): the centroids/codebooks are FROZEN
  * by design (the FAISS discipline — appends encode against the stored
  * model, retraining = rebuild), so the engine must MEASURE when the
  * frozen model has drifted from the data instead of letting an operator
  * discover it as recall loss. Laws:
  *
  *  - a balanced bootstrap reads clean: occupancy imbalance 1.0,
  *    appended-mass fraction 0.0, no warning;
  *  - a SKEW-PLANTED append (every new vector lands in one cell) trips
  *    the occupancy-imbalance warning;
  *  - the appended-mass fraction counts rows the frozen model never saw
  *    and trips its own threshold independently of skew;
  *  - compaction carries the trained-corpus marker: the appended-mass
  *    fraction SURVIVES the physical fold (a compaction must not launder
  *    drift), while occupancy re-exacts from the folded payload;
  *  - takedown keeps the cadence alive: the estimate is documented as
  *    not subtracting deletes between compactions, and re-exacts at the
  *    next fold;
  *  - the IVF-PQ tier measures through the same body
  *    ([[CodesTier.driftStatsRow]]) — same signals, same thresholds.
  */
class IvfDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dim = 16
  private val nCells = 16

  /** Identity-basis centroids: cell assignment is exactly the planted
    * axis, so occupancy is deterministic by construction.
    */
  private def cents: Array[Array[Double]] =
    Array.tabulate(nCells)(i => Array.tabulate(dim)(j => if (i == j) 1.0 else 0.0))

  /** `perCell` vectors per axis cell: e_{id % nCells} + tiny noise. */
  private def axisVecs(n: Int, cell: Long => Int, idFrom: Long = 0L): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(23)
    Seq.tabulate(n) { i =>
      val id = idFrom + i
      val c = cell(id)
      (id, Array.tabulate(dim)(j =>
        (if (j == c) 1.0 else 0.0) + 0.01 * rnd.nextGaussian()))
    }
  }

  private def toDf(rows: Seq[(Long, Array[Double])]): DataFrame = {
    val s = spark; import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def stats(dir: String, imbalanceWarn: Double = 4.0,
      appendedWarn: Double = 0.5): (Long, Double, Double, Boolean) = {
    val r = Similarity.ivfDriftStats(spark, dir, imbalanceWarn, appendedWarn)
      .collect().head
    (r.getAs[Long]("occupied_rows"), r.getAs[Double]("occ_imbalance"),
      r.getAs[Double]("appended_mass_fraction"), r.getAs[Boolean]("drift_warn"))
  }

  test("balanced bootstrap reads clean; a skew-planted append trips the " +
      "imbalance warning; compaction re-exacts occupancy but carries the " +
      "appended-mass fraction") {
    val dir = Files.createTempDirectory("graft_ivf_drift").toString
    try {
      // 10 vectors per cell, perfectly balanced
      val base = axisVecs(160, id => (id % nCells).toInt)
      Similarity.ivfWriteIndex(toDf(base), "embedding", "vec_id", dir,
        centroids = Some(cents))
      val (rows0, imb0, frac0, warn0) = stats(dir)
      assert(rows0 == 160L && imb0 == 1.0 && frac0 == 0.0 && !warn0, (rows0, imb0, frac0))

      // skew-planted append: 160 fresh vectors, ALL in cell 0 —
      // occupancy (170, 10×15), mean 20 → imbalance 8.5 > 4.0
      Similarity.ivfAppendToStored(spark, dir,
        toDf(axisVecs(160, _ => 0, idFrom = 1000L)), "embedding", "vec_id")
      val (rows1, imb1, frac1, warn1) = stats(dir)
      assert(rows1 == 320L && imb1 == 8.5 && warn1, (rows1, imb1, warn1))
      assert(frac1 == 0.5, s"appended 160 over trained 160: $frac1")

      // the appended-mass signal trips its own threshold with skew
      // disarmed; and stays quiet above its own
      assert(stats(dir, imbalanceWarn = 100.0, appendedWarn = 0.4)._4)
      assert(!stats(dir, imbalanceWarn = 100.0, appendedWarn = 0.6)._4)

      // compaction folds physically but must NOT launder drift: the
      // trained-corpus marker rides through, so the fraction holds
      Similarity.ivfCompactStored(spark, dir)
      val (rows2, imb2, frac2, warn2) = stats(dir)
      assert(rows2 == 320L && imb2 == 8.5 && frac2 == 0.5 && warn2,
        (rows2, imb2, frac2, warn2))

      // takedown between compactions: estimate documented as additive
      // (delete sets don't know their victims' cells) — the next fold
      // re-exacts. Delete the whole skewed batch, compact, read clean
      // occupancy again; the appended fraction STILL reads the folded
      // store against the trained size (160 trained of 160 live = 0)
      Similarity.ivfDeleteFromStored(spark, dir,
        toDf(axisVecs(160, _ => 0, idFrom = 1000L)).select("vec_id"))
      Similarity.ivfCompactStored(spark, dir)
      val (rows3, imb3, frac3, _) = stats(dir)
      assert(rows3 == 160L && imb3 == 1.0 && frac3 == 0.0, (rows3, imb3, frac3))
    } finally BatchState.deleteDir(dir)
  }

  test("the compaction cadence runs the drift check (loud warning path) " +
      "and still folds on its threshold") {
    val dir = Files.createTempDirectory("graft_ivf_drift_cadence").toString
    try {
      Similarity.ivfWriteIndex(toDf(axisVecs(160, id => (id % nCells).toInt)),
        "embedding", "vec_id", dir, centroids = Some(cents))
      Similarity.ivfAppendToStored(spark, dir,
        toDf(axisVecs(160, _ => 0, idFrom = 1000L)), "embedding", "vec_id")
      // 2 segments > threshold 1 → folds; drift check runs on the cadence
      assert(Similarity.ivfCompactIfFragmented(spark, dir, maxSegments = 1))
      val (rows, imb, frac, warn) = stats(dir)
      assert(rows == 320L && imb == 8.5 && frac == 0.5 && warn)
      assert(!Similarity.ivfCompactIfFragmented(spark, dir, maxSegments = 1))
    } finally BatchState.deleteDir(dir)
  }

  test("IVF-PQ drift measures through the same body: clean at bootstrap, " +
      "appended-mass fraction rises with a frozen-model append and " +
      "survives compaction") {
    val dir = Files.createTempDirectory("graft_ivfpq_drift").toString
    try {
      val base = axisVecs(160, id => (id % nCells).toInt)
      Similarity.ivfPqWriteIndex(toDf(base), "embedding", "vec_id", dir,
        dim = dim, nCentroids = nCells, m = 4, c = 8)
      val (rows0, _, frac0, _) = statsPq(dir)
      assert(rows0 == 160L && frac0 == 0.0)
      Similarity.ivfPqAppendToStored(spark, dir,
        toDf(axisVecs(160, _ => 0, idFrom = 1000L)), "embedding", "vec_id")
      val (rows1, _, frac1, warnLow) = statsPq(dir, appendedWarn = 0.4)
      assert(rows1 == 320L && frac1 == 0.5 && warnLow)
      Similarity.ivfPqCompactStored(spark, dir)
      assert(statsPq(dir)._3 == 0.5)
    } finally BatchState.deleteDir(dir)
  }

  private def statsPq(dir: String, imbalanceWarn: Double = 4.0,
      appendedWarn: Double = 0.5): (Long, Double, Double, Boolean) = {
    val r = Similarity.ivfPqDriftStats(spark, dir, imbalanceWarn, appendedWarn)
      .collect().head
    (r.getAs[Long]("occupied_rows"), r.getAs[Double]("occ_imbalance"),
      r.getAs[Double]("appended_mass_fraction"), r.getAs[Boolean]("drift_warn"))
  }

  test("compaction never INVENTS a trained size: a pre-meta (legacy) " +
      "store reads trained_known=false before AND after the fold — " +
      "stamping the folded total would read appended 0.0 and permanently " +
      "launder accumulated drift") {
    val dir = Files.createTempDirectory("graft_ivf_legacy").toString
    try {
      Similarity.ivfWriteIndex(toDf(axisVecs(160, id => (id % nCells).toInt)),
        "embedding", "vec_id", dir, centroids = Some(cents))
      // simulate a store written before the trained-rows meta existed
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.getFileName.toString == "_graft_trained.json")
        .toList.foreach(java.nio.file.Files.delete)
      def trainedKnown(): Boolean = Similarity.ivfDriftStats(spark, dir)
        .collect().head.getAs[Boolean]("trained_known")
      assert(!trainedKnown(), "meta deleted, trained size must read unknown")
      // accumulate real drift, then fold — the fold must carry 'unknown',
      // never stamp the folded total as the trained size
      Similarity.ivfAppendToStored(spark, dir,
        toDf(axisVecs(160, _ => 0, idFrom = 1000L)), "embedding", "vec_id")
      Similarity.ivfCompactStored(spark, dir)
      val r = Similarity.ivfDriftStats(spark, dir).collect().head
      assert(!r.getAs[Boolean]("trained_known"))
      assert(r.getAs[Double]("appended_mass_fraction") == 0.0)
      // the occupancy signal still works blind: the skew warning fires
      assert(r.getAs[Double]("occ_imbalance") == 8.5 &&
        r.getAs[Boolean]("drift_warn"))
      // a fresh bootstrap (rebuild) restores the known trained size
      Similarity.ivfWriteIndex(toDf(axisVecs(160, id => (id % nCells).toInt)),
        "embedding", "vec_id", dir, centroids = Some(cents))
      assert(trainedKnown())
    } finally BatchState.deleteDir(dir)
  }
}
