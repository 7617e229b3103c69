package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Laws for the opt-in drift repair (round 19, r18 verdict #5): a
  * drift-tripped cadence with `rebuildOnDrift` set re-trains from the
  * float corpus under the writer lease; without it the cadence only
  * warns; and the rebuild fires only when BOTH signals exceed threshold
  * — the AND is what keeps a genuinely crowded corpus from thrashing
  * rebuilds every cadence (appended mass resets to 0 on rebuild, so the
  * conjunction can no longer hold).
  */
class IvfDriftRepairSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vec(seed: Int): Seq[Double] =
    Seq.tabulate(16)(d => math.sin(seed * 0.61 + d * 1.31))

  private def corpus(n: Int, from: Int = 0) = {
    val s = spark; import s.implicits._
    (from until from + n).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
  }

  /** Skewed append: every vector one fixed direction — frozen-centroid
    * assignment lands them all in ONE cell (the q_ivf_drift plant).
    */
  private def skew(n: Int, from: Int) = {
    val s = spark; import s.implicits._
    val d = Seq.tabulate(16)(i => math.cos(i / 3.0))
    (from until from + n).map(i => (i.toLong, d)).toDF("vec_id", "embedding")
  }

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_repair_$tag").toString

  private def drift(path: String, appendedWarn: Double = 0.25) = {
    val r = Similarity.ivfDriftStats(spark, path, imbalanceWarn = 4.0,
      appendedWarn = appendedWarn).collect().head
    (r.getAs[Double]("occ_imbalance"),
      r.getAs[Double]("appended_mass_fraction"),
      r.getAs[Boolean]("trained_known"), r.getAs[Boolean]("drift_warn"))
  }

  test("drift-tripped cadence with the flag rebuilds; without it only warns") {
    val dir = tmp("flag")
    try {
      val base = corpus(200).localCheckpoint(true)
      Similarity.ivfWriteIndex(base, "embedding", "vec_id", dir, nCentroids = 16)
      val grown = skew(100, from = 5000).localCheckpoint(true)
      Similarity.ivfAppendToStored(spark, dir, grown, "embedding", "vec_id")
      val (imb1, frac1, _, warn1) = drift(dir)
      assert(imb1 > 4.0 && frac1 > 0.25 && warn1, s"plant failed: $imb1 $frac1")
      // default OFF: the cadence warns but must not touch the store
      assert(!Similarity.ivfCompactIfFragmented(spark, dir,
        appendedWarn = 0.25))
      val (imb2, frac2, _, _) = drift(dir)
      assert(imb2 === imb1 && frac2 === frac1, "flag-off cadence mutated the store")
      // flag ON: both signals exceed threshold -> re-train and replace
      val live = base.unionByName(grown).localCheckpoint(true)
      assert(Similarity.ivfCompactIfFragmented(spark, dir,
        rebuildOnDrift = Some(live), appendedWarn = 0.25))
      val (_, frac3, known3, _) = drift(dir)
      assert(frac3 === 0.0, "rebuild must reset appended mass")
      assert(known3, "rebuild must re-stamp trained_rows")
      // the rebuilt store serves the full live corpus
      assert(Similarity.readIvfIndex(spark, dir).count() === 300L)
      // second flagged cadence: appended is 0, the AND fails, no thrash
      assert(!Similarity.ivfCompactIfFragmented(spark, dir,
        rebuildOnDrift = Some(live), appendedWarn = 0.25))
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("one tripped signal is not enough (the AND law)") {
    val dir = tmp("and")
    try {
      val base = corpus(200).localCheckpoint(true)
      Similarity.ivfWriteIndex(base, "embedding", "vec_id", dir, nCentroids = 16)
      val grown = skew(100, from = 5000).localCheckpoint(true)
      Similarity.ivfAppendToStored(spark, dir, grown, "embedding", "vec_id")
      val live = base.unionByName(grown).localCheckpoint(true)
      // imbalance trips, appended cannot (threshold 2.0 is unreachable)
      assert(!Similarity.ivfCompactIfFragmented(spark, dir,
        rebuildOnDrift = Some(live), appendedWarn = 2.0))
      // appended trips, imbalance cannot (threshold enormous)
      assert(!Similarity.ivfCompactIfFragmented(spark, dir,
        rebuildOnDrift = Some(live), imbalanceWarn = 1e9,
        appendedWarn = 0.25))
      assert(drift(dir)._2 > 0.25, "store must be untouched")
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("the IVF-PQ guard repairs with the model's own (dim, m, c) shape") {
    val dir = tmp("pq")
    try {
      val base = corpus(200).localCheckpoint(true)
      Similarity.ivfPqWriteIndex(base, "embedding", "vec_id", dir,
        dim = 16, nCentroids = 16, m = 4, c = 8)
      Similarity.ivfPqAppendToStored(spark, dir, skew(100, from = 5000),
        "embedding", "vec_id")
      val live = base.unionByName(skew(100, from = 5000)).localCheckpoint(true)
      assert(Similarity.ivfPqCompactIfFragmented(spark, dir,
        rebuildOnDrift = Some(live), appendedWarn = 0.25))
      val r = Similarity.ivfPqDriftStats(spark, dir).collect().head
      assert(r.getAs[Double]("appended_mass_fraction") === 0.0)
      assert(r.getAs[Boolean]("trained_known"))
      val (cents, books) = Similarity.readIvfPqModel(spark, dir)
      assert(cents.head.length === 16)
      assert(books.length === 4 && books.head.length === 8)
    } finally graft.batch.BatchState.deleteDir(dir)
  }
}
