package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Laws for the stored graph tiers' health row (round 19, r18 verdict #4
  * — mirroring IvfDriftSpec's discipline on the codes tiers):
  * tombstone-mass fraction and shard imbalance, folded O(segments) from
  * the per-segment graphstats tables the write verbs maintain O(change).
  */
class GraphHealthSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vec(seed: Int): Seq[Double] =
    Seq.tabulate(8)(d => math.sin(seed * 0.9 + d * 1.7))

  private def corpus(n: Int, from: Int = 0) = {
    val s = spark; import s.implicits._
    (from until from + n).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
  }

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_ghealth_$tag").toString

  private def snap(path: String) = {
    val r = Similarity.graphHealthStats(spark, path).collect().head
    (r.getAs[Long]("live_rows"), r.getAs[Long]("tombstone_rows"),
      r.getAs[Double]("tombstone_fraction"),
      r.getAs[Double]("shard_imbalance"),
      r.getAs[Long]("appended_rows"),
      r.getAs[Boolean]("stats_exact"), r.getAs[Boolean]("health_warn"))
  }

  test("fresh build: zero tombstones, balanced shards, no warning") {
    val dir = tmp("fresh")
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(corpus(80), "embedding", "vec_id", nParts = 4),
        dir)
      val (live, tomb, frac, imb, app, exact, warn) = snap(dir)
      assert(live === 80L); assert(tomb === 0L); assert(frac === 0.0)
      assert(imb >= 1.0 && imb < 4.0, s"hash shards should balance: $imb")
      assert(app === 0L); assert(exact); assert(!warn)
      val r = Similarity.graphHealthStats(spark, dir).collect().head
      assert(r.getAs[Int]("n_shards") === 4)
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("takedowns raise the fraction exactly; past threshold the warning trips") {
    val s = spark; import s.implicits._
    val dir = tmp("takedown")
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(corpus(100), "embedding", "vec_id"), dir)
      Similarity.nswDeleteFromStored(spark, dir,
        (0L until 10L).toDF("vec_id"))
      val (live1, tomb1, frac1, _, _, _, warn1) = snap(dir)
      assert(live1 === 90L); assert(tomb1 === 10L); assert(frac1 === 0.1)
      assert(!warn1, "0.1 is under the 0.2 default threshold")
      // idempotence: re-delivering the same takedown adds no mass
      Similarity.nswDeleteFromStored(spark, dir, (0L until 10L).toDF("vec_id"))
      assert(snap(dir)._2 === 10L)
      Similarity.nswDeleteFromStored(spark, dir, (10L until 25L).toDF("vec_id"))
      val (live2, tomb2, frac2, _, _, _, warn2) = snap(dir)
      assert(live2 === 75L); assert(tomb2 === 25L); assert(frac2 === 0.25)
      assert(warn2, "0.25 > 0.2 must warn")
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("appends count live; a mirrored in-column tombstone is never double-counted") {
    val s = spark; import s.implicits._
    val dir = tmp("append")
    try {
      // bootstrap WITH in-column tombstones (an nswDeleteFromBuilt frame)
      val built = Similarity.nswBuild(corpus(50), "embedding", "vec_id")
      val withTombs = Similarity.nswDeleteFromBuilt(built,
        (0L until 5L).toDF("vec_id"))
      Similarity.nswWriteIndex(withTombs, dir)
      val (live0, tomb0, frac0, _, _, _, _) = snap(dir)
      assert(live0 === 45L); assert(tomb0 === 5L); assert(frac0 === 0.1)
      // the append mirrors the 5 in-column tombstones into a mark segment
      // (layout invariant) — the health fold must still count them ONCE
      Similarity.nswAppendToStored(spark, dir, corpus(10, from = 1000),
        "embedding", "vec_id")
      val (live1, tomb1, frac1, _, app1, exact1, _) = snap(dir)
      assert(app1 === 10L)
      assert(live1 === 55L, "45 retained + 10 appended")
      assert(tomb1 === 5L, s"mirror double-counted: $tomb1")
      assert(frac1 === BigDecimal(5.0 / 60.0).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(exact1)
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("compaction clears tombstone mass and re-exacts the shards") {
    val s = spark; import s.implicits._
    val dir = tmp("compact")
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(corpus(100), "embedding", "vec_id"), dir)
      Similarity.nswDeleteFromStored(spark, dir, (0L until 30L).toDF("vec_id"))
      Similarity.nswAppendToStored(spark, dir, corpus(20, from = 2000),
        "embedding", "vec_id")
      assert(snap(dir)._7, "0.3-ish fraction must warn before the fold")
      Similarity.nswCompactStored(spark, dir, "embedding", "vec_id")
      val (live, tomb, frac, imb, app, exact, warn) = snap(dir)
      assert(live === 90L, "70 retained + 20 appended")
      assert(tomb === 0L); assert(frac === 0.0); assert(app === 0L)
      assert(imb >= 1.0 && imb < 4.0); assert(exact); assert(!warn)
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("the hierarchical tier shares the discipline (hnsw lifecycle)") {
    val s = spark; import s.implicits._
    val dir = tmp("hnsw")
    try {
      Similarity.hnswWriteIndex(
        Similarity.hnswBuild(corpus(60), "embedding", "vec_id"), dir)
      Similarity.hnswDeleteFromStored(spark, dir, (0L until 20L).toDF("vec_id"))
      val (live1, tomb1, frac1, _, _, _, warn1) = snap(dir)
      assert(live1 === 40L); assert(tomb1 === 20L)
      assert(frac1 === BigDecimal(20.0 / 60.0).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(warn1)
      Similarity.hnswCompactStored(spark, dir, "embedding", "vec_id")
      val (live2, tomb2, frac2, _, _, _, warn2) = snap(dir)
      assert(live2 === 40L); assert(tomb2 === 0L); assert(frac2 === 0.0)
      assert(!warn2)
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("the cadence guard runs the health row without disturbing the fold decision") {
    val s = spark; import s.implicits._
    val dir = tmp("cadence")
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(corpus(40), "embedding", "vec_id"), dir)
      // under the segment threshold: no fold, but the health check ran
      // (best-effort — the law is it neither throws nor compacts)
      assert(!Similarity.nswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", maxSegments = 8))
      assert(snap(dir)._1 === 40L)
    } finally graft.batch.BatchState.deleteDir(dir)
  }
}
