package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Laws for the opt-in graph-tier wear repair (round 20, r19 verdict #1
  * — mirroring IvfDriftRepairSpec's discipline on the codes tiers): a
  * wear-tripped cadence with `compactOnWear` set runs the locked
  * compaction; without it the cadence only warns; the gate is
  * tombstone_fraction ALONE (compaction resets it to exactly 0, so the
  * trigger is self-limiting — the anti-thrash law below); and shard
  * imbalance never triggers (a rebuild re-shards by the same id hash,
  * so a skewed id population would thrash nightly O(index) rebuilds).
  */
class NswWearRepairSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vec(seed: Int): Seq[Double] =
    Seq.tabulate(8)(d => math.sin(seed * 0.9 + d * 1.7))

  private def corpus(n: Int, from: Int = 0) = {
    val s = spark; import s.implicits._
    (from until from + n).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
  }

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_wear_$tag").toString

  private def snap(path: String) = {
    val r = Similarity.graphHealthStats(spark, path).collect().head
    (r.getAs[Long]("live_rows"), r.getAs[Long]("tombstone_rows"),
      r.getAs[Double]("tombstone_fraction"), r.getAs[Boolean]("health_warn"))
  }

  test("worn cadence with the flag folds; without it only warns (nsw)") {
    val s = spark; import s.implicits._
    val dir = tmp("flag")
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(corpus(100), "embedding", "vec_id"), dir)
      Similarity.nswDeleteFromStored(spark, dir, (0L until 30L).toDF("vec_id"))
      val (_, tomb1, frac1, warn1) = snap(dir)
      assert(tomb1 === 30L && frac1 === 0.3 && warn1, "plant failed")
      // default OFF: the cadence warns (stderr) but must not touch the store
      assert(!Similarity.nswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", maxSegments = 8))
      assert(snap(dir)._2 === 30L, "flag-off cadence mutated the store")
      // flag ON: tombstone mass past threshold -> the locked fold runs
      assert(Similarity.nswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", maxSegments = 8, compactOnWear = true))
      val (live2, tomb2, frac2, warn2) = snap(dir)
      assert(live2 === 70L && tomb2 === 0L && frac2 === 0.0 && !warn2,
        "fold must sweep the marks and reset the stats")
      // the folded store serves the retained rows only
      assert(Similarity.readNswIndex(spark, dir).count() === 70L)
      // anti-thrash / idempotence: the reset fraction cannot re-trip
      assert(!Similarity.nswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", maxSegments = 8, compactOnWear = true))
      assert(snap(dir)._1 === 70L)
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("under-threshold tombstone mass never triggers the flagged fold") {
    val s = spark; import s.implicits._
    val dir = tmp("under")
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(corpus(100), "embedding", "vec_id"), dir)
      Similarity.nswDeleteFromStored(spark, dir, (0L until 10L).toDF("vec_id"))
      assert(snap(dir)._3 === 0.1)
      assert(!Similarity.nswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", maxSegments = 8, compactOnWear = true))
      assert(snap(dir)._2 === 10L, "under-threshold cadence mutated the store")
      // a tighter explicit threshold DOES trigger on the same store
      assert(Similarity.nswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", maxSegments = 8, compactOnWear = true,
        tombstoneWarn = 0.05))
      assert(snap(dir)._2 === 0L)
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("the count guard wins when both trip (one fold, not two)") {
    val s = spark; import s.implicits._
    val dir = tmp("both")
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(corpus(60), "embedding", "vec_id"), dir)
      // fragment past the count threshold AND plant tombstone mass
      (0 until 4).foreach(b => Similarity.nswAppendToStored(spark, dir,
        corpus(5, from = 1000 + 10 * b), "embedding", "vec_id"))
      Similarity.nswDeleteFromStored(spark, dir, (0L until 20L).toDF("vec_id"))
      assert(graft.batch.SegmentedStore.committedSegs(dir).length > 3)
      assert(Similarity.nswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", maxSegments = 3, compactOnWear = true))
      val (live, tomb, frac, warn) = snap(dir)
      assert(live === 60L && tomb === 0L && frac === 0.0 && !warn)
      assert(graft.batch.SegmentedStore.committedSegs(dir).length === 1)
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("the hierarchical tier shares the repair (hnsw)") {
    val s = spark; import s.implicits._
    val dir = tmp("hnsw")
    try {
      Similarity.hnswWriteIndex(
        Similarity.hnswBuild(corpus(60), "embedding", "vec_id"), dir)
      Similarity.hnswDeleteFromStored(spark, dir, (0L until 20L).toDF("vec_id"))
      assert(snap(dir)._4, "plant must warn")
      assert(!Similarity.hnswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", maxSegments = 8))
      assert(snap(dir)._2 === 20L)
      assert(Similarity.hnswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", maxSegments = 8, compactOnWear = true))
      val (live, tomb, frac, warn) = snap(dir)
      assert(live === 40L && tomb === 0L && frac === 0.0 && !warn)
      // the rebuilt store still holds the hierarchical layout
      assert(Similarity.readHnswIndex(spark, dir).columns.contains("layer_nbrs"))
    } finally graft.batch.BatchState.deleteDir(dir)
  }
}
