package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.batch.{BatchState, SegmentedStore}

/** Stored IVF tier laws (round 17): the int8 codes store partitioned by
  * frozen coarse-centroid cell under the shared segment machinery —
  *
  *  - full-probe serve ≡ the flat int8 path exactly (the candidate space
  *    is the whole codes store);
  *  - the probe-pruned read touches ONLY the probed `cid=` partitions
  *    (parquet partition pruning — the tier's 100 TB lever) and equals
  *    the full read filtered to those cells;
  *  - appends assign against the FROZEN stored centroids and equal a
  *    bootstrap over the union with the same centroids;
  *  - takedown/covers/compaction inherit the codes-store contracts
  *    (victims never surface; re-append re-serves; compaction folds
  *    physically, keeps centroids, and flips atomically under a racing
  *    reader);
  *  - replay-guarded appends are idempotent;
  *  - a pretrained-centroid bootstrap over an EMPTY corpus serves the
  *    canonical empty frame and accepts its first append.
  */
class IvfStoredSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dim = 16
  private def vecs: Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(11)
    Seq.tabulate(120)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
  }
  private def query: Array[Double] = vecs(7)._2
  private def withNeedle: Seq[(Long, Array[Double])] =
    vecs :+ (500L -> query.clone())

  private def topIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq

  test("full-probe stored serve equals the flat int8 path exactly; " +
      "pruned serve finds the planted self-hit first") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivf_store").toString
    try {
      Similarity.ivfWriteIndex(df, "embedding", "vec_id", dir, nCentroids = 8)
      val full = topIds(Similarity.ivfTopKStored(spark, dir, df, "embedding",
        "vec_id", query, k = 10, nProbe = 8))
      val flat = topIds(Similarity.int8TopK(df, "embedding", "vec_id",
        query, k = 10))
      assert(full == flat, s"full-probe $full != int8 $flat")
      // pruned: the query IS vector 7/500, so its own cell is probe #1 —
      // the self-hit must surface at rank 1 with cosine 1.0
      val pruned = Similarity.ivfTopKStored(spark, dir, df, "embedding",
        "vec_id", query, k = 10, nProbe = 2).collect()
      assert(pruned.nonEmpty && pruned.length <= 10)
      assert(Set(7L, 500L).contains(pruned.head.getLong(0)) &&
        pruned.head.getDouble(1) == 1.0, pruned.head)
    } finally BatchState.deleteDir(dir)
  }

  test("probe-pruned read touches ONLY the probed cid partitions and " +
      "equals the full read filtered to them") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivf_prune").toString
    try {
      Similarity.ivfWriteIndex(df, "embedding", "vec_id", dir, nCentroids = 8)
      val cents = Similarity.readIvfCentroids(spark, dir)
      val probes = Similarity.ivfProbeCids(query, cents, nProbe = 2)
      val pruned = Similarity.readIvfIndex(spark, dir, probeCids = Some(probes))
      // partition-pruning law: every codes file ACTUALLY read is inside a
      // probed cell's partition dir. input_file_name() observes the
      // post-pruning scan (DataFrame.inputFiles reports the relation's
      // full file index BEFORE partition pruning — useless here)
      val codeFiles = pruned.select(input_file_name().as("f"))
        .distinct().collect().map(_.getString(0)).filter(_.contains("/ivf/"))
      assert(codeFiles.nonEmpty)
      codeFiles.foreach { f =>
        assert(probes.exists(p => f.contains(s"/cid=$p/")),
          s"pruned scan read an unprobed partition: $f (probes=$probes)")
      }
      // semantic equality with the post-hoc filter on the full read
      val expect = Similarity.readIvfIndex(spark, dir)
        .where(col("cid").isin(probes.map(Int.box): _*))
        .select("vec_id").as[Long].collect().sorted.toSeq
      val got = pruned.select("vec_id").as[Long].collect().sorted.toSeq
      assert(got == expect)
    } finally BatchState.deleteDir(dir)
  }

  test("append assigns against the FROZEN centroids: serve equals a " +
      "bootstrap over the union with the same centroids; centroids " +
      "unchanged; replayed batchId is a no-op") {
    val s = spark; import s.implicits._
    val base = vecs.toDF("vec_id", "embedding")
    val extra = Seq((600L, query.clone()), (601L, vecs(3)._2.map(_ + 0.01)))
    val dirA = Files.createTempDirectory("graft_ivf_app_a").toString
    val dirB = Files.createTempDirectory("graft_ivf_app_b").toString
    try {
      Similarity.ivfWriteIndex(base, "embedding", "vec_id", dirA, nCentroids = 8)
      val cents = Similarity.readIvfCentroids(spark, dirA)
      Similarity.ivfAppendToStored(spark, dirA,
        extra.toDF("vec_id", "embedding"), "embedding", "vec_id",
        batchId = Some(0L))
      assert(Similarity.readIvfCentroids(spark, dirA).map(_.toSeq).toSeq
        == cents.map(_.toSeq).toSeq, "append must not touch the centroids")
      // replay: same batchId re-delivered — commit log and content unchanged
      val segsBefore = SegmentedStore.committedSegs(dirA)
      Similarity.ivfAppendToStored(spark, dirA,
        extra.toDF("vec_id", "embedding"), "embedding", "vec_id",
        batchId = Some(0L))
      assert(SegmentedStore.committedSegs(dirA) == segsBefore)
      // union bootstrap with the SAME frozen centroids
      Similarity.ivfWriteIndex(
        base.unionByName(extra.toDF("vec_id", "embedding")),
        "embedding", "vec_id", dirB, centroids = Some(cents))
      val a = Similarity.readIvfIndex(spark, dirA)
        .select("vec_id", "cid").as[(Long, Int)].collect().sorted.toSeq
      val b = Similarity.readIvfIndex(spark, dirB)
        .select("vec_id", "cid").as[(Long, Int)].collect().sorted.toSeq
      assert(a == b, "append-assembled cells diverge from the union bootstrap")
      val sa = topIds(Similarity.ivfTopKStored(spark, dirA,
        base.unionByName(extra.toDF("vec_id", "embedding")),
        "embedding", "vec_id", query, k = 10, nProbe = 8))
      val sb = topIds(Similarity.ivfTopKStored(spark, dirB,
        base.unionByName(extra.toDF("vec_id", "embedding")),
        "embedding", "vec_id", query, k = 10, nProbe = 8))
      assert(sa == sb)
    } finally { BatchState.deleteDir(dirA); BatchState.deleteDir(dirB) }
  }

  test("takedown: victims never surface; re-append re-serves immediately " +
      "(coverage semantics); compaction folds physically, keeps " +
      "centroids, cadence guard fires over the threshold") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivf_del").toString
    try {
      Similarity.ivfWriteIndex(df, "embedding", "vec_id", dir, nCentroids = 8)
      val cents = Similarity.readIvfCentroids(spark, dir)
      Similarity.ivfDeleteFromStored(spark, dir, Seq(7L, 9L).toDF("vec_id"))
      val served = topIds(Similarity.ivfTopKStored(spark, dir, df,
        "embedding", "vec_id", query, k = 10, nProbe = 8))
      assert(!served.contains(7L) && !served.contains(9L) &&
        served.head == 500L, served)
      // re-append one victim: the delete's coverage excludes the new
      // segment, so it serves again with no compaction
      Similarity.ivfAppendToStored(spark, dir,
        Seq((7L, vecs(7)._2)).toDF("vec_id", "embedding"), "embedding", "vec_id")
      val reAppended = topIds(Similarity.ivfTopKStored(spark, dir, df,
        "embedding", "vec_id", query, k = 10, nProbe = 8))
      assert(reAppended.contains(7L) && !reAppended.contains(9L), reAppended)
      // fragment past the cadence threshold, then let the guard fold
      (0 until 3).foreach { i =>
        Similarity.ivfAppendToStored(spark, dir,
          Seq((700L + i, vecs(i)._2.map(_ + 0.02))).toDF("vec_id", "embedding"),
          "embedding", "vec_id")
      }
      assert(!Similarity.ivfCompactIfFragmented(spark, dir, maxSegments = 16))
      assert(Similarity.ivfCompactIfFragmented(spark, dir, maxSegments = 2))
      assert(SegmentedStore.committedSegs(dir).size == 1)
      assert(Similarity.readIvfCentroids(spark, dir).map(_.toSeq).toSeq
        == cents.map(_.toSeq).toSeq, "compaction must carry centroids over")
      // physical fold: 9L is gone from the raw codes, not just anti-joined
      val rawIds = Similarity.readIvfIndex(spark, dir)
        .select("vec_id").as[Long].collect().toSet
      assert(!rawIds.contains(9L) && rawIds.contains(7L))
      // post-compaction serve keeps the takedown/re-append semantics
      val after = topIds(Similarity.ivfTopKStored(spark, dir, df,
        "embedding", "vec_id", query, k = 10, nProbe = 8))
      assert(after.contains(7L) && !after.contains(9L), after)
    } finally BatchState.deleteDir(dir)
  }

  test("read racing compaction resolves the old or the new segment set, " +
      "never a mix (atomic flip under concurrent serve)") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivf_race").toString
    try {
      Similarity.ivfWriteIndex(df, "embedding", "vec_id", dir, nCentroids = 8)
      val rnd = new scala.util.Random(99)
      Similarity.ivfAppendToStored(spark, dir,
        Seq((800L, Array.fill(dim)(rnd.nextGaussian())),
            (801L, Array.fill(dim)(rnd.nextGaussian())))
          .toDF("vec_id", "embedding"), "embedding", "vec_id")
      Similarity.ivfDeleteFromStored(spark, dir, Seq(5L).toDF("vec_id"))
      // the IVF row SET is compaction-invariant (the fold changes layout,
      // not content) — the law's file fingerprint is what distinguishes
      // the two legal states here
      GraphFlipRaceLaw.run(
        read = () => Similarity.readIvfIndex(spark, dir),
        compact = () => Similarity.ivfCompactStored(spark, dir,
          sweepGraceMs = 3600000L))
    } finally BatchState.deleteDir(dir)
  }

  test("pretrained-centroid bootstrap over an empty corpus: canonical " +
      "empty read, first append serves") {
    val s = spark; import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivf_empty").toString
    try {
      val cents = Similarity.kmeansCentroids(df, "embedding", "vec_id", 8, 2)
      Similarity.ivfWriteIndex(df.limit(0), "embedding", "vec_id", dir,
        centroids = Some(cents))
      assert(Similarity.readIvfIndex(spark, dir).count() == 0)
      intercept[IllegalArgumentException](
        Similarity.ivfWriteIndex(df.limit(0), "embedding", "vec_id",
          Files.createTempDirectory("graft_ivf_notrain").toString))
      Similarity.ivfAppendToStored(spark, dir, df, "embedding", "vec_id",
        batchId = Some(0L))
      val served = topIds(Similarity.ivfTopKStored(spark, dir, df,
        "embedding", "vec_id", query, k = 5, nProbe = 8))
      assert(served.head == 7L, served)
    } finally BatchState.deleteDir(dir)
  }
}
