package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.batch.{BatchState, SegmentedStore}

/** Stored IVF-PQ tier laws (round 17): PQ-coded residuals partitioned by
  * frozen coarse cell under the shared segment machinery — FAISS's IVFADC
  * layout on disk —
  *
  *  - full-probe stored serve ≡ the in-memory same-model path exactly
  *    (identical codes → identical ADC ranks → identical exact re-rank);
  *  - the probe-pruned read touches ONLY the probed `cid=` partitions
  *    (parquet partition pruning — the tier's 100 TB lever) and equals
  *    the full read filtered to those cells;
  *  - appends encode against the FROZEN stored model and equal a
  *    bootstrap over the union with the same model;
  *  - takedown/covers/compaction inherit the codes-store contracts
  *    (victims never surface; re-append re-serves; compaction folds
  *    physically, carries the model — centroids AND codebooks — and
  *    flips atomically under a racing reader);
  *  - replay-guarded appends are idempotent;
  *  - a pretrained-model bootstrap over an EMPTY corpus serves the
  *    canonical empty frame and accepts its first append.
  */
class IvfPqStoredSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dim = 16
  private def vecs: Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(13)
    Seq.tabulate(120)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
  }
  private def query: Array[Double] = vecs(7)._2
  private def withNeedle: Seq[(Long, Array[Double])] =
    vecs :+ (500L -> query.clone())

  private def topIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq

  private def writeIdx(df: org.apache.spark.sql.DataFrame, dir: String,
      model: Option[(Array[Array[Double]], Array[Array[Array[Double]]])] = None): Unit =
    Similarity.ivfPqWriteIndex(df, "embedding", "vec_id", dir, dim = dim,
      nCentroids = 8, m = 4, c = 8, model = model)

  private def modelEq(a: (Array[Array[Double]], Array[Array[Array[Double]]]),
      b: (Array[Array[Double]], Array[Array[Array[Double]]])): Boolean =
    a._1.map(_.toSeq).toSeq == b._1.map(_.toSeq).toSeq &&
      a._2.map(_.map(_.toSeq).toSeq).toSeq == b._2.map(_.map(_.toSeq).toSeq).toSeq

  test("full-probe stored serve equals the in-memory same-model path " +
      "exactly; pruned serve surfaces the planted self-hit first") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivfpq_store").toString
    try {
      writeIdx(df, dir)
      val (cents, books) = Similarity.readIvfPqModel(spark, dir)
      val stored = Similarity.ivfPqTopKStored(spark, dir, df, "embedding",
        "vec_id", query, k = 10, nProbe = 8).collect().toSeq
      val mem = Similarity.ivfPqTopKWithModel(df, "embedding", "vec_id",
        query, k = 10, cents, books, nProbe = 8).collect().toSeq
      assert(stored.map(r => (r.getLong(0), r.getDouble(1)))
        == mem.map(r => (r.getLong(0), r.getDouble(1))),
        s"stored $stored != in-memory same-model $mem")
      // pruned: the query IS vector 7/500, so its own cell is probe #1 —
      // the self-hit must surface at rank 1 with cosine 1.0 after the
      // exact re-rank (id 7 wins the tie with 500 on the smaller id)
      val pruned = Similarity.ivfPqTopKStored(spark, dir, df, "embedding",
        "vec_id", query, k = 10, nProbe = 2).collect()
      assert(pruned.nonEmpty && pruned.length <= 10)
      assert(pruned.head.getLong(0) == 7L && pruned.head.getDouble(1) == 1.0,
        pruned.head)
    } finally BatchState.deleteDir(dir)
  }

  test("probe-pruned read touches ONLY the probed cid partitions and " +
      "equals the full read filtered to them") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivfpq_prune").toString
    try {
      writeIdx(df, dir)
      val (cents, _) = Similarity.readIvfPqModel(spark, dir)
      val probes = Similarity.ivfProbeCids(query, cents, nProbe = 2)
      val pruned = Similarity.readIvfPqIndex(spark, dir, probeCids = Some(probes))
      // partition-pruning law: every codes file ACTUALLY read is inside a
      // probed cell's partition dir (input_file_name observes the
      // post-pruning scan)
      val codeFiles = pruned.select(input_file_name().as("f"))
        .distinct().collect().map(_.getString(0)).filter(_.contains("/ivfpq/"))
      assert(codeFiles.nonEmpty)
      codeFiles.foreach { f =>
        assert(probes.exists(p => f.contains(s"/cid=$p/")),
          s"pruned scan read an unprobed partition: $f (probes=$probes)")
      }
      val expect = Similarity.readIvfPqIndex(spark, dir)
        .where(col("cid").isin(probes.map(Int.box): _*))
        .select("vec_id").as[Long].collect().sorted.toSeq
      val got = pruned.select("vec_id").as[Long].collect().sorted.toSeq
      assert(got == expect)
    } finally BatchState.deleteDir(dir)
  }

  test("append encodes against the FROZEN model: codes equal a bootstrap " +
      "over the union with the same model; model unchanged; replayed " +
      "batchId is a no-op") {
    val s = spark; import s.implicits._
    val base = vecs.toDF("vec_id", "embedding")
    val extra = Seq((600L, query.clone()), (601L, vecs(3)._2.map(_ + 0.01)))
    val dirA = Files.createTempDirectory("graft_ivfpq_app_a").toString
    val dirB = Files.createTempDirectory("graft_ivfpq_app_b").toString
    try {
      writeIdx(base, dirA)
      val model = Similarity.readIvfPqModel(spark, dirA)
      Similarity.ivfPqAppendToStored(spark, dirA,
        extra.toDF("vec_id", "embedding"), "embedding", "vec_id",
        batchId = Some(0L))
      assert(modelEq(Similarity.readIvfPqModel(spark, dirA), model),
        "append must not touch the model")
      // replay: same batchId re-delivered — commit log unchanged
      val segsBefore = SegmentedStore.committedSegs(dirA)
      Similarity.ivfPqAppendToStored(spark, dirA,
        extra.toDF("vec_id", "embedding"), "embedding", "vec_id",
        batchId = Some(0L))
      assert(SegmentedStore.committedSegs(dirA) == segsBefore)
      // union bootstrap with the SAME frozen model
      writeIdx(base.unionByName(extra.toDF("vec_id", "embedding")), dirB,
        model = Some(model))
      def rows(d: String) = Similarity.readIvfPqIndex(spark, d)
        .select(col("vec_id"), col("cid"), col("codes"))
        .as[(Long, Int, Seq[Int])].collect().sortBy(_._1).toSeq
      assert(rows(dirA) == rows(dirB),
        "append-assembled codes diverge from the union bootstrap")
      val union = base.unionByName(extra.toDF("vec_id", "embedding"))
      val sa = topIds(Similarity.ivfPqTopKStored(spark, dirA, union,
        "embedding", "vec_id", query, k = 10, nProbe = 8))
      val sb = topIds(Similarity.ivfPqTopKStored(spark, dirB, union,
        "embedding", "vec_id", query, k = 10, nProbe = 8))
      assert(sa == sb)
    } finally { BatchState.deleteDir(dirA); BatchState.deleteDir(dirB) }
  }

  test("takedown: victims never surface; re-append re-serves immediately " +
      "(coverage semantics); compaction folds physically, carries the " +
      "model, cadence guard fires over the threshold") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivfpq_del").toString
    try {
      writeIdx(df, dir)
      val model = Similarity.readIvfPqModel(spark, dir)
      Similarity.ivfPqDeleteFromStored(spark, dir, Seq(7L, 9L).toDF("vec_id"))
      val served = topIds(Similarity.ivfPqTopKStored(spark, dir, df,
        "embedding", "vec_id", query, k = 10, nProbe = 8))
      assert(!served.contains(7L) && !served.contains(9L) &&
        served.head == 500L, served)
      // re-append one victim: the delete's coverage excludes the new
      // segment, so it serves again with no compaction
      Similarity.ivfPqAppendToStored(spark, dir,
        Seq((7L, vecs(7)._2)).toDF("vec_id", "embedding"), "embedding", "vec_id")
      val reAppended = topIds(Similarity.ivfPqTopKStored(spark, dir, df,
        "embedding", "vec_id", query, k = 10, nProbe = 8))
      assert(reAppended.contains(7L) && !reAppended.contains(9L), reAppended)
      // fragment past the cadence threshold, then let the guard fold
      (0 until 3).foreach { i =>
        Similarity.ivfPqAppendToStored(spark, dir,
          Seq((700L + i, vecs(i)._2.map(_ + 0.02))).toDF("vec_id", "embedding"),
          "embedding", "vec_id")
      }
      assert(!Similarity.ivfPqCompactIfFragmented(spark, dir, maxSegments = 16))
      assert(Similarity.ivfPqCompactIfFragmented(spark, dir, maxSegments = 2))
      assert(SegmentedStore.committedSegs(dir).size == 1)
      assert(modelEq(Similarity.readIvfPqModel(spark, dir), model),
        "compaction must carry the model over")
      // physical fold: 9L is gone from the raw codes, not just anti-joined
      val rawIds = Similarity.readIvfPqIndex(spark, dir)
        .select("vec_id").as[Long].collect().toSet
      assert(!rawIds.contains(9L) && rawIds.contains(7L))
      val after = topIds(Similarity.ivfPqTopKStored(spark, dir, df,
        "embedding", "vec_id", query, k = 10, nProbe = 8))
      assert(after.contains(7L) && !after.contains(9L), after)
    } finally BatchState.deleteDir(dir)
  }

  test("read racing compaction resolves the old or the new segment set, " +
      "never a mix (atomic flip under concurrent serve)") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivfpq_race").toString
    try {
      writeIdx(df, dir)
      val rnd = new scala.util.Random(101)
      Similarity.ivfPqAppendToStored(spark, dir,
        Seq((800L, Array.fill(dim)(rnd.nextGaussian())),
            (801L, Array.fill(dim)(rnd.nextGaussian())))
          .toDF("vec_id", "embedding"), "embedding", "vec_id")
      Similarity.ivfPqDeleteFromStored(spark, dir, Seq(5L).toDF("vec_id"))
      GraphFlipRaceLaw.run(
        read = () => Similarity.readIvfPqIndex(spark, dir),
        compact = () => Similarity.ivfPqCompactStored(spark, dir,
          sweepGraceMs = 3600000L))
    } finally BatchState.deleteDir(dir)
  }

  test("IVF tier: a batch whose embedding dim disagrees with the frozen " +
      "centroids fails LOUDLY at encode (never a silent null-cid " +
      "partition invisible to every probed serve)") {
    val s = spark; import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivf_dimchk").toString
    try {
      Similarity.ivfWriteIndex(df, "embedding", "vec_id", dir, nCentroids = 4)
      val wrongDim = Seq((900L, Array.fill(dim + 3)(0.5)))
        .toDF("vec_id", "embedding")
      val e = intercept[Exception](
        Similarity.ivfAppendToStored(spark, dir, wrongDim, "embedding", "vec_id"))
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("does not match the frozen")),
        s"expected the dim-guard error, got: $e")
      // the failed append committed nothing — the store still serves
      assert(Similarity.readIvfIndex(spark, dir).count() == vecs.size)
    } finally BatchState.deleteDir(dir)
  }

  test("pretrained-model bootstrap over an empty corpus: canonical empty " +
      "read, first append serves; training on empty throws") {
    val s = spark; import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivfpq_empty").toString
    try {
      val model = Similarity.ivfPqTrain(df, "embedding", "vec_id", dim,
        nCentroids = 8, m = 4, c = 8)
      writeIdx(df.limit(0), dir, model = Some(model))
      assert(Similarity.readIvfPqIndex(spark, dir).count() == 0)
      intercept[IllegalArgumentException](
        writeIdx(df.limit(0),
          Files.createTempDirectory("graft_ivfpq_notrain").toString))
      Similarity.ivfPqAppendToStored(spark, dir, df, "embedding", "vec_id",
        batchId = Some(0L))
      val served = topIds(Similarity.ivfPqTopKStored(spark, dir, df,
        "embedding", "vec_id", query, k = 5, nProbe = 8))
      assert(served.head == 7L, served)
    } finally BatchState.deleteDir(dir)
  }
}
