package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Laws for the round-19 auto IVF geometry (r18 verdict #3): the build
  * verbs default nCentroids to IvfCellsAuto, which resolves to
  * suggestedIvfCells(corpus rows) on the training path — and the auto
  * build must equal the explicit call BIT-FOR-BIT (same centroid table,
  * same codes), because "auto" is a default, not a different algorithm.
  */
class IvfAutoGeometrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(n: Int) = {
    val s = spark; import s.implicits._
    (0 until n).map(i =>
        (i.toLong, Seq.tabulate(16)(d => math.sin(i * 0.37 + d * 1.1))))
      .toDF("vec_id", "embedding")
  }

  private def tmpDir(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_autogeo_$tag").toString

  test("suggestedIvfCells: min(4*sqrt(N), N/768), power of two, clamped") {
    assert(Similarity.suggestedIvfCells(0) === 16)
    // the rows-per-cell floor rules small corpora (N/768 < 4*sqrt(N)
    // below ~9.4M rows)
    assert(Similarity.suggestedIvfCells(100) === 16)
    assert(Similarity.suggestedIvfCells(2000) === 16)
    assert(Similarity.suggestedIvfCells(200000) === 256)  // 200k/768=260
    // the sqrt term rules at scale: 4*sqrt(1e9)=126491 -> ceiling clamp
    assert(Similarity.suggestedIvfCells(1000000000L) === 65536)
    assert(Similarity.suggestedIvfCells(Long.MaxValue) === 65536)
    for (n <- Seq(10L, 1000L, 100000L, 10000000L, 1000000000L)) {
      val c = Similarity.suggestedIvfCells(n)
      assert(Integer.bitCount(c) === 1, s"$c not a power of two")
      assert(c >= 16 && c <= 65536)
      // the floor's point: a suggested geometry never shreds the corpus
      // into cells too small to amortize their partition overhead
      assert(n / c >= 256 || c === 16, s"n=$n c=$c under-filled cells")
    }
  }

  test("auto ivfWriteIndex equals the explicit suggestedIvfCells call bit-for-bit") {
    val df = corpus(400).localCheckpoint(true)
    val auto = tmpDir("ivf_auto"); val expl = tmpDir("ivf_expl")
    try {
      Similarity.ivfWriteIndex(df, "embedding", "vec_id", auto)
      Similarity.ivfWriteIndex(df, "embedding", "vec_id", expl,
        nCentroids = Similarity.suggestedIvfCells(400))
      val ca = Similarity.readIvfCentroids(spark, auto)
      val ce = Similarity.readIvfCentroids(spark, expl)
      assert(ca.length === Similarity.suggestedIvfCells(400))
      assert(ca.map(_.toSeq).toSeq === ce.map(_.toSeq).toSeq)
      val ia = Similarity.readIvfIndex(spark, auto)
        .select("vec_id", "cid", "codes", "scale")
      val ie = Similarity.readIvfIndex(spark, expl)
        .select("vec_id", "cid", "codes", "scale")
      assert(ia.exceptAll(ie).count() === 0)
      assert(ie.exceptAll(ia).count() === 0)
    } finally {
      graft.batch.BatchState.deleteDir(auto)
      graft.batch.BatchState.deleteDir(expl)
    }
  }

  test("auto ivfPqTrain equals the explicit call; pretrained bootstrap untouched") {
    val df = corpus(300).localCheckpoint(true)
    val (ca, ba) = Similarity.ivfPqTrain(df, "embedding", "vec_id", dim = 16,
      m = 4, c = 8)
    val (ce, be) = Similarity.ivfPqTrain(df, "embedding", "vec_id", dim = 16,
      nCentroids = Similarity.suggestedIvfCells(300), m = 4, c = 8)
    assert(ca.length === Similarity.suggestedIvfCells(300))
    assert(ca.map(_.toSeq).toSeq === ce.map(_.toSeq).toSeq)
    assert(ba.map(_.map(_.toSeq).toSeq).toSeq === be.map(_.map(_.toSeq).toSeq).toSeq)
    // a pretrained bootstrap's geometry is its model — the resolver must
    // not run (an empty corpus would otherwise count 0 and clamp to 16
    // regardless of the model's cells)
    val boot = tmpDir("ivfpq_boot")
    try {
      Similarity.ivfPqWriteIndex(df.limit(0), "embedding", "vec_id", boot,
        dim = 16, m = 4, c = 8, model = Some((ca, ba)),
        trainedRows = Some(300L))
      val (cb, _) = Similarity.readIvfPqModel(spark, boot)
      assert(cb.length === ca.length)
    } finally graft.batch.BatchState.deleteDir(boot)
  }
}
