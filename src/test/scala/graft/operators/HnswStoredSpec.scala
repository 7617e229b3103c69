package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.batch.{BatchState, SegmentedStore}

/** Stored HIERARCHICAL graph tier laws (round 16): the
  * [[Similarity.hnswBuild]] (id, vec, layer_nbrs) frame under the same
  * segment machinery as the flat tier — write/read/takedown are
  * schema-generic delegates, append persists an O(|batch|·m) delta via
  * the hierarchical insert-replay, compaction rebuilds the hierarchy:
  *
  *  - write → read round-trips the hierarchical search exactly;
  *  - a stored takedown gates results while tombstoned nodes keep
  *    routing, INCLUDING as upper-layer waypoints;
  *  - append is a graphdelta segment of only the touched rows, the LWW
  *    reassembly equals the in-memory hierarchical insert exactly;
  *  - compaction folds deltas + marks physically;
  *  - codes-only stored hierarchies serve gated ADC search but refuse
  *    append/compact loudly.
  */
class HnswStoredSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dim = 16
  private def vecs: Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(11)
    Seq.tabulate(120)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
  }
  // the query IS vector 7 — an exact copy planted as id 500
  private def query: Array[Double] = vecs(7)._2
  private def withNeedle: Seq[(Long, Array[Double])] =
    vecs :+ (500L -> query.clone())

  private def topIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSeq

  test("hnswWriteIndex → readHnswIndex round-trips the hierarchical " +
      "search exactly") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val index = Similarity.hnswBuild(df, "embedding", "vec_id", nParts = 2)
    val dir = Files.createTempDirectory("graft_hnsw_store").toString
    try {
      Similarity.hnswWriteIndex(index, dir)
      val mem = topIds(Similarity.hnswSearchBuilt(index, "embedding", "vec_id",
        query, k = 10, nParts = 2))
      val stored = topIds(Similarity.hnswSearchBuilt(
        Similarity.readHnswIndex(spark, dir), "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(stored == mem)
      assert(stored.take(2).toSet == Set(7L, 500L), stored)
    } finally BatchState.deleteDir(dir)
  }

  test("stored takedown: one tiny mark segment; retained copy serves, " +
      "revoked ids never surface; deleted nodes still route (waypoints " +
      "included at every layer)") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_hnsw_del").toString
    try {
      Similarity.hnswWriteIndex(
        Similarity.hnswBuild(df, "embedding", "vec_id", nParts = 2), dir)
      val before = SegmentedStore.committedSegs(dir)
      Similarity.hnswDeleteFromStored(spark, dir,
        Seq(7L, 9L, 23L).toDF("vec_id"))
      val segs = SegmentedStore.committedSegs(dir)
      assert(segs.size == before.size + 1, s"$before -> $segs")
      assert(!graft.batch.StoreFs.exists(
        s"${SegmentedStore.segDir(dir, segs.max)}/graph"))
      val got = topIds(Similarity.hnswSearchBuilt(
        Similarity.readHnswIndex(spark, dir), "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(got.head == 500L, got)       // the retained exact copy
      assert(!got.exists(Set(7L, 9L, 23L)), got)
      assert(got.size == 10, got)         // routing intact: full k served
    } finally BatchState.deleteDir(dir)
  }

  test("append is a graphdelta segment of only the touched rows; LWW " +
      "reassembly equals the in-memory hierarchical insert; marks survive") {
    val s = spark; import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_hnsw_app").toString
    try {
      val built = Similarity.hnswBuild(df, "embedding", "vec_id", nParts = 2)
        .localCheckpoint(true)
      Similarity.hnswWriteIndex(built, dir)
      Similarity.hnswDeleteFromStored(spark, dir, Seq(7L).toDF("vec_id"))
      val before = SegmentedStore.committedSegs(dir)
      val batch = Seq((500L, query.toSeq)).toDF("vec_id", "embedding")
      Similarity.hnswAppendToStored(spark, dir, batch,
        "embedding", "vec_id", nParts = 2, m = 8)
      val segs = SegmentedStore.committedSegs(dir)
      assert(segs.size == before.size + 1, s"$before -> $segs")
      val newSeg = SegmentedStore.segDir(dir, segs.max)
      assert(!graft.batch.StoreFs.exists(s"$newSeg/graph"),
        "append rewrote the graph payload")
      assert(graft.batch.StoreFs.hasParquetFiles(s"$newSeg/graphdelta"))
      // O(|batch|·m): each new node links ≤ m per layer over ≤ 13 levels;
      // for a 1-row batch that bounds the delta far below the 120-row index
      val deltaRows = spark.read.parquet(s"$newSeg/graphdelta").count()
      assert(deltaRows <= 1L * (8 * 13 + 1) && deltaRows < 120,
        s"delta is not O(|batch|·m): $deltaRows rows for a 1-row batch")
      // LWW reassembly ≡ the in-memory hierarchical insert over the same base
      val mem = Similarity.hnswInsertAgainst(built, batch,
        "embedding", "vec_id", nParts = 2, m = 8)
      val stored = Similarity.readHnswIndex(spark, dir)
        .where(!col("nsw_deleted"))
        .select("vec_id", "embedding", "layer_nbrs")
      val memLive = mem.where(col("vec_id") =!= 7L)
      assert(stored.except(memLive).isEmpty && memLive.except(stored).isEmpty,
        "reassembled hierarchy differs from the in-memory insert")
      val got = topIds(Similarity.hnswSearchBuilt(
        Similarity.readHnswIndex(spark, dir), "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(got.head == 500L, got)   // the appended needle serves
      assert(!got.contains(7L), got)  // the takedown survived the append
      // a deleted id cannot silently re-enter via append
      intercept[org.apache.spark.SparkException](
        Similarity.hnswAppendToStored(spark, dir,
          Seq((7L, query.toSeq)).toDF("vec_id", "embedding"),
          "embedding", "vec_id", nParts = 2))
    } finally BatchState.deleteDir(dir)
  }

  test("compaction folds deltas + marks physically; append-only ids make " +
      "the folded index equal a fresh hierarchical build; " +
      "hnswCompactIfFragmented is the cadence hook") {
    val s = spark; import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_hnsw_cmp").toString
    try {
      Similarity.hnswWriteIndex(
        Similarity.hnswBuild(df, "embedding", "vec_id", nParts = 2), dir)
      Similarity.hnswAppendToStored(spark, dir,
        Seq((500L, query.toSeq)).toDF("vec_id", "embedding"),
        "embedding", "vec_id", nParts = 2)
      Similarity.hnswDeleteFromStored(spark, dir, Seq(7L).toDF("vec_id"))
      assert(SegmentedStore.committedSegs(dir).size == 3)
      assert(!Similarity.hnswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", nParts = 2, maxSegments = 8), "folded below threshold")
      assert(Similarity.hnswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", nParts = 2, maxSegments = 2))
      assert(SegmentedStore.committedSegs(dir).size == 1)
      val idx = Similarity.readHnswIndex(spark, dir).localCheckpoint(true)
      assert(!idx.columns.contains("nsw_deleted") ||
        idx.where(col("nsw_deleted")).isEmpty, "marks not folded")
      assert(idx.count() == vecs.size) // +1 appended, -1 revoked
      // physical fold == a fresh hierarchical build over the retained rows
      val want = Similarity.hnswBuild(
        vecs.filterNot(_._1 == 7L).:+(500L -> query)
          .toDF("vec_id", "embedding"), "embedding", "vec_id", nParts = 2)
      assert(idx.except(want).isEmpty && want.except(idx).isEmpty,
        "folded hierarchy differs from the fresh build")
    } finally BatchState.deleteDir(dir)
  }

  test("codes-only stored hierarchy: takedown marks apply through " +
      "hnswSearchCoded; append/compact refuse loudly") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(df, "embedding", "vec_id",
      dim = dim, m = 4, c = 8)
    val coded = Similarity.hnswEncodeIndex(
      Similarity.hnswBuild(df, "embedding", "vec_id", nParts = 2),
      "embedding", "vec_id", books)
    val dir = Files.createTempDirectory("graft_hnsw_coded").toString
    try {
      Similarity.hnswWriteIndex(coded, dir)
      Similarity.hnswDeleteFromStored(spark, dir, Seq(7L).toDF("vec_id"))
      val got = topIds(Similarity.hnswSearchCoded(
        Similarity.readHnswIndex(spark, dir), "vec_id", books, query,
        k = 10, nParts = 2))
      assert(got.contains(500L) && !got.contains(7L), got)
      intercept[IllegalArgumentException](
        Similarity.hnswAppendToStored(spark, dir,
          Seq((600L, query.toSeq)).toDF("vec_id", "embedding"),
          "embedding", "vec_id", nParts = 2))
      intercept[IllegalArgumentException](
        Similarity.hnswCompactStored(spark, dir, "embedding", "vec_id",
          nParts = 2))
    } finally BatchState.deleteDir(dir)
  }

  test("read racing compaction resolves the old or the new segment set, " +
      "never a mix (atomic flip under concurrent serve)") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_hnsw_race").toString
    try {
      Similarity.hnswWriteIndex(
        Similarity.hnswBuild(df, "embedding", "vec_id", nParts = 2), dir)
      val rnd = new scala.util.Random(99)
      Similarity.hnswAppendToStored(spark, dir,
        Seq((600L, Array.fill(dim)(rnd.nextGaussian())),
            (601L, Array.fill(dim)(rnd.nextGaussian())))
          .toDF("vec_id", "embedding"),
        "embedding", "vec_id", nParts = 2)
      Similarity.hnswDeleteFromStored(spark, dir, Seq(5L).toDF("vec_id"))
      GraphFlipRaceLaw.run(
        read = () => Similarity.readHnswIndex(spark, dir),
        compact = () => Similarity.hnswCompactStored(spark, dir,
          "embedding", "vec_id", nParts = 2, sweepGraceMs = 3600000L))
    } finally BatchState.deleteDir(dir)
  }
}
