package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Laws for the IO side of block-max pruning (round 20, r19 verdict #3):
  * segments persist a per-posting quantized-impact block id (`__blk`) and
  * a tiny per-(token, block) `blockstats` table; the stored serve derives
  * dfs and block bounds from blockstats (no posting scan), reads only the
  * block-floor postings for its θ/bounds machinery (pushed predicate over
  * the (token, __blk)-sorted row groups), and exact-scores survivors in
  * ONE full pruned-bucket scan. Laws: the persisted summaries equal the
  * on-the-fly ones; the IO path is result-identical to the in-memory
  * scorer and the classic stored path (including ties, maxDfFraction,
  * multi-segment stores); deletes fall back without changing results and
  * compaction re-enables the path; and the IO path reads strictly fewer
  * filesystem bytes than the classic five-scan pipeline.
  */
class RetrievalIoPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_ioprune_$tag").toString

  /** Zipf-ish corpus: "the" in every doc (stopword), "mid" in a third,
    * rare per-doc tokens, a few multi-tf docs — the shape where block
    * floors bite.
    */
  private def corpus(n: Int) = {
    val s = spark; import s.implicits._
    (1L to n.toLong).map { i =>
      val rep = if (i % 17 == 0) "the the the" else "the"
      val mid = if (i % 3 == 0) s" mid mid" else ""
      val pad = (1L to (i % 7)).map(j => s"pad${j}").mkString(" ")
      (i, s"$rep$mid rare$i $pad")
    }.toDF("doc_id", "text")
  }

  private def q(rows: (Int, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("query_id", "qtext")
  }

  private def queries = q(
    0 -> "the rare7",
    1 -> "mid rare12 rare13",
    2 -> "the mid",
    3 -> "zzz-nothing",
    4 -> "rare20")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("persisted blockstats equal the on-the-fly block summaries") {
    val dir = tmp("stats")
    try {
      val docs = corpus(120)
      Retrieval.writeIndex(
        Retrieval.buildIndex(docs.where(col("doc_id") <= 80), "text", "doc_id"),
        dir, tokenBuckets = 4)
      Retrieval.appendToStored(spark, dir, tokenBuckets = 4,
        docs.where(col("doc_id") > 80), "text", "doc_id")
      // merged persisted stats across the two segments
      val segs = graft.batch.SegmentedStore.committedSegs(dir)
      val persisted = segs.map(id => spark.read.parquet(
          s"${graft.batch.SegmentedStore.segDir(dir, id)}/blockstats"))
        .reduce(_ unionByName _)
        .groupBy(col("token"), col("__blk"))
        .agg(sum(col("n")).as("n"), max(col("max_tf")).as("max_tf"),
          min(col("min_dl")).as("min_dl"))
      // on-the-fly summaries over the logical index
      val onTheFly = Retrieval.readIndex(spark, dir, "doc_id").postings
        .withColumn("__blk", Retrieval.blkOf(col("tf"), col("dl")))
        .groupBy(col("token"), col("__blk"))
        .agg(count(lit(1)).as("n"), max(col("tf")).as("max_tf"),
          min(col("dl")).as("min_dl"))
      assert(persisted.exceptAll(onTheFly).count() === 0)
      assert(onTheFly.exceptAll(persisted).count() === 0)
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("IO-pruned serve ≡ in-memory bm25TopK ≡ classic stored path") {
    val dir = tmp("eq")
    try {
      val docs = corpus(150)
      val idx = Retrieval.buildIndex(docs, "text", "doc_id")
      Retrieval.writeIndex(idx, dir, tokenBuckets = 4,
        rowGroupBytes = Some(64L * 1024))
      for (k <- Seq(1, 3, 10); frac <- Seq(1.0, 0.3)) {
        val mem = rows(Retrieval.bm25TopK(idx, queries, "qtext", "query_id",
          k, maxDfFraction = frac))
        val io = rows(Retrieval.bm25TopKFromStored(spark, dir, 4, queries,
          "qtext", "query_id", "doc_id", k, maxDfFraction = frac))
        val classic = rows(Retrieval.bm25TopKFromStored(spark, dir, 4,
          queries, "qtext", "query_id", "doc_id", k, maxDfFraction = frac,
          ioPrune = false))
        assert(io === mem, s"io vs mem diverged at k=$k frac=$frac")
        assert(classic === mem, s"classic vs mem diverged at k=$k frac=$frac")
      }
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("exact ties at the k boundary survive the IO path (pure id tie-break)") {
    val s = spark; import s.implicits._
    val dir = tmp("ties")
    try {
      val same = (1L to 8L).map(i => (i, "common words shared by every doc"))
        .toDF("doc_id", "text")
      val idx = Retrieval.buildIndex(same, "text", "doc_id")
      Retrieval.writeIndex(idx, dir, tokenBuckets = 2)
      val io = rows(Retrieval.bm25TopKFromStored(spark, dir, 2,
        q(0 -> "common shared words"), "qtext", "query_id", "doc_id", 3))
      assert(io === rows(Retrieval.bm25TopK(idx, q(0 -> "common shared words"),
        "qtext", "query_id", 3)))
      assert(io.map(t => (t._2, t._4)) === Set((1L, 1), (2L, 2), (3L, 3)))
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("multi-segment stores merge block bounds; appends stay exact") {
    val dir = tmp("segs")
    try {
      val docs = corpus(150)
      Retrieval.writeIndex(
        Retrieval.buildIndex(docs.where(col("doc_id") <= 50), "text", "doc_id"),
        dir, tokenBuckets = 4)
      Retrieval.appendToStored(spark, dir, 4,
        docs.where(col("doc_id") > 50 && col("doc_id") <= 100), "text", "doc_id")
      Retrieval.appendToStored(spark, dir, 4,
        docs.where(col("doc_id") > 100), "text", "doc_id")
      val idx = Retrieval.buildIndex(docs, "text", "doc_id")
      val io = rows(Retrieval.bm25TopKFromStored(spark, dir, 4, queries,
        "qtext", "query_id", "doc_id", 3))
      assert(io === rows(Retrieval.bm25TopK(idx, queries, "qtext",
        "query_id", 3)))
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("deletes fall back to the exact classic path; compaction re-enables") {
    val dir = tmp("del")
    try {
      val docs = corpus(150)
      Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
        dir, tokenBuckets = 4)
      Retrieval.deleteFromStored(spark, dir,
        docs.where(col("doc_id") % 5 === 0).select("doc_id"))
      val retained = Retrieval.buildIndex(
        docs.where(col("doc_id") % 5 =!= 0), "text", "doc_id")
      // with a live delete segment the IO path must fall back (blockstats
      // would overcount dfs) and still serve the exact retained scores
      val served = rows(Retrieval.bm25TopKFromStored(spark, dir, 4, queries,
        "qtext", "query_id", "doc_id", 3))
      assert(served === rows(Retrieval.bm25TopK(retained, queries, "qtext",
        "query_id", 3)))
      // compaction folds the deletes and regenerates blockstats
      Retrieval.compactStored(spark, dir, tokenBuckets = 4)
      val segs = graft.batch.SegmentedStore.committedSegs(dir)
      assert(segs.length === 1)
      assert(graft.batch.SegmentedStore.hasParquetFiles(
        s"${graft.batch.SegmentedStore.segDir(dir, segs.head)}/blockstats"))
      val after = rows(Retrieval.bm25TopKFromStored(spark, dir, 4, queries,
        "qtext", "query_id", "doc_id", 3))
      assert(after === served)
    } finally graft.batch.BatchState.deleteDir(dir)
  }

  test("the IO path reads fewer filesystem bytes than the classic pipeline") {
    val dir = tmp("bytes")
    try {
      // big enough that the stopword's bucket spans several 64 KiB row
      // groups; queries stopword-heavy so the block floor has work to do
      val docs = corpus(4000)
      Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
        dir, tokenBuckets = 4, rowGroupBytes = Some(64L * 1024))
      val qs = q(0 -> "the rare7", 1 -> "the mid rare12")
      def measure(io: Boolean): Long = {
        val before = graft.GateHelpers.fsBytesRead()
        Retrieval.bm25TopKFromStored(spark, dir, 4, qs, "qtext", "query_id",
          "doc_id", 3, ioPrune = io).count()
        graft.GateHelpers.fsBytesRead() - before
      }
      val classic = measure(io = false)
      val pruned = measure(io = true)
      assert(pruned < classic,
        s"IO path read $pruned bytes vs classic $classic")
    } finally graft.batch.BatchState.deleteDir(dir)
  }
}
