package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.batch.{BatchState, SegmentedStore}

/** Stored graph-ANN tier laws (round 15): the [[Similarity.nswBuild]]
  * adjacency frame under the segmented commit-log layout, where a
  * takedown is one tiny mark-segment write behind an atomic flip —
  * never an index-sized rewrite — applied at [[Similarity.readNswIndex]]
  * load as an OR-join into `nsw_deleted`:
  *
  *  - write → read round-trips search exactly;
  *  - a stored takedown gates results while tombstoned nodes keep
  *    routing (the in-memory [[Similarity.nswDeleteFromBuilt]] contract);
  *  - marks COMPOSE by OR across segments;
  *  - an APPEND persists only the touched rows as a `graphdelta` segment
  *    (O(|batch|·m) — round 16), read-side last-writer-wins reassembles
  *    the grown graph exactly, and marks survive (in-column tombstones
  *    are mirrored into a mark segment inside the same commit);
  *  - compaction folds deltas + marks physically and re-opens re-add;
  *  - no-op takedowns (never-indexed / already-marked ids) leave the
  *    commit log untouched.
  */
class NswStoredSpec extends AnyFunSuite {
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

  test("nswWriteIndex → readNswIndex round-trips the search exactly") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val index = Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2)
    val dir = Files.createTempDirectory("graft_nsw_store").toString
    try {
      Similarity.nswWriteIndex(index, dir)
      val mem = topIds(Similarity.nswSearchBuilt(index, "embedding", "vec_id",
        query, k = 10, nParts = 2))
      val stored = topIds(Similarity.nswSearchBuilt(
        Similarity.readNswIndex(spark, dir), "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(stored == mem)
      assert(stored.take(2).toSet == Set(7L, 500L), stored)
    } finally BatchState.deleteDir(dir)
  }

  test("stored takedown: one tiny mark segment; retained copy serves, " +
      "revoked ids never surface; deleted nodes still route") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_nsw_del").toString
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2), dir)
      val before = SegmentedStore.committedSegs(dir)
      Similarity.nswDeleteFromStored(spark, dir,
        Seq(7L, 9L, 23L).toDF("vec_id"))
      val segs = SegmentedStore.committedSegs(dir)
      assert(segs.size == before.size + 1, s"$before -> $segs")
      // the graph payload was NOT rewritten (the whole point)
      assert(!graft.batch.StoreFs.exists(
        s"${SegmentedStore.segDir(dir, segs.max)}/graph"))
      val got = topIds(Similarity.nswSearchBuilt(
        Similarity.readNswIndex(spark, dir), "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(got.head == 500L, got)       // the retained exact copy
      assert(!got.exists(Set(7L, 9L, 23L)), got)
      assert(got.size == 10, got)         // routing intact: full k served
    } finally BatchState.deleteDir(dir)
  }

  test("marks compose by OR across segments (two takedowns, both apply)") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_nsw_del2").toString
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2), dir)
      Similarity.nswDeleteFromStored(spark, dir, Seq(7L).toDF("vec_id"))
      Similarity.nswDeleteFromStored(spark, dir, Seq(500L).toDF("vec_id"))
      val got = topIds(Similarity.nswSearchBuilt(
        Similarity.readNswIndex(spark, dir), "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(!got.exists(Set(7L, 500L)), got)
      assert(got.size == 10, got)
    } finally BatchState.deleteDir(dir)
  }

  test("an index persisted WITH in-memory tombstones composes with stored " +
      "marks: both gate the results") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_nsw_mix").toString
    try {
      val marked = Similarity.nswDeleteFromBuilt(
        Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2),
        Seq(9L).toDF("vec_id"))
      Similarity.nswWriteIndex(marked, dir)   // nsw_deleted column persists
      Similarity.nswDeleteFromStored(spark, dir, Seq(23L).toDF("vec_id"))
      val got = topIds(Similarity.nswSearchBuilt(
        Similarity.readNswIndex(spark, dir), "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(!got.exists(Set(9L, 23L)), got)
      assert(got.size == 10 && got.head == 7L, got)
      // an APPEND must carry BOTH mark provenances into its rewrite — the
      // rebuilt payload drops the nsw_deleted column, so missing the
      // in-column half would silently resurrect id 9
      Similarity.nswAppendToStored(spark, dir,
        Seq((900L, vecs(40)._2.toSeq)).toDF("vec_id", "embedding"),
        "embedding", "vec_id", nParts = 2)
      val after = topIds(Similarity.nswSearchBuilt(
        Similarity.readNswIndex(spark, dir), "embedding", "vec_id",
        query, k = 30, nParts = 2))
      assert(!after.exists(Set(9L, 23L)),
        s"append resurrected a persisted tombstone: $after")
    } finally BatchState.deleteDir(dir)
  }

  test("no-op takedowns (never-indexed or already-marked ids) leave the " +
      "commit log untouched") {
    val s = spark; import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_nsw_noop").toString
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2), dir)
      Similarity.nswDeleteFromStored(spark, dir, Seq(3L).toDF("vec_id"))
      val st = BatchState.read(dir)
      Similarity.nswDeleteFromStored(spark, dir, Seq(3L).toDF("vec_id"))
      Similarity.nswDeleteFromStored(spark, dir, Seq(99999L).toDF("vec_id"))
      assert(BatchState.read(dir) == st, "no-op takedown mutated the log")
    } finally BatchState.deleteDir(dir)
  }

  test("append is a graphdelta segment of only the touched rows — " +
      "O(|batch|·m), the base payload untouched; marks survive; the " +
      "reassembled graph equals the in-memory insert exactly") {
    val s = spark; import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_nsw_app").toString
    try {
      val built = Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2)
        .localCheckpoint(true)
      Similarity.nswWriteIndex(built, dir)
      Similarity.nswDeleteFromStored(spark, dir, Seq(7L).toDF("vec_id"))
      val before = SegmentedStore.committedSegs(dir)
      // append the exact-copy needle as a NEW id (append-only ingest)
      val batch = Seq((500L, query.toSeq)).toDF("vec_id", "embedding")
      Similarity.nswAppendToStored(spark, dir, batch,
        "embedding", "vec_id", nParts = 2, m = 8)
      // segment shape: ONE new segment, graphdelta-only (the base graph
      // payload was not rewritten), at most |batch|·(m+1) rows
      val segs = SegmentedStore.committedSegs(dir)
      assert(segs.size == before.size + 1, s"$before -> $segs")
      val newSeg = SegmentedStore.segDir(dir, segs.max)
      assert(!graft.batch.StoreFs.exists(s"$newSeg/graph"),
        "append rewrote the graph payload")
      assert(graft.batch.StoreFs.hasParquetFiles(s"$newSeg/graphdelta"))
      val deltaRows = spark.read.parquet(s"$newSeg/graphdelta").count()
      assert(deltaRows <= 1L * (8 + 1),
        s"delta is not O(|batch|·m): $deltaRows rows for a 1-row batch")
      // LWW reassembly ≡ the in-memory insert over the same base
      val mem = Similarity.nswInsertAgainst(built, batch,
        "embedding", "vec_id", nParts = 2, m = 8)
      val stored = Similarity.readNswIndex(spark, dir)
        .where(!col("nsw_deleted"))
        .select("vec_id", "embedding", "nbr_ids")
      val memLive = mem.where(col("vec_id") =!= 7L)
      assert(stored.except(memLive).isEmpty && memLive.except(stored).isEmpty,
        "reassembled graph differs from the in-memory insert")
      val got = topIds(Similarity.nswSearchBuilt(
        Similarity.readNswIndex(spark, dir), "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(got.head == 500L, got)   // the appended needle serves
      assert(!got.contains(7L), got)  // the takedown survived the append
      // a deleted id cannot silently re-enter via append
      intercept[org.apache.spark.SparkException](
        Similarity.nswAppendToStored(spark, dir,
          Seq((7L, query.toSeq)).toDF("vec_id", "embedding"),
          "embedding", "vec_id", nParts = 2))
    } finally BatchState.deleteDir(dir)
  }

  test("successive appends stack as deltas and the newest relink wins; " +
      "compaction folds them back to one payload") {
    val s = spark; import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_nsw_app2").toString
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2), dir)
      Similarity.nswAppendToStored(spark, dir,
        Seq((500L, query.toSeq)).toDF("vec_id", "embedding"),
        "embedding", "vec_id", nParts = 2)
      Similarity.nswAppendToStored(spark, dir,
        Seq((501L, vecs(40)._2.toSeq)).toDF("vec_id", "embedding"),
        "embedding", "vec_id", nParts = 2)
      assert(SegmentedStore.committedSegs(dir).size == 3)
      val idx = Similarity.readNswIndex(spark, dir).localCheckpoint(true)
      // exactly one row per id after last-writer-wins
      assert(idx.count() == vecs.size + 2)
      assert(idx.select("vec_id").distinct().count() == vecs.size + 2)
      // the appended exact copy serves beside the original
      val got = topIds(Similarity.nswSearchBuilt(idx, "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(got.take(2).toSet == Set(7L, 500L), got)
      // a takedown of a DELTA-appended id gates it (the victim probe
      // reads through the LWW fold)
      Similarity.nswDeleteFromStored(spark, dir, Seq(500L).toDF("vec_id"))
      val afterDel = topIds(Similarity.nswSearchBuilt(
        Similarity.readNswIndex(spark, dir), "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(!afterDel.contains(500L) && afterDel.head == 7L, afterDel)
      // compaction folds deltas + the mark physically: one segment,
      // row count minus the revoked appendee
      Similarity.nswCompactStored(spark, dir, "embedding", "vec_id", nParts = 2)
      assert(SegmentedStore.committedSegs(dir).size == 1)
      assert(Similarity.readNswIndex(spark, dir).count() == vecs.size + 1)
    } finally BatchState.deleteDir(dir)
  }

  test("compaction folds marks physically and re-opens re-add") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_nsw_cmp").toString
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2), dir)
      Similarity.nswDeleteFromStored(spark, dir, Seq(7L).toDF("vec_id"))
      Similarity.nswCompactStored(spark, dir, "embedding", "vec_id", nParts = 2)
      val idx = Similarity.readNswIndex(spark, dir)
      assert(!idx.columns.contains("nsw_deleted") ||
        idx.where(col("nsw_deleted")).isEmpty, "marks not folded")
      assert(idx.count() == withNeedle.size - 1)
      // physical fold == a fresh build over the retained rows
      val want = topIds(Similarity.nswSearchBuilt(
        Similarity.nswBuild(vecs.filterNot(_._1 == 7L)
            .:+(500L -> query).toDF("vec_id", "embedding"),
          "embedding", "vec_id", nParts = 2),
        "embedding", "vec_id", query, k = 10, nParts = 2))
      val got = topIds(Similarity.nswSearchBuilt(idx, "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(got == want)
      // the id is re-addable now
      Similarity.nswAppendToStored(spark, dir,
        Seq((7000L, vecs(7)._2.toSeq)).toDF("vec_id", "embedding"),
        "embedding", "vec_id", nParts = 2)
      val after = topIds(Similarity.nswSearchBuilt(
        Similarity.readNswIndex(spark, dir), "embedding", "vec_id",
        query, k = 10, nParts = 2))
      assert(after.contains(7000L), after)
    } finally BatchState.deleteDir(dir)
  }

  test("nswCompactIfFragmented: no-op below the threshold, folds past it " +
      "(the delta-append maintenance cadence)") {
    val s = spark; import s.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_nsw_frag").toString
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2), dir)
      (0 until 3).foreach { i =>
        Similarity.nswAppendToStored(spark, dir,
          Seq((600L + i, vecs(i)._2.toSeq)).toDF("vec_id", "embedding"),
          "embedding", "vec_id", nParts = 2)
      }
      assert(SegmentedStore.committedSegs(dir).size == 4)
      assert(!Similarity.nswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", nParts = 2, maxSegments = 8), "folded below threshold")
      assert(SegmentedStore.committedSegs(dir).size == 4)
      assert(Similarity.nswCompactIfFragmented(spark, dir, "embedding",
        "vec_id", nParts = 2, maxSegments = 2))
      assert(SegmentedStore.committedSegs(dir).size == 1)
      assert(Similarity.readNswIndex(spark, dir).count() == vecs.size + 3)
    } finally BatchState.deleteDir(dir)
  }

  test("codes-only stored index: takedown marks apply through " +
      "nswSearchCoded; append/compact refuse loudly (no vectors to relink)") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(df, "embedding", "vec_id",
      dim = dim, m = 4, c = 8)
    val coded = Similarity.nswEncodeIndex(
      Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2),
      "embedding", "vec_id", books)
    val dir = Files.createTempDirectory("graft_nsw_coded").toString
    try {
      Similarity.nswWriteIndex(coded, dir)
      Similarity.nswDeleteFromStored(spark, dir, Seq(7L).toDF("vec_id"))
      val got = topIds(Similarity.nswSearchCoded(
        Similarity.readNswIndex(spark, dir), "vec_id", books, query,
        k = 10, nParts = 2))
      assert(got.contains(500L) && !got.contains(7L), got)
      intercept[IllegalArgumentException](
        Similarity.nswAppendToStored(spark, dir,
          Seq((600L, query.toSeq)).toDF("vec_id", "embedding"),
          "embedding", "vec_id", nParts = 2))
      intercept[IllegalArgumentException](
        Similarity.nswCompactStored(spark, dir, "embedding", "vec_id",
          nParts = 2))
    } finally BatchState.deleteDir(dir)
  }

  test("read racing compaction resolves the old or the new segment set, " +
      "never a mix (atomic flip under concurrent serve)") {
    val s = spark; import s.implicits._
    val df = withNeedle.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_nsw_race").toString
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(df, "embedding", "vec_id", nParts = 2), dir)
      // fragment the store so the fold has real work: a delta append +
      // a takedown mark on top of the payload
      val rnd = new scala.util.Random(99)
      Similarity.nswAppendToStored(spark, dir,
        Seq((600L, Array.fill(dim)(rnd.nextGaussian())),
            (601L, Array.fill(dim)(rnd.nextGaussian())))
          .toDF("vec_id", "embedding"),
        "embedding", "vec_id", nParts = 2)
      Similarity.nswDeleteFromStored(spark, dir, Seq(5L).toDF("vec_id"))
      GraphFlipRaceLaw.run(
        read = () => Similarity.readNswIndex(spark, dir),
        compact = () => Similarity.nswCompactStored(spark, dir,
          "embedding", "vec_id", nParts = 2, sweepGraceMs = 3600000L))
    } finally BatchState.deleteDir(dir)
  }
}
