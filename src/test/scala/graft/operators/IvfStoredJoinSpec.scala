package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.batch.BatchState

/** Query-TABLE serving over the stored IVF / IVF-PQ tiers (round 18,
  * r17 verdict #2 — the batch decontamination / curation-search shape;
  * the storehaus multiGet discipline the KV store already honors,
  * reference FlatMapOperation.scala:113-137):
  *
  *  - per-query results of [[Similarity.ivfTopKStoredJoin]] are EXACTLY
  *    `ivfTopKStored(query)` over the same live store — same probe rule,
  *    same quantized scores, same id tie-breaks — at full AND partial
  *    probe, on a store with appends and takedowns outstanding (the
  *    multi-segment resolution path);
  *  - same law for [[Similarity.ivfPqTopKStoredJoin]] vs
  *    `ivfPqTopKStored` (identical ADC tables → identical ranks);
  *  - the one-scan plan is real: the join's pruned read touches ONLY the
  *    UNION of the queries' probe cells (input_file_name audit — the
  *    per-query loop would re-resolve and re-scan per query);
  *  - an empty query table serves the canonical empty frame;
  *  - the maxQueries bound fails loudly, never silently truncates.
  */
class IvfStoredJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dim = 16
  private def vecs: Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(17)
    Seq.tabulate(150)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
  }

  private def df: DataFrame = {
    val s = spark; import s.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  /** Store with a lifecycle behind it: bootstrap over ids < 120, append
    * 120..149 against the frozen model, take down ids % 10 == 4 — so the
    * join resolves segments + delete sets, not a single fresh segment.
    */
  private def liveAndQueries(build: (DataFrame, String) => Unit,
      append: (DataFrame, String) => Unit,
      delete: (DataFrame, String) => Unit,
      dir: String): (DataFrame, DataFrame) = {
    val base = df.where(col("vec_id") < 120)
    val extra = df.where(col("vec_id") >= 120)
    build(base, dir)
    append(extra, dir)
    delete(df.where(col("vec_id") % 10 === 4).select("vec_id"), dir)
    val live = df.where(col("vec_id") % 10 =!= 4)
    val queries = df.where(col("vec_id").isin(3L, 47L, 121L))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    (live, queries)
  }

  /** (vec_id, cosine_sim) rows in the deterministic rank order. */
  private def ranked(rows: Array[(Long, Double)]): Seq[(Long, Double)] =
    rows.sortBy { case (id, c) => (-c, id) }.toSeq

  private def perQuery(join: DataFrame): Map[Long, Seq[(Long, Double)]] =
    join.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (q, rs) => q -> ranked(rs.map(_._2)) }

  private def single(df: DataFrame): Seq[(Long, Double)] =
    ranked(df.collect().map(r => (r.getLong(0), r.getDouble(1))))

  test("ivfTopKStoredJoin per-query results equal the ivfTopKStored loop " +
      "exactly, at full and partial probe, over a lifecycled store") {
    val dir = Files.createTempDirectory("graft_ivf_join").toString
    try {
      val (live, queries) = liveAndQueries(
        (b, d) => Similarity.ivfWriteIndex(b, "embedding", "vec_id", d,
          nCentroids = 8),
        (a, d) => Similarity.ivfAppendToStored(spark, d, a, "embedding", "vec_id"),
        (ids, d) => Similarity.ivfDeleteFromStored(spark, d, ids), dir)
      val qs = queries.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      for (nProbe <- Seq(2, 8)) {
        val joined = perQuery(Similarity.ivfTopKStoredJoin(spark, dir, live,
          "embedding", "vec_id", queries, "q_vec", "q_id", k = 10,
          nProbe = nProbe))
        assert(joined.keySet == qs.map(_._1).toSet)
        qs.foreach { case (qid, q) =>
          val loop = single(Similarity.ivfTopKStored(spark, dir, live,
            "embedding", "vec_id", q, k = 10, nProbe = nProbe))
          assert(joined(qid) == loop,
            s"nProbe=$nProbe q=$qid join=${joined(qid)} loop=$loop")
        }
      }
    } finally BatchState.deleteDir(dir)
  }

  test("ivfPqTopKStoredJoin per-query results equal the ivfPqTopKStored " +
      "loop exactly, at full and partial probe, over a lifecycled store") {
    val dir = Files.createTempDirectory("graft_ivfpq_join").toString
    try {
      val (live, queries) = liveAndQueries(
        (b, d) => Similarity.ivfPqWriteIndex(b, "embedding", "vec_id", d,
          dim = dim, nCentroids = 8, m = 4, c = 8),
        (a, d) => Similarity.ivfPqAppendToStored(spark, d, a, "embedding", "vec_id"),
        (ids, d) => Similarity.ivfPqDeleteFromStored(spark, d, ids), dir)
      val qs = queries.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      for (nProbe <- Seq(2, 8)) {
        val joined = perQuery(Similarity.ivfPqTopKStoredJoin(spark, dir, live,
          "embedding", "vec_id", queries, "q_vec", "q_id", k = 10,
          nProbe = nProbe))
        assert(joined.keySet == qs.map(_._1).toSet)
        qs.foreach { case (qid, q) =>
          val loop = single(Similarity.ivfPqTopKStored(spark, dir, live,
            "embedding", "vec_id", q, k = 10, nProbe = nProbe))
          assert(joined(qid) == loop,
            s"nProbe=$nProbe q=$qid join=${joined(qid)} loop=$loop")
        }
      }
    } finally BatchState.deleteDir(dir)
  }

  test("int8TopKStoredJoin per-query results equal the int8TopKStored " +
      "loop exactly over a lifecycled store (the flat tier's one-scan " +
      "batch form)") {
    val dir = Files.createTempDirectory("graft_int8_join").toString
    try {
      val (live, queries) = liveAndQueries(
        (b, d) => Similarity.int8WriteIndex(b, "embedding", "vec_id", d),
        (a, d) => Similarity.int8AppendToStored(spark, d, a, "embedding", "vec_id"),
        (ids, d) => Similarity.int8DeleteFromStored(spark, d, ids), dir)
      val qs = queries.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val joined = perQuery(Similarity.int8TopKStoredJoin(spark, dir, live,
        "embedding", "vec_id", queries, "q_vec", "q_id", k = 10))
      assert(joined.keySet == qs.map(_._1).toSet)
      qs.foreach { case (qid, q) =>
        val loop = single(Similarity.int8TopKStored(spark, dir, live,
          "embedding", "vec_id", q, k = 10))
        assert(joined(qid) == loop, s"q=$qid join=${joined(qid)} loop=$loop")
      }
      // duplicate query ids fail loudly, never silently multiply rows
      val dup = queries.unionByName(queries.limit(1))
      val e = intercept[IllegalArgumentException] {
        Similarity.int8TopKStoredJoin(spark, dir, live, "embedding",
          "vec_id", dup, "q_vec", "q_id", k = 10)
      }
      assert(e.getMessage.contains("duplicate"))
    } finally BatchState.deleteDir(dir)
  }

  test("the joined serve's pruned read touches ONLY the union of the " +
      "queries' probe cells") {
    val dir = Files.createTempDirectory("graft_ivf_join_prune").toString
    try {
      Similarity.ivfWriteIndex(df, "embedding", "vec_id", dir, nCentroids = 8)
      val cents = Similarity.readIvfCentroids(spark, dir)
      val qs = Seq(3L, 47L, 121L).map(i => vecs(i.toInt)._2)
      val union = qs.flatMap(Similarity.ivfProbeCids(_, cents, 2)).distinct
      // the union scan the join performs, audited the gate-row way:
      // input_file_name() observes the post-pruning scan
      val files = Similarity.readIvfIndex(spark, dir, probeCids = Some(union))
        .select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0)).filter(_.contains("/ivf/"))
      assert(files.nonEmpty)
      files.foreach { f =>
        assert(union.exists(p => f.contains(s"/cid=$p/")),
          s"joined scan read an unprobed partition: $f (union=$union)")
      }
    } finally BatchState.deleteDir(dir)
  }

  test("suggestedIvfCells follows min(4*sqrt(N), N/768): " +
      "power-of-two, clamped, monotone in corpus size") {
    // round 19: the rule gained a measured rows-per-cell floor (N/768 —
    // a cid= partition must amortize its per-file overhead; see
    // IvfAutoGeometrySpec for the floor's own laws)
    assert(Similarity.suggestedIvfCells(0) == 16)
    assert(Similarity.suggestedIvfCells(100) == 16)      // floor rules
    assert(Similarity.suggestedIvfCells(10000) == 16)    // 10000/768 = 13 -> clamp
    assert(Similarity.suggestedIvfCells(1000000) == 1024) // 1e6/768 = 1302 -> 1024
    assert(Similarity.suggestedIvfCells(100000000L) == 32768) // sqrt term: 4e4 -> 2^15
    assert(Similarity.suggestedIvfCells(Long.MaxValue) == 65536)
    val sizes = Seq(0L, 10L, 1000L, 100000L, 10000000L, 1000000000L)
    val cells = sizes.map(Similarity.suggestedIvfCells)
    assert(cells == cells.sorted, s"must be monotone: $cells")
    cells.foreach(c => assert((c & (c - 1)) == 0 && c >= 16 && c <= 65536))
  }

  test("empty query table serves the canonical empty frame; maxQueries " +
      "fails loudly instead of truncating") {
    val s = spark; import s.implicits._
    val dir = Files.createTempDirectory("graft_ivf_join_empty").toString
    try {
      Similarity.ivfWriteIndex(df, "embedding", "vec_id", dir, nCentroids = 4)
      val empty = Seq.empty[(Long, Seq[Double])].toDF("q_id", "q_vec")
      val served = Similarity.ivfTopKStoredJoin(spark, dir, df, "embedding",
        "vec_id", empty, "q_vec", "q_id", k = 5)
      assert(served.columns.toSeq == Seq("q_id", "vec_id", "cosine_sim"))
      assert(served.count() == 0L)
      val queries = df.limit(3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfTopKStoredJoin(spark, dir, df, "embedding", "vec_id",
          queries, "q_vec", "q_id", k = 5, maxQueries = 2)
      }
      assert(e.getMessage.contains("maxQueries"))
    } finally BatchState.deleteDir(dir)
  }
}
