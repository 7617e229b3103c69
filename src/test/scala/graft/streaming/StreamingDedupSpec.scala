package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Streaming exact dedup: first arrival of a digest passes, later
  * byte-identical arrivals drop — across micro-batches — and only under
  * the watermarked form is that state bounded.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("exact drops cross-micro-batch byte duplicates, keeps first arrival") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(Long, String)]
    val deduped = StreamingDedup.exact(
      ms.toDS().toDF("id", "text"), "text")
    val q = deduped.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      ms.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      ms.addData((4L, "beta"), (5L, "gamma"), (6L, "gamma"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sdedup").as[(Long, String)].collect().toMap
    // one survivor per distinct text; within a micro-batch either id may
    // win (no event-time order in the unbounded form), across batches the
    // earlier batch always wins
    assert(got.values.toSet == Set("alpha", "beta", "gamma"))
    assert(got.size == 3)
    assert(got.find(_._2 == "beta").get._1 == 2L,   "batch-1 beta must beat batch-2 beta")
    assert(Set(5L, 6L).contains(got.find(_._2 == "gamma").get._1))
  }

  test("exactWithinHorizon bounds state: duplicates inside the horizon drop") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = StreamingDedup.exactWithinHorizon(
      ms.toDS().toDF("ts", "text"), "text", "ts", "10 seconds")
    val q = deduped.writeStream.format("memory").queryName("sdedup_wm")
      .outputMode("append").start()
    def t(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    try {
      ms.addData((t(1), "alpha"), (t(2), "beta"))
      q.processAllAvailable()
      // in-horizon duplicates: dropped
      ms.addData((t(3), "alpha"), (t(4), "beta"), (t(5), "gamma"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sdedup_wm").select(col("text")).as[String].collect().toSeq
    assert(got.sorted == Seq("alpha", "beta", "gamma"))
  }

  private val nearDupDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2L, "the quick brown fox jumps over the lazy dog and runs away quickly"),
    (3L, "completely different text about spark catalyst optimizer rules that rewrite logical plans before physical planning internals"),
    (4L, "completely different text about spark catalyst optimizer rules that rewrite logical plans before physical planning behavior"),
    (5L, "unrelated document covering streaming state stores and watermarks"))

  test("streaming minhash candidates == batch candidate set, cross-micro-batch pairs included") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batchPairs = graft.operators.Dedup.minhashCandidates(
      nearDupDocs.toDF("id", "text"), "text", "id")
      .as[(Long, Long)].collect().toSet
    assert(batchPairs.contains((1L, 2L)) && batchPairs.contains((3L, 4L)))

    // each near-dup pair split ACROSS micro-batches
    val ms = MemoryStream[(Long, String)]
    val cands = StreamingDedup.minhashCandidates(
      ms.toDS().toDF("id", "text"), "text", "id")
    val q = cands.writeStream.format("memory").queryName("smh")
      .outputMode("append").start()
    try {
      ms.addData(nearDupDocs(0), nearDupDocs(2))
      q.processAllAvailable()
      ms.addData(nearDupDocs(1), nearDupDocs(4))
      q.processAllAvailable()
      ms.addData(nearDupDocs(3))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("smh").as[(Long, Long)].collect().toSet
    assert(streamed == batchPairs)

    // batch-mode invocation of the streaming operator agrees too
    val oneShot = StreamingDedup.minhashCandidates(
      nearDupDocs.toDF("id", "text"), "text", "id")
      .collect().toSet
    assert(oneShot == batchPairs)
  }

  test("streaming minhash blank docs form a linear star matching the batch contract") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // blanks fed ascending (min id first) across micro-batches: the
    // emitted set must equal the batch star — (min blank, other blank)
    // only, never the clique — alongside untouched non-blank candidates
    val docs = Seq((1L, ""), (2L, "   "), (3L, "\t"),
      (4L, nearDupDocs(0)._2), (5L, nearDupDocs(0)._2), (6L, ""))
    val batchPairs = graft.operators.Dedup.minhashCandidates(
      docs.toDF("id", "text"), "text", "id").as[(Long, Long)].collect().toSet
    assert(batchPairs == Set((1L, 2L), (1L, 3L), (1L, 6L), (4L, 5L)))

    val ms = MemoryStream[(Long, String)]
    val cands = StreamingDedup.minhashCandidates(
      ms.toDS().toDF("id", "text"), "text", "id")
    val q = cands.writeStream.format("memory").queryName("smh_blank")
      .outputMode("append").start()
    try {
      ms.addData(docs(0), docs(1), docs(3))
      q.processAllAvailable()
      ms.addData(docs(2), docs(4), docs(5))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("smh_blank").as[(Long, Long)].collect().toSet
    assert(streamed == batchPairs)
  }

  test("horizon minhash: in-horizon copies pair across micro-batches; " +
      "past-horizon state is reclaimed and late copies emit nothing") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val cands = StreamingDedup.minhashCandidatesWithinHorizon(
      ms.toDS().toDF("id", "ts", "text"), "text", "id", "ts", "30 seconds")
    val q = cands.writeStream.format("memory").queryName("smh_wm")
      .outputMode("append").start()
    try {
      // batch 1: two sources at t=100 (away from epoch 0 — a ts equal to
      // the initial watermark is dropped as late, a test artifact only)
      ms.addData((1L, t(100), nearDupDocs(0)._2), (3L, t(100), nearDupDocs(2)._2))
      q.processAllAvailable()
      // batch 2 (t=110, inside horizon): near-dups pair across the state
      ms.addData((2L, t(110), nearDupDocs(1)._2), (4L, t(110), nearDupDocs(3)._2))
      q.processAllAvailable()
      val inHorizon = spark.table("smh_wm").as[(Long, Long)].collect().toSet
      assert(inHorizon.contains((1L, 2L)) && inHorizon.contains((3L, 4L)),
        s"in-horizon near-dups must pair, got $inHorizon")
      // advance the watermark far past the horizon (t=1100), then feed a
      // byte-copy of doc 1: its source's state aged out -> NO new pair
      ms.addData((50L, t(1100), "watermark advancing filler document text"))
      q.processAllAvailable()
      ms.addData((51L, t(1101), nearDupDocs(0)._2))
      q.processAllAvailable()
      val after = spark.table("smh_wm").as[(Long, Long)].collect().toSet
      assert(!after.exists(p => p._2 == 51L),
        s"late copy must not pair against evicted state, got $after")
      // state is bounded: every pre-horizon bucket was reclaimed — the
      // state store holds only rows from the filler/late docs
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows <= 2L * 16L + 2L,
        s"state rows $stateRows not bounded by the horizon's arrivals")
    } finally q.stop()
  }

  test("horizon minhash batch invocation (no watermark) == unbounded candidates") {
    val s = spark; import s.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val withTs = nearDupDocs.zipWithIndex
      .map { case ((id, tx), i) => (id, t(i.toLong), tx) }
      .toDF("id", "ts", "text")
    val horizon = StreamingDedup.minhashCandidatesWithinHorizon(
      withTs, "text", "id", "ts", "30 seconds").collect().toSet
    val unbounded = StreamingDedup.minhashCandidates(
      nearDupDocs.toDF("id", "text"), "text", "id").collect().toSet
    assert(horizon == unbounded)
  }

  test("streaming minhash maxBucket caps state but keeps pairing against remembered ids") {
    val s = spark; import s.implicits._
    // 4 byte-identical docs in one shot with maxBucket = 2: every band
    // bucket remembers ids 1,2 only; 3 and 4 each pair against {1,2}
    // but never against each other
    val same = (1L to 4L).map(i => (i, "identical text repeated in every single document here"))
    val got = StreamingDedup.minhashCandidates(
      same.toDF("id", "text"), "text", "id", maxBucket = 2)
      .collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
  }
}
