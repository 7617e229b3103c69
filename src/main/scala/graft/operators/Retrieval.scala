package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sparse lexical retrieval over a document corpus: inverted-index build,
  * incremental append, and BM25 scoring / top-k search.
  *
  * A training-data pipeline needs lexical search at corpus scale for
  * decontamination against benchmark suites, targeted curation ("find all
  * documents about X"), and dedup candidate generation — the retrieval
  * complement of the embedding-space ANN family in
  * [[graft.operators.Similarity]].
  *
  * Shape at scale (the 100 TB contract):
  *  - The index is ONE shuffle of (doc, token) pairs — `groupBy(token,
  *    doc)` — and carries `dl` (doc length) denormalized into each
  *    posting row, so query-time scoring never joins back to the corpus.
  *    Persist it partitioned/bucketed by `token` and posting lookups
  *    prune to the query tokens' buckets.
  *  - Queries are small relative to the corpus: the query-token frame is
  *    BROADCAST against the postings scan, reducing the corpus-sized side
  *    to candidate postings before any aggregation. Per-token document
  *    frequencies for scoring are computed from the candidate postings
  *    themselves (the broadcast semi-filter keeps every posting of each
  *    query token, so the post-filter count IS the exact df) — no
  *    vocabulary-wide aggregate at query time.
  *  - Corpus constants (N, avgdl) live in a one-row stats frame merged
  *    associatively on append; they cross-join (broadcast) into scoring.
  *  - Stopword-class tokens (df ~ N) dominate posting volume while
  *    contributing near-zero idf; `maxDfFraction` drops them before the
  *    candidate join — the first, simplest member of the impact-pruning
  *    family (block-max/WAND being the full treatment).
  *  - Top-k uses window `row_number` + `rn <= k`, which Spark 3.5+
  *    compiles to WindowGroupLimit: each map task keeps only its local
  *    top-k before the per-query shuffle, so a query never gathers more
  *    than k * shufflePartitions rows to one task.
  *
  * Tokenization is the engine-wide whitespace tokenizer over lowercased
  * text ([[TextFunctions.tokens]]) so oracle SQL agrees exactly.
  *
  * The reference has no retrieval operator (its closest shape is keyed
  * lookup joins, summingbird-core/.../Producer.scala leftJoin); BM25 here
  * follows Robertson et al.'s Okapi formulation with the Lucene-style
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf, which is non-negative for
  * every df <= N.
  */
object Retrieval {

  /** Inverted index: `postings` = (token, `idCol`, tf, dl) — one row per
    * distinct (document, token); `stats` = ONE row (n_docs, total_dl),
    * covering ALL indexed docs including token-less ones (they produce no
    * postings but still shift N and avgdl).
    */
  final case class Bm25Index(postings: DataFrame, stats: DataFrame, idCol: String)

  private def lowTokens(text: Column): Column = TextFunctions.tokens(lower(text))

  /** Build the index in one pass: explode tokens, count per (doc, token),
    * carry dl on every posting. `stats` aggregates the pre-explode frame
    * so empty documents count toward N / avgdl.
    */
  def buildIndex(docs: DataFrame, textCol: String, idCol: String): Bm25Index = {
    val withToks = docs.select(col(idCol), lowTokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")))
    val postings = withToks
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("token"))
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"), first(col("__dl")).as("dl"))
    // coalesce: sum over ZERO rows is null, and an empty index must write
    // (0, 0) stats so the streaming-ingest bootstrap can roll them forward
    val stats = withToks.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("__dl")), lit(0L)).as("total_dl"))
    Bm25Index(postings, stats, idCol)
  }

  /** Append a (disjoint-id) batch without touching existing postings:
    * postings union, stats merged associatively — the incremental path a
    * daily-ingest corpus needs. Identical to a full rebuild on the union
    * (per-doc rows are independent; N and total_dl are sums).
    */
  def appendToIndex(index: Bm25Index, newDocs: DataFrame, textCol: String): Bm25Index = {
    val add = buildIndex(newDocs, textCol, index.idCol)
    val stats = index.stats.unionByName(add.stats)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_dl")).as("total_dl"))
    Bm25Index(index.postings.unionByName(add.postings), stats, index.idCol)
  }

  /** BM25 scores for every (query, document) pair sharing at least one
    * surviving token. `queries` is a small frame (`qIdCol`, `qTextCol`).
    * Returns (`qIdCol`, `idCol`, "score") with score rounded to 6dp.
    *
    * `maxDfFraction` < 1.0 drops query tokens whose df exceeds that
    * fraction of N before scoring (stopword pruning — recall trade
    * documented above); 1.0 scores exactly.
    */
  def bm25FromIndex(index: Bm25Index, queries: DataFrame, qTextCol: String,
      qIdCol: String, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 1.0): DataFrame = {
    val qTok = queries
      .select(col(qIdCol), explode(array_distinct(lowTokens(col(qTextCol)))).as("token"))
    // corpus-sized side reduced FIRST: broadcast the query tokens into the
    // postings scan; everything downstream is candidate-sized. The frame
    // feeds two consumers (df aggregation + scoring join) UNMATERIALIZED,
    // deliberately: an in-memory index's build aggregation sits behind its
    // own exchange (AQE reuses the shuffle stage across the consumers),
    // and a checkpoint here would hide the pruned stored scan and the
    // delete anti-join from the executed plan — the properties the
    // plan-audit laws (and a plan reader) must see (round 20: a
    // checkpoint attempt broke exactly those laws and was reverted)
    val cand = index.postings.join(
      broadcast(qTok.select(col("token")).distinct()), Seq("token"), "left_semi")
    // exact df per query token from the candidates themselves
    val dfT = cand.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val stats = index.stats.select(col("n_docs"),
      (col("total_dl").cast("double") /
        when(col("n_docs") > 0, col("n_docs")).otherwise(lit(1L))).as("avgdl"))
    val idCol = index.idCol
    val scored = broadcast(qTok)
      .join(cand, Seq("token"))
      .join(broadcast(dfT), Seq("token"))
      .crossJoin(broadcast(stats))
      .where(col("df") <= lit(maxDfFraction) * col("n_docs"))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("__part", col("__idf") *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(qIdCol), col(idCol))
      .agg(round(sum(col("__part")), 6).as("score"))
    scored
  }

  /** Persist the index partitioned by token hash-bucket (`tb = pmod(
    * xxhash64(token), tokenBuckets)`): a query-time read prunes statically
    * to the query tokens' buckets — the postings analogue of
    * `BatchStore`'s key-clustered snapshots. Stats land beside it.
    */
  private def withBucket(postings: DataFrame, tokenBuckets: Int): DataFrame =
    postings.withColumn("tb",
      pmod(xxhash64(col("token")), lit(tokenBuckets)).cast("int"))

  /** The quantized-impact block id of a posting (round 19's in-memory
    * block-max grouping; PERSISTED per posting since round 20): tf exact
    * to 8, dl in quarter-octave bands — ≤ 288 blocks per token, and
    * `idf · tfPart(block max tf, block min dl)` bounds every member
    * tightly (tfPart is monotone up in tf, down in dl). One definition
    * shared by the in-memory scorer, the segment writers, and the
    * persisted-summary law (RetrievalIoPruneSpec).
    */
  private[operators] def blkOf(tf: Column, dl: Column): Column =
    (least(tf, lit(8)).cast("int") * 32 +
      least(floor(log2(dl.cast("double") + 1.0) * 2.0), lit(31.0)).cast("int"))

  /* Stored layout — log-structured segments under the shared commit log
   * ([[graft.batch.SegmentedStore]]: crash-consistency, writer
   * exclusivity, and sweep semantics documented there):
   *
   *   path/_graft_state.json      commit log: committed segment ids
   *   path/seg=N/postings/tb=.../ this segment's postings, token-bucketed
   *   path/seg=N/stats/           ONE row: this segment's (n_docs, total_dl)
   *                               DELTA; readers sum deltas across segments
   *   path/seg=N/deletes/         a [[deleteFromStored]] segment's delete
   *                               set (one id column) plus its coverage
   *                               marker (the committed segments it
   *                               applies to); readers anti-join each
   *                               delete set out of its COVERED segments'
   *                               postings only, so re-appends after a
   *                               takedown serve without a compaction
   *
   * Postings and stats sit in the same segment, so they can never tear
   * apart — they commit together on the log flip; a delete segment's set
   * and its negative stats delta likewise.
   */
  private def segDir(path: String, id: Long) =
    graft.batch.SegmentedStore.segDir(path, id)

  private def committedSegs(path: String): List[Long] =
    graft.batch.SegmentedStore.committedSegs(path)

  private def hasParquetFiles(dir: String): Boolean =
    graft.batch.SegmentedStore.hasParquetFiles(dir)

  /** Union of the committed segments' postings, each root read separately
    * (one shared root would make Spark infer `seg=` itself as a partition
    * column and conflict across roots), `tb` partition column retained so
    * callers can prune before dropping it, plus a `__seg` provenance
    * column (the source segment id — the delete anti-join applies each
    * delete set only to the segments it covers; [[minusDeleted]] drops
    * it). None ⇔ the index has never indexed a posting-bearing document.
    */
  private def readPostings(spark: org.apache.spark.sql.SparkSession,
      path: String, segs: List[Long]): Option[DataFrame] = {
    val live = segs.filter(id =>
      hasParquetFiles(s"${segDir(path, id)}/postings"))
    if (live.isEmpty) None
    else Some(live.map(id => spark.read.parquet(s"${segDir(path, id)}/postings")
        // the persisted impact-block column (round 20) is the IO-pruned
        // serve's private machinery ([[ioPrunedTopK]] reads it via its
        // own reader); every other reader sees the round-19 schema —
        // also what keeps pre-r20 and r20 segments unionByName-compatible
        .drop("__blk")
        .withColumn("__seg", lit(id)))
      .reduce(_ unionByName _))
  }

  /** The one postings-write body (round 20, r19 verdict #3 — the IO side
    * of block-max pruning): postings land with their PERSISTED
    * quantized-impact block id (`__blk`, [[blkOf]]), one file per `tb=`
    * bucket sorted by (token, __blk) — so parquet row-group min/max
    * stats line up with the pushed `(token = t AND __blk IN ...)`
    * block-floor predicate the IO-pruned serve builds, and whole row
    * groups of a stopword's low-impact postings are skipped at READ
    * time, not just at scoring time. Beside them, ONE tiny `blockstats`
    * table per segment — (tb, token, __blk, n, max_tf, min_dl), ≤ 288
    * rows per token, token-bucketed like the postings — gives the serve
    * its exact per-token dfs and block bounds WITHOUT any posting scan.
    * `rowGroupBytes` shrinks parquet row groups (default: parquet's) so
    * laws and probes can demonstrate the skip at test scale; at corpus
    * scale a stopword bucket spans many default-size row groups and the
    * default is right.
    */
  private def writePostingsPart(postings: DataFrame, segRoot: String,
      tokenBuckets: Int, rowGroupBytes: Option[Long]): Unit = {
    val bucketed = withBucket(postings, tokenBuckets)
      .withColumn("__blk", blkOf(col("tf"), col("dl")))
    val w = bucketed
      .repartition(col("tb")).sortWithinPartitions("token", "__blk")
      .write.partitionBy("tb").mode("overwrite")
    rowGroupBytes.fold(w)(n => w.option("parquet.block.size", n.toString))
      .parquet(s"$segRoot/postings")
    // blockstats from the WRITTEN parquet, never by re-running the whole
    // index plan (round 20 opt: the `bucketed` lineage is the full
    // tokenize+explode+aggregate build — recomputing it doubled every
    // writeIndex/compact; the read-back touches four narrow columns of
    // files this process just wrote). Same rows either way, so the stats
    // are identical. An empty index writes no postings files and needs no
    // blockstats (the IO-pruned serve only consults posting-bearing
    // segments).
    if (hasParquetFiles(s"$segRoot/postings")) {
      postings.sparkSession.read.parquet(s"$segRoot/postings")
        .groupBy(col("tb"), col("token"), col("__blk"))
        .agg(count(lit(1)).as("n"), max(col("tf")).as("max_tf"),
          min(col("dl")).as("min_dl"))
        .repartition(col("tb")).sortWithinPartitions("token")
        .write.partitionBy("tb").mode("overwrite")
        .parquet(s"$segRoot/blockstats")
    }
  }

  private def writeSegment(index: Bm25Index, path: String, id: Long,
      tokenBuckets: Int, rowGroupBytes: Option[Long] = None): Unit = {
    // CLEAR the whole segment dir first: `nextId` reuses a crashed
    // writer's uncommitted id, and parquet overwrite only clears the
    // subdirs THIS mutation writes — without the pre-clear, an orphan
    // `deletes/` left by a crashed takedown would ride this segment's
    // commit into the log and silently suppress live documents
    graft.batch.StoreFs.deleteRecursive(segDir(path, id))
    writePostingsPart(index.postings, segDir(path, id), tokenBuckets,
      rowGroupBytes)
    index.stats.coalesce(1).write.mode("overwrite")
      .parquet(s"${segDir(path, id)}/stats")
  }

  /** Bootstrap (or fully replace) a stored index: one segment holding the
    * whole index, committed as the ONLY live segment; prior segments swept.
    */
  /** @param rowGroupBytes parquet row-group size for the postings files
    *   (None = parquet default) — laws/probes shrink it to demonstrate
    *   block-floor row-group skipping at test scale.
    */
  def writeIndex(index: Bm25Index, path: String, tokenBuckets: Int,
      rowGroupBytes: Option[Long] = None): Unit = {
    require(tokenBuckets >= 1, s"tokenBuckets must be >= 1, got $tokenBuckets")
    graft.batch.SegmentedStore.withWriterLock(path) {
      val id = graft.batch.SegmentedStore.nextId(path)
      writeSegment(index, path, id, tokenBuckets, rowGroupBytes)
      graft.batch.SegmentedStore.commitReplaceAll(path, id)
    }
  }

  /** Ingest a (disjoint-id) batch into a STORED index as a NEW committed
    * segment (existing segments untouched — append is per-doc-independent,
    * same contract as [[appendToIndex]]); the segment's one-row stats delta
    * rolls N / total_dl forward at read time. This is the streaming
    * maintenance path: call it from `foreachBatch` and the index stays
    * serveable between micro-batches; a crash before the commit-log flip
    * leaves the index exactly as it was.
    */
  /** @param batchId pass the foreachBatch micro-batch id to make the
    *   append IDEMPOTENT under at-least-once replay: the segment id
    *   becomes a pure function of the batch id
    *   ([[graft.batch.SegmentedStore.batchSegId]]), so a re-delivered
    *   batch whose commit already landed is skipped instead of
    *   double-appended. None = ordinal (non-replayed) append.
    */
  def appendToStored(spark: org.apache.spark.sql.SparkSession, path: String,
      tokenBuckets: Int, newDocs: DataFrame, textCol: String, idCol: String,
      batchId: Option[Long] = None): Unit = {
    val committed = committedSegs(path)
    require(committed.nonEmpty,
      s"appendToStored: no committed index at $path — bootstrap with writeIndex first")
    graft.batch.SegmentedStore.withWriterLock(path) {
      batchId match {
        case Some(b) if graft.batch.SegmentedStore.batchApplied(path, b) =>
          () // replayed micro-batch: its segment is already committed
        case _ =>
          val id = batchId.map(graft.batch.SegmentedStore.batchSegId)
            .getOrElse(graft.batch.SegmentedStore.nextId(path))
          writeSegment(buildIndex(newDocs, textCol, idCol), path, id, tokenBuckets)
          batchId match {
            // streaming: raise the applied-batch high-water mark in the
            // same atomic flip, so the replay guard survives compaction
            case Some(b) => graft.batch.SegmentedStore.commitStreamingAppend(path, b)
            case None    => graft.batch.SegmentedStore.commitAppend(path, id)
          }
      }
    }
  }

  /** Compact a stored index: streaming ingest leaves one segment per
    * micro-batch, and point-read latency degrades with file count (each
    * pruned read opens every file of its buckets in every segment).
    * Rewrites all committed segments into ONE new segment (one file per
    * bucket, token-sorted for row-group pruning) with the summed stats,
    * then atomically re-points the commit log at it and sweeps the
    * superseded segments — scores unchanged. Run it on the maintenance
    * cadence, like the BatchStore retention sweep.
    */
  /** @param sweepGraceMs 0 = delete superseded segments immediately;
    *   > 0 = tombstone them and let a later sweep delete after the grace,
    *   so readers mid-scan across this compaction keep their files
    *   ([[graft.batch.SegmentedStore.sweepUncommitted]]).
    */
  def compactStored(spark: org.apache.spark.sql.SparkSession, path: String,
      tokenBuckets: Int, sweepGraceMs: Long = 0L,
      rowGroupBytes: Option[Long] = None): Unit =
    graft.batch.SegmentedStore.withWriterLock(path) {
      compactLocked(spark, path, tokenBuckets, sweepGraceMs, rowGroupBytes)
    }

  // lock-free compact body, shared by the direct verb (above) and the
  // cadence guard (below, which re-checks the threshold INSIDE the lock)
  private def compactLocked(spark: org.apache.spark.sql.SparkSession,
      path: String, tokenBuckets: Int, sweepGraceMs: Long,
      rowGroupBytes: Option[Long] = None): Unit = {
    val idx = readIndex(spark, path, idCol = "doc_id")
    val id = graft.batch.SegmentedStore.nextId(path)
    // pre-clear the (new, uncommitted) target id — a crashed writer's
    // orphan subdirs must not ride this commit (see writeSegment)
    graft.batch.StoreFs.deleteRecursive(segDir(path, id))
    writePostingsPart(idx.postings, segDir(path, id), tokenBuckets,
      rowGroupBytes)
    idx.stats.coalesce(1).write.mode("overwrite")
      .parquet(s"${segDir(path, id)}/stats")
    graft.batch.SegmentedStore.commitReplaceAll(path, id, sweepGraceMs)
  }

  /** Compact only when fragmentation crosses `maxSegments` — the
    * self-scheduling form of [[compactStored]] a streaming ingest can
    * call after every micro-batch: below the threshold it costs one
    * commit-log read, takes no lock, and does nothing (the threshold is
    * re-checked inside the writer lock before the fold — see
    * SegmentedStore.compactIfFragmentedLocked). Returns whether a
    * compaction ran.
    */
  def compactIfFragmented(spark: org.apache.spark.sql.SparkSession,
      path: String, tokenBuckets: Int, maxSegments: Int = 8,
      sweepGraceMs: Long = 0L): Boolean =
    graft.batch.SegmentedStore.compactIfFragmentedLocked(path, maxSegments) {
      compactLocked(spark, path, tokenBuckets, sweepGraceMs)
    }

  /** Full (unpruned) read of a stored index: postings unioned across the
    * committed segments, stats deltas summed into the one-row total.
    */
  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String): Bm25Index = {
    val segs = committedSegs(path)
    require(segs.nonEmpty, s"readIndex: no committed index at $path")
    readIndexSegs(spark, path, segs, idCol)
  }

  /** Never-indexed corpus: canonical empty postings frame (long ids —
    * the engine-wide id convention).
    */
  private def emptyPostings(spark: org.apache.spark.sql.SparkSession,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("token", StringType),
        StructField(idCol, LongType), StructField("tf", LongType),
        StructField("dl", IntegerType))))
  }

  private def readIndexSegs(spark: org.apache.spark.sql.SparkSession,
      path: String, segs: List[Long], idCol: String): Bm25Index = {
    val postings = readPostings(spark, path, segs)
      .map(_.drop("tb"))
      .map(minusDeleted(spark, path, segs, _, idCol))
      .getOrElse(emptyPostings(spark, idCol))
    val stats = segs.map(id => spark.read.parquet(s"${segDir(path, id)}/stats"))
      .reduce(_ unionByName _)
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("total_dl")), lit(0L)).as("total_dl"))
    Bm25Index(postings, stats, idCol)
  }

  /** Union of the committed segments' delete sets, each row carrying its
    * delete's covered-segment array (`__covers` — the segments committed
    * when that delete was computed, [[graft.batch.SegmentedStore
    * .readDeleteCovers]]; pre-marker deletes fall back to covering every
    * other committed segment). None when no segment carries deletions.
    */
  private def readDeletes(spark: org.apache.spark.sql.SparkSession,
      path: String, segs: List[Long], idCol: String): Option[DataFrame] = {
    val live = segs.filter(id => hasParquetFiles(s"${segDir(path, id)}/deletes"))
    if (live.isEmpty) None
    else Some(live.map { id =>
      val covers = graft.batch.SegmentedStore.readDeleteCovers(path, id)
        .getOrElse(segs.filter(_ != id))
      spark.read.parquet(s"${segDir(path, id)}/deletes").toDF(idCol)
        .distinct().withColumn("__covers", typedLit(covers))
    }.reduce(_ unionByName _))
  }

  /** Filter deleted documents out of a postings frame (which carries the
    * `__seg` provenance column, dropped here): one anti-join against the
    * (takedown-sized) delete-set union, matching a posting only when its
    * source segment is COVERED by the delete — a doc re-appended after a
    * takedown lands in a segment no earlier delete covers, so it serves
    * with no compaction required. The planner broadcasts the delete side
    * when small, shuffles when a mass revocation isn't.
    */
  private def minusDeleted(spark: org.apache.spark.sql.SparkSession,
      path: String, segs: List[Long], postings: DataFrame,
      idCol: String): DataFrame =
    readDeletes(spark, path, segs, idCol) match {
      case None => postings.drop("__seg")
      case Some(d) =>
        postings.alias("__p").join(d.alias("__d"),
          col(s"__p.$idCol") === col(s"__d.$idCol") &&
            array_contains(col("__d.__covers"), col("__p.__seg")),
          "left_anti")
          .drop("__seg")
    }

  /** Remove documents from a STORED index — the takedown /
    * right-to-be-forgotten maintenance path a training corpus needs
    * (license revocations, opt-outs). Writes ONE new segment holding the
    * delete set (`seg=N/deletes`) plus the NEGATIVE stats delta of the
    * removed docs, committed on the same atomic log flip — so N and
    * avgdl correct exactly, candidate-derived dfs correct exactly (the
    * read-side anti-join removes the docs' postings), and scores equal a
    * rebuild without the documents bit-for-bit. Physical removal happens
    * at the next [[compactStored]], which folds live postings and sweeps
    * the delete sets.
    *
    * `ids` is restricted to currently-LIVE indexed docs before anything
    * is written (semi-join against the delete-filtered index), which
    * makes the operation idempotent (re-deleting is a no-op) and makes
    * deleting never-indexed ids a no-op rather than a stats corruption.
    * Token-less documents leave no postings and cannot be matched here:
    * their N contribution stays (avgdl is unaffected — they carry dl 0).
    *
    * The segment also records its COVERAGE — the committed-segment set
    * the victim set was computed against ([[graft.batch.SegmentedStore
    * .writeDeleteCovers]]) — and readers apply the delete only to those
    * segments. So a previously deleted id re-appended via
    * [[appendToStored]] serves again immediately (its new segment is
    * covered by no earlier delete), with no compaction required; and
    * takedowns landing between micro-batches can never suppress a LATER
    * streaming append whose pinned even segment id happens to be smaller.
    */
  def deleteFromStored(spark: org.apache.spark.sql.SparkSession, path: String,
      ids: DataFrame, idCol: String = "doc_id"): Unit =
    graft.batch.SegmentedStore.withWriterLock(path) {
      val segs = committedSegs(path)
      require(segs.nonEmpty, s"deleteFromStored: no committed index at $path")
      val idx = readIndexSegs(spark, path, segs, idCol)
      val victims = idx.postings
        .join(ids.toDF(idCol).distinct(), Seq(idCol), "left_semi")
        .select(col(idCol), col("dl")).distinct()
        .persist()
      try {
        // nothing live matched (re-delete / never-indexed): leave the
        // commit log untouched rather than committing an empty segment
        if (victims.limit(1).count() > 0) {
          val id = graft.batch.SegmentedStore.nextId(path)
          // pre-clear: an orphan postings/ dir from a crashed append at
          // this reused id must not ride the takedown's commit
          graft.batch.StoreFs.deleteRecursive(segDir(path, id))
          victims.select(col(idCol)).write.mode("overwrite")
            .parquet(s"${segDir(path, id)}/deletes")
          // covers marker AFTER the parquet overwrite (which clears the
          // dir); commits atomically with the segment on the log flip
          graft.batch.SegmentedStore.writeDeleteCovers(path, id, segs)
          victims.agg((-count(lit(1))).as("n_docs"),
              (-coalesce(sum(col("dl")), lit(0L))).as("total_dl"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"${segDir(path, id)}/stats")
          graft.batch.SegmentedStore.commitAppend(path, id)
        }
      } finally {
        victims.unpersist()
        ()
      }
    }

  /** ATOMIC upsert of a document batch into a STORED index — the
    * correction path for a poisoned ingest: docs whose ids are live are
    * REPLACED (their old postings suppressed), new ids are appended, in
    * ONE commit-log flip. The composition delete-then-append does the
    * same logically but commits twice, exposing a window where the docs
    * are gone; a reader resolves the log once per scan, so with
    * `replaceInStored` it sees the old content or the corrected content,
    * never the gap.
    *
    * One new segment carries all three parts, atomic together on the
    * flip: the corrected postings (bucketed like any segment), the
    * victim delete-set with its COVERAGE marker (the committed segments
    * at replace time — which never includes this segment, so the
    * corrected postings are not self-suppressed; later appends of the
    * same ids are untouched, the delete/re-add ordering contract), and
    * ONE stats row summing the corrected docs' positive (n, total_dl)
    * delta with the replaced docs' negative delta — N and avgdl are
    * exact on both sides of the flip. Physical removal of the old
    * postings folds at the next [[compactStored]], like a takedown.
    *
    * Docs that should not exist at all after the correction are
    * [[deleteFromStored]]'s job — replace is an upsert, not a diff.
    * `docs` must carry distinct ids (the appendToStored contract).
    * Ordinal-only: a streaming at-least-once ingest should use
    * [[appendToStored]] with its replay-guarded batch ids.
    */
  def replaceInStored(spark: org.apache.spark.sql.SparkSession, path: String,
      tokenBuckets: Int, docs: DataFrame, textCol: String,
      idCol: String): Unit =
    graft.batch.SegmentedStore.withWriterLock(path) {
      val segs = committedSegs(path)
      require(segs.nonEmpty,
        s"replaceInStored: no committed index at $path — bootstrap with writeIndex first")
      val idx = readIndexSegs(spark, path, segs, idCol)
      val newIdx = buildIndex(docs, textCol, idCol)
      // victims = LIVE docs the batch replaces (delete-filtered read, so
      // re-replacing after an earlier takedown never double-subtracts)
      val victims = idx.postings
        .join(docs.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
        .select(col(idCol), col("dl")).distinct()
        .persist()
      try {
        val id = graft.batch.SegmentedStore.nextId(path)
        // pre-clear the reused id (see writeSegment), then write every
        // part of the segment; the commit-log flip publishes them together
        graft.batch.StoreFs.deleteRecursive(segDir(path, id))
        writePostingsPart(newIdx.postings, segDir(path, id), tokenBuckets,
          rowGroupBytes = None)
        if (victims.limit(1).count() > 0) {
          victims.select(col(idCol)).write.mode("overwrite")
            .parquet(s"${segDir(path, id)}/deletes")
          // covers marker AFTER the parquet overwrite (it lives inside
          // the deletes dir); commits atomically with the segment
          graft.batch.SegmentedStore.writeDeleteCovers(path, id, segs)
        }
        newIdx.stats
          .unionByName(victims.agg((-count(lit(1))).as("n_docs"),
            (-coalesce(sum(col("dl")), lit(0L))).as("total_dl")))
          .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
            coalesce(sum(col("total_dl")), lit(0L)).as("total_dl"))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"${segDir(path, id)}/stats")
        graft.batch.SegmentedStore.commitAppend(path, id)
      } finally {
        victims.unpersist()
        ()
      }
    }

  /** Score queries against a STORED index reading only the query tokens'
    * buckets: the distinct query tokens (bounded — `maxQueryTokens` caps
    * them loudly, the same enforced-bounded-query-table contract as the
    * ANN join search) turn into a static `tb IN (...)` partition filter
    * plus a `token IN (...)` pushed filter, so the scan touches a handful
    * of the index's files no matter how large the corpus vocabulary is.
    * Exactness is unaffected: the pruned read keeps EVERY posting of each
    * query token, so candidate-derived dfs are identical to a full read.
    */
  /** The candidate postings a stored-index query touches: distinct query
    * tokens (driver-resolved, `maxQueryTokens`-capped loudly) become a
    * static `tb IN (...)` partition filter plus a pushed `token IN (...)`
    * per segment — the pruned, candidate-sized read every stored serving
    * path (BM25 scoring, overlap counting, hybrid fusion) starts from.
    * Returns (token, doc-id, tf, dl) rows, ALL postings of each query
    * token, so candidate-derived dfs are exact.
    */
  def storedQueryPostings(spark: org.apache.spark.sql.SparkSession,
      path: String, tokenBuckets: Int, queries: DataFrame, qTextCol: String,
      maxQueryTokens: Int = 10000, idCol: String = "doc_id"): DataFrame = {
    // loud on a mistyped / never-bootstrapped path — an empty-frame return
    // there would silently score zero hits for every query
    val segs = committedSegs(path)
    require(segs.nonEmpty, s"storedQueryPostings: no committed index at $path")
    storedQueryPostingsSegs(spark, path, segs, tokenBuckets,
      queries, qTextCol, maxQueryTokens, idCol)
  }

  /** The query set's distinct tokens, driver-resolved and loudly capped —
    * the bounded-query contract every stored serving path starts from.
    */
  private def distinctQueryTokens(spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, qTextCol: String, maxQueryTokens: Int): Array[String] = {
    val toks = queries
      .select(explode(array_distinct(lowTokens(col(qTextCol)))).as("token"))
      .distinct().as(spark.implicits.newStringEncoder)
      .take(maxQueryTokens + 1)
    require(toks.length <= maxQueryTokens,
      s"query set exceeds $maxQueryTokens distinct tokens — a query TABLE this " +
        "large should score against the in-memory index (bm25FromIndex), not " +
        "point-prune a stored one")
    toks
  }

  /** The tokens' `tb=` partition values — same hash the writer used:
    * xxhash64 over the UTF-8 token bytes.
    */
  private def bucketsOf(toks: Seq[String], tokenBuckets: Int): Seq[Int] =
    toks.map(t => {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        org.apache.spark.sql.types.StringType, 42L)
      val m = h % tokenBuckets
      (if (m < 0) m + tokenBuckets else m).toInt
    }).distinct

  private def storedQueryPostingsSegs(spark: org.apache.spark.sql.SparkSession,
      path: String, segs: List[Long], tokenBuckets: Int, queries: DataFrame,
      qTextCol: String, maxQueryTokens: Int, idCol: String): DataFrame = {
    val toks = distinctQueryTokens(spark, queries, qTextCol, maxQueryTokens)
    storedTokenPostingsSegs(spark, path, segs, tokenBuckets, toks, idCol)
  }

  // prune each segment's read independently (static tb partition filter +
  // pushed token IN), then union the candidate-sized remainders; deleted
  // docs anti-join out of the candidate-sized frame (exact dfs either way
  // — every LIVE posting of each query token survives)
  private def storedTokenPostingsSegs(spark: org.apache.spark.sql.SparkSession,
      path: String, segs: List[Long], tokenBuckets: Int,
      toks: Seq[String], idCol: String): DataFrame = {
    val buckets = bucketsOf(toks, tokenBuckets)
    readPostings(spark, path, segs)
      .map(_.where(col("tb").isin(buckets.map(Integer.valueOf).toSeq: _*))
        .where(col("token").isin(toks.toSeq: _*))
        .drop("tb"))
      .map(minusDeleted(spark, path, segs, _, idCol))
      .getOrElse(emptyPostings(spark, idCol))
  }

  def bm25FromStored(spark: org.apache.spark.sql.SparkSession, path: String,
      tokenBuckets: Int, queries: DataFrame, qTextCol: String, qIdCol: String,
      idCol: String, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 1.0, maxQueryTokens: Int = 10000): DataFrame = {
    // ONE commit-log resolution shared by the stats and postings reads —
    // two independent resolutions could tear across a concurrent append
    // (stats over segments 1..N, postings over 1..N+1), a state matching
    // no committed snapshot
    val segs = committedSegs(path)
    require(segs.nonEmpty, s"bm25FromStored: no committed index at $path")
    val full = readIndexSegs(spark, path, segs, idCol)
    val postings = storedQueryPostingsSegs(spark, path, segs, tokenBuckets,
      queries, qTextCol, maxQueryTokens, idCol)
    val idx = Bm25Index(postings, full.stats, idCol)
    bm25FromIndex(idx, queries, qTextCol, qIdCol, k1, b, maxDfFraction)
  }

  /** One-shot convenience: build + score. */
  def bm25Scores(docs: DataFrame, queries: DataFrame, textCol: String,
      idCol: String, qTextCol: String, qIdCol: String,
      k1: Double = 1.2, b: Double = 0.75, maxDfFraction: Double = 1.0): DataFrame =
    bm25FromIndex(buildIndex(docs, textCol, idCol), queries, qTextCol, qIdCol,
      k1, b, maxDfFraction)

  /** Top-k per query by (score desc, id asc) — deterministic: the rank key
    * is the 6dp-rounded score, so an oracle computing the same rounded
    * score ranks identically. The `rn <= k` filter directly over the
    * window compiles to WindowGroupLimit (partial top-k before the
    * per-query shuffle).
    */
  def bm25TopK(index: Bm25Index, queries: DataFrame, qTextCol: String,
      qIdCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 1.0): DataFrame = {
    val scored = bm25FromIndex(index, queries, qTextCol, qIdCol, k1, b, maxDfFraction)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("score").desc, col(index.idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** WAND-lite (max-score) impact-pruned top-k — identical results to
    * [[bm25TopK]], but candidate docs whose score provably cannot reach
    * the k-th rank are never scored or aggregated. The pruning math
    * (Turtle–Flood max-score; Broder et al. WAND, CIKM'03) runs entirely
    * on vocabulary-sized per-token summaries:
    *
    *  - per query token: an upper bound `ub` on any single posting's
    *    contribution — the token's LARGEST actual posting contribution
    *    (a doc's contribution from a token IS one of that token's
    *    postings, so the max over real postings bounds it). NOT the
    *    worst-case combination idf · tfPart(max tf, min dl), which pairs
    *    the max tf and the min dl from DIFFERENT docs: one high-tf long
    *    doc plus one tiny doc inflates that fictional bound far above any
    *    real posting, marks the stopword essential, and organically
    *    degrades pruning as the corpus grows;
    *  - θ (a sound lower bound on the true k-th score): for each scoring
    *    token, its k-th LARGEST single-posting contribution — the k docs
    *    holding those postings are distinct and each totals at least its
    *    own posting's contribution, so ≥ k docs score ≥ that value; θ is
    *    the max over the query's tokens (no token with ≥ k postings ⇒ no
    *    θ ⇒ no pruning — fewer than k matches may exist). Both bounds
    *    come off ONE rank-k window over each token's actual postings,
    *    which compiles to WindowGroupLimit (map-side partial top-k
    *    before the exchange — a stopword's billion postings reduce to k
    *    rows per input partition): ub is the window's rank-1 value, θ's
    *    ingredient its rank-k value. Each strictly dominates the earlier
    *    worst-case forms (tf = 1 at the corpus max dl collapsed θ ≈ 0;
    *    max-tf/min-dl inflated ub), both of which DEGRADED with organic
    *    corpus growth — exactly backwards for the 100 TB target;
    *  - non-essential tokens: the largest ub-ascending prefix whose
    *    cumulative ub stays under θ (minus a 6dp-rounding guard): a doc
    *    containing ONLY those tokens tops out below θ and can neither
    *    enter nor tie into the top k. Docs with at least one essential
    *    posting are scored EXACTLY (all their postings, so totals match
    *    the unpruned operator bit-for-bit).
    *
    * At corpus scale the skipped work is the per-doc score aggregation of
    * stopword-class posting lists — the volume-dominant part of a short
    * query against a web corpus. Exactness is law-checked (pruned ≡
    * unpruned on adversarial tie corpora) and gate-checked (shares
    * q_bm25_topk's oracle).
    */
  def bm25TopKPruned(index: Bm25Index, queries: DataFrame, qTextCol: String,
      qIdCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 1.0): DataFrame =
    bm25TopKPrunedDiag(index, queries, qTextCol, qIdCol, k, k1, b,
      maxDfFraction)._1

  // the stored fallback's pruned-parquet candidate read is cheap to
  // re-derive (columnar, bucket-pruned, OS-cached) — materializing it
  // would trade that for candidate-sized executor storage (guide:
  // persist only when recompute is the more expensive side), and the
  // IO-pruned serve is the production stored path anyway
  private[operators] def bm25TopKPrunedStoredFallback(index: Bm25Index,
      queries: DataFrame, qTextCol: String, qIdCol: String, k: Int,
      k1: Double, b: Double, maxDfFraction: Double): DataFrame =
    bm25TopKPrunedDiag(index, queries, qTextCol, qIdCol, k, k1, b,
      maxDfFraction, materializeCand = false)._1

  /** [[bm25TopKPruned]] plus its surviving-candidate frame
    * (`qIdCol`, idCol) — the docs that actually reach score aggregation —
    * so scale probes can report the pruning ratio against the unpruned
    * candidate count without re-deriving the internals.
    */
  private[graft] def bm25TopKPrunedDiag(index: Bm25Index, queries: DataFrame,
      qTextCol: String, qIdCol: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75, maxDfFraction: Double = 1.0,
      materializeCand: Boolean = true): (DataFrame, DataFrame) = {
    require(k > 0, s"need k > 0, got $k")
    val idCol = index.idCol
    val qTok = queries
      .select(col(qIdCol), explode(array_distinct(lowTokens(col(qTextCol)))).as("token"))
    // materialized ONCE by default (round 20 opt): five downstream
    // consumers (block summary, rank-k window, seed scores, doc bounds,
    // exact scoring) each re-evaluate this frame — for an in-memory index
    // that is five re-runs of the whole tokenize+explode+aggregate build.
    // The stored fallback opts out (its re-derivation is a cheap pruned
    // columnar read; see bm25TopKPrunedStoredFallback)
    val cand0 = index.postings.join(
      broadcast(qTok.select(col("token")).distinct()), Seq("token"), "left_semi")
    val cand = if (materializeCand) cand0.localCheckpoint(true) else cand0
    // vocabulary + block summary in ONE pass over the candidate postings
    // (round 19): grouping by (token, quantized-impact block) yields both
    // the exact df (sum of block counts -> idf, maxDfFraction gate) and
    // the block extremes the per-doc bounds need -- map-side combinable
    // to <= 288 rows per token, broadcast regardless of corpus size. tf
    // is exact to 8, dl in quarter-octave bands, so idf * tfPart(block
    // max tf, block min dl) bounds every member tightly (tfPart is
    // monotone up in tf, down in dl; the fictional max-tf/min-dl pairing
    // that inflates TOKEN-level bounds is capped by the band width).
    val blkExpr = blkOf(col("tf"), col("dl"))
    val blkAgg = cand
      .withColumn("__blk", blkExpr)
      .groupBy(col("token"), col("__blk"))
      .agg(count(lit(1)).as("__bn"), max(col("tf")).as("__btf"),
        min(col("dl")).as("__bdl"))
      .localCheckpoint(true) // bounded: <= query tokens x 288 rows
    val summ = blkAgg.groupBy(col("token")).agg(sum(col("__bn")).as("df"))
    val stats = index.stats.select(col("n_docs"),
      (col("total_dl").cast("double") /
        when(col("n_docs") > 0, col("n_docs")).otherwise(lit(1L))).as("avgdl"))
    def tfPart(tf: Column, dl: Column): Column =
      (tf.cast("double") * lit(k1 + 1.0)) /
        (tf.cast("double") + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("avgdl")))
    val perQTBase = broadcast(qTok)
      .join(broadcast(summ), Seq("token"))
      .crossJoin(broadcast(stats))
      .where(col("df") <= lit(maxDfFraction) * col("n_docs"))
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    // ONE rank-k window over each scoring token's actual posting
    // contributions (rank-k -> WindowGroupLimit: map-side partial top-k,
    // so each input partition ships at most k rows per token to the
    // exchange, never a stopword's list). Its rank-k value is the
    // per-token floor ingredient (k distinct docs each total at least
    // their own posting, so the true k-th score is >= it) and its
    // (token, doc) pairs are the SEED docs of the floor pass below.
    // Materialized once (<= k rows per scoring token) and reused. Only
    // perQTBase's (maxDfFraction-surviving) tokens contribute -- a
    // non-scoring token's postings prove nothing about scores that
    // exclude it. The per-posting expression is the same (idf * num) /
    // denom association the scorer uses, and a doc's summed double total
    // can never land below its own largest nonnegative term, so the
    // 1e-6 rounding-guard margin on theta is the only slack needed.
    val wTok = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("__c").desc)
    val rankedTopK = cand
      .join(broadcast(perQTBase.select(col("token"), col("__idf")).distinct()),
        Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("__c", col("__idf") * tfPart(col("tf"), col("dl")))
      .withColumn("__rn", row_number().over(wTok))
      .where(col("__rn") <= k)
      .select(col("token"), col(idCol), col("__c"))
      .localCheckpoint(true)
    val tokBounds = rankedTopK.groupBy(col("token"))
      .agg(when(count(lit(1)) === k, min(col("__c"))).as("__kth"))
    // ---- the running top-k floor, set-based (round 19, r18 verdict #6):
    // cursor-based WAND raises theta as docs score; the set-based
    // equivalent is a SEED pass -- the union of each scoring token's
    // top-k postings' docs (<= k * |query tokens| docs per query), scored
    // EXACTLY with the same expression and rounding as the final ranking.
    // The k-th best seed score is a sound floor (it is the score of a
    // real doc, so the true k-th is >= it) and far tighter than any
    // single-posting bound: a seed doc's total sums ALL its query tokens,
    // which is exactly what the per-token floor (one token's k-th
    // posting) structurally undercounts on multi-token queries.
    val seedDocs = broadcast(qTok)
      .join(rankedTopK.select(col("token"), col(idCol)), Seq("token"))
      .select(col(qIdCol), col(idCol)).distinct()
    val seedScores = broadcast(perQTBase.select(col(qIdCol), col("token"), col("__idf")))
      .join(cand, Seq("token"))
      .join(broadcast(seedDocs), Seq(qIdCol, idCol), "left_semi")
      .crossJoin(broadcast(stats))
      .withColumn("__part", col("__idf") *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(qIdCol), col(idCol))
      .agg(round(sum(col("__part")), 6).as("__sscore"))
    val wSeed = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("__sscore").desc)
    val seedTheta = seedScores
      .withColumn("__srn", row_number().over(wSeed))
      .where(col("__srn") === k)
      .select(col(qIdCol), col("__sscore").as("__stheta"))
    // theta per query: the BEST available sound floor -- the seed pass's
    // k-th score when >= k seed docs exist, else the per-token k-th
    // posting bound -- minus the 6dp-rounding guard (scores rank by
    // their ROUNDED value downstream; the margin keeps a pruned doc from
    // rounding up into a tie with the k-th). greatest() skips nulls, so
    // either floor alone still prunes; both null => no pruning (fewer
    // than k matches may exist).
    val theta = perQTBase.join(broadcast(tokBounds), Seq("token"))
      .groupBy(col(qIdCol))
      .agg(max(col("__kth")).as("__ktok"))
      .join(broadcast(seedTheta), Seq(qIdCol), "left")
      .select(col(qIdCol),
        (greatest(col("__ktok"), col("__stheta")) - lit(1e-6)).as("__theta"))
    // ---- per-doc block bounds (Ding & Suel, SIGIR'11 block-max WAND,
    // set-based): a doc's score is bounded by the SUM of its own
    // postings' block maxima -- per-doc, not per-token (the old
    // token-level essential test compared theta against a PREFIX SUM of
    // other tokens' maxima and pruned nothing on 4-5 token queries; the
    // per-doc bound subsumes it, so the essential stage is gone). A doc
    // whose bound lands under theta is pruned before exact scoring.
    // Exactness: score(d) = sum c(d,t) <= sum bmax(t, blk(d,t)) < theta
    // <= true k-th score, with theta's 1e-6 guard absorbing the 6dp
    // rounding, so d can neither enter nor tie into the top k. On this
    // layout (parquet token buckets with tf/dl carried per posting) the
    // block extremes are derivable for free from the same pruned read
    // the scorer uses, so storing them with the index would buy no IO:
    // a token bucket is read whole either way, and the skip this enables
    // is the (q, doc) EXACT-SCORING aggregation -- the volume-dominant
    // tail -- not the bucket scan.
    val blockBounds = blkAgg
      .join(broadcast(perQTBase.select(col("token"), col("__idf")).distinct()),
        Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("__bmax", col("__idf") * tfPart(col("__btf"), col("__bdl")))
      .select(col("token"), col("__blk"), col("__bmax"))
    val docBound = broadcast(perQTBase.select(col(qIdCol), col("token")))
      .join(cand.withColumn("__blk", blkExpr)
        .select(col("token"), col(idCol), col("__blk")), Seq("token"))
      .join(broadcast(blockBounds), Seq("token", "__blk"))
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum(col("__bmax")).as("__bound"))
    val refinedDocs = docBound.join(broadcast(theta), Seq(qIdCol))
      .where(col("__theta").isNull || col("__bound") >= col("__theta"))
      .select(col(qIdCol), col(idCol))
    // perQTBase carries the surviving (maxDfFraction-filtered) tokens
    // and their idf — scoring joins against it so pruned and unpruned
    // agree on exactly which tokens score. The per-posting expression
    // below is the BYTE-IDENTICAL association bm25FromIndex uses —
    // (idf * num) / denom, never idf * (num / denom) — so the summed
    // doubles (and therefore the 6dp rounding and rank tie-breaks)
    // match bit-for-bit.
    val scored = broadcast(perQTBase.select(col(qIdCol), col("token"), col("__idf")))
      .join(cand, Seq("token"))
      .join(refinedDocs, Seq(qIdCol, idCol), "left_semi")
      .crossJoin(broadcast(stats))
      .withColumn("__part", col("__idf") *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(qIdCol), col(idCol))
      .agg(round(sum(col("__part")), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("score").desc, col(idCol).asc)
    (scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k), refinedDocs)
  }

  /** Top-k straight off a STORED index — the end-to-end serving path for
    * a corpus-scale index: the scan prunes to the query tokens' buckets
    * (`tb IN` + pushed `token IN`, [[storedQueryPostings]]), WAND-lite
    * pruning then skips score aggregation for docs that provably cannot
    * reach the k-th rank, and the final rank compiles to
    * WindowGroupLimit. Exact: the pruned read keeps every LIVE posting
    * of each query token, so the per-token summaries, θ, dfs and scores
    * are identical to [[bm25TopK]] over the same logical index —
    * including after [[deleteFromStored]] (the anti-join applies before
    * the summaries). Shares q_bm25_topk's oracle.
    */
  /** @param ioPrune (round 20, r19 verdict #3) use the persisted
    *   `blockstats` tables and the `__blk` posting column to SKIP IO,
    *   not just CPU: per-token dfs and block bounds come off the tiny
    *   blockstats read (no posting scan — a `maxDfFraction`-gated
    *   stopword's postings are never read AT ALL), the θ floor and
    *   per-doc bounds come off ONE block-floor-pushed read (row groups
    *   of low-impact postings skipped via the (token, __blk) sort +
    *   min/max stats), and exact scoring of the surviving docs is ONE
    *   full pruned-bucket scan — versus the five full scans the
    *   candidate-derived pipeline pays. Falls back (loudly, stderr) to
    *   that pipeline whenever the IO path cannot be exact or helpful:
    *   live delete segments (blockstats would overcount dfs — transient
    *   until the next compaction regenerates them), pre-r20 segments
    *   without blockstats, a query set past `maxPruneTokens`, or no
    *   scoring tokens. Results are identical either way (law:
    *   RetrievalIoPruneSpec; shares q_bm25_topk's oracle).
    */
  def bm25TopKFromStored(spark: org.apache.spark.sql.SparkSession,
      path: String, tokenBuckets: Int, queries: DataFrame, qTextCol: String,
      qIdCol: String, idCol: String, k: Int, k1: Double = 1.2,
      b: Double = 0.75, maxDfFraction: Double = 1.0,
      maxQueryTokens: Int = 10000, ioPrune: Boolean = true,
      maxPruneTokens: Int = 256): DataFrame = {
    // one commit-log resolution shared by stats and postings (the same
    // torn-read note as bm25FromStored)
    val segs = committedSegs(path)
    require(segs.nonEmpty, s"bm25TopKFromStored: no committed index at $path")
    def classic(): DataFrame = {
      val full = readIndexSegs(spark, path, segs, idCol)
      val postings = storedQueryPostingsSegs(spark, path, segs, tokenBuckets,
        queries, qTextCol, maxQueryTokens, idCol)
      bm25TopKPrunedStoredFallback(Bm25Index(postings, full.stats, idCol),
        queries, qTextCol, qIdCol, k, k1, b, maxDfFraction)
    }
    if (!ioPrune) classic()
    else {
      val postingSegs = segs.filter(id =>
        hasParquetFiles(s"${segDir(path, id)}/postings"))
      val reason =
        if (postingSegs.isEmpty) Some("no posting-bearing segment")
        else if (segs.exists(id => hasParquetFiles(s"${segDir(path, id)}/deletes")))
          Some("live delete segments (dfs must come from the postings " +
            "until the next compaction folds them)")
        else if (!postingSegs.forall(id =>
          hasParquetFiles(s"${segDir(path, id)}/blockstats")))
          Some("pre-r20 segment without blockstats (compact to regenerate)")
        else None
      reason match {
        case Some(r) =>
          System.err.println(s"[graft] bm25TopKFromStored at $path: IO " +
            s"prune unavailable — $r; serving via the candidate-derived " +
            "pipeline (results identical)")
          classic()
        case None =>
          val toks = distinctQueryTokens(spark, queries, qTextCol, maxQueryTokens)
          if (toks.length > maxPruneTokens) {
            System.err.println(s"[graft] bm25TopKFromStored at $path: " +
              s"${toks.length} distinct query tokens exceed " +
              s"maxPruneTokens=$maxPruneTokens — serving via the " +
              "candidate-derived pipeline (results identical)")
            classic()
          } else ioPrunedTopK(spark, path, postingSegs, tokenBuckets, toks,
            queries, qTextCol, qIdCol, idCol, k, k1, b, maxDfFraction)
            .getOrElse(classic()) // no scoring token: the canonical tail
      }
    }
  }

  /** The IO-pruned stored serving core — exactness argument, stage by
    * stage (every floor SOUND, every bound an over-estimate, so the
    * top-k set and scores equal [[bm25TopK]] bit-for-bit):
    *
    *  1. dfs are EXACT: no live deletes (caller gates), so each token's
    *     df is the sum of its blockstats counts. idf / the maxDfFraction
    *     gate / avgdl are computed from (df, N, total_dl) with the SAME
    *     Catalyst expressions as the unpruned scorer — bit-identical.
    *  2. Per token, blocks are ranked by their EXACT query-time bound
    *     `idf · tfPart(max_tf, min_dl)` (desc, block id asc on ties) and
    *     the minimal prefix holding ≥ k postings is SELECTED (`S_t`);
    *     `s_t` = the best UNSELECTED block's bound (0 if none). The
    *     super-floor read fetches only `(token, __blk ∈ S_t)` postings —
    *     the pushed disjunction parquet row-group stats can skip.
    *  3. θ per query = the best of two SOUND floors, − the 6dp-rounding
    *     guard: (a) the k-th best PARTIAL score over the super-floor
    *     postings (a partial sum of nonnegative contributions
    *     lower-bounds the doc's true score, and ≥ k distinct docs hold
    *     them); (b) each token's k-th best super-floor contribution (k
    *     distinct docs each total at least their own posting). Both are
    *     weaker than the full-read floors — never wrong, just possibly
    *     less pruning.
    *  4. A doc NEVER seen in the super-floor read scores, per query
    *     token, either 0 (no posting) or ≤ s_t (its posting sits below
    *     the floor) — total ≤ Σ_t s_t. When Σ_t s_t < θ the whole
    *     unseen class is pruned WITHOUT being read; otherwise the query
    *     falls back to scoring all its candidate docs (`__fb`).
    *  5. A seen doc's bound = Σ_{seen (t, blk)} bmax(t, blk) +
    *     Σ_{unseen t} s_t (computed as sumS + Σ(bmax − s_t) over its
    *     super-floor postings); below θ ⇒ pruned.
    *  6. Survivors are scored EXACTLY from ONE full scan of the scoring
    *     tokens' buckets — the same posting set, expression association,
    *     6dp rounding, and (score desc, id asc) window as [[bm25TopK]].
    *
    * None ⇔ no scoring token survives the df gate (caller serves the
    * canonical empty tail via the classic path).
    */
  private def ioPrunedTopK(spark: org.apache.spark.sql.SparkSession,
      path: String, postingSegs: List[Long], tokenBuckets: Int,
      toks: Array[String], queries: DataFrame, qTextCol: String,
      qIdCol: String, idCol: String, k: Int, k1: Double, b: Double,
      maxDfFraction: Double): Option[DataFrame] = {
    require(k > 0, s"need k > 0, got $k")
    import spark.implicits._
    // exact corpus constants — ONE tiny stats fold (the commit-log
    // resolution happened in the caller; postingSegs ⊆ that snapshot)
    val segsAll = committedSegs(path)
    val statsRow = segsAll.map(id => spark.read.parquet(s"${segDir(path, id)}/stats"))
      .reduce(_ unionByName _)
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("total_dl")), lit(0L)).as("total_dl"))
      .collect().head
    val nDocs = statsRow.getLong(0)
    val totalDl = statsRow.getLong(1)
    val avgdl = totalDl.toDouble / (if (nDocs > 0) nDocs else 1L)
    // blockstats for the query tokens: a tb-pruned, token-pushed read of
    // the tiny side tables — NO posting bytes; merged across segments
    // (n sums; max_tf/min_dl extremes still bound every member)
    val allBuckets = bucketsOf(toks.toSeq, tokenBuckets)
    val merged = postingSegs.map(id =>
        spark.read.parquet(s"${segDir(path, id)}/blockstats"))
      .reduce(_ unionByName _)
      .where(col("tb").isin(allBuckets.map(Integer.valueOf): _*))
      .where(col("token").isin(toks.toSeq: _*))
      .groupBy(col("token"), col("__blk"))
      .agg(sum(col("n")).as("n"), max(col("max_tf")).as("max_tf"),
        min(col("min_dl")).as("min_dl"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    val dfT: Map[String, Long] =
      merged.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._3).sum }
    // the df gate, driver-side with the scorer's exact comparison: a
    // gated stopword's postings are never read below this line
    val scoring = toks.filter(t =>
      dfT.get(t).exists(df => df <= maxDfFraction * nDocs))
    if (scoring.isEmpty) return None
    def tfPartD(tf: Long, dl: Long): Double =
      (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    def idfD(df: Long): Double =
      math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    // per-token block-floor selection (stage 2 above)
    final case class TokPlan(sel: Set[Int], sT: Double,
      bmax: Map[Int, Double])
    val plan: Map[String, TokPlan] = scoring.map { t =>
      val idf = idfD(dfT(t))
      val blocks = merged.filter(_._1 == t)
        .map { case (_, blk, n, mtf, mdl) => (blk, n, idf * tfPartD(mtf, mdl)) }
        .sortBy { case (blk, _, bm) => (-bm, blk) }
      var cum = 0L
      var i = 0
      while (i < blocks.length && cum < k) { cum += blocks(i)._2; i += 1 }
      val sT =
        if (i >= blocks.length) 0.0 else blocks.drop(i).map(_._3).max
      t -> TokPlan(blocks.take(i).map(_._1).toSet, sT,
        blocks.map { case (blk, _, bm) => blk -> bm }.toMap)
    }.toMap
    val scoringBuckets = bucketsOf(scoring.toSeq, tokenBuckets)
    def rawScoringRead(): DataFrame = postingSegs.map(id =>
        spark.read.parquet(s"${segDir(path, id)}/postings"))
      .reduce(_ unionByName _)
      .where(col("tb").isin(scoringBuckets.map(Integer.valueOf): _*))
      .where(col("token").isin(scoring.toSeq: _*))
    // the super-floor read: the block-floor disjunction, pushed so the
    // (token, __blk)-sorted row groups of sub-floor postings are skipped
    val floorPred = scoring.map(t =>
      col("token") === lit(t) &&
        col("__blk").isin(plan(t).sel.toSeq.map(Integer.valueOf): _*))
      .reduce(_ || _)
    // materialized ONCE (localCheckpoint): three consumers (θ partials,
    // per-token floors, doc bounds) read it without re-scanning parquet.
    // Its size is the selected blocks' mass — per token, the minimal
    // high-impact prefix holding ≥ k postings — the same candidate-
    // machinery class as the frames the in-memory pipeline checkpoints
    val superFloor = rawScoringRead().where(floorPred)
      .select(col("token"), col(idCol), col("tf"), col("dl"), col("__blk"))
      .localCheckpoint(true)
    // exact-idf frame: df injected as data, idf/avgdl/gate computed with
    // the scorer's own expressions (bit-identical doubles)
    val statsDf = broadcast(Seq((nDocs, avgdl)).toDF("n_docs", "avgdl"))
    val summDf = broadcast(scoring.map(t => (t, dfT(t))).toSeq.toDF("token", "df"))
    val qTok = queries
      .select(col(qIdCol), explode(array_distinct(lowTokens(col(qTextCol)))).as("token"))
      .where(col("token").isin(scoring.toSeq: _*))
    val perQT = broadcast(qTok).join(summDf, Seq("token"))
      .crossJoin(statsDf)
      .withColumn("__idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .select(col(qIdCol), col("token"), col("__idf"))
    def partExpr: Column = col("__idf") *
      (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    // θ floor (a): k-th best partial score over the super-floor postings
    val partial = broadcast(perQT).join(superFloor, Seq("token"))
      .crossJoin(statsDf)
      .withColumn("__part", partExpr)
      .groupBy(col(qIdCol), col(idCol))
      .agg(round(sum(col("__part")), 6).as("__pscore"))
    val wSeed = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("__pscore").desc)
    val seedTheta = partial.withColumn("__srn", row_number().over(wSeed))
      .where(col("__srn") === k)
      .select(col(qIdCol), col("__pscore").as("__stheta"))
    // θ floor (b): each token's k-th best super-floor contribution
    val wTok = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("__c").desc)
    val tokBounds = superFloor
      .join(broadcast(perQT.select(col("token"), col("__idf")).distinct()),
        Seq("token"))
      .crossJoin(statsDf)
      .withColumn("__c", col("__idf") *
        (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .withColumn("__rn", row_number().over(wTok))
      .where(col("__rn") <= k)
      .groupBy(col("token"))
      .agg(when(count(lit(1)) === k, min(col("__c"))).as("__kth"))
    val theta = broadcast(qTok).join(broadcast(tokBounds), Seq("token"))
      .groupBy(col(qIdCol)).agg(max(col("__kth")).as("__ktok"))
      .join(broadcast(seedTheta), Seq(qIdCol), "left")
      .select(col(qIdCol),
        (greatest(col("__ktok"), col("__stheta")) - lit(1e-6)).as("__theta"))
    // stage 4: the unseen-doc class bound and the per-query fallback flag
    val sTDf = broadcast(scoring.map(t => (t, plan(t).sT)).toSeq
      .toDF("token", "__s"))
    val sumS = broadcast(qTok).join(sTDf, Seq("token"))
      .groupBy(col(qIdCol)).agg(sum(col("__s")).as("__sums"))
    val qFlags = sumS.join(theta, Seq(qIdCol), "left")
      .select(col(qIdCol), col("__theta"),
        (col("__theta").isNull || col("__sums") >= col("__theta")).as("__fb"),
        col("__sums"))
      .localCheckpoint(true) // one row per query
    // stage 5: per-(query, doc) bound from the super-floor memberships
    val bmaxDf = broadcast(scoring.flatMap(t =>
        plan(t).bmax.map { case (blk, v) => (t, blk, v) }).toSeq
      .toDF("token", "__blk", "__bmax"))
    val keep = broadcast(qTok)
      .join(superFloor.select(col("token"), col(idCol), col("__blk")),
        Seq("token"))
      .join(bmaxDf, Seq("token", "__blk"))
      .join(sTDf, Seq("token"))
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum(col("__bmax") - col("__s")).as("__gain"))
      .join(broadcast(qFlags), Seq(qIdCol))
      .where(col("__theta").isNull ||
        (col("__sums") + col("__gain")) >= col("__theta"))
      .select(col(qIdCol), col(idCol), lit(true).as("__keep"))
    // stage 6: exact scoring of the survivors — ONE full pruned-bucket
    // scan, the scorer's own expression/rounding/window
    val scoredParts = broadcast(perQT).join(rawScoringRead()
        .select(col("token"), col(idCol), col("tf"), col("dl")), Seq("token"))
      .crossJoin(statsDf)
      .withColumn("__part", partExpr)
    val filtered = scoredParts
      .join(broadcast(qFlags.select(col(qIdCol), col("__fb"))), Seq(qIdCol))
      .join(keep, Seq(qIdCol, idCol), "left_outer")
      .where(col("__fb") || col("__keep"))
    val scored = filtered.groupBy(col(qIdCol), col(idCol))
      .agg(round(sum(col("__part")), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("score").desc, col(idCol).asc)
    Some(scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009) — the
    * standard way to combine heterogeneous retrievers (BM25 + dense ANN,
    * BM25 + overlap, ...): fused(q, d) = Σ_r 1/(k0 + rank_r(q, d)) over
    * every ranking r that returned d, then keep each query's `topK` by
    * (fused desc, id asc). Rank-based, so the input scorers need no
    * calibration against each other; k0 = 60 is the paper's constant.
    *
    * Each input frame carries (qIdCol, idCol, rankCol). Scale: the
    * union/re-aggregate shuffles only (query, doc, contrib) triples of
    * the ALREADY-top-k'd inputs — candidate-set-sized, never
    * corpus-sized; the final window spans ≤ Σ k_r rows per query.
    */
  def rrfFuse(rankings: Seq[DataFrame], qIdCol: String, idCol: String,
      rankCol: String = "rank", k0: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k0 > 0 && topK > 0, s"need k0 > 0 and topK > 0, got $k0/$topK")
    val contribs = rankings.map(_.select(col(qIdCol), col(idCol),
      (lit(1.0) / (lit(k0) + col(rankCol).cast("double"))).as("__c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(qIdCol), col(idCol)).agg(sum(col("__c")).as("rrf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("rrf").desc, col(idCol).asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .where(col("fused_rank") <= topK)
  }
}
