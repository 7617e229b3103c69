package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.algebra.{Moments, QHist, Semigroup, TopK}
import graft.api.{ExternalService, GraftSink, GraftStream, KeyedGraftStream}
import graft.batch.BatchStore
import graft.client.ClientStore
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{AsofJoin, BatchServices, Dedup, LoopJoin, Packing, PretrainPipeline, Retrieval, RowIndex, Sampling, Scoring, Sharding, Similarity}
import graft.time.{BatchID, Batcher, Timestamp}

import GateHelpers._

/** Gate registry — the deduplication family (exact / MinHash / SimHash /
  * embedding / spans / incremental) PLUS, positionally, the rows that
  * shared its SparkEntry neighborhood: lexical retrieval (q_bm25*,
  * q_streaming_bm25), LM scoring (q_lm_score, q_lm_score_bigram),
  * packing (q_pack*), pipelines (q_pipeline*), and q_row_index. The
  * split is the round-19 verbatim SparkEntry slice, NOT a semantic
  * re-grouping (r19 advice: say so, so a maintainer looks here — not
  * TextGate — for a BM25 row; TextGate holds the backoff LM and the
  * hybrid-fusion rows for the same reason). RegistrySplitSpec pins the
  * union's disjointness; SparkEntry concatenates the registries.
  */
private[graft] object DedupGate {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // -- dedup family ----------------------------------------------------
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(docsDs(s, dir).toDF(), "text", "doc_id").select("doc_id")),


    "q_dedup_exact_norm" -> ((s, dir) =>
      Dedup.exactNormalized(docsDs(s, dir).toDF(), "text", "doc_id").select("doc_id")),


    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashLsh(docsDs(s, dir).toDF(), "text", "doc_id",
        w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5).select("doc_id")),


    "q_exact_substr" -> ((s, dir) =>
      // ExactSubstr-style span removal (Lee et al. ACL'22): non-first
      // occurrences of 8-token windows are removed, text rebuilt from
      // surviving tokens. Oracle recomputes the same first-occurrence
      // ranking over literal gram strings in DuckDB.
      Dedup.removeDuplicatedSpans(docsDs(s, dir).toDF(), "text", "doc_id", k = 8)),


    "q_span_incr" -> ((s, dir) => {
      // incremental span removal: the daily batch (doc_id % 5 == 0) loses
      // spans already present in the historical corpus plus non-first
      // re-occurrences within the batch; the corpus-side input is the
      // stored spanHashes frame (here computed inline).
      val base = t(s, dir, "documents").select("doc_id", "text")
      val batch = base.where(col("doc_id") % 5 === 0)
      val corpus = base.where(col("doc_id") % 5 =!= 0)
      Dedup.removeDuplicatedSpansAgainst(batch,
        Dedup.spanHashes(corpus, "text", k = 8), "text", "doc_id", k = 8)
    }),


    "q_pipeline_spans" -> ((s, dir) => {
      // span-hygiene COMPOSITION: ExactSubstr span removal → drop docs
      // emptied by it → exact dedup of the REBUILT text (catches docs
      // that became byte-identical only after their duplicated spans
      // were cut). The whole chain is oracled in one SQL statement.
      val cleaned = Dedup.removeDuplicatedSpans(
        t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id", k = 8)
      Dedup.exact(cleaned.where(length(col("text_clean")) > 0),
        "text_clean", "doc_id").select("doc_id")
    }),


    "q_dedup_cc" -> ((s, dir) =>
      // transitive-closure dedup: connected components over the verified
      // near-dup graph, keep each component's min id. The oracle computes
      // the same closure with a recursive CTE over the exact-jaccard pair
      // set (banding recall is ~1 at 0.5 on this corpus, as established
      // for q_minhash_cands).
      Dedup.minhashLshTransitive(docsDs(s, dir).toDF(), "text", "doc_id",
        w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5).select("doc_id")),


    "q_dedup_canonical" -> ((s, dir) => {
      // the POLICY layer over the same closure: production releases keep
      // the best member per near-dup cluster, not the smallest id — here
      // the longest text, ties to min id. Output is the full resolution
      // mapping (every doc -> its cluster's canonical doc).
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("score", length(col("text")))
      val pairs = Dedup.minhashVerifiedPairs(docs, "text", "doc_id",
        w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      Dedup.canonicalByScore(docs, pairs, "doc_id", "score")
    }),


    "q_bm25" -> ((s, dir) => {
      // lexical retrieval: all BM25-scored (query, doc) pairs for the
      // fixed query set — the index build + broadcast-candidate join +
      // score aggregation path, fully oracled (scores to 6dp)
      Retrieval.bm25Scores(t(s, dir, "documents").select("doc_id", "text"),
        bm25Queries(s), "text", "doc_id", "qtext", "query_id")
    }),


    "q_bm25_topk" -> ((s, dir) => {
      // per-query top-3 by (rounded score desc, doc_id) — the window
      // rank compiles to WindowGroupLimit (partial top-k map-side)
      val idx = Retrieval.buildIndex(
        t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id")
      Retrieval.bm25TopK(idx, bm25Queries(s), "qtext", "query_id", k = 3)
    }),


    "q_bm25_topk_pruned" -> ((s, dir) => {
      // WAND-lite (max-score) impact pruning: per-token ub/minc bounds
      // derive a sound k-th-score floor θ, docs reachable only through
      // the sub-θ token prefix are never scored — identical output to
      // q_bm25_topk (shared oracle) with the stopword-class aggregation
      // volume skipped
      val idx = Retrieval.buildIndex(
        t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id")
      Retrieval.bm25TopKPruned(idx, bm25Queries(s), "qtext", "query_id", k = 3)
    }),


    "q_bm25_incr" -> ((s, dir) => {
      // daily-ingest shape: index built on 2/3 of the corpus, the rest
      // appended WITHOUT touching existing postings (stats merged
      // associatively) — scores must equal the full rebuild, so this row
      // shares q_bm25's oracle verbatim
      val base = t(s, dir, "documents").select("doc_id", "text")
      val idx0 = Retrieval.buildIndex(
        base.where(col("doc_id") % 3 =!= 0), "text", "doc_id")
      val idx = Retrieval.appendToIndex(idx0,
        base.where(col("doc_id") % 3 === 0), "text")
      Retrieval.bm25FromIndex(idx, bm25Queries(s), "qtext", "query_id")
    }),


    "q_bm25_stored" -> ((s, dir) => {
      // the serving path: index persisted token-bucketed, queries answered
      // from a PRUNED read (static tb partition filter + pushed token IN) —
      // exactness unaffected, so the row shares q_bm25's oracle verbatim
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_store_").toString
      try {
        val idx = Retrieval.buildIndex(
          t(s, dir, "documents").select("doc_id", "text"), "text", "doc_id")
        Retrieval.writeIndex(idx, tmp, tokenBuckets = 16)
        // materialize before the finally reclaims the index files
        Retrieval.bm25FromStored(s, tmp, tokenBuckets = 16,
          bm25Queries(s), "qtext", "query_id", "doc_id").localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),


    "q_bm25_topk_stored" -> ((s, dir) => {
      // the end-to-end stored SERVING path: scan pruned to the query
      // tokens' buckets (tb IN + pushed token IN), WAND-pruned scoring,
      // WindowGroupLimit top-k — exact, shares q_bm25_topk's oracle
      val docsDf = t(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_tks_").toString
      try {
        Retrieval.writeIndex(Retrieval.buildIndex(docsDf, "text", "doc_id"),
          tmp, tokenBuckets = 16)
        Retrieval.bm25TopKFromStored(s, tmp, tokenBuckets = 16,
          bm25Queries(s), "qtext", "query_id", "doc_id", k = 3)
          .localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),


    "q_bm25_stored_ioprune" -> ((s, dir) => {
      // round 20 (r19 verdict #3): the IO side of block-max pruning.
      // Segments persist the quantized-impact block id per posting
      // ((token, __blk)-sorted row groups) plus a tiny blockstats table;
      // the serve then derives dfs/idf and block bounds WITHOUT any
      // posting scan, reads only the pushed block-floor postings for its
      // θ/bounds machinery (row groups of low-impact stopword postings
      // skipped via parquet min/max stats — 128 KiB row groups here so
      // the skip is demonstrable at gate scale), and exact-scores the
      // survivors in ONE full pruned-bucket scan — vs the classic
      // pipeline's five. Pins: result identity with the in-memory
      // scorer AND the classic stored path (the top-k rows themselves
      // are this row's oracle data), and an in-row filesystem
      // bytes-read audit showing the IO path reads fewer bytes.
      val docsDf = t(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_iop_").toString
      try {
        PhaseTimer.time("q_bm25_stored_ioprune", "build") {
          Retrieval.writeIndex(Retrieval.buildIndex(docsDf, "text", "doc_id"),
            tmp, tokenBuckets = 16, rowGroupBytes = Some(128L * 1024))
        }
        def serve(io: Boolean): (org.apache.spark.sql.DataFrame, Long) = {
          val b0 = fsBytesRead()
          val out = Retrieval.bm25TopKFromStored(s, tmp, tokenBuckets = 16,
            bm25Queries(s), "qtext", "query_id", "doc_id", k = 3,
            ioPrune = io).localCheckpoint(true)
          (out, fsBytesRead() - b0)
        }
        val (ioDf, ioBytes) = serve(io = true)
        val (classicDf, classicBytes) =
          PhaseTimer.time("q_bm25_stored_ioprune", "prune_audit") {
            serve(io = false)
          }
        // multiset equality via |A| = |B| ∧ A∖B = ∅ — both frames are
        // checkpointed, so the counts are free and the second exceptAll
        // direction is redundant (equal sizes + empty difference one way
        // imply equality); the in-memory oracle is checkpointed ONCE so
        // its full pipeline isn't recomputed per comparison job
        val sameAsUnpruned = PhaseTimer.time("q_bm25_stored_ioprune",
            "prune_audit") {
          ioDf.count() == classicDf.count() &&
            ioDf.exceptAll(classicDf).count() == 0
        }
        val sameAsMem = PhaseTimer.time("q_bm25_stored_ioprune",
            "exact_oracle") {
          val mem = Retrieval.bm25TopK(
            Retrieval.buildIndex(docsDf, "text", "doc_id"),
            bm25Queries(s), "qtext", "query_id", k = 3).localCheckpoint(true)
          ioDf.count() == mem.count() && ioDf.exceptAll(mem).count() == 0
        }
        System.err.println(f"[graft] q_bm25_stored_ioprune bytes: io " +
          f"$ioBytes vs classic $classicBytes (${
            ioBytes.toDouble / math.max(1L, classicBytes)}%.3f)")
        ioDf.withColumn("same_as_mem", lit(sameAsMem))
          .withColumn("same_as_unpruned", lit(sameAsUnpruned))
          .withColumn("pruned_fewer_bytes", lit(ioBytes < classicBytes))
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),


    "q_bm25_delete" -> ((s, dir) => {
      // the takedown / right-to-be-forgotten maintenance path: bootstrap a
      // stored index over the full corpus, DELETE doc_id % 7 == 3 (a
      // delete-set segment + negative stats delta on one atomic commit),
      // then serve — must equal DuckDB's BM25 over the RETAINED corpus
      // exactly, including the N/avgdl shift and df-derived idf changes
      val docsDf = t(s, dir, "documents").select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_del_").toString
      try {
        Retrieval.writeIndex(Retrieval.buildIndex(docsDf, "text", "doc_id"),
          tmp, tokenBuckets = 16)
        Retrieval.deleteFromStored(s, tmp,
          docsDf.where(col("doc_id") % 7 === 3).select("doc_id"))
        Retrieval.bm25FromStored(s, tmp, tokenBuckets = 16,
          bm25Queries(s), "qtext", "query_id", "doc_id").localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),


    "q_bm25_replace" -> ((s, dir) => {
      // round 14: ATOMIC correction of a poisoned ingest
      // (Retrieval.replaceInStored): bootstrap the stored index from a
      // corpus whose doc_id % 7 == 3 slice was mangled at ingest (junk
      // token noise), then upsert the TRUE slice back — corrected
      // postings, the victim delete-set with its coverage marker, and
      // the exact (N, total_dl) stats delta publish on ONE commit-log
      // flip — and serve. Must equal DuckDB's BM25 over the true corpus
      // verbatim (q_bm25's oracle shared): no trace of the poisoned
      // texts in N, avgdl, dfs, or scores.
      val docsDf = t(s, dir, "documents").select("doc_id", "text")
      val mangled = docsDf.withColumn("text",
        when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" zzjunk zzjunk zznoise zzjunk")))
          .otherwise(col("text")))
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_rep_").toString
      try {
        Retrieval.writeIndex(Retrieval.buildIndex(mangled, "text", "doc_id"),
          tmp, tokenBuckets = 16)
        Retrieval.replaceInStored(s, tmp, tokenBuckets = 16,
          docsDf.where(col("doc_id") % 7 === 3), "text", "doc_id")
        Retrieval.bm25FromStored(s, tmp, tokenBuckets = 16,
          bm25Queries(s), "qtext", "query_id", "doc_id").localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),


    "q_streaming_bm25" -> ((s, dir) => {
      // the FULL stored-index maintenance lifecycle: the corpus arrives in
      // 3 doc_id-sliced micro-batches, each committed as a new index
      // segment inside foreachBatch (the index stays serveable between
      // batches), then the maintenance-cadence COMPACTION folds the
      // segments into one (atomic commit-log flip), and scoring runs off
      // the compacted index. Every stage is exact, so this row still
      // shares q_bm25's oracle verbatim.
      // State story: NO Spark state-store state (fanout is stateless) —
      // the index IS the durable state, all-time by the operator's
      // contract; replay safety is the segment replay guard (batchId),
      // not a TTL/horizon (see StreamingIO.fanout)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = docsDs(s, dir).collect()
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_stream_").toString
      try {
        // bootstrap: an EMPTY index ((0,0) stats, no postings) to ingest into
        Retrieval.writeIndex(Retrieval.buildIndex(
          t(s, dir, "documents").select("doc_id", "text").limit(0),
          "text", "doc_id"), tmp, tokenBuckets = 16)
        val writer = graft.streaming.StreamingIO.fanout(
          ms.toDS().toDF("doc_id", "text"))(Seq(
          (b, bid) => Retrieval.appendToStored(s, tmp, 16, b, "text",
            "doc_id", batchId = Some(bid))))
        withStreamingGateConf(s, 4) {
          val q = writer.start()
          try {
            (0 until 3).foreach { i =>
              ms.addData(docs.iterator.filter(_.doc_id % 3 == i)
                .map(d => (d.doc_id, d.text)).toSeq)
              q.processAllAvailable()
            }
          } finally q.stop()
        }
        Retrieval.compactStored(s, tmp, tokenBuckets = 16)
        Retrieval.bm25FromStored(s, tmp, tokenBuckets = 16,
          bm25Queries(s), "qtext", "query_id", "doc_id").localCheckpoint(true)
      } finally graft.batch.BatchState.deleteDir(tmp)
    }),


    "q_minhash_cands" -> ((s, dir) =>
      // the VERIFIED candidate stage: banding proposes, exact shingle
      // jaccard disposes. Oracling the raw candidate set would assert
      // perfect banding PRECISION (false positives are allowed by
      // construction — a single sub-threshold band collision on regenerated
      // data would fail the gate); the verified stage is the contract.
      Dedup.minhashVerifiedPairs(docsDs(s, dir).toDF(), "text", "doc_id",
        w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .select("id_a", "id_b")),


    "q_dedup_incr_exact" -> ((s, dir) => {
      // incremental exact dedup: a "daily batch" (the %5 slice plus planted
      // byte-copies of corpus docs under shifted ids) deduped against the
      // historical corpus without re-pairing the corpus with itself. The
      // planted copies must all drop; the originals survive.
      val base = t(s, dir, "documents").select("doc_id", "text")
      val newBatch = base.where(col("doc_id") % 5 === 0).unionByName(
        base.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val corpus = base.where(col("doc_id") % 5 =!= 0)
      Dedup.exactAgainst(newBatch, corpus, "text", "doc_id").select("doc_id")
    }),


    "q_dedup_incr_bloom" -> ((s, dir) => {
      // same daily-ingest shape, via the Bloom-prefiltered path: the
      // corpus collapses to one bit array; only sketch-flagged batch rows
      // enter the verification anti-join. No false negatives => result is
      // exactly exactAgainst's, so the two queries share an oracle.
      val base = t(s, dir, "documents").select("doc_id", "text")
      val newBatch = base.where(col("doc_id") % 5 === 0).unionByName(
        base.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val corpus = base.where(col("doc_id") % 5 =!= 0)
      Dedup.exactAgainstBloom(newBatch, corpus, "text", "doc_id",
        numBits = 1 << 20, k = 5).select("doc_id")
    }),


    "q_dedup_incr_minhash" -> ((s, dir) => {
      // incremental near-dup: cross-only LSH between the new batch and the
      // corpus (bands x |new| bucket probes, no corpus self-join), verified
      // at exact 3-gram jaccard >= 0.5 against the cross-pair oracle
      val base = t(s, dir, "documents").select("doc_id", "text")
      Dedup.minhashNearCorpus(
        base.where(col("doc_id") % 5 === 0), base.where(col("doc_id") % 5 =!= 0),
        "text", "doc_id", w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
    }),


    "q_row_index" -> ((s, dir) =>
      // contiguous 0-based export ids in (ts, event_id) order WITHOUT the
      // single-task global window: range partition -> per-partition counts
      // -> broadcast offsets -> per-slice row_number
      RowIndex.withRowIndex(eventsDF(s, dir), "idx", col("ts"), col("event_id"))
        .select(col("event_id"), col("idx"))),


    "q_pack" -> ((s, dir) =>
      // concat-and-chunk packing into 512-token training sequences in
      // doc_id order — global token prefix sum via the RowIndex shape
      // (range partition -> per-partition totals -> broadcast offsets),
      // never a data-sized unpartitioned window
      Packing.packSequences(
        t(s, dir, "documents").select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens")),
        col("n_tokens"), 512L, Seq(col("doc_id")))
        .select(col("doc_id"), col("n_tokens"), col("seq_id"), col("seq_offset"))),


    "q_pack_docwise" -> ((s, dir) =>
      // document-boundary-aware packing: budgeted next-fit that never
      // splits a doc across 512-token sequences — groups of 4096 tokens
      // (by prefix sum) are the deterministic parallel unit, local seq ids
      // renumber via a group-count-sized prefix sum
      Packing.packDocwise(
        t(s, dir, "documents").select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", col("n_tokens"), 512L, Seq(col("doc_id")), groupBudget = 4096L)
        .select(col("doc_id"), col("n_tokens"), col("seq_id"), col("seq_offset"))),


    "q_shared_ngrams" -> ((s, dir) =>
      // cross-document duplicated-trigram stats: docs sharing any distinct
      // lowercased 3-gram with another doc; only (id, gram-hash) Longs move
      Dedup.sharedNgramStats(t(s, dir, "documents"), "text", "doc_id",
        n = 3, minDocs = 2)),


    "q_boilerplate" -> ((s, dir) =>
      // C4-style boilerplate-line removal at corpus doc-frequency >= 2;
      // this corpus has no repeated lines, so the row also pins the exact
      // split/filter/rebuild byte-roundtrip (planted-removal laws live in
      // TrainingDataOpsSpec)
      Dedup.removeBoilerplateLines(t(s, dir, "documents"), "text", "doc_id",
        minDocs = 2)),


    "q_lm_score" -> ((s, dir) => {
      // CCNet-style LM quality scoring: unigram LM from the even-id half of
      // the corpus, mean per-token surprisal for the odd-id half. The LM
      // table broadcasts; scoring is explode -> broadcast probe -> hash avg.
      val base = t(s, dir, "documents").select("doc_id", "text")
      val lm = Scoring.unigramLm(base.where(col("doc_id") % 2 === 0), "text")
      Scoring.surprisal(base.where(col("doc_id") % 2 === 1), lm, "text", "doc_id")
        .select(col("doc_id"), round(col("surprisal"), 6).as("surprisal"))
    }),


    "q_lm_score_bigram" -> ((s, dir) => {
      // conditional-bigram LM from the even-id half, mean per-bigram
      // surprisal for the odd-id half — same broadcast-table shape as
      // q_lm_score, one n-gram order up
      val base = t(s, dir, "documents").select("doc_id", "text")
      val lm = Scoring.bigramLm(base.where(col("doc_id") % 2 === 0), "text")
      Scoring.bigramSurprisal(base.where(col("doc_id") % 2 === 1), lm, "text", "doc_id")
        .select(col("doc_id"), round(col("surprisal"), 6).as("surprisal"))
    }),


    "q_pipeline" -> ((s, dir) => {
      // the END-TO-END hygiene pipeline: quality gate -> repetition gate ->
      // exact dedup -> verified minhash near-dup dedup -> benchmark
      // decontamination -> deterministic sample + split labels, one call.
      // Every stage is individually oracled elsewhere; this row oracles the
      // COMPOSITION (stage order and survivor flow).
      val base = t(s, dir, "documents").select("doc_id", "text")
      PretrainPipeline.clean(
        base.where(col("doc_id") % 20 =!= 0), base.where(col("doc_id") % 20 === 0),
        "text", "doc_id")
    }),


    "q_dedup_simhash" -> ((s, dir) => {
      // planted-needle invariant oracle (q_hll pattern): the survivor set
      // itself is signature-specific, but simhash(maxHamming=3) MUST drop
      // an exact copy — identical text ⇒ identical 64-bit signature ⇒
      // hamming 0, and the 4×16-bit banding is pigeonhole-complete at
      // hamming ≤ 3, so the copy always pairs with its smaller-id original
      // and the smallest-id-survives policy drops it. Plant a copy of
      // every 10th doc — at id MAX + 1 + doc_id, so plants sit strictly
      // above every real id at ANY corpus size (a fixed offset would
      // collide once doc_ids reach it) — and oracle that ALL planted
      // copies are dropped; the full simhash pipeline (signatures,
      // banding join, hamming verify) runs over corpus + plants.
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val planted = docs.where(col("doc_id") % 10 === 0)
        .crossJoin(docs.agg(max(col("doc_id")).as("__mx")))
        .select((col("__mx") + lit(1L) + col("doc_id")).as("doc_id"), col("text"))
      val survivors = Dedup.simhash(docs.union(planted), "text", "doc_id",
        maxHamming = 3).select(col("doc_id"), lit(1).as("__kept"))
      planted.select("doc_id")
        .join(survivors, Seq("doc_id"), "left")
        .select(col("doc_id"), col("__kept").isNull.as("planted_dropped"))
    }),


    "q_ngram_jaccard" -> ((s, dir) =>
      // EXACT all-pairs n-gram Jaccard >= 0.5 — the ground truth the LSH
      // candidate stage approximates; oracle-checked via DuckDB string
      // shingle sets (hashing is jaccard-invariant modulo 64-bit collisions)
      Dedup.jaccardAllPairs(docsDs(s, dir).toDF(), "text", "doc_id", 3, 0.5)),


    "q_dedup_embedding" -> ((s, dir) =>
      // exact all-pairs form (oracle-checked); the LSH-bucketed scale path
      // is q_dedup_embedding_lsh
      Dedup.embeddingNearDupExact(t(s, dir, "embeddings"), "embedding", "vec_id",
        threshold = 0.95).select("vec_id")),


    "q_dedup_embedding_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDup(t(s, dir, "embeddings"), "embedding", "vec_id",
        dim = 64, threshold = 0.95, nBits = 8).select("vec_id")),


    "q_semdedup" -> ((s, dir) =>
      // SemDeDup at nClusters = 1: the cluster-scoped pair search is
      // exhaustive, so the survivor set is exact (the oracle-checked
      // configuration, like full-probe IVF); partial-cluster recall and
      // the cluster-containment law live in ApproxOpsSpec
      Dedup.semanticDedup(t(s, dir, "embeddings"), "embedding", "vec_id",
        nClusters = 1, threshold = 0.9, lloydIters = 0).select("vec_id")),


    "q_semdedup_hier" -> ((s, dir) => {
      // SemDeDup in the PRODUCTION-k regime: k grows with the corpus, so
      // assignment goes through the multi-probe two-level coarse quantizer
      // (~5√k cosines/row at nProbe=4 instead of k — at 100 TB, k ~ 1e5
      // makes brute-force assignment the dominant cost: 5√k/k ≈ 1.6%).
      // Invariants computed Spark-side: survivors stay within the corpus;
      // the EXHAUSTIVE all-pairs survivors are a subset (cluster scoping
      // can only MISS pairs, true for ANY assignment); the probed
      // assignment agrees with brute argmax on >= 90% of rows; and the
      // mean cosine gap between the probed choice and the true best
      // centroid is <= 0.02 (measured 0.005 — near-ties among crowded
      // centroids account for most disagreements, so the gap is the
      // honest fidelity metric, the agreement rate the strict one).
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val k = 64
      // ONE k-means training shared by the operator and the quality check
      // (each Lloyd pass compiles a k-literal-centroid expression; training
      // twice would double the row's dominant fixed cost). Round 16: Lloyd
      // trains on a BOUNDED hashed-id sample, driver-local (the
      // pqCodebooks discipline) — at 100x data the training cost is flat
      // and the corpus is scanned once (the assignment pass); every
      // invariant below is computed against THESE centroids, so the gate
      // is unchanged by where they were refined.
      val cents = PhaseTimer.time("q_semdedup_hier", "train") {
        Similarity.kmeansCentroids(e, "embedding", "vec_id", k, 2,
          hierAssign = true, trainSample = 16384)
      }
      val hierKept = PhaseTimer.time("q_semdedup_hier", "dedup") {
        Dedup.semanticDedup(e, "embedding", "vec_id",
          nClusters = k, threshold = 0.9, hierAssign = true,
          centroids = Some(cents))
          .select("vec_id").localCheckpoint(true)
      }
      val q = PhaseTimer.time("q_semdedup_hier", "fidelity") {
        // the k-cosine array lands in ONE named column (round 21, r20
        // verdict #7): brute argmax and both gap terms previously each
        // built their own k-literal-centroid cosine array — 3 evaluations
        // (and 3x the codegen tree) for identical expressions. Same
        // doubles: __brute is nearestCentroid's own argmax form over the
        // same array, the gap terms are the same element_at lookups.
        val sims = array(cents.toIndexedSeq.map(c =>
          graft.functions.VectorFunctions.cosine(col("embedding"),
            array(c.toIndexedSeq.map(lit(_)): _*))): _*)
        Similarity.withNearestCentroidTwoLevel(
            e, col("embedding"), cents, "__hier")
          .withColumn("__sims", sims)
          .withColumn("__brute",
            (array_position(col("__sims"), array_max(col("__sims"))) - 1).cast("int"))
          .agg(avg(when(col("__hier") === col("__brute"), 1.0).otherwise(0.0)),
            avg(element_at(col("__sims"), col("__brute") + 1) -
              element_at(col("__sims"), col("__hier") + 1)))
          .head()
      }
      val (agree, gap) = (q.getDouble(0), q.getDouble(1))
      val nVecs = e.count()
      val within = hierKept.join(e.select("vec_id"), Seq("vec_id"), "left_anti").count() == 0
      // exact-subset invariant in WITNESS form (round 16), banded
      // (round 17): exactKept ⊆ hierKept ⇔ every hier-DROPPED doc has a
      // smaller-id exact near-dup — complement inclusion, the identical
      // boolean. Round 16's broadcast witness scan was |dropped| × n
      // (51.1 s of this row's 77.4 s at organic 100x); the banded form
      // prefilters witness pairs with the SAME hyperplane-bucket family
      // q_dedup_embedding_lsh uses and re-checks only the LSH-missed
      // remainder exhaustively — one banded broadcast join + a small
      // exact pass, boolean unchanged (Dedup.nearDupWitnessCheck; the
      // all-pairs OPERATOR keeps its own oracle row, q_dedup_embedding).
      val exactSubset = PhaseTimer.time("q_semdedup_hier", "exact_oracle") {
        Dedup.nearDupWitnessCheck(e, hierKept, "embedding", "vec_id",
          dim = 64, threshold = 0.9)
      }
      Seq((nVecs, within, exactSubset, agree >= 0.9, gap <= 0.02))
        .toDF("n_vecs", "survivors_within_corpus", "exact_kept_subset",
          "agreement_ok", "gap_ok")
    })
  )

  def oracleSql: Map[String, String] = Map(


    "q_dedup_exact" ->
      "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",


    "q_dedup_exact_norm" ->
      """SELECT min(doc_id) AS doc_id FROM documents
        |GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))""".stripMargin,


    // q_minhash_cands is the VERIFIED stage, so exact Jaccard precision is
    // guaranteed by construction; matching the exact pair set then asserts
    // only banding RECALL, which is ~1 at the 0.5 threshold for this
    // banding config on near-dup corpora (recall law in ApproxOpsSpec)
    "q_minhash_cands" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |AND (CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |  ELSE 1.0 END) >= 0.5""".stripMargin,


    "q_dedup_minhash" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents))
        |SELECT doc_id FROM documents WHERE doc_id NOT IN (
        |  SELECT b.doc_id FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |  AND (CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    ELSE 1.0 END) >= 0.5)""".stripMargin,


    "q_dedup_embedding_lsh" ->
      """SELECT e.vec_id FROM embeddings e WHERE NOT EXISTS (
        |  SELECT 1 FROM embeddings o WHERE o.vec_id < e.vec_id
        |  AND list_cosine_similarity(o.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= 0.95)""".stripMargin,


    // first-occurrence ranking over literal 8-gram strings; Spark ranks
    // over xxhash64 of the same gram (position sets identical absent a
    // 64-bit collision)
    "q_exact_substr" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, i AS pos, array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |  FROM t, UNNEST(range(1, greatest(len(toks) - 6, 1))) AS u(i)),
        |flagged AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |    FROM w) WHERE rn > 1),
        |cover AS (
        |  SELECT DISTINCT f.doc_id, r.j
        |  FROM flagged f, UNNEST(range(f.pos, f.pos + 8)) AS r(j)),
        |tok AS (
        |  SELECT doc_id, toks[i] AS tok, i
        |  FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
        |kept AS (
        |  SELECT k.doc_id, k.tok, k.i
        |  FROM tok k LEFT JOIN cover c ON k.doc_id = c.doc_id AND k.i = c.j
        |  WHERE c.j IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text_clean,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.text_clean, '') AS text_clean,
        |  len(t.toks) - coalesce(a.n_kept, 0) AS n_removed
        |FROM t LEFT JOIN agg a USING (doc_id)""".stripMargin,


    "q_span_incr" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE doc_id % 5 = 0),
        |ct AS (
        |  SELECT list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents WHERE doc_id % 5 != 0),
        |cg AS (
        |  SELECT DISTINCT array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |  FROM ct, UNNEST(range(1, greatest(len(toks) - 6, 1))) AS u(i)),
        |w AS (
        |  SELECT doc_id, i AS pos, array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |  FROM t, UNNEST(range(1, greatest(len(toks) - 6, 1))) AS u(i)),
        |flagged AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, gram,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |    FROM w) x
        |  WHERE rn > 1 OR gram IN (SELECT gram FROM cg)),
        |cover AS (
        |  SELECT DISTINCT f.doc_id, r.j
        |  FROM flagged f, UNNEST(range(f.pos, f.pos + 8)) AS r(j)),
        |tok AS (
        |  SELECT doc_id, toks[i] AS tok, i
        |  FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
        |kept AS (
        |  SELECT k.doc_id, k.tok, k.i
        |  FROM tok k LEFT JOIN cover c ON k.doc_id = c.doc_id AND k.i = c.j
        |  WHERE c.j IS NULL),
        |agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text_clean,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.text_clean, '') AS text_clean,
        |  len(t.toks) - coalesce(a.n_kept, 0) AS n_removed
        |FROM t LEFT JOIN agg a USING (doc_id)""".stripMargin,


    "q_pipeline_spans" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, i AS pos, array_to_string(list_slice(toks, i, i + 7), ' ') AS gram
        |  FROM t, UNNEST(range(1, greatest(len(toks) - 6, 1))) AS u(i)),
        |flagged AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |    FROM w) WHERE rn > 1),
        |cover AS (
        |  SELECT DISTINCT f.doc_id, r.j
        |  FROM flagged f, UNNEST(range(f.pos, f.pos + 8)) AS r(j)),
        |tok AS (
        |  SELECT doc_id, toks[i] AS tok, i
        |  FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
        |kept AS (
        |  SELECT k.doc_id, k.tok, k.i
        |  FROM tok k LEFT JOIN cover c ON k.doc_id = c.doc_id AND k.i = c.j
        |  WHERE c.j IS NULL),
        |rebuilt AS (
        |  SELECT t.doc_id, coalesce(a.text_clean, '') AS text_clean
        |  FROM t LEFT JOIN (
        |    SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text_clean
        |    FROM kept GROUP BY doc_id) a USING (doc_id))
        |SELECT min(doc_id) AS doc_id FROM rebuilt
        |WHERE len(text_clean) > 0 GROUP BY text_clean""".stripMargin,


    // reachability closure via recursive CTE: a doc is dropped iff some
    // smaller id is reachable in the exact-jaccard>=0.5 pair graph
    "q_dedup_cc" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |  AND (CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    ELSE 1.0 END) >= 0.5),
        |edges AS (SELECT ida AS s, idb AS d FROM pairs
        |  UNION SELECT idb AS s, ida AS d FROM pairs),
        |reach(s, d) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s)
        |SELECT doc_id FROM documents WHERE doc_id NOT IN (
        |  SELECT DISTINCT s FROM reach WHERE d < s)""".stripMargin,


    // same reachability closure; then per component (min reachable id incl
    // self) elect the winner by (length desc, id asc) and emit the full
    // doc -> canonical mapping
    "q_dedup_canonical" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |  AND (CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    ELSE 1.0 END) >= 0.5),
        |edges AS (SELECT ida AS s, idb AS d FROM pairs
        |  UNION SELECT idb AS s, ida AS d FROM pairs),
        |reach(s, d) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
        |minreach AS (SELECT s AS doc_id, min(d) AS md FROM reach GROUP BY s),
        |comp AS (
        |  SELECT d.doc_id, least(d.doc_id, coalesce(m.md, d.doc_id)) AS comp
        |  FROM documents d LEFT JOIN minreach m USING (doc_id)),
        |winner AS (
        |  SELECT comp, doc_id AS canon_id FROM (
        |    SELECT c.comp, c.doc_id,
        |      row_number() OVER (PARTITION BY c.comp
        |        ORDER BY length(d.text) DESC, c.doc_id ASC) AS rn
        |    FROM comp c JOIN documents d USING (doc_id)) WHERE rn = 1)
        |SELECT c.doc_id, w.canon_id FROM comp c JOIN winner w USING (comp)""".stripMargin,


    "q_bm25" -> bm25OracleScored,


    // takedown: the oracle IS the rebuild-without-the-deleted-docs
    // computation — N/avgdl shift and df-derived idf changes included
    "q_bm25_delete" -> (bm25OracleBaseFor("doc_id % 7 <> 3") + bm25ScoredSuffix),


    // atomic replace of a poisoned slice: serving equals BM25 over the
    // TRUE corpus verbatim — q_bm25's oracle shared
    "q_bm25_replace" -> bm25OracleScored,



    // the incremental index, the pruned stored read, and the streaming
    // ingest MUST all score identically to the full rebuild — these rows
    // share the full-rebuild oracle verbatim
    "q_bm25_incr" -> bm25OracleScored,

    "q_bm25_stored" -> bm25OracleScored,

    "q_streaming_bm25" -> bm25OracleScored,


    "q_bm25_topk" -> bm25TopKOracle,


    // WAND-lite pruning is exact (docs that cannot reach or tie into the
    // top k are never scored), so the pruned row shares the oracle verbatim
    "q_bm25_topk_pruned" -> bm25TopKOracle,


    // stored serving (pruned read + WAND pruning) is exact, so the row
    // shares the top-k oracle verbatim
    "q_bm25_topk_stored" -> bm25TopKOracle,


    // the IO-pruned stored serve is exact too (every floor sound, every
    // bound an over-estimate, survivors scored from the full pruned
    // read), so its top-k rows share the oracle; the identity and
    // bytes-audit booleans are hard pins computed in-row
    "q_bm25_stored_ioprune" ->
      s"""SELECT o.*, TRUE AS same_as_mem, TRUE AS same_as_unpruned,
        |  TRUE AS pruned_fewer_bytes
        |FROM (
        |$bm25TopKOracle
        |) o""".stripMargin,


    // blank docs (empty shingle sets) follow the STAR contract: one
    // (min blank id, other blank id, 1.0) row per extra blank — linear,
    // transitively equivalent to the quadratic clique (Dedup.emptyDocStar)
    "q_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents)),
        |ne AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
        |emp AS (SELECT doc_id FROM sh WHERE len(s) = 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        |FROM ne a, ne b WHERE a.doc_id < b.doc_id AND jaccard >= 0.5
        |UNION ALL
        |SELECT (SELECT min(doc_id) FROM emp) AS id_a, e.doc_id AS id_b,
        |  1.0 AS jaccard
        |FROM emp e WHERE e.doc_id > (SELECT min(doc_id) FROM emp)""".stripMargin,


    "q_row_index" ->
      """SELECT event_id,
        |  row_number() OVER (ORDER BY ts, event_id) - 1 AS idx
        |FROM events""".stripMargin,


    "q_pack" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(s // 512 AS BIGINT) AS seq_id,
        |  CAST(s % 512 AS BIGINT) AS seq_offset
        |FROM c""".stripMargin,


    // docwise next-fit (Packing.packDocwise): groups of 4096 tokens by
    // exclusive prefix sum, a sequential next-fit fold per group (the
    // linear-recursion CTE walks every group in lockstep), then global
    // renumbering by per-group sequence counts — the exact Scala fold
    "q_pack_docwise" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |  FROM t),
        |g AS (SELECT doc_id, n_tokens, CAST(s // 4096 AS BIGINT) AS grp,
        |    row_number() OVER (PARTITION BY s // 4096 ORDER BY s, doc_id) AS rn
        |  FROM c),
        |p AS (
        |  SELECT grp, rn, doc_id, n_tokens,
        |    CAST(0 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS off,
        |    CAST(CASE WHEN n_tokens > 512 THEN 1 ELSE 0 END AS BIGINT) AS cur,
        |    CAST(CASE WHEN n_tokens > 512 THEN 0 ELSE n_tokens END AS BIGINT) AS fill
        |  FROM g WHERE rn = 1
        |  UNION ALL
        |  SELECT g.grp, g.rn, g.doc_id, g.n_tokens,
        |    CASE WHEN g.n_tokens > 512 THEN
        |           (CASE WHEN p.fill > 0 THEN p.cur + 1 ELSE p.cur END)
        |         WHEN p.fill + g.n_tokens <= 512 THEN p.cur
        |         ELSE p.cur + 1 END AS seq,
        |    CASE WHEN g.n_tokens > 512 OR p.fill + g.n_tokens > 512 THEN 0
        |         ELSE p.fill END AS off,
        |    CASE WHEN g.n_tokens > 512 THEN
        |           (CASE WHEN p.fill > 0 THEN p.cur + 2 ELSE p.cur + 1 END)
        |         WHEN p.fill + g.n_tokens <= 512 THEN p.cur
        |         ELSE p.cur + 1 END AS cur,
        |    CASE WHEN g.n_tokens > 512 THEN 0
        |         WHEN p.fill + g.n_tokens <= 512 THEN p.fill + g.n_tokens
        |         ELSE g.n_tokens END AS fill
        |  FROM g JOIN p ON g.grp = p.grp AND g.rn = p.rn + 1),
        |u AS (SELECT grp, max(seq) + 1 AS used FROM p GROUP BY grp),
        |b AS (SELECT grp, coalesce(sum(used) OVER (ORDER BY grp
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base FROM u)
        |SELECT p.doc_id, p.n_tokens, CAST(b.base + p.seq AS BIGINT) AS seq_id,
        |  CAST(p.off AS BIGINT) AS seq_offset
        |FROM p JOIN b ON p.grp = b.grp""".stripMargin,


    "q_shared_ngrams" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |ng AS (SELECT doc_id, list_distinct(
        |    CASE WHEN len(t) >= 3 THEN
        |      list_transform(range(1, len(t) - 1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
        |    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
        |    ELSE [] END) AS s FROM toks),
        |flat AS (SELECT doc_id, unnest(s) AS g FROM ng),
        |shared AS (SELECT g FROM flat GROUP BY g HAVING count(*) >= 2),
        |cnt AS (SELECT f.doc_id, count(*) AS n_shared
        |  FROM flat f JOIN shared USING (g) GROUP BY 1)
        |SELECT c.doc_id, c.n_shared, CAST(len(ng.s) AS BIGINT) AS n_grams,
        |  round(c.n_shared / CAST(len(ng.s) AS DOUBLE), 6) AS shared_frac
        |FROM cnt c JOIN ng USING (doc_id)""".stripMargin,


    "q_boilerplate" ->
      """WITH lines AS (SELECT doc_id,
        |    unnest(string_split(text, chr(10))) AS line FROM documents),
        |freq AS (SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY 1)
        |  WHERE df >= 2),
        |rem AS (SELECT coalesce(list(line), []) AS r FROM freq)
        |SELECT d.doc_id,
        |  array_to_string(list_filter(string_split(d.text, chr(10)),
        |    l -> NOT list_contains(r.r, l)), chr(10)) AS clean_text
        |FROM documents d CROSS JOIN rem r""".stripMargin,


    "q_lm_score" ->
      """WITH tok AS (SELECT unnest(
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents WHERE doc_id % 2 = 0),
        |lm AS (SELECT token,
        |    -log2(count(*) / CAST((SELECT count(*) FROM tok) AS DOUBLE)) AS logp
        |  FROM tok GROUP BY token),
        |dt AS (SELECT doc_id, unnest(
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)) AS token
        |  FROM documents WHERE doc_id % 2 = 1)
        |SELECT d.doc_id, round(avg(coalesce(lm.logp, 24.0)), 6) AS surprisal
        |FROM dt d LEFT JOIN lm ON d.token = lm.token GROUP BY 1""".stripMargin,


    "q_lm_score_bigram" ->
      """WITH ct AS (SELECT list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents WHERE doc_id % 2 = 0),
        |cbg AS (SELECT unnest(list_transform(range(1, len(t)),
        |    i -> {'p': t[i], 'w': t[i+1]})) AS bg
        |  FROM ct WHERE len(t) >= 2),
        |bgc AS (SELECT bg.p AS p, bg.w AS w, count(*) AS c FROM cbg GROUP BY 1, 2),
        |ctx AS (SELECT p, sum(c) AS n FROM bgc GROUP BY 1),
        |lm AS (SELECT bgc.p, bgc.w, -log2(c / CAST(n AS DOUBLE)) AS logp
        |  FROM bgc JOIN ctx ON bgc.p = ctx.p),
        |dbg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |    i -> {'p': t[i], 'w': t[i+1]})) AS bg
        |  FROM (SELECT doc_id, list_filter(
        |      string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |    FROM documents WHERE doc_id % 2 = 1)
        |  WHERE len(t) >= 2)
        |SELECT d.doc_id, round(avg(coalesce(lm.logp, 24.0)), 6) AS surprisal
        |FROM dbg d LEFT JOIN lm ON d.bg.p = lm.p AND d.bg.w = lm.w
        |GROUP BY 1""".stripMargin,


    // stage thresholds chosen so every stage drops documents at sf0.01;
    // near-dup stage leans on the same banding-recall argument as
    // q_minhash_cands (survivor pairs are a subset of the all-pairs set)
    "q_pipeline" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 != 0),
        |feat AS (SELECT doc_id, text,
        |  length(text) AS n_chars,
        |  CASE WHEN len(toks_l) > 0 THEN
        |    CAST(len(list_filter(toks_l, x -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','are','was','for','on',
        |       'with','as','at','by','it','be','this','that'], x))) AS DOUBLE) / len(toks_l)
        |    ELSE 0.0 END AS stop_ratio,
        |  CASE WHEN len(bg) > 0 THEN
        |    (len(bg) - len(list_distinct(bg))) / CAST(len(bg) AS DOUBLE)
        |    ELSE 0.0 END AS dup_bg
        |  FROM (SELECT doc_id, text, toks_l,
        |    CASE WHEN len(toks_l) >= 2 THEN
        |      list_transform(range(1, len(toks_l)), i -> concat_ws(' ', toks_l[i], toks_l[i+1]))
        |    WHEN len(toks_l) > 0 THEN [array_to_string(toks_l, ' ')]
        |    ELSE [] END AS bg
        |    FROM (SELECT doc_id, text,
        |      list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks_l
        |      FROM corpus))),
        |q AS (SELECT doc_id, text FROM feat
        |  WHERE n_chars >= 150 AND stop_ratio >= 0.02 AND dup_bg <= 0.08),
        |e AS (SELECT doc_id, text FROM q
        |  WHERE doc_id = (SELECT min(q2.doc_id) FROM q q2 WHERE q2.text = q.text)),
        |sh AS (SELECT doc_id, list_distinct(
        |    CASE WHEN len(t) >= 3 THEN
        |      list_transform(range(1, len(t) - 1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
        |    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |    FROM e)),
        |nd AS (SELECT a.doc_id, a.s FROM sh a WHERE NOT EXISTS (
        |  SELECT 1 FROM sh b WHERE b.doc_id < a.doc_id
        |  AND CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    ELSE 1.0 END >= 0.5)),
        |bench AS (SELECT DISTINCT unnest(s) AS g FROM (
        |  SELECT list_distinct(
        |    CASE WHEN len(t) >= 3 THEN
        |      list_transform(range(1, len(t) - 1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
        |    WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |    FROM documents WHERE doc_id % 20 = 0))),
        |cont AS (SELECT doc_id FROM (
        |    SELECT d.doc_id, count(*) AS ov
        |    FROM (SELECT doc_id, unnest(s) AS g FROM nd) d
        |    JOIN bench b ON d.g = b.g GROUP BY 1)
        |  WHERE ov >= 5),
        |final AS (SELECT nd.doc_id,
        |    CAST(concat('0x', substr(md5(CAST(nd.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |      / 4294967296.0 AS u,
        |    CAST(concat('0x', substr(md5(CAST(nd.doc_id AS VARCHAR) || ':sample'), 1, 8)) AS UBIGINT)
        |      / 4294967296.0 AS us
        |  FROM nd WHERE nd.doc_id NOT IN (SELECT doc_id FROM cont))
        |SELECT doc_id,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        |FROM final WHERE us < 0.9""".stripMargin,


    "q_dedup_incr_exact" ->
      """WITH newb AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
        |keep AS (SELECT min(doc_id) AS doc_id, text FROM newb GROUP BY text)
        |SELECT doc_id FROM keep WHERE NOT EXISTS (
        |  SELECT 1 FROM documents c WHERE c.doc_id % 5 != 0 AND c.text = keep.text)""".stripMargin,


    // Bloom pre-filter never drops a true dup (no false negatives) and
    // false positives are removed by the verification anti-join, so the
    // result is exactly exactAgainst's
    "q_dedup_incr_bloom" ->
      """WITH newb AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
        |keep AS (SELECT min(doc_id) AS doc_id, text FROM newb GROUP BY text)
        |SELECT doc_id FROM keep WHERE NOT EXISTS (
        |  SELECT 1 FROM documents c WHERE c.doc_id % 5 != 0 AND c.text = keep.text)""".stripMargin,


    // same recall argument as q_minhash_cands: the verified stage matches
    // the exact cross-pair set because banding recall is ~1 at 0.5 here
    "q_dedup_incr_minhash" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |    WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |    ELSE [] END) AS s
        |  FROM (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS toks
        |    FROM documents))
        |SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
        |  round(CASE WHEN len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) > 0 THEN
        |    CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        |    ELSE 1.0 END, 6) AS jaccard
        |FROM sh a, sh b
        |WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0 AND jaccard >= 0.5""".stripMargin,


    "q_dedup_embedding" ->
      """SELECT e.vec_id FROM embeddings e WHERE NOT EXISTS (
        |  SELECT 1 FROM embeddings o WHERE o.vec_id < e.vec_id
        |  AND list_cosine_similarity(o.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= 0.95)""".stripMargin,


    "q_semdedup" ->
      """SELECT e.vec_id FROM embeddings e WHERE NOT EXISTS (
        |  SELECT 1 FROM embeddings o WHERE o.vec_id < e.vec_id
        |  AND list_cosine_similarity(o.embedding::DOUBLE[], e.embedding::DOUBLE[]) >= 0.9)""".stripMargin,


    // production-k SemDeDup through the two-level coarse quantizer: the
    // corpus size is the genuine SQL check; the three booleans are
    // Spark-computed invariants (survivor containment, exhaustive-subset,
    // assignment agreement — see the queries entry)
    "q_semdedup_hier" ->
      """SELECT count(*) AS n_vecs, TRUE AS survivors_within_corpus,
        |  TRUE AS exact_kept_subset, TRUE AS agreement_ok, TRUE AS gap_ok
        |FROM embeddings""".stripMargin,


    // every planted exact copy (identical text, larger id) must be dropped:
    // hamming 0 is banding-complete at any maxHamming, smallest id survives;
    // plants sit at max(doc_id)+1+doc_id so they outrank ANY real id
    "q_dedup_simhash" ->
      """SELECT (SELECT max(doc_id) FROM documents) + 1 + doc_id AS doc_id,
        |  TRUE AS planted_dropped
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin
  )
}
