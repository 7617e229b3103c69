package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** BM25 retrieval laws: hand-computed scores on a tiny corpus, index
  * append ≡ rebuild, df-pruning semantics, top-k determinism, and the
  * N/avgdl contract for token-less documents.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs = {
    val s = spark; import s.implicits._
    Seq(
      (1L, "spark merge window"),
      (2L, "spark spark join"),
      (3L, "window sort window merge window"),
      (4L, ""), // token-less: no postings, still counts in N / avgdl
      (5L, "join batch")
    ).toDF("doc_id", "text")
  }

  private def q(rows: (Int, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("query_id", "qtext")
  }

  test("bm25 matches a hand-computed score exactly (one term, one doc)") {
    // corpus: N=5, total_dl = 3+3+5+0+2 = 13, avgdl = 2.6
    // token "sort": df=1, only doc 3 (tf=1, dl=5)
    // idf = ln(1 + (5 - 1 + 0.5)/(1 + 0.5)) = ln(4)
    // tfpart = 1*2.2 / (1 + 1.2*(0.25 + 0.75*5/2.6))
    val n = 5.0; val avgdl = 13.0 / 5.0
    val idf = math.log(1 + (n - 1 + 0.5) / 1.5)
    val expected = BigDecimal(idf * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 5 / avgdl)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Retrieval.bm25Scores(docs, q(0 -> "sort"), "text", "doc_id",
      "qtext", "query_id").collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3L)
    assert(out.head.getDouble(2) == expected)
  }

  test("multi-term scores sum per (query, doc); no shared token -> no row") {
    val out = Retrieval.bm25Scores(docs, q(0 -> "spark join", 1 -> "zzz"),
      "text", "doc_id", "qtext", "query_id")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // query 0 hits docs 1 (spark), 2 (spark+join), 5 (join) — never 3, 4
    assert(out.keySet == Set(0 -> 1L, 0 -> 2L, 0 -> 5L))
    // doc 2 carries both terms: strictly larger than its single-term parts
    val single = Retrieval.bm25Scores(docs, q(0 -> "spark"), "text", "doc_id",
      "qtext", "query_id").collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(0 -> 2L) > single(2L))
  }

  test("duplicate query tokens count once (array_distinct before explode)") {
    val once = Retrieval.bm25Scores(docs, q(0 -> "spark"), "text", "doc_id",
      "qtext", "query_id").collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    val twice = Retrieval.bm25Scores(docs, q(0 -> "spark spark"), "text", "doc_id",
      "qtext", "query_id").collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(once == twice)
  }

  test("appendToIndex == full rebuild (postings, stats, and scores)") {
    val a = docs.where(col("doc_id") <= 2)
    val b = docs.where(col("doc_id") > 2)
    val incr = Retrieval.appendToIndex(Retrieval.buildIndex(a, "text", "doc_id"), b, "text")
    val full = Retrieval.buildIndex(docs, "text", "doc_id")
    assert(incr.postings.exceptAll(full.postings).isEmpty &&
      full.postings.exceptAll(incr.postings).isEmpty)
    assert(incr.stats.collect().toSeq == full.stats.collect().toSeq)
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    val si = Retrieval.bm25FromIndex(incr, queries, "qtext", "query_id")
    val sf = Retrieval.bm25FromIndex(full, queries, "qtext", "query_id")
    assert(si.exceptAll(sf).isEmpty && sf.exceptAll(si).isEmpty)
  }

  test("maxDfFraction drops only high-df tokens; surviving scores unchanged") {
    // "window" df=2/5=0.4, "sort" df=1/5=0.2 -> cap 0.3 keeps only "sort"
    val all = Retrieval.bm25Scores(docs, q(0 -> "window sort"), "text", "doc_id",
      "qtext", "query_id").collect().map(r => r.getLong(1)).toSet
    val pruned = Retrieval.bm25Scores(docs, q(0 -> "window sort"), "text", "doc_id",
      "qtext", "query_id", maxDfFraction = 0.3)
    val prunedRows = pruned.collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(all == Set(1L, 3L))      // window: docs 1,3; sort: doc 3
    assert(prunedRows.keySet == Set(3L)) // only sort survives the cap
    val sortOnly = Retrieval.bm25Scores(docs, q(0 -> "sort"), "text", "doc_id",
      "qtext", "query_id").collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(prunedRows == sortOnly)  // pruning never changes surviving terms' math
  }

  test("bm25TopK: k bounds rows per query, rank dense from 1, id tie-break") {
    val idx = Retrieval.buildIndex(docs, "text", "doc_id")
    val out = Retrieval.bm25TopK(idx, q(0 -> "spark join window"), "qtext",
      "query_id", k = 2).collect()
    assert(out.length == 2)
    assert(out.map(_.getInt(3)).sorted.toSeq == Seq(1, 2))
    // determinism across runs
    val again = Retrieval.bm25TopK(idx, q(0 -> "spark join window"), "qtext",
      "query_id", k = 2).collect()
    assert(out.map(r => (r.getLong(1), r.getInt(3))).toSet ==
      again.map(r => (r.getLong(1), r.getInt(3))).toSet)
  }

  test("bm25TopKPruned ≡ bm25TopK across query shapes (multi-term, " +
      "stopword-heavy, no-match, k > matches)") {
    val idx = Retrieval.buildIndex(docs, "text", "doc_id")
    val queries = q(0 -> "spark join window", 1 -> "window", 2 -> "zzz",
      3 -> "spark spark", 4 -> "spark merge window sort join batch")
    for (k <- Seq(1, 2, 3, 10)) {
      val plain = Retrieval.bm25TopK(idx, queries, "qtext", "query_id", k)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val pruned = Retrieval.bm25TopKPruned(idx, queries, "qtext", "query_id", k)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(pruned == plain, s"k=$k mismatch:\nplain  $plain\npruned $pruned")
    }
    // maxDfFraction interacts identically
    val pf = Retrieval.bm25TopKPruned(idx, queries, "qtext", "query_id", 2,
      maxDfFraction = 0.3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val bf = Retrieval.bm25TopK(idx, queries, "qtext", "query_id", 2,
      maxDfFraction = 0.3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(pf == bf)
  }

  test("bm25TopKPruned ≡ bm25TopK under exact score ties at the k boundary") {
    val s = spark; import s.implicits._
    // many byte-identical docs: every score equal, ranking is pure id
    // tie-break — pruning must not change which ids win
    val same = (1L to 8L).map(i => (i, "common words shared by every doc"))
      .toDF("doc_id", "text")
    val idx = Retrieval.buildIndex(same, "text", "doc_id")
    val queries = q(0 -> "common shared words")
    val plain = Retrieval.bm25TopK(idx, queries, "qtext", "query_id", 3)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    val pruned = Retrieval.bm25TopKPruned(idx, queries, "qtext", "query_id", 3)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    assert(pruned == plain && plain == Set((1L, 1), (2L, 2), (3L, 3)))
  }

  test("θ from k-th posting contributions keeps pruning in the outlier-dl " +
      "regime that zeroed the worst-case bound") {
    val s = spark; import s.implicits._
    // the organic-growth shape that collapsed the old θ (tf=1 at the
    // corpus max dl): one giant doc carrying a single "rare" stretches
    // the token's max dl to 500, so the worst-case bound idf·tfPart(1,
    // max_dl) ≈ 0 — below every token's upper bound, pruning OFF. The
    // k-th-contribution θ reads rare's three real tf=3 postings instead
    // and still dwarfs the mid-frequency "the" prefix.
    val mid = (1L to 30L).map(i =>
      (i, if (i <= 2) s"the the w$i" else s"the w$i x$i"))
    val other = (31L to 55L).map(i => (i, s"c$i d$i e$i"))
    val rare = (56L to 60L).map(i =>
      (i, s"rare rare rare p$i q$i r$i s$i t$i u$i v$i"))
    val giant = Seq((61L, Array.fill(499)("filler").mkString(" ") + " rare"))
    val corpus = (mid ++ other ++ rare ++ giant).toDF("doc_id", "text")
    val idx = Retrieval.buildIndex(corpus, "text", "doc_id")
    val queries = q(0 -> "the rare")
    val k = 3
    val plain = Retrieval.bm25TopK(idx, queries, "qtext", "query_id", k)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val (prunedDf, survivors) = Retrieval.bm25TopKPrunedDiag(
      idx, queries, "qtext", "query_id", k)
    val pruned = prunedDf
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(pruned == plain)
    // and pruning actually FIRED: rare's k-th contribution sets a θ the
    // "the" prefix cannot reach, so its 30 postings are never aggregated
    // — only rare's 6 docs survive to scoring
    val nSurv = survivors.count()
    val nCand = Retrieval.bm25FromIndex(idx, queries, "qtext", "query_id")
      .count()
    assert(nCand >= 36L, s"corpus wiring changed? candidates=$nCand")
    assert(nSurv < nCand / 2,
      s"expected real pruning, got $nSurv of $nCand candidates")
  }

  test("ub from the max ACTUAL posting contribution keeps pruning when a " +
      "high-tf long doc plus a tiny doc inflate the worst-case combo") {
    val s = spark; import s.implicits._
    // the organic-growth shape that killed the ub side: "the" carries
    // max tf = 60 (in a 400-token doc, where the real contribution is
    // modest) and min dl = 2 (a tiny doc where tf = 1). The fictional
    // bound idf·tfPart(60, 2) pairs them into a contribution NO real
    // posting has — it crosses θ (from rare's postings), marks "the"
    // essential, and scores its whole list. The rank-1
    // actual-contribution ub stays under θ, so "the" is non-essential
    // and only rare's 6 docs reach score aggregation.
    val mid = (1L to 6L).map(i => (i, s"the w$i x$i"))
    val tiny = Seq((7L, "the y1"))
    val longTheDoc = Seq((8L,
      (Array.fill(60)("the") ++ (1 to 340).map(j => s"z$j")).mkString(" ")))
    val other = (9L to 38L).map(i => (i, s"c$i d$i e$i"))
    val rare = (39L to 44L).map(i =>
      (i, s"rare rare rare p$i q$i r$i s$i t$i u$i v$i"))
    val corpus = (mid ++ tiny ++ longTheDoc ++ other ++ rare)
      .toDF("doc_id", "text")
    val idx = Retrieval.buildIndex(corpus, "text", "doc_id")
    val queries = q(0 -> "the rare")
    val k = 3
    val plain = Retrieval.bm25TopK(idx, queries, "qtext", "query_id", k)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val (prunedDf, survivors) = Retrieval.bm25TopKPrunedDiag(
      idx, queries, "qtext", "query_id", k)
    val pruned = prunedDf
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(pruned == plain)
    val nSurv = survivors.count()
    val nCand = Retrieval.bm25FromIndex(idx, queries, "qtext", "query_id")
      .count()
    // candidates = the 8 "the" docs + the 6 rare docs; only rare's docs
    // survive to aggregation (the worst-case combo would have kept all 14)
    assert(nCand == 14L, s"corpus wiring changed? candidates=$nCand")
    assert(nSurv == 6L,
      s"expected only rare's docs to survive, got $nSurv of $nCand")
  }

  test("bm25TopKPruned ≡ bm25TopK on seeded random Zipf-ish corpora") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = ("the" +: "of" +: (1 to 40).map(i => s"w$i")).toArray
    for (trial <- 0 until 3) {
      val corpus = (1L to 60L).map { i =>
        val dl = 1 + rnd.nextInt(30)
        val words = Array.fill(dl) {
          // Zipf-ish: first vocab entries drawn far more often
          vocab(math.min(vocab.length - 1,
            (math.pow(rnd.nextDouble(), 3) * vocab.length).toInt))
        }
        (i, words.mkString(" "))
      }.toDF("doc_id", "text")
      val idx = Retrieval.buildIndex(corpus, "text", "doc_id")
      val queries = q(0 -> "the w3 w17", 1 -> "of the", 2 -> "w29 w31 w40",
        3 -> "the the w1", 4 -> "absentword")
      for (k <- Seq(1, 4, 9)) {
        val plain = Retrieval.bm25TopK(idx, queries, "qtext", "query_id", k)
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
          .toSet
        val pruned = Retrieval
          .bm25TopKPruned(idx, queries, "qtext", "query_id", k)
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
          .toSet
        assert(pruned == plain, s"trial=$trial k=$k")
      }
    }
  }

  test("block-max refinement prunes materially on multi-token queries; " +
      "every served row is a survivor") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = ("the" +: "of" +: (1 to 40).map(i => s"w$i")).toArray
    val corpus = (1L to 400L).map { i =>
      val dl = 1 + rnd.nextInt(40)
      val words = Array.fill(dl)(vocab(math.min(vocab.length - 1,
        (math.pow(rnd.nextDouble(), 3) * vocab.length).toInt)))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val idx = Retrieval.buildIndex(corpus, "text", "doc_id")
    // the r18 weak spot: a multi-token query where θ never clears any
    // other token's ub, so the TOKEN-level prune keeps everything —
    // the per-DOC Σ-block-bound must still cut the scoring set hard
    val queries = q(0 -> "the of w1 w2 w3")
    val (top, survivors) = Retrieval.bm25TopKPrunedDiag(
      idx, queries, "qtext", "query_id", k = 3)
    val matchGroups = Retrieval.bm25FromIndex(idx, queries, "qtext", "query_id")
      .select("query_id", "doc_id").distinct().count()
    val nSurv = survivors.count()
    assert(nSurv.toDouble / matchGroups < 0.5,
      s"block-max should prune a crowded multi-token query materially: " +
        s"$nSurv / $matchGroups")
    // soundness the cheap way: every served row must have reached exact
    // scoring through the survivor set
    val served = top.select("query_id", "doc_id")
    assert(served.exceptAll(survivors.toDF("query_id", "doc_id")).count() === 0)
    // and the served rows equal the unpruned operator (the hard law,
    // re-checked on this corpus shape)
    val plain = Retrieval.bm25TopK(idx, queries, "qtext", "query_id", 3)
      .select("query_id", "doc_id", "score", "rank")
    val prunedSel = top.select("query_id", "doc_id", "score", "rank")
    assert(prunedSel.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(prunedSel).count() === 0)
  }

  test("stored bucketed index: pruned read scores EXACTLY like the in-memory index") {
    val idx = Retrieval.buildIndex(docs, "text", "doc_id")
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
    Retrieval.writeIndex(idx, dir, tokenBuckets = 8)
    val queries = q(0 -> "spark window", 1 -> "join sort batch", 2 -> "zzz")
    val mem = Retrieval.bm25FromIndex(idx, queries, "qtext", "query_id")
    val stored = Retrieval.bm25FromStored(spark, dir, tokenBuckets = 8,
      queries, "qtext", "query_id", "doc_id")
    assert(mem.exceptAll(stored).isEmpty && stored.exceptAll(mem).isEmpty)
    // the loud cap: a query set larger than maxQueryTokens must refuse
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25FromStored(spark, dir, 8, queries, "qtext", "query_id",
        "doc_id", maxQueryTokens = 2)
    }
    assert(e.getMessage.contains("distinct tokens"), e.getMessage)
  }

  test("replaceInStored: atomic upsert equals a rebuild over the corrected " +
      "corpus, exactly one new committed segment, compaction preserves it") {
    val s = spark; import s.implicits._
    val truth = ((1L to 40L).map(i => (i, s"alpha beta w$i x$i")) ++
      (41L to 46L).map(i => (i, s"rare gamma y$i"))).toSeq
    // poisoned ingest: the doc_id % 7 == 3 slice picked up junk tokens
    val poisoned = truth.map { case (id, t) =>
      (id, if (id % 7 == 3) t + " zzjunk zzjunk zznoise" else t)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_rep").toString
    Retrieval.writeIndex(
      Retrieval.buildIndex(poisoned.toDF("doc_id", "text"), "text", "doc_id"),
      dir, tokenBuckets = 8)
    // the correction batch: the true slice plus one brand-new doc (upsert)
    val correction = (truth.filter(_._1 % 7 == 3) :+
      ((100L, "delta epsilon rare"))).toDF("doc_id", "text")
    val before = graft.batch.SegmentedStore.committedSegs(dir).length
    Retrieval.replaceInStored(spark, dir, tokenBuckets = 8,
      correction, "text", "doc_id")
    assert(graft.batch.SegmentedStore.committedSegs(dir).length == before + 1,
      "replace must publish on exactly one commit")
    val corrected = (truth :+ ((100L, "delta epsilon rare")))
      .toDF("doc_id", "text")
    val queries = q(0 -> "alpha rare", 1 -> "zzjunk", 2 -> "delta w3")
    val expect = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(corrected, "text", "doc_id"),
      queries, "qtext", "query_id")
    def served() = Retrieval.bm25FromStored(spark, dir, tokenBuckets = 8,
      queries, "qtext", "query_id", "doc_id")
    assert(expect.exceptAll(served()).isEmpty && served().exceptAll(expect).isEmpty,
      "replace != rebuild over the corrected corpus")
    // no trace of the poisoned tokens (zzjunk scored zero rows)
    assert(served().where(col("query_id") === 1).count() == 0,
      "poisoned tokens survived the replace")
    // physical fold preserves the correction
    Retrieval.compactStored(spark, dir, tokenBuckets = 8)
    assert(expect.exceptAll(served()).isEmpty && served().exceptAll(expect).isEmpty,
      "compaction changed post-replace serving")
    graft.batch.BatchState.deleteDir(dir)
  }

  test("crash window: a takedown that died after writing its deletes dir " +
      "cannot ride a later append's commit at the reused segment id") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_orph").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
      dir, tokenBuckets = 8) // seg=1
    // simulate the crashed takedown: deletes parquet + covers marker
    // written at the NEXT ordinal id, no commit
    val orphanId = graft.batch.SegmentedStore.nextId(dir)
    Seq(1L, 2L, 3L).toDF("doc_id").write.mode("overwrite")
      .parquet(s"$dir/seg=$orphanId/deletes")
    graft.batch.SegmentedStore.writeDeleteCovers(dir, orphanId, List(1L))
    // the next append reuses the id; its pre-clear must drop the orphan
    Retrieval.appendToStored(spark, dir, tokenBuckets = 8,
      Seq((10L, "fresh doc")).toDF("doc_id", "text"), "text", "doc_id")
    val queries = q(0 -> "spark window join")
    val got = Retrieval.bm25FromStored(spark, dir, tokenBuckets = 8,
      queries, "qtext", "query_id", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(got),
      s"crashed takedown's orphan delete set resurrected: served only $got")
    graft.batch.BatchState.deleteDir(dir)
  }

  test("appendToStored: 3 micro-batch appends score EXACTLY like one writeIndex") {
    val s = spark; import s.implicits._
    val dirIncr = java.nio.file.Files.createTempDirectory("graft_bm25_app").toString
    val dirFull = java.nio.file.Files.createTempDirectory("graft_bm25_ful").toString
    // bootstrap empty, then ingest in 3 disjoint slices
    Retrieval.writeIndex(Retrieval.buildIndex(docs.limit(0), "text", "doc_id"),
      dirIncr, tokenBuckets = 4)
    (0 until 3).foreach { i =>
      Retrieval.appendToStored(spark, dirIncr, 4,
        docs.where(col("doc_id") % 3 === i), "text", "doc_id")
    }
    Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
      dirFull, tokenBuckets = 4)
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    val a = Retrieval.bm25FromStored(spark, dirIncr, 4, queries, "qtext",
      "query_id", "doc_id")
    val b = Retrieval.bm25FromStored(spark, dirFull, 4, queries, "qtext",
      "query_id", "doc_id")
    assert(a.collect().nonEmpty)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // stats rolled forward through all three appends (per-segment deltas
    // summed at read)
    val st = Retrieval.readIndex(spark, dirIncr, "doc_id").stats.collect().head
    assert(st.getLong(0) == 5L && st.getLong(1) == 13L)
  }

  test("compactStored: one file per bucket afterwards, scores identical") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_cmp").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs.limit(0), "text", "doc_id"),
      dir, tokenBuckets = 4)
    (0 until 3).foreach { i =>
      Retrieval.appendToStored(spark, dir, 4,
        docs.where(col("doc_id") % 3 === i), "text", "doc_id")
    }
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    val before = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    // files per bucket ACROSS committed segments — fragmentation is
    // one file set per micro-batch segment
    def filesPerBucket: Map[String, Int] = {
      val segs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("seg="))
      segs.flatMap { s =>
        Option(new java.io.File(s, "postings").listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("tb="))
          .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    assert(filesPerBucket.values.exists(_ > 1) || filesPerBucket.size > 1,
      s"append fixture never fragmented: $filesPerBucket")
    Retrieval.compactStored(spark, dir, tokenBuckets = 4)
    // superseded segments swept: exactly ONE live segment, one file/bucket
    val liveSegs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
    assert(liveSegs.length == 1, liveSegs.map(_.getName).mkString(","))
    assert(filesPerBucket.values.forall(_ == 1), filesPerBucket.toString)
    val after = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == before)
  }

  test("batch-id-keyed appends are IDEMPOTENT under at-least-once replay") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_replay").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs.limit(0), "text", "doc_id"),
      dir, tokenBuckets = 4)
    // batches 0..2, with batch 1 RE-DELIVERED (post-commit crash replay)
    (Seq(0, 1, 1, 2): Seq[Int]).foreach { b =>
      Retrieval.appendToStored(spark, dir, 4,
        docs.where(col("doc_id") % 3 === b), "text", "doc_id",
        batchId = Some(b.toLong))
    }
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    val a = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id")
    val full = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(docs, "text", "doc_id"), queries, "qtext", "query_id")
    assert(a.exceptAll(full).isEmpty && full.exceptAll(a).isEmpty,
      "replayed batch double-appended")
    // stats did not double-count either
    val st = Retrieval.readIndex(spark, dir, "doc_id").stats.collect().head
    assert(st.getLong(0) == 5L && st.getLong(1) == 13L)
    graft.batch.BatchState.deleteDir(dir)
  }

  test("bm25TopKFromStored: pruned-read + WAND-pruned top-k equals the " +
      "in-memory top-k bit-for-bit, including after deletes") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_tks").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
      dir, tokenBuckets = 4)
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(asSet(Retrieval.bm25TopKFromStored(spark, dir, 4, queries,
        "qtext", "query_id", "doc_id", k = 2)) ==
      asSet(Retrieval.bm25TopK(Retrieval.buildIndex(docs, "text", "doc_id"),
        queries, "qtext", "query_id", k = 2)))
    // deletes apply before the summaries: θ, dfs and scores all shift
    Retrieval.deleteFromStored(spark, dir, Seq(2L).toDF("doc_id"))
    assert(asSet(Retrieval.bm25TopKFromStored(spark, dir, 4, queries,
        "qtext", "query_id", "doc_id", k = 2)) ==
      asSet(Retrieval.bm25TopK(
        Retrieval.buildIndex(docs.where(col("doc_id") =!= 2L), "text", "doc_id"),
        queries, "qtext", "query_id", k = 2)))
    graft.batch.BatchState.deleteDir(dir)
  }

  test("deleteFromStored: delete equals rebuild-without bit-for-bit, is " +
      "idempotent, no-ops on never-indexed ids, and compaction folds it " +
      "physically") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_del").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
      dir, tokenBuckets = 4)
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    def stored() = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    // scores against the index REBUILT WITHOUT docs 2 and 3 — the delete
    // must reproduce this exactly, including the N/avgdl shift and the
    // df-derived idf changes, not just drop rows from the output
    val expected = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(docs.where(!col("doc_id").isin(2L, 3L)), "text", "doc_id"),
      queries, "qtext", "query_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    Retrieval.deleteFromStored(spark, dir, Seq(2L, 3L).toDF("doc_id"))
    assert(stored() == expected, "delete != rebuild-without")
    val st = Retrieval.readIndex(spark, dir, "doc_id").stats.collect().head
    assert(st.getLong(0) == 3L && st.getLong(1) == 5L,
      s"stats not corrected: (${st.getLong(0)}, ${st.getLong(1)})")
    // idempotent: re-deleting leaves the commit log untouched
    val segsBefore = graft.batch.SegmentedStore.committedSegs(dir)
    Retrieval.deleteFromStored(spark, dir, Seq(2L).toDF("doc_id"))
    // never-indexed id: a no-op too
    Retrieval.deleteFromStored(spark, dir, Seq(999L).toDF("doc_id"))
    assert(graft.batch.SegmentedStore.committedSegs(dir) == segsBefore,
      "no-op deletes committed segments")
    assert(stored() == expected)
    // compaction folds the removal physically: postings rows gone, delete
    // sets swept, one live segment, scores unchanged
    Retrieval.compactStored(spark, dir, tokenBuckets = 4)
    val live = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
    assert(live.length == 1)
    assert(!new java.io.File(live.head, "deletes").exists(),
      "compaction carried a delete set forward")
    val postIds = Retrieval.readIndex(spark, dir, "doc_id").postings
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(postIds == Set(1L, 5L), s"deleted postings survived compaction: $postIds")
    assert(stored() == expected)
    // after the physical fold, a deleted id can be re-added
    Retrieval.appendToStored(spark, dir, 4,
      docs.where(col("doc_id") === 2L), "text", "doc_id")
    val back = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(docs.where(col("doc_id") =!= 3L), "text", "doc_id"),
      queries, "qtext", "query_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stored() == back, "re-added doc after compaction does not serve")
    graft.batch.BatchState.deleteDir(dir)
  }

  test("delete then re-append the same id serves again with NO compaction " +
      "(delete coverage is the committed-segment set at delete time)") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_readd").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
      dir, tokenBuckets = 4)
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    def stored() = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    def rebuilt(d: org.apache.spark.sql.DataFrame) = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(d, "text", "doc_id"), queries, "qtext", "query_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    Retrieval.deleteFromStored(spark, dir, Seq(2L).toDF("doc_id"))
    assert(stored() == rebuilt(docs.where(col("doc_id") =!= 2L)))
    // re-append the SAME id, deliberately before any compaction: the
    // delete's coverage excludes the new segment, so the doc serves
    Retrieval.appendToStored(spark, dir, 4,
      docs.where(col("doc_id") === 2L), "text", "doc_id")
    assert(stored() == rebuilt(docs),
      "re-added doc suppressed without a compaction")
    // stats rolled all the way back: N=5, total_dl=13
    val st = Retrieval.readIndex(spark, dir, "doc_id").stats.collect().head
    assert(st.getLong(0) == 5L && st.getLong(1) == 13L)
    // top-k serving path agrees too
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(asSet(Retrieval.bm25TopKFromStored(spark, dir, 4, queries,
        "qtext", "query_id", "doc_id", k = 2)) ==
      asSet(Retrieval.bm25TopK(Retrieval.buildIndex(docs, "text", "doc_id"),
        queries, "qtext", "query_id", k = 2)))
    // and the re-added doc is deletable AGAIN (the second delete covers
    // the re-add's segment)
    Retrieval.deleteFromStored(spark, dir, Seq(2L).toDF("doc_id"))
    assert(stored() == rebuilt(docs.where(col("doc_id") =!= 2L)))
    graft.batch.BatchState.deleteDir(dir)
  }

  test("legacy delete segments (no coverage marker) keep the pre-r14 " +
      "semantics: re-add suppressed until a compaction folds the delete") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_legacy").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
      dir, tokenBuckets = 4)
    Retrieval.deleteFromStored(spark, dir, Seq(2L).toDF("doc_id"))
    // simulate an r13-written store: strip the coverage marker
    val delSeg = graft.batch.SegmentedStore.committedSegs(dir)
      .find(id => new java.io.File(
        s"${graft.batch.SegmentedStore.segDir(dir, id)}/deletes").isDirectory).get
    graft.batch.StoreFs.deleteRecursive(
      s"${graft.batch.SegmentedStore.segDir(dir, delSeg)}/deletes/" +
        graft.batch.SegmentedStore.DeleteCoversName)
    Retrieval.appendToStored(spark, dir, 4,
      docs.where(col("doc_id") === 2L), "text", "doc_id")
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    def stored() = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    // marker-less delete covers EVERYTHING, including the re-add — but
    // the stats DID roll forward (+1 doc), so compare postings only: no
    // doc-2 rows may appear
    assert(!stored().exists(_._2 == 2L),
      "legacy delete failed to suppress a pre-compaction re-add")
    // the documented legacy recovery: compaction folds the delete, after
    // which a fresh append serves
    Retrieval.compactStored(spark, dir, tokenBuckets = 4)
    Retrieval.appendToStored(spark, dir, 4,
      docs.where(col("doc_id") === 2L)
        .withColumn("doc_id", col("doc_id") + 100L), "text", "doc_id")
    assert(stored().exists(_._2 == 102L))
    graft.batch.BatchState.deleteDir(dir)
  }

  test("two takedowns between micro-batches cannot leapfrog the NEXT " +
      "streaming append (coverage is commit-time, not segment-id order)") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_leap").toString
    // bootstrap (seg 1) + batch 0 (seg 2): docs 1..3
    Retrieval.writeIndex(Retrieval.buildIndex(docs.limit(0), "text", "doc_id"),
      dir, tokenBuckets = 4)
    Retrieval.appendToStored(spark, dir, 4,
      docs.where(col("doc_id") <= 3), "text", "doc_id", batchId = Some(0L))
    // two takedowns land between micro-batches: segs 3 and 5
    Retrieval.deleteFromStored(spark, dir, Seq(2L).toDF("doc_id"))
    Retrieval.deleteFromStored(spark, dir, Seq(3L).toDF("doc_id"))
    // batch 1's PINNED even segment id is 4 — smaller than the second
    // delete's id 5. It re-adds doc 3 (deleted above) plus docs 4, 5:
    // under id-ordered deletes, seg 5's delete of doc 3 would wrongly
    // suppress this append's doc 3
    Retrieval.appendToStored(spark, dir, 4,
      docs.where(col("doc_id") >= 3), "text", "doc_id", batchId = Some(1L))
    assert(graft.batch.SegmentedStore.committedSegs(dir) ==
      List(1L, 2L, 3L, 4L, 5L), "test no longer exercises the id leapfrog")
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    val got = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(docs.where(col("doc_id") =!= 2L), "text", "doc_id"),
      queries, "qtext", "query_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, "delete leapfrogged a later streaming append")
    // stats: live docs {1,3,4,5} → N=4, total_dl = 3+5+0+2 = 10
    val st = Retrieval.readIndex(spark, dir, "doc_id").stats.collect().head
    assert(st.getLong(0) == 4L && st.getLong(1) == 10L)
    graft.batch.BatchState.deleteDir(dir)
  }

  test("compactIfFragmented: no-op below the threshold, compacts above it") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_frag").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs.limit(0), "text", "doc_id"),
      dir, tokenBuckets = 4)
    (0 to 2).foreach { b =>
      Retrieval.appendToStored(spark, dir, 4,
        docs.where(col("doc_id") % 3 === b), "text", "doc_id",
        batchId = Some(b.toLong))
    }
    val segs = graft.batch.SegmentedStore.committedSegs(dir)
    assert(segs.length == 4) // bootstrap + 3 appends
    assert(!Retrieval.compactIfFragmented(spark, dir, 4, maxSegments = 8))
    assert(graft.batch.SegmentedStore.committedSegs(dir) == segs,
      "below-threshold call mutated the store")
    assert(Retrieval.compactIfFragmented(spark, dir, 4, maxSegments = 3))
    assert(graft.batch.SegmentedStore.committedSegs(dir).length == 1)
    graft.batch.BatchState.deleteDir(dir)
  }

  test("streaming takedown feed: deleteFromStored in foreachBatch converges, " +
      "and a re-delivered revocation batch is a natural no-op") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_del_s").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
      dir, tokenBuckets = 4)
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val writer = ms.toDS().toDF("doc_id").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Retrieval.deleteFromStored(spark, dir, b)
      }
    val query = writer.start()
    try {
      ms.addData(2L); query.processAllAvailable()
      ms.addData(3L); query.processAllAvailable()
    } finally query.stop()
    // at-least-once re-delivery of the first revocation: already-deleted
    // ids fail the live-set semi-join, so nothing is written or committed
    val segsBefore = graft.batch.SegmentedStore.committedSegs(dir)
    Retrieval.deleteFromStored(spark, dir, Seq(2L).toDF("doc_id"))
    assert(graft.batch.SegmentedStore.committedSegs(dir) == segsBefore)
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    val got = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(docs.where(!col("doc_id").isin(2L, 3L)), "text", "doc_id"),
      queries, "qtext", "query_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, "streaming takedown feed diverged from rebuild")
    graft.batch.BatchState.deleteDir(dir)
  }

  test("streaming correction feed: replaceInStored in foreachBatch " +
      "converges, and a re-delivered correction batch is content-idempotent") {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_rep_s").toString
    // poisoned bootstrap: docs 2 and 3 mangled at ingest
    val mangled = docs.withColumn("text",
      when(col("doc_id").isin(2L, 3L),
        concat(col("text"), lit(" zzjunk"))).otherwise(col("text")))
    Retrieval.writeIndex(Retrieval.buildIndex(mangled, "text", "doc_id"),
      dir, tokenBuckets = 4)
    val truth = docs.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val writer = ms.toDS().toDF("doc_id").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.select("doc_id").as[Long].collect()
        if (ids.nonEmpty) {
          val corrections = ids.toSeq.map(id => (id, truth(id)))
            .toDF("doc_id", "text")
          Retrieval.replaceInStored(spark, dir, tokenBuckets = 4,
            corrections, "text", "doc_id")
        }
      }
    val query = writer.start()
    try {
      ms.addData(2L); query.processAllAvailable()
      ms.addData(3L); query.processAllAvailable()
    } finally query.stop()
    val queries = q(0 -> "spark window", 1 -> "join sort batch", 2 -> "zzjunk")
    def served() = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(docs, "text", "doc_id"),
      queries, "qtext", "query_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served() == expected, "streaming correction feed diverged from truth")
    // replace is ordinal (no replay guard by design — corrections are
    // maintenance, not the ingest path): a re-delivered correction
    // commits a NEW segment but the served content is unchanged
    Retrieval.replaceInStored(spark, dir, tokenBuckets = 4,
      Seq((2L, truth(2L))).toDF("doc_id", "text"), "text", "doc_id")
    assert(served() == expected,
      "re-delivered correction changed the served content")
    graft.batch.BatchState.deleteDir(dir)
  }

  test("deletes interleave with streaming appends: delete → append → serve " +
      "equals the rebuilt retained corpus") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_del_i").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs.limit(0), "text", "doc_id"),
      dir, tokenBuckets = 4)
    Retrieval.appendToStored(spark, dir, 4,
      docs.where(col("doc_id") <= 3), "text", "doc_id", batchId = Some(0L))
    // takedown lands BETWEEN micro-batches — the live-maintenance ordering
    Retrieval.deleteFromStored(spark, dir, Seq(2L).toDF("doc_id"))
    Retrieval.appendToStored(spark, dir, 4,
      docs.where(col("doc_id") > 3), "text", "doc_id", batchId = Some(1L))
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    val got = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(docs.where(col("doc_id") =!= 2L), "text", "doc_id"),
      queries, "qtext", "query_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, "interleaved delete+append diverged from rebuild")
    graft.batch.BatchState.deleteDir(dir)
  }

  test("deletion grace: a reader holding the pre-compaction segment list " +
      "still completes after the compaction commits") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_grace").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs.limit(0), "text", "doc_id"),
      dir, tokenBuckets = 4)
    (0 to 2).foreach { b =>
      Retrieval.appendToStored(spark, dir, 4,
        docs.where(col("doc_id") % 3 === b), "text", "doc_id",
        batchId = Some(b.toLong))
    }
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    // reader resolves the PRE-compaction segment list (file listing is
    // pinned at plan time) but has not executed yet
    val preCompactionPlan = Retrieval.bm25FromStored(spark, dir, 4, queries,
      "qtext", "query_id", "doc_id")
    val expected = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(docs, "text", "doc_id"), queries, "qtext", "query_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    Retrieval.compactStored(spark, dir, tokenBuckets = 4,
      sweepGraceMs = 3600000L)
    // mid-scan execution AFTER the compaction commit: the superseded
    // segments are tombstoned, not deleted, so the old plan completes
    val got = preCompactionPlan.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected, "pre-compaction reader lost files or results")
    // new readers resolve the compacted segment only, same results
    val fresh = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fresh == expected)
    // tombstones age out on the sweep cadence
    val tombed = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && new java.io.File(f, "_graft_tombstone").exists())
    assert(tombed.nonEmpty, "superseded segments were not tombstoned")
    tombed.foreach(f => assert(new java.io.File(f, "_graft_tombstone")
      .setLastModified(System.currentTimeMillis() - 7200000L)))
    graft.batch.SegmentedStore.sweepUncommitted(dir, 3600000L)
    val live = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
    assert(live.length == 1, s"expired segments survived: ${live.map(_.getName).mkString(",")}")
    graft.batch.BatchState.deleteDir(dir)
  }

  test("replay guard SURVIVES compaction: a batch whose segment was folded " +
      "away is still skipped on replay") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_replay_c").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs.limit(0), "text", "doc_id"),
      dir, tokenBuckets = 4)
    (0 to 2).foreach { b =>
      Retrieval.appendToStored(spark, dir, 4,
        docs.where(col("doc_id") % 3 === b), "text", "doc_id",
        batchId = Some(b.toLong))
    }
    // compaction folds the even streaming segment ids out of the commit
    // log — the exact window the segment-membership guard alone misses
    Retrieval.compactStored(spark, dir, tokenBuckets = 4)
    assert((0 to 2).forall(b => graft.batch.SegmentedStore.batchApplied(dir, b.toLong)),
      "high-water mark lost across compaction")
    // crash-between-foreachBatch-return-and-checkpoint-commit replay,
    // arriving only after the compaction ran: must be a no-op
    Retrieval.appendToStored(spark, dir, 4,
      docs.where(col("doc_id") % 3 === 1), "text", "doc_id",
      batchId = Some(1L))
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    val a = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id")
    val full = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(docs, "text", "doc_id"), queries, "qtext", "query_id")
    assert(a.exceptAll(full).isEmpty && full.exceptAll(a).isEmpty,
      "post-compaction replay double-appended")
    val st = Retrieval.readIndex(spark, dir, "doc_id").stats.collect().head
    assert(st.getLong(0) == 5L && st.getLong(1) == 13L, "stats double-counted")
    // re-pointing a NEW checkpoint (ids restart at 0) needs the explicit
    // reset — and only the reset — to accept batches again
    graft.batch.SegmentedStore.resetStreamingReplayGuard(dir)
    assert(!graft.batch.SegmentedStore.batchApplied(dir, 0L))
    graft.batch.BatchState.deleteDir(dir)
  }

  test("crash window: an uncommitted segment is invisible to readers and " +
      "the next append overwrites its id") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_crash").toString
    Retrieval.writeIndex(Retrieval.buildIndex(
      docs.where(col("doc_id") <= 3), "text", "doc_id"), dir, tokenBuckets = 4)
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    def score() = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val healthy = score()
    // simulate a writer that died mid-append: segment data written (with
    // WRONG poisoned content so reading it would be detectable), commit
    // log never flipped. 3 = the next ORDINAL segment id after the
    // bootstrap's seg=1 (ordinal mutations take odd ids; evens belong to
    // batch-id-keyed streaming appends)
    val orphanId = 3L
    val poisoned = Retrieval.buildIndex(
      Seq((99L, "spark spark spark window join")).toDF("doc_id", "text"),
      "text", "doc_id")
    import org.apache.spark.sql.functions.{col => c, pmod, xxhash64, lit}
    poisoned.postings
      .withColumn("tb", pmod(xxhash64(c("token")), lit(4)).cast("int"))
      .write.partitionBy("tb").mode("overwrite").parquet(s"$dir/seg=$orphanId/postings")
    poisoned.stats.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/seg=$orphanId/stats")
    // readers resolve only the commit log: scores and stats unchanged
    assert(score() == healthy, "uncommitted segment leaked into scoring")
    val st0 = Retrieval.readIndex(spark, dir, "doc_id").stats.collect().head
    assert(st0.getLong(0) == 3L, s"uncommitted stats leaked: $st0")
    // recovery: the NEXT append claims the same segment id, overwrites the
    // torn data, and commits — the poisoned rows can never surface
    Retrieval.appendToStored(spark, dir, 4,
      docs.where(col("doc_id") > 3), "text", "doc_id")
    val full = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id")
    val rebuilt = Retrieval.bm25FromIndex(
      Retrieval.buildIndex(docs, "text", "doc_id"), queries, "qtext", "query_id")
    assert(full.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(full).isEmpty)
    assert(!full.collect().exists(_.getLong(1) == 99L))
    graft.batch.BatchState.deleteDir(dir)
  }

  test("crash window: compaction that dies before the commit-log flip " +
      "leaves the index exactly as it was; rerun converges") {
    val s = spark; import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_crash2").toString
    Retrieval.writeIndex(Retrieval.buildIndex(docs.limit(0), "text", "doc_id"),
      dir, tokenBuckets = 4)
    (0 until 3).foreach { i =>
      Retrieval.appendToStored(spark, dir, 4,
        docs.where(col("doc_id") % 3 === i), "text", "doc_id")
    }
    val queries = q(0 -> "spark window", 1 -> "join sort batch")
    def score() = Retrieval.bm25FromStored(spark, dir, 4, queries, "qtext",
      "query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    val before = score()
    // simulate: compacted segment fully written, state file never flipped
    // (= compactStored dying on its second-to-last line). seg=9 is the
    // id the compaction will claim (next odd after the appends' 3,5,7)
    val idx = Retrieval.readIndex(spark, dir, "doc_id")
    import org.apache.spark.sql.functions.{col => c, pmod, xxhash64, lit}
    idx.postings.withColumn("tb", pmod(xxhash64(c("token")), lit(4)).cast("int"))
      .write.partitionBy("tb").mode("overwrite").parquet(s"$dir/seg=9/postings")
    idx.stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/seg=9/stats")
    assert(score() == before, "half-finished compaction changed scores")
    // rerun completes: one live segment, scores still identical
    Retrieval.compactStored(spark, dir, tokenBuckets = 4)
    assert(score() == before)
    val live = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
    assert(live.length == 1, live.map(_.getName).mkString(","))
    graft.batch.BatchState.deleteDir(dir)
  }

  test("stats count token-less docs (N=5, avgdl=2.6) — not just posting docs") {
    val idx = Retrieval.buildIndex(docs, "text", "doc_id")
    val st = idx.stats.collect().head
    assert(st.getLong(0) == 5L && st.getLong(1) == 13L)
    // postings only cover the 4 docs with tokens
    assert(idx.postings.select("doc_id").distinct().count() == 4L)
  }

  test("rrfFuse matches the hand-computed Cormack formula, single-list docs included") {
    val s = spark; import s.implicits._
    val a = Seq((0, 10L, 1), (0, 11L, 2), (0, 12L, 3)).toDF("qid", "id", "rank")
    val b = Seq((0, 11L, 1), (0, 13L, 2)).toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "qid", "id", topK = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._3)
    // 11: 1/62 + 1/61 (both lists); 10: 1/61; 13: 1/62; 12: 1/63 (cut)
    assert(got.map(_._1).toSeq == Seq(11L, 10L, 13L))
    assert(got(0)._2 == 1.0 / 62 + 1.0 / 61)
    assert(got(1)._2 == 1.0 / 61 && got(2)._2 == 1.0 / 62)
    assert(got.map(_._3).toSeq == Seq(1, 2, 3), "fused ranks must be contiguous")
  }

  test("rrfFuse breaks exact score ties by ascending id") {
    val s = spark; import s.implicits._
    val a = Seq((0, 5L, 1), (0, 3L, 2)).toDF("qid", "id", "rank")
    val b = Seq((0, 3L, 1), (0, 5L, 2)).toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "qid", "id", topK = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2)
    // both score 1/61 + 1/62 -> id 3 first
    assert(got.toSeq == Seq((3L, 1), (5L, 2)))
  }
}
