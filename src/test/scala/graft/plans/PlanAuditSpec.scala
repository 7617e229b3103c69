package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.operators.Dedup

/** Physical-plan audits: the properties that make the headline queries
  * scale-safe must hold in the EXPLAIN output, not just in intent — column
  * pruning reaches the parquet scan, filters push down, small dimensions
  * broadcast, the exact-dedup shuffle carries digests rather than text,
  * and no operator re-introduces an unpartitioned global window.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("projection and filter reach the parquet scan (pruning + pushdown)") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"),
      s"scan reads pruned columns: $readSchema")
  }

  test("clustered BatchStore point-read statically prunes to ONE bucket file (serving get)") {
    val s = spark; import s.implicits._
    import graft.batch.BatchStore
    import graft.time.BatchID
    val tmp = java.nio.file.Files.createTempDirectory("graft_clustered_").toString
    val store = new BatchStore[Long, Long](tmp, keyBuckets = Some(8))
    store.writeSnapshot(BatchID(1), (0L until 1000L).map(k => (k, k * 2)).toDS())
    // the layout really is 8 bucket dirs, one file each
    val bdirs = new java.io.File(s"$tmp/batch_id=1").listFiles()
      .filter(_.getName.startsWith("kb="))
    assert(bdirs.length == 8, s"expected 8 kb= dirs, got ${bdirs.map(_.getName).toSeq}")
    bdirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"${d.getName} not single-file")
    }
    val got = store.readLastForKey(spark, 137L).get._2
    assert(got.collect().toSeq == Seq((137L, 274L)))
    // static partition pruning: of the 8 bucket dirs the scan reads ONE
    // file, and the key equality is pushed into the parquet reader (the
    // within-file key sort then confines decoding to ~1 row group)
    val scan = got.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }.head
    assert(scan.metrics("numFiles").value == 1,
      s"point get scanned ${scan.metrics("numFiles").value} files (wanted 1 of 8)")
    val scanStr = scan.toString
    assert(scanStr.contains("EqualTo(key,137"), scanStr)
    // multiget: one scan for a key SET prunes to the union of the keys'
    // bucket dirs (<= |keys| of the 8)
    val multiKeys = Seq(137L, 202L, 911L)
    val gotMulti = store.readLastForKeys(spark, multiKeys).get._2
    assert(gotMulti.collect().toMap == multiKeys.map(k => k -> k * 2).toMap)
    val mScan = gotMulti.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }.head
    assert(mScan.metrics("numFiles").value <= multiKeys.length,
      s"multiget scanned ${mScan.metrics("numFiles").value} files for ${multiKeys.length} keys")
    // reopening the same path with a DIFFERENT bucket count must fail
    // loudly — the mis-declared layout would otherwise name the wrong
    // kb= directory for most keys and silently serve empty point reads
    val mis = new BatchStore[Long, Long](tmp, keyBuckets = Some(16))
    val e = intercept[IllegalStateException] { mis.readLastForKey(spark, 137L) }
    assert(e.getMessage.contains("different") && e.getMessage.contains("bucket"),
      e.getMessage)
    // CORRUPTION law: a bucket dir lost AFTER commit must fail LOUDLY on
    // any point read — pruning would otherwise skip the hole and serve an
    // empty result indistinguishable from "no value for key". Delete the
    // dir that holds key 137's bucket, then read both a key in the hole
    // and a key outside it: both refuse (the store cannot know which
    // future keys route into the hole, so any serve is unsafe)
    import org.apache.spark.sql.functions.{hash => fhash, lit, pmod}
    val kb137 = spark.range(1).select(pmod(fhash(lit(137L)), lit(8))).head().getInt(0)
    graft.batch.BatchState.deleteDir(s"$tmp/batch_id=1/kb=$kb137")
    val holed = new BatchStore[Long, Long](tmp, keyBuckets = Some(8))
    val eHole = intercept[IllegalStateException] { holed.readLastForKey(spark, 137L) }
    assert(eHole.getMessage.contains("missing bucket") &&
      eHole.getMessage.contains(s"kb=$kb137"), eHole.getMessage)
    val eOther = intercept[IllegalStateException] { holed.readLastForKeys(spark, multiKeys) }
    assert(eOther.getMessage.contains("missing bucket"), eOther.getMessage)
    graft.batch.BatchState.deleteDir(tmp)
  }

  test("clustered store: a legitimately EMPTY bucket serves point reads " +
      "(empty dir materialized at write ≠ a dir lost after commit)") {
    val s = spark; import s.implicits._
    import graft.batch.BatchStore
    import graft.time.BatchID
    val tmp = java.nio.file.Files.createTempDirectory("graft_store_empty").toString
    val store = new BatchStore[Long, Long](tmp, keyBuckets = Some(8))
    // ONE key: 7 of 8 buckets hold no rows (the sf0.001 shape that
    // false-positived the corruption guard in round 12's local audit)
    store.writeSnapshot(BatchID(1), Seq((137L, 274L)).toDS())
    val dirs = new java.io.File(s"$tmp/batch_id=1").listFiles()
      .filter(_.getName.startsWith("kb=")).map(_.getName).toSet
    assert(dirs == (0 until 8).map(i => s"kb=$i").toSet, dirs.toString)
    // present key found; a key routing to an empty bucket reads EMPTY, not loud
    assert(store.readLastForKey(spark, 137L).get._2.collect().toSeq ==
      Seq((137L, 274L)))
    val kb137 = spark.range(1).select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(
          org.apache.spark.sql.functions.lit(137L)),
        org.apache.spark.sql.functions.lit(8))).head().getInt(0)
    val other = (1L to 100L).find(k => spark.range(1).select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(
          org.apache.spark.sql.functions.lit(k)),
        org.apache.spark.sql.functions.lit(8))).head().getInt(0) != kb137).get
    assert(store.readLastForKey(spark, other).get._2.collect().isEmpty)
    graft.batch.BatchState.deleteDir(tmp)
  }

  test("uniqueKeyed service join broadcasts the dimension side") {
    import graft.operators.BatchServices
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"))
    val svc = spark.read.parquet(s"$dir/events.parquet")
      .where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("event_id")).as("signup_event_id"))
    val p = plan(BatchServices.uniqueKeyed(ev, svc, Seq("user_id")))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("dimension-filtered join broadcasts the small side (q3 shape)") {
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .where(col("c_mktsegment") === "BUILDING")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val p = plan(c.join(o, col("c_custkey") === col("o_custkey")))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("exact dedup shuffles only (digest, id), never the text column") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(Dedup.exact(docs, "text", "doc_id"))
    // the exchange feeding the digest aggregation must not carry `text`
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(exchanges.forall(!_.contains("text#")), exchanges.mkString("\n"))
  }

  test("decontaminate broadcasts the benchmark set and never shuffles text") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(Dedup.decontaminate(
      docs.where(col("doc_id") % 20 =!= 0), docs.where(col("doc_id") % 20 === 0),
      "text", "doc_id", n = 3, minOverlap = 5))
    assert(p.contains("BroadcastHashJoin"), p)
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(!_.contains("text#")),
      s"text in exchange:\n${exchanges.mkString("\n")}")
  }

  test("stored-index delete anti-join plans as BROADCAST (takedown-sized), " +
      "adding no shuffle to the serving read") {
    val s = spark; import s.implicits._
    import graft.operators.Retrieval
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_del_plan_").toString
    try {
      Retrieval.writeIndex(Retrieval.buildIndex(docs, "text", "doc_id"),
        tmp, tokenBuckets = 4)
      Retrieval.deleteFromStored(spark, tmp,
        docs.where(col("doc_id") % 13 === 0).select("doc_id"))
      val queries = Seq((0, "spark window data")).toDF("query_id", "qtext")
      val p = plan(Retrieval.bm25FromStored(spark, tmp, 4, queries,
        "qtext", "query_id", "doc_id"))
      val anti = p.linesIterator.filter(_.contains("LeftAnti")).toSeq
      assert(anti.nonEmpty, s"no delete anti-join in plan:\n${p.take(800)}")
      assert(anti.forall(_.contains("Broadcast")),
        s"delete anti-join shuffled instead of broadcast:\n${anti.mkString("\n")}")
    } finally graft.batch.BatchState.deleteDir(tmp)
  }

  test("stored graph-ANN mark fold plans as a BROADCAST join into the " +
      "graph read (a takedown adds no shuffle to serving)") {
    val s = spark; import s.implicits._
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_nswp_").toString
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(emb, "embedding", "vec_id", nParts = 2), tmp)
      Similarity.nswDeleteFromStored(spark, tmp,
        emb.where(col("vec_id") % 13 === 0).select("vec_id"))
      val p = plan(Similarity.readNswIndex(spark, tmp))
      val joins = p.linesIterator.filter(_.contains("Join")).toSeq
      assert(joins.nonEmpty, s"no mark join in plan:\n${p.take(800)}")
      assert(joins.forall(_.contains("Broadcast")),
        s"mark fold shuffled instead of broadcast:\n${joins.mkString("\n")}")
    } finally graft.batch.BatchState.deleteDir(tmp)
  }

  test("stored graph-ANN delta fold: the index-sized base folds via a " +
      "BROADCAST anti-join (never shuffled); the LWW window runs over " +
      "deltas only") {
    val s = spark; import s.implicits._
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_nswd_").toString
    try {
      Similarity.nswWriteIndex(
        Similarity.nswBuild(emb, "embedding", "vec_id", nParts = 2), tmp)
      Similarity.nswAppendToStored(spark, tmp,
        Seq((900L, Seq.tabulate(64)(i => math.sin(i + 2.0))))
          .toDF("vec_id", "embedding")
          .select(col("vec_id"), col("embedding")
            .cast(emb.schema("embedding").dataType)),
        "embedding", "vec_id", nParts = 2)
      val p = plan(Similarity.readNswIndex(spark, tmp))
      val joins = p.linesIterator.filter(_.contains("Join")).toSeq
      assert(joins.nonEmpty, s"no delta fold join in plan:\n${p.take(800)}")
      assert(joins.forall(_.contains("Broadcast")),
        s"delta fold shuffled the base:\n${joins.mkString("\n")}")
      // the only Window is the per-id LWW over the tiny delta union —
      // it must not consume the base payload (no window directly above
      // the full-graph scan: the base reaches the output through the
      // anti-join branch only)
      assert(p.contains("Window"), s"LWW window missing:\n${p.take(800)}")
    } finally graft.batch.BatchState.deleteDir(tmp)
  }

  test("backfill's revocation guard plans as a BROADCAST anti-join on the " +
      "key digest (the delta stream never shuffles for the guard)") {
    val s = spark; import s.implicits._
    // audit the EXACT query the guard runs (BatchStore.guardDeltas — the
    // same helper backfill calls), not a hand-built lookalike
    val store = new graft.batch.BatchStore[Long, Long](
      java.nio.file.Files.createTempDirectory("graft_guard_plan_").toString)
    val deltas = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id").as("_1"), lit(1L).as("_2"), lit(1L).as("_3"))
    val rev = Seq(7L, 13L).toDF("k")
      .select(xxhash64(col("k")).as("kd"), lit(5L).as("ub"))
    val p = plan(store.guardDeltas(deltas, rev))
    val anti = p.linesIterator.filter(_.contains("LeftAnti")).toSeq
    assert(anti.nonEmpty, s"no anti-join:\n${p.take(800)}")
    assert(anti.forall(_.contains("Broadcast")),
      s"guard anti-join shuffled the deltas:\n${anti.mkString("\n")}")
    assert(!p.contains("NestedLoop"),
      s"guard degraded to a nested-loop join:\n${p.take(800)}")
  }

  test("removeDuplicatedSpans: no ranking window (hot-gram-safe aggregate); exchanges carry no text") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(Dedup.removeDuplicatedSpans(docs, "text", "doc_id", k = 8))
    // first-occurrence selection must be a partial-aggregable min, not a
    // ranking window (which would serialize a hot gram into one sort)
    assert(!p.contains("windowspecdefinition"), s"ranking window in plan:\n$p")
    assert(!p.contains("SinglePartition"), s"global funnel in plan:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(!_.contains("text#")),
      s"text in exchange:\n${exchanges.mkString("\n")}")
  }

  test("exactAgainstBloom: candidates broadcast into the verification join; text never shuffles") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = Dedup.exactAgainstBloom(
      docs.where(col("doc_id") % 5 === 0), docs.where(col("doc_id") % 5 =!= 0),
      "text", "doc_id", numBits = 1 << 16, k = 5)
    val p = plan(df)
    // the sketch-flagged candidate frame is tiny => Spark broadcasts it,
    // so the corpus digest column streams through the semi-join unshuffled
    assert(p.contains("BroadcastHashJoin"), p)
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(!_.contains("text#")),
      s"text in exchange:\n${exchanges.mkString("\n")}")
  }

  test("sketch aggregates run one partial+final hash aggregation (no extra shuffle)") {
    import graft.functions.{SketchAggregates => SK}
    val ev = spark.read.parquet(s"$dir/events.parquet")
    for (agg <- Seq(
        SK.spaceSaver(col("user_id"), 64),
        SK.bloomFilter(col("user_id"), 1 << 12, 5),
        SK.hllSketch(col("user_id")))) {
      val p = plan(ev.groupBy(col("event_type")).agg(agg.as("s")))
      val nAggs = p.linesIterator.count(_.contains("ObjectHashAggregate"))
      val nExch = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(nAggs == 2, s"expected partial+final ObjectHashAggregate:\n$p")
      assert(nExch == 1, s"expected exactly one key exchange:\n$p")
    }
  }

  test("deterministic sampling is a narrow codegen'd filter (no shuffle, no UDF)") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val p = plan(graft.operators.Sampling.stratified(ev, col("event_type"),
      col("event_id"), Map("purchase" -> 0.5), default = 0.01))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
    // `*(n)` prefix = the Filter runs inside a WholeStageCodegen stage
    assert(p.linesIterator.exists(l => l.contains("Filter") && l.trim.startsWith("*(")), p)
  }

  test("withRowIndex's data-sized window is partitioned (no global funnel)") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val p = plan(graft.operators.RowIndex.withRowIndex(ev, "idx",
      col("user_id"), col("event_id")))
    // every Window over the DATA must be partitioned by the range slice;
    // the only permissible global window is the one over partition COUNTS
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, p)
    val unpartitioned = windows.filterNot(_.contains("__pid"))
    assert(unpartitioned.forall(_.contains("__n")),
      s"data-sized unpartitioned window:\n${windows.mkString("\n")}")
  }

  test("shardAssign: no unpartitioned data window; striping is projection-only over the prefix sum") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
    val df = graft.operators.Sharding.shardAssign(docs, col("doc_id"),
      worldSize = 8, seed = 3L)
    val p = plan(df)
    // same contract as withRowIndex: the only global window runs over
    // per-partition COUNTS (__n), never over data rows
    val unpartitioned = p.linesIterator.filter(_.contains("Window ["))
      .filterNot(_.contains("__pid")).toSeq
    assert(unpartitioned.forall(_.contains("__n")),
      s"data-sized unpartitioned window:\n${unpartitioned.mkString("\n")}")
    // shard/ord are arithmetic on pos — no extra exchange beyond the
    // prefix-sum machinery (offsets broadcast, range shuffle is upstream
    // of the checkpoint)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("naive-bayes: model probes broadcast; training is hash aggregation, no windows") {
    import graft.operators.Scoring
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val m = Scoring.naiveBayesTrain(docs.where(col("doc_id") % 2 === 0),
      "text", length(col("text")) > 300)
    val scored = Scoring.naiveBayesScore(docs.where(col("doc_id") % 2 =!= 0),
      m, "text", "doc_id")
    val p = plan(scored)
    // the vocabulary table and the 1-row consts frame must both arrive
    // broadcast — a sort-merge join would shuffle the exploded corpus
    // against a model table that fits in memory by construction
    assert(!p.contains("SortMergeJoin"),
      s"NB scoring shuffled a model join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window ["), "NB has no business running a window")
  }

  test("packSequences: data-sized window partitioned; boilerplate/shared-ngram shuffles carry hashes, not text") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pk = plan(graft.operators.Packing.packSequences(
      docs.select(col("doc_id"), length(col("text")).cast("long").as("n")),
      col("n"), 512L, Seq(col("doc_id"))))
    val windows = pk.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, pk)
    // the only unpartitioned window is over per-partition totals (__n)
    assert(windows.filterNot(_.contains("__pid")).forall(_.contains("__n")),
      s"data-sized unpartitioned window:\n${windows.mkString("\n")}")
    // line-frequency and gram-frequency aggregates move only 8-byte hashes
    val bp = plan(Dedup.removeBoilerplateLines(docs, "text", "doc_id", minDocs = 2))
    val bpAgg = bp.linesIterator.filter(_.contains("Exchange hashpartitioning(__h")).toSeq
    assert(bpAgg.nonEmpty, bp)
    assert(bpAgg.forall(!_.contains("__line#")), bpAgg.mkString("\n"))
    // audit the lazy core (the public entry checkpoints its output, which
    // collapses the executed plan to a block scan)
    val ng = docs.select(col("doc_id"),
      explode(Dedup.shingleCol(col("text"), 3)).as("__g"))
    val sh = plan(Dedup.sharedNgramStatsFrom(ng, "doc_id", minDocs = 2))
    val shEx = sh.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shEx.nonEmpty, sh)
    assert(shEx.forall(!_.contains("text#")), shEx.mkString("\n"))
  }

  test("packDocwise: the only unpartitioned window is over group counts, never data") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.operators.Packing.packDocwise(
      docs.select(col("doc_id"), length(col("text")).cast("long").as("n")),
      "doc_id", col("n"), 512L, Seq(col("doc_id")), groupBudget = 4096L))
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, p)
    // permissible unpartitioned windows: the prefix-sum over per-partition
    // totals (__n) and the seq-id renumbering over per-GROUP counts
    // (__used) — both partition-count/group-count-sized frames, never data
    assert(windows.filterNot(_.contains("__pid"))
        .forall(w => w.contains("__n") || w.contains("__used")),
      s"data-sized unpartitioned window:\n${windows.mkString("\n")}")
  }

  test("no unpartitioned global Window anywhere in the ANN/IVF plans") {
    val e = spark.read.parquet(s"$dir/../sf0.001/embeddings.parquet")
    val queries = e.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val p = plan(graft.operators.Similarity.ivfTopK(spark, e, "embedding",
      "vec_id", queries, "q_vec", "q_id", k = 5, nCentroids = 4, nProbe = 4))
    // every Window must be partitioned: "Window [..], [part], [order]" — an
    // unpartitioned window renders with an empty partition spec
    p.linesIterator.filter(_.trim.startsWith("Window")).foreach { w =>
      assert(!w.matches(".*Window \\[[^\\]]*\\], \\[\\].*"), w)
    }
    assert(!p.contains("CartesianProduct"), p)
  }

  test("GraftStream columnar source: q_filter predicate pushes to the parquet scan") {
    // the round-4 verdict's top item: with the closure source every filter
    // ran post-deserialization; the columnar source must push it down
    val p = plan(graft.SparkEntry.queries("q_filter")(spark, dir))
    assert(p.contains("EqualTo(event_type,click)"), p)
    assert(p.contains("PushedFilters"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props"), s"scan reads pruned column: $readSchema")
  }

  test("columnar keyed pipeline plans with zero object deserialization (q_mapvalues)") {
    val p = plan(graft.SparkEntry.queries("q_mapvalues")(spark, dir))
    assert(!p.contains("DeserializeToObject"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("columnar filterKeys predicate pushes to the scan (q_filterkeys)") {
    val p = plan(graft.SparkEntry.queries("q_filterkeys")(spark, dir))
    assert(p.contains("LessThan(user_id,50)"), p)
  }

  test("columnar lookup join is closure-free and broadcasts the service (q_lookup)") {
    val p = plan(graft.SparkEntry.queries("q_lookup")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("DeserializeToObject"), p)
  }

  test("either and loop-join seams carry no kryo/binary blobs (product-encoded)") {
    // r6 verdict item 3: Either seams must be (tag, nullable structs), not
    // opaque kryo bytes — the schemas prove the physical layout is columnar
    val pEither = graft.SparkEntry.queries("q_either")(spark, dir)
    val pLoop = graft.SparkEntry.queries("q_loop_join")(spark, dir)
    Seq(pEither, pLoop).foreach { df =>
      val p = plan(df)
      assert(!p.toLowerCase.contains("kryo"), p)
      // a kryo seam surfaces as a BinaryType column; no binary anywhere in
      // any intermediate schema of these queries (none is a legit binary col)
      df.queryExecution.analyzed.foreach { node =>
        node.output.foreach { a =>
          assert(!a.dataType.catalogString.contains("binary"),
            s"binary blob attribute $a in:\n$p")
        }
      }
    }
    // and the encoder itself round-trips both branches
    val s = spark; import s.implicits._
    implicit val e: org.apache.spark.sql.Encoder[Either[Long, String]] =
      GraftEncoders.either[Long, String]
    val ds = Seq[Either[Long, String]](Left(7L), Right("x")).toDS()
    assert(!ds.schema.catalogString.contains("binary"), ds.schema.catalogString)
    assert(ds.collect().toSet == Set(Left(7L), Right("x")))
  }

  test("name(n, shards = k) pins the requested partitioning (FlatMapShards/Reducers analogue)") {
    val s = spark; import s.implicits._
    import graft.api.GraftStream
    import graft.algebra.Semigroup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).as[graft.Doc]

    // FlatMapShards: the closure flatMap reshards its input round-robin to 7
    val fm = GraftStream.from(docs)(_.doc_id)
      .name("tokenize", shards = 7)
      .flatMap(d => d.text.split("\\s+").iterator)
    val pFm = fm.ds.queryExecution.executedPlan.toString
    assert(pFm.contains("RoundRobinPartitioning(7"), pFm)

    // Reducers: the keyed aggregation shuffles on the key into exactly 13
    // partitions, and the hint survives intermediate keyed transforms;
    // the aggregate adds NO second exchange on top of the requested one
    val agg = GraftStream.from(docs)(_.doc_id)
      .asKeyedWith(_.doc_id % 10, (_: graft.Doc) => 1L)
      .name("cnt", shards = 13)
      .mapValues(v => v) // hint must survive a value transform
      .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
    val pAgg = agg.queryExecution.executedPlan.toString
    assert(pAgg.contains(", 13)"), pAgg)
    assert(pAgg.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, pAgg)

    // without the hint: no round-robin exchange appears
    val plain = GraftStream.from(docs)(_.doc_id).flatMap(d => d.text.split("\\s+").iterator)
    assert(!plain.ds.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning"))
  }

  test("name(n, commutative = ...) overrides the aggregation path (MonoidIsCommutative)") {
    val s = spark; import s.implicits._
    import graft.algebra.Semigroup
    import graft.time.Batcher
    val ks = new graft.api.KeyedGraftStream[String, Long](
      Seq((1L, "a", 3L), (2L, "a", 9L), (3L, "b", 4L), (4L, "a", 1L)).toDS())
    // under-declared semigroup (max is commutative but declared not):
    // the hint admits it to the unordered group path, same result
    val underDeclared = Semigroup.from[Long](commutative = false)(math.max)
    val hinted = ks.name("agg", commutative = true)
      .sumDeltasPerBatch(Batcher.unit)(underDeclared)
    val plain = ks.sumDeltasPerBatch(Batcher.unit)(underDeclared)
    assert(hinted.collect().toSet == plain.collect().toSet)
    assert(hinted.collect().toSet == Set(("a", 0L, 9L), ("b", 0L, 4L)))
    // forcing non-commutative on a columnForm semigroup abandons the
    // codegen'd hash aggregation for the event-time-ordered fold (the
    // deterministic-float-order use case)
    val default = ks.sumDeltasPerBatch(Batcher.unit)(Semigroup.longSemigroup)
    val forcedOrdered = ks.name("agg", commutative = false)
      .sumDeltasPerBatch(Batcher.unit)(Semigroup.longSemigroup)
    assert(plan(default.toDF()).contains("HashAggregate"))
    assert(!plan(forcedOrdered.toDF()).contains("HashAggregate"),
      plan(forcedOrdered.toDF()))
    assert(forcedOrdered.collect().toSet == default.collect().toSet)
  }

  test("merge combines per-name hints symmetrically: max(shards), AND(commutative)") {
    val s = spark; import s.implicits._
    def ks(hintShards: Option[Int], hintComm: Option[Boolean]) = {
      val base = new graft.api.KeyedGraftStream[String, Long](
        Seq((1L, "a", 3L)).toDS())
      val s1 = hintShards.fold(base)(n => base.name("l", shards = n))
      hintComm.fold(s1)(c => s1.name("l", commutative = c))
    }
    // max of the two shard requests wins; one-sided hints propagate
    assert(ks(Some(7), None).merge(ks(Some(13), None)).shardHint == Some(13))
    assert(ks(Some(13), None).merge(ks(Some(7), None)).shardHint == Some(13))
    assert(ks(None, None).merge(ks(Some(7), None)).shardHint == Some(7))
    assert(ks(Some(7), None).merge(ks(None, None)).shardHint == Some(7))
    assert(ks(None, None).merge(ks(None, None)).shardHint == None)
    // an ordered-fold request (commutative = false) on EITHER side survives
    assert(ks(None, Some(true)).merge(ks(None, Some(false))).commutativeHint == Some(false))
    assert(ks(None, Some(false)).merge(ks(None, Some(true))).commutativeHint == Some(false))
    assert(ks(None, Some(true)).merge(ks(None, Some(true))).commutativeHint == Some(true))
    assert(ks(None, None).merge(ks(None, Some(false))).commutativeHint == Some(false))
    // and the merged hint drives the physical plan: the union aggregates
    // on 13 partitions (right side's larger request)
    import graft.algebra.Semigroup
    val merged = ks(Some(7), None).merge(ks(Some(13), None))
      .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
    assert(merged.queryExecution.executedPlan.toString.contains(", 13)"))
    // unkeyed streams: same max(shards) rule, either side's hint survives
    val g1 = graft.api.GraftStream.from(Seq(1L).toDS())(identity).name("l", shards = 5)
    val g2 = graft.api.GraftStream.from(Seq(2L).toDS())(identity).name("r", shards = 9)
    assert(g1.merge(g2).shardHint == Some(9))
    assert(g2.merge(g1).shardHint == Some(9))
    assert(g1.merge(graft.api.GraftStream.from(Seq(3L).toDS())(identity)).shardHint == Some(5))
  }

  test("native kernels (dot, minhash sig, shingles, intersect) run inside whole-stage codegen") {
    // regression guard: these expressions implement doGenCode (no
    // CodegenFallback) — the hot stages must show codegen spans, not
    // interpreted projection
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val pDot = plan(e.select(graft.functions.VectorFunctions.cosine(
      col("embedding"), array((0 until 64).map(i => lit(i * 0.5)): _*)).as("c")))
    assert(pDot.contains("graft_dot") && pDot.contains("graft_sumsq"), pDot)
    assert(pDot.contains("*("), pDot)

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pSig = plan(docs.select(graft.operators.Dedup.minhashSignature(
      graft.operators.Dedup.shingleCol(col("text"), 3), 64).as("s")))
    assert(pSig.contains("graft_minhash_sig") && pSig.contains("graft_shingle_hashes"), pSig)
    assert(pSig.contains("*("), pSig)
    assert(!pSig.toLowerCase.contains("fallback"), pSig)
  }

  test("whole-stage codegen covers the scalar text operators") {
    // charCount/alphaRatio are plain expressions -> codegen'd ("*(n)" stage
    // markers); higher-order array functions run as expressions outside
    // codegen by design, so assert on the scalar family
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = docs.select(col("doc_id"),
      graft.functions.TextFunctions.charCount(col("text")).as("n"),
      graft.functions.TextFunctions.alphaRatio(col("text")).as("a"))
      .where(col("n") > 10)
    val p = plan(df)
    assert(p.contains("*("), p)
  }

  test("bm25: query side broadcasts against postings; topK compiles to WindowGroupLimit") {
    val s = spark; import s.implicits._
    import graft.operators.Retrieval
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val queries = Seq(0 -> "spark merge window", 1 -> "batch join").toDF("query_id", "qtext")
    val idx = Retrieval.buildIndex(docs, "text", "doc_id")
    // scoring: the corpus-sized postings frame must meet the query tokens
    // through BROADCAST joins only — a shuffled join here would shuffle
    // the whole posting list volume per query batch
    val scored = Retrieval.bm25FromIndex(idx, queries, "qtext", "query_id")
    val pScored = plan(scored)
    assert(pScored.contains("BroadcastHashJoin"), pScored)
    val shuffledJoins = scored.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffledJoins.isEmpty,
      s"bm25 scoring shuffled a join:\n${shuffledJoins.mkString("\n")}")
    // top-k: rn <= k over the window must compile to WindowGroupLimit so
    // each map task keeps only its local top-k before the per-query shuffle
    val pTop = plan(Retrieval.bm25TopK(idx, queries, "qtext", "query_id", k = 3))
    assert(pTop.contains("WindowGroupLimit"), pTop)
  }

  test("stored bm25 index: query scan prunes to the query tokens' buckets + pushes token IN") {
    val s = spark; import s.implicits._
    import graft.operators.Retrieval
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val idx = Retrieval.buildIndex(docs, "text", "doc_id")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25_prune").toString
    // one file per bucket so numFiles counts bucket dirs exactly
    Retrieval.writeIndex(
      idx.copy(postings = idx.postings.repartition(1)), tmp, tokenBuckets = 16)
    val segDir = new java.io.File(tmp).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg=")).head
    val nDirs = new java.io.File(segDir, "postings").listFiles()
      .count(_.getName.startsWith("tb="))
    assert(nDirs > 4, s"corpus vocabulary only filled $nDirs of 16 buckets")
    val queries = Seq(0 -> "spark window").toDF("query_id", "qtext")
    val scored = Retrieval.bm25FromStored(spark, tmp, tokenBuckets = 16,
      queries, "qtext", "query_id", "doc_id")
    scored.count() // materialize so scan metrics fill
    // AQE hides scans behind AdaptiveSparkPlanExec/QueryStageExec leaf
    // boundaries — descend through them explicitly
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => allScans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(scored.queryExecution.executedPlan)
    val postScan = scans.find(_.output.exists(_.name == "token")).get
    // 2 query tokens -> at most 2 of the filled bucket dirs are read
    assert(postScan.metrics("numFiles").value <= 2,
      s"pruned read touched ${postScan.metrics("numFiles").value} files of $nDirs buckets")
    assert(postScan.toString.contains("In(token"), postScan.toString)
  }
}
