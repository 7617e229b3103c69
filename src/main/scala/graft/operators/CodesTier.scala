package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.batch.{SegmentedStore, StoreFs}

/** One stored-codes tier: the segmented lifecycle the flat-int8, IVF and
  * IVF-PQ serving indexes share (round 18, extracting what the round-17
  * tree carried as three structural twins). A tier is a
  * [[graft.batch.SegmentedStore]] layout whose payload segments hold
  * ENCODED vectors — int8 codes, cell-partitioned int8 codes, PQ residual
  * codes — plus, for the cell tiers, the FROZEN model tables the encoding
  * was computed against (FAISS discipline: appends encode against the
  * stored model; retraining = rebuild). What varies between tiers is
  * exactly the constructor: the payload layout, the empty-frame schema,
  * and how model tables persist. Everything else — atomic bootstrap,
  * replay-guarded append, coverage-marked takedown, model-carrying
  * compaction, the cadence guard — is THIS one body, so a
  * crash-consistency fix lands in every tier at once (the round-17
  * local-FS atomicity fix had to be verified tier by tier).
  *
  * Reference semantics: summingbird-batch VersionedBatchStore.scala:62-143
  * (mutations become visible only via an atomic marker flip); the
  * delete-set coverage discipline is documented at
  * [[graft.batch.SegmentedStore.writeDeleteCovers]].
  *
  * @param label      tier name for error messages ("int8" / "ivf" / "ivfpq")
  * @param payload    payload subdir under each segment dir
  * @param cellPartitioned whether payload rows carry a `cid` coarse-cell
  *   column and the parquet layout partitions by it (the partition-pruned
  *   serving lever; also enables the per-segment cell-occupancy stats)
  * @param emptySchema canonical empty-frame schema, parameterized by the
  *   id column name (served during the bootstrap-to-first-batch window)
  * @param modelMarker model-table subdir whose presence marks a
  *   model-carrying segment (None for model-free tiers); the NEWEST
  *   committed segment carrying it is always current (payload bootstraps
  *   write it; compaction re-writes the same model)
  * @param writeModel  persist the model tables under a segment dir
  * @param loadModel   read the model tables back from a segment dir
  */
private[operators] final class CodesTier[M](
    label: String,
    payload: String,
    cellPartitioned: Boolean,
    emptySchema: String => StructType,
    modelMarker: Option[String],
    writeModel: (SparkSession, String, M) => Unit,
    loadModel: (SparkSession, String) => M) {

  private def segDir(path: String, id: Long): String =
    SegmentedStore.segDir(path, id)

  /** Marker file (inside the model-table dir, so it commits atomically
    * with the segment and parquet readers ignore it) recording the corpus
    * size the frozen model was TRAINED on — the denominator of the
    * appended-mass drift signal ([[driftStatsRow]]). Carried verbatim
    * through compactions; reset only by a rebuild.
    */
  private val TrainedMetaName = "_graft_trained.json"

  /** The one codes-segment write shape: CLEAR the whole segment dir first
    * — `nextId`/`batchSegId` reuse a crashed writer's uncommitted id, and
    * parquet overwrite only clears the payload subdir, so without the
    * pre-clear an orphan `deletes/` left by a crashed takedown would ride
    * this segment's commit into the log and silently suppress live
    * vectors (mirrors Retrieval.writeSegment). Cell tiers also write a
    * per-cell occupancy table (`cellstats/`) aggregated from the payload
    * just written — O(new data) at write time, so the drift cadence reads
    * tiny per-segment tables instead of scanning the store.
    */
  def writeSegment(encoded: DataFrame, path: String, id: Long,
      model: Option[M], trainedRows: Option[Long] = None,
      stampTrainedFallback: Boolean = true): Unit = {
    val seg = segDir(path, id)
    StoreFs.deleteRecursive(seg)
    // REBALANCE by cid before a cell-partitioned write (round 20 opt,
    // guide §6): partitionBy alone writes one file per (input partition,
    // cell) pair — N scan tasks × C cells small files per segment, the
    // small-files catastrophe at corpus scale and extra open cost on
    // every pruned read. The AQE rebalance clusters each cell's rows
    // (≈ one file per cell) while still SPLITTING a skewed hot cell
    // across tasks, so a hot cell stragglers neither the write nor a
    // later read. Row content is unchanged — layout only.
    val clustered =
      if (cellPartitioned) encoded.hint("rebalance", col("cid")) else encoded
    val w = clustered.write.mode("overwrite")
    (if (cellPartitioned) w.partitionBy("cid") else w).parquet(s"$seg/$payload")
    // an empty batch (bootstrap-to-first-micro-batch window) writes only
    // markers — nothing to read back, and schema inference would throw
    val hasRows = cellPartitioned &&
      SegmentedStore.hasParquetFiles(s"$seg/$payload")
    // occupancy from the WRITTEN parquet FOOTERS (round 21; was a
    // read-back scan in round 20, and never a re-run of the encode):
    // `cid` is the partition directory and each footer records its exact
    // row count, so the per-cell stats are a driver-side metadata read —
    // the previous groupBy read-back was one full Spark job per segment
    // write, paid by every micro-batch append and every compaction. Rows
    // with zero-count files are filtered for exact equivalence with the
    // groupBy (which only ever emitted cids holding rows).
    val cellCounts: Seq[(Int, Long)] =
      if (!hasRows) Seq.empty
      else StoreFs.listStatus(s"$seg/$payload")
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cid="))
        .map { st =>
          val cid = st.getPath.getName.stripPrefix("cid=").toInt
          val n = StoreFs.listStatus(st.getPath.toString)
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            .map(f => StoreFs.parquetRowCount(f.getPath.toString)).sum
          cid -> n
        }
        .filter(_._2 > 0L).toSeq
    if (hasRows) {
      val session = encoded.sparkSession
      import session.implicits._
      cellCounts.toDF("cid", "n")
        .coalesce(1).write.mode("overwrite").parquet(s"$seg/cellstats")
    }
    model.foreach { m =>
      writeModel(encoded.sparkSession, seg, m)
      // trained-corpus meta AFTER the model parquet writes (overwrite
      // clears the dir); commits atomically with the segment on the flip.
      // A model-carrying BOOTSTRAP passes None and records the payload
      // size just written (the cellstats sum — free); a COMPACTION
      // carries the original train-time value through and DISABLES the
      // fallback: stamping a meta-less pre-r18 store with its folded
      // total would read as appended_mass_fraction 0.0 and permanently
      // launder whatever drift it had already accumulated — the store
      // stays honestly "trained size unknown" until a rebuild
      modelMarker.foreach { mk =>
        val n = trainedRows.orElse {
          if (!stampTrainedFallback) None
          // cellCounts already holds the written payload size (footer
          // counts, empty ⇒ 0) — no read-back job
          else Some(cellCounts.map(_._2).sum)
        }
        n.foreach(v => StoreFs.writeAtomic(s"$seg/$mk/$TrainedMetaName",
          s"""{"trained_rows":$v}""".getBytes("UTF-8")))
      }
    }
  }

  /** Bootstrap / replace: write ONE payload segment (plus model tables),
    * behind one atomic flip. `encoded` is by-name — it materializes only
    * inside the writer lock.
    */
  def writeIndexReplaceAll(encoded: => DataFrame, path: String,
      model: Option[M], trainedRows: Option[Long] = None): Unit =
    SegmentedStore.withWriterLock(path) {
      val id = SegmentedStore.nextId(path)
      writeSegment(encoded, path, id, model, trainedRows)
      SegmentedStore.commitReplaceAll(path, id)
    }

  /** The index's frozen model: the NEWEST committed segment carrying
    * model tables.
    *
    * Cached per (segment dir, model-file fingerprint) — round 21, r20
    * verdict #3: every serve call and every micro-batch append re-read
    * and re-collected the model parquet (a full Spark job for a ≤ cells
    * (resp. m·c)-row table), so a 3-query loop oracle paid 3 model-read
    * jobs and a streaming ingest one per micro-batch. The model is
    * FROZEN by contract (appends encode against it; retraining =
    * rebuild), and any mutation that changes it writes a NEW segment dir
    * — but the key still carries the model files' (name, length, mtime)
    * fingerprint so even an in-place rewrite at a recycled path/segment
    * id (fresh store at the same tmp dir) can never serve a stale model.
    * Bounded LRU; driver-side fingerprint stat only — no Spark job on a
    * hit.
    */
  def readModel(spark: SparkSession, path: String): M = {
    val seg = newestModelSeg(spark, path)
    val mk = modelMarker.get // newestModelSeg already required it
    val fp = StoreFs.listStatus(s"$seg/$mk")
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(";")
    val key = (seg, fp)
    CodesTier.modelCacheGet(key) match {
      case Some(m) => m.asInstanceOf[M]
      case None =>
        val m = loadModel(spark, seg)
        CodesTier.modelCachePut(key, m)
        m
    }
  }

  private def newestModelSeg(spark: SparkSession, path: String): String = {
    val mk = modelMarker.getOrElse(
      throw new IllegalStateException(s"$label tier carries no model tables"))
    val segs = SegmentedStore.committedSegs(path)
    require(segs.nonEmpty, s"$label readModel: no committed index at $path")
    val withModel = segs.filter(id =>
      SegmentedStore.hasParquetFiles(s"${segDir(path, id)}/$mk"))
    require(withModel.nonEmpty,
      s"$label readModel: no model tables committed at $path")
    segDir(path, withModel.max)
  }

  /** The trained-corpus size recorded with the current model, None for a
    * store bootstrapped before the meta existed (or a model-free tier).
    */
  def readTrainedRows(spark: SparkSession, path: String): Option[Long] =
    modelMarker.flatMap { mk =>
      val f = s"${newestModelSeg(spark, path)}/$mk/$TrainedMetaName"
      if (!StoreFs.exists(f)) None
      else "-?\\d+".r.findFirstIn(new String(StoreFs.readBytes(f), "UTF-8"))
        .map(_.toLong)
    }

  /** Union of the committed segments' codes with deletes anti-joined.
    * `probeCids` prunes the scan to those cells (ordinary parquet
    * partition pruning — the serve path's lever); None reads everything
    * (equality laws, compaction). An index whose committed segments hold
    * no payload (the bootstrap-to-first-batch window of a streaming
    * ingest) reads as the canonical EMPTY frame, so serving and
    * compaction stay alive between micro-batches.
    */
  def readIndex(spark: SparkSession, path: String,
      idCol: String = "vec_id",
      probeCids: Option[Seq[Int]] = None): DataFrame = {
    val segs = SegmentedStore.committedSegs(path)
    require(segs.nonEmpty, s"$label readIndex: no committed index at $path")
    val live = segs.filter(id =>
      SegmentedStore.hasParquetFiles(s"${segDir(path, id)}/$payload"))
    if (live.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        emptySchema(idCol))
    } else {
      // __seg provenance: the delete anti-join applies each delete set
      // only to the segments it covers (dropped before returning)
      val codes = live.map { id =>
        val seg = spark.read.parquet(s"${segDir(path, id)}/$payload")
        probeCids.fold(seg)(cids =>
            seg.where(col("cid").isin(cids.map(Int.box): _*)))
          .withColumn("__seg", lit(id))
      }.reduce(_ unionByName _)
      readDeletes(spark, path, segs, idCol) match {
        case None => codes.drop("__seg")
        case Some(d) =>
          codes.alias("__p").join(d.alias("__d"),
            col(s"__p.$idCol") === col(s"__d.$idCol") &&
              array_contains(col("__d.__covers"), col("__p.__seg")),
            "left_anti")
            .drop("__seg")
      }
    }
  }

  /** Union of the committed segments' delete sets, each row carrying its
    * delete's covered-segment array (`__covers`); None when no segment
    * carries deletions (commit-order coverage semantics documented at
    * [[graft.batch.SegmentedStore.writeDeleteCovers]]).
    */
  private def readDeletes(spark: SparkSession, path: String,
      segs: List[Long], idCol: String): Option[DataFrame] = {
    val live = segs.filter(id =>
      SegmentedStore.hasParquetFiles(s"${segDir(path, id)}/deletes"))
    if (live.isEmpty) None
    else Some(live.map { id =>
      val covers = SegmentedStore.readDeleteCovers(path, id)
        .getOrElse(segs.filter(_ != id))
      spark.read.parquet(s"${segDir(path, id)}/deletes")
        .toDF(idCol).distinct().withColumn("__covers", typedLit(covers))
    }.reduce(_ unionByName _))
  }

  /** Ingest a (disjoint-id) vector batch as ONE new committed segment —
    * the streaming maintenance path (call from `foreachBatch`). `encode`
    * runs on the model resolved INSIDE the writer lock: a concurrent
    * rebuild with a fresh model must not leave this append encoded
    * against superseded tables. `batchId` makes the append idempotent
    * under at-least-once replay (same contract as Retrieval
    * .appendToStored); the streaming commit raises the applied-batch
    * high-water mark in the same atomic flip, so the replay guard
    * survives compaction.
    */
  def appendToStored(spark: SparkSession, path: String,
      batchId: Option[Long], opLabel: String, bootstrapHint: String)(
      encode: M => DataFrame): Unit = {
    require(SegmentedStore.committedSegs(path).nonEmpty,
      s"$opLabel: no committed index at $path — bootstrap with $bootstrapHint")
    SegmentedStore.withWriterLock(path) {
      batchId match {
        case Some(b) if SegmentedStore.batchApplied(path, b) => ()
        case _ =>
          val m = readModelOrUnit(spark, path)
          val id = batchId.map(SegmentedStore.batchSegId)
            .getOrElse(SegmentedStore.nextId(path))
          writeSegment(encode(m), path, id, model = None)
          batchId match {
            case Some(b) => SegmentedStore.commitStreamingAppend(path, b)
            case None    => SegmentedStore.commitAppend(path, id)
          }
      }
    }
  }

  // model-free tiers encode against nothing; M is Unit there and the
  // cast is the identity
  private def readModelOrUnit(spark: SparkSession, path: String): M =
    if (modelMarker.isEmpty) ().asInstanceOf[M]
    else readModel(spark, path)

  /** Takedown — the shared codes-store delete-set discipline (coverage
    * semantics, re-append re-serves immediately): one segment holding the
    * delete set, committed on the atomic log flip; reads anti-join it
    * out, so serving equals an index built without the vectors; the next
    * compaction folds the removal physically. Restricted to
    * currently-live ids (idempotent; never-indexed ids are a no-op).
    */
  def deleteFromStored(spark: SparkSession, path: String,
      ids: DataFrame, idCol: String, opLabel: String): Unit =
    SegmentedStore.withWriterLock(path) {
      val segs = SegmentedStore.committedSegs(path)
      require(segs.nonEmpty, s"$opLabel: no committed index at $path")
      val victims = readIndex(spark, path, idCol)
        .join(ids.toDF(idCol).distinct(), Seq(idCol), "left_semi")
        .select(col(idCol)).distinct()
        .persist()
      try {
        // nothing live matched: leave the commit log untouched
        if (victims.limit(1).count() > 0) {
          val id = SegmentedStore.nextId(path)
          // pre-clear: an orphan payload dir from a crashed append at
          // this reused id must not ride the takedown's commit
          StoreFs.deleteRecursive(segDir(path, id))
          victims.write.mode("overwrite")
            .parquet(s"${segDir(path, id)}/deletes")
          // covers marker AFTER the parquet overwrite; commits with the
          // segment on the log flip
          SegmentedStore.writeDeleteCovers(path, id, segs)
          SegmentedStore.commitAppend(path, id)
        }
      } finally {
        victims.unpersist()
        ()
      }
    }

  /** Fold segments + deletes physically into one payload segment, the
    * model (and its trained-corpus meta) carried over UNCHANGED — frozen;
    * a codes-only store cannot retrain. Rebuild from the float corpus to
    * repair drift ([[driftStatsRow]] measures WHEN).
    */
  def compactStored(spark: SparkSession, path: String,
      sweepGraceMs: Long = 0L): Unit =
    SegmentedStore.withWriterLock(path) {
      compactLocked(spark, path, sweepGraceMs)
    }

  // lock-free compact body, shared by the direct verb and the cadence
  // guard (which re-checks the threshold INSIDE the lock)
  def compactLocked(spark: SparkSession, path: String,
      sweepGraceMs: Long): Unit = {
    val m = modelMarker.map(_ => readModel(spark, path))
    val trained = if (modelMarker.isDefined) readTrainedRows(spark, path) else None
    val all = readIndex(spark, path)
    val id = SegmentedStore.nextId(path)
    // carry-only: a compaction must never INVENT a trained size (see
    // writeSegment — the fallback is for bootstraps)
    writeSegment(all, path, id, m, trained, stampTrainedFallback = false)
    SegmentedStore.commitReplaceAll(path, id, sweepGraceMs)
  }

  /** Self-scheduling fold — the shared cadence guard (threshold
    * re-checked inside the writer lock). Cell tiers also run the cheap
    * drift check on every cadence call (per-segment stats tables, never
    * a store scan) and WARN loudly past the thresholds — frozen-model
    * drift must surface here, on the maintenance path an operator already
    * watches, not as unexplained recall loss. Returns whether a
    * compaction ran.
    */
  def compactIfFragmented(spark: SparkSession, path: String,
      maxSegments: Int, sweepGraceMs: Long,
      driftCells: Option[() => Int] = None): Boolean = {
    val ran = SegmentedStore.compactIfFragmentedLocked(path, maxSegments) {
      compactLocked(spark, path, sweepGraceMs)
    }
    // drift check AFTER the fold decision (unlocked — it only reads):
    // `driftCells` supplies the frozen model's true cell count, so a
    // store whose whole mass sits in one cell still reads imbalance
    // n_cells, not 1.0
    driftCells.foreach { nc =>
      // NonFatal only: a driver OOM / interrupt raised inside this
      // best-effort observability read must propagate, not become a
      // stderr line with the JVM left in a corrupted state
      try { driftStatsRow(spark, path, nc()).collect(); () }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft] $label drift check skipped at $path: $e")
      }
    }
    ran
  }

  /** Per-cell live-occupancy estimate from the per-segment `cellstats`
    * tables — O(segments) tiny reads, never a store scan. Takedowns
    * between compactions are NOT subtracted (a delete set doesn't know
    * its victims' cells); the estimate re-exacts at every compaction,
    * which rewrites the stats from the folded payload. Pre-stats
    * segments (written before round 18) fall back to counting their
    * payload's cid partition column.
    */
  def cellOccupancy(spark: SparkSession, path: String): DataFrame = {
    require(cellPartitioned, s"$label tier is not cell-partitioned")
    val segs = SegmentedStore.committedSegs(path)
    require(segs.nonEmpty, s"$label cellOccupancy: no committed index at $path")
    val perSeg = segs.flatMap { id =>
      val seg = segDir(path, id)
      if (SegmentedStore.hasParquetFiles(s"$seg/cellstats"))
        Some(spark.read.parquet(s"$seg/cellstats").select("cid", "n"))
      else if (SegmentedStore.hasParquetFiles(s"$seg/$payload"))
        Some(spark.read.parquet(s"$seg/$payload")
          .groupBy(col("cid")).agg(count(lit(1)).as("n")).select("cid", "n"))
      else None
    }
    if (perSeg.isEmpty)
      spark.range(0).select(col("id").cast("int").as("cid"), col("id").as("n"))
    else perSeg.reduce(_ unionByName _)
      .groupBy(col("cid")).agg(sum(col("n")).as("n"))
  }

  /** ONE drift-observability row for a frozen-model cell tier (r17
    * verdict #3): cell-occupancy imbalance (max/mean over the model's
    * cell count — a skewed append pushes it up) and appended-mass
    * fraction (rows beyond the trained corpus size / total — the share of
    * the store the frozen model never saw). Both are retrain-WHEN
    * signals: the model is frozen by design (FAISS discipline), so past
    * the thresholds the repair is a rebuild, and this row is what makes
    * that trade observable instead of discovered as recall loss.
    * Thresholds: occupancy imbalance > `imbalanceWarn` (mean-relative, so
    * it is corpus-size invariant) or appended fraction > `appendedWarn`.
    */
  def driftStatsRow(spark: SparkSession, path: String, nCells: Int,
      imbalanceWarn: Double = 4.0, appendedWarn: Double = 0.5): DataFrame = {
    val occ = cellOccupancy(spark, path).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = occ.values.sum
    val maxCell = if (occ.isEmpty) 0L else occ.values.max
    val mean = if (nCells > 0) total.toDouble / nCells else 0.0
    val imbalance = if (mean > 0) maxCell / mean else 0.0
    val emptyCells = nCells - occ.count(_._2 > 0L)
    val trained = readTrainedRows(spark, path)
    val appendedFrac = trained match {
      case Some(t) if total > 0 => math.max(0L, total - t).toDouble / total
      case _                    => 0.0
    }
    // trained_known distinguishes "no appended mass" from "trained size
    // unknown" (a pre-meta store; compaction deliberately never invents
    // one) — an unknown store's appended signal is blind, and the row
    // must say so rather than read as a clean 0.0
    val trainedKnown = trained.isDefined
    val warn = imbalance > imbalanceWarn || appendedFrac > appendedWarn
    if (warn) System.err.println(
      f"[graft] $label index at $path: FROZEN-MODEL DRIFT — occupancy " +
      f"imbalance $imbalance%.2f (warn > $imbalanceWarn%.1f), appended-mass " +
      f"fraction $appendedFrac%.3f (warn > $appendedWarn%.2f). The model is " +
      "frozen by design; repair by rebuilding from the float corpus")
    import spark.implicits._
    Seq((nCells, total, maxCell,
        BigDecimal(imbalance).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        emptyCells,
        BigDecimal(appendedFrac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        trainedKnown, warn))
      .toDF("n_cells", "occupied_rows", "max_cell_rows", "occ_imbalance",
        "empty_cells", "appended_mass_fraction", "trained_known", "drift_warn")
  }
}

private[operators] object CodesTier {
  // Frozen-model read cache shared by every tier instance (see
  // readModel). Values are small driver-side arrays (≤ cells centroid
  // rows / m·c codebook rows); 64 entries bounds it to a handful of MB.
  // NOT a result cache: entries are keyed on the store's own files
  // (segment dir + file fingerprint), hold only what one readModel call
  // collects, and every bench/oracle run builds its stores fresh under
  // new tmp dirs — the cache only dedupes repeated reads of the SAME
  // committed model within one run.
  private val MaxEntries = 64
  private val cache =
    new java.util.LinkedHashMap[(String, String), Any](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Any]): Boolean =
        size() > MaxEntries
    }
  private[operators] def modelCacheGet(key: (String, String)): Option[Any] =
    cache.synchronized(Option(cache.get(key)))
  private[operators] def modelCachePut(key: (String, String), m: Any): Unit =
    cache.synchronized { cache.put(key, m); () }
}
