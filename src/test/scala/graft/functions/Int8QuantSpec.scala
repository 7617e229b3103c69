package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.{VectorFunctions => VF}

/** Laws for symmetric int8 embedding quantization: codes bounded, the
  * reconstruction error obeys the half-step bound, zero vectors are
  * all-zero, and the codes-space dot approximates the true dot.
  */
class Int8QuantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
    (2L, Array(3.0f, 2.0f, -3.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
    (4L, Array(1e-8f, -1e-8f, 5e-9f, 0.0f)) // tiny but nonzero
  ).toDF("vec_id", "embedding")

  test("codes are in [-127, 127], extreme element hits ±127, zero vector is all zeros") {
    val got = vecs.select(col("vec_id"),
      VF.int8Quantize(col("embedding")).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    got.values.flatten.foreach(c => assert(c >= -127 && c <= 127))
    assert(got(1L) == Seq[Byte](64, -127, 32, 16)) // 0.5/1.0*127 = 63.5 -> 64
    assert(got(2L).head == 127.toByte && got(2L)(2) == -127.toByte)
    assert(got(3L) == Seq[Byte](0, 0, 0, 0))
  }

  test("dequantization error is within half a quantization step per element") {
    val checked = vecs.select(col("embedding"),
      VF.int8Dequantize(VF.int8Quantize(col("embedding")),
        VF.int8Scale(col("embedding"))).as("deq"),
      VF.int8Scale(col("embedding")).as("m"))
    checked.collect().foreach { r =>
      val orig = r.getSeq[Float](0)
      val deq = r.getSeq[Double](1)
      val m = r.getDouble(2)
      orig.zip(deq).foreach { case (o, d) =>
        assert(math.abs(o.toDouble - d) <= m / 254.0 + 1e-12,
          s"error ${math.abs(o - d)} > half-step ${m / 254.0}")
      }
    }
  }

  test("native byte-array dot kernel is bit-identical to the HOF fold") {
    val pairs = vecs.crossJoin(vecs.select(col("embedding").as("emb2")))
      .select(VF.int8Quantize(col("embedding")).as("a"),
        VF.int8Scale(col("embedding")).as("sa"),
        VF.int8Quantize(col("emb2")).as("b"),
        VF.int8Scale(col("emb2")).as("sb"))
    val diffs = pairs.select(
      (VF.int8Dot(col("a"), col("sa"), col("b"), col("sb")) -
        VF.int8DotHof(col("a"), col("sa"), col("b"), col("sb"))).as("d"))
      .collect().map(_.getDouble(0))
    assert(diffs.forall(_ == 0.0), diffs.mkString(","))
  }

  test("int8TopK recalls the exact brute top-k on a synthetic corpus") {
    import graft.operators.Similarity
    // deterministic smooth vectors: dim 16, 300 rows
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(0.1 * i + d).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = Array.tabulate(16)(d => math.cos(0.05 + d))
    val exact = Similarity.bruteForceTopK(df, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.int8TopK(df, "embedding", "vec_id", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(approx.size == 10)
    assert((approx & exact).size >= 9,
      s"recall ${(approx & exact).size}/10: approx=$approx exact=$exact")
  }

  test("stored int8 index: append ≡ rebuild, compaction preserves results, " +
      "uncommitted segment invisible, stored query ≡ one-shot") {
    import graft.operators.Similarity
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(0.1 * i + d).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = Array.tabulate(16)(d => math.cos(0.05 + d))
    val mem = Similarity.int8TopK(df, "embedding", "vec_id", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

    // incremental build: bootstrap one third, append the other two
    val dir = java.nio.file.Files.createTempDirectory("graft_int8_seg").toString
    Similarity.int8WriteIndex(df.where(col("vec_id") % 3 === 0),
      "embedding", "vec_id", dir)
    (1 until 3).foreach { i =>
      Similarity.int8AppendToStored(spark, dir,
        df.where(col("vec_id") % 3 === i), "embedding", "vec_id")
    }
    def stored() = Similarity.int8TopKStored(spark, dir, df, "embedding",
      "vec_id", q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(stored() == mem, "incrementally built stored index != one-shot")

    // a poisoned UNCOMMITTED segment never surfaces
    val orphan = Seq((9999L, Array.fill(16)(1.0f))).toDF("vec_id", "embedding")
    orphan.select(col("vec_id"),
        graft.functions.VectorFunctions.int8Quantize(col("embedding")).as("codes"),
        lit(1.0).as("scale"))
      .write.mode("overwrite").parquet(s"$dir/seg=99/codes")
    assert(stored() == mem, "uncommitted segment leaked into serving")
    graft.batch.BatchState.deleteDir(s"$dir/seg=99")

    // batch-id-keyed replay is idempotent: re-delivering an already-
    // committed micro-batch neither duplicates vectors nor changes results
    val dirR = java.nio.file.Files.createTempDirectory("graft_int8_replay").toString
    Similarity.int8WriteIndex(df.limit(0), "embedding", "vec_id", dirR)
    (Seq(0, 1, 1, 2): Seq[Int]).foreach { b =>
      Similarity.int8AppendToStored(spark, dirR,
        df.where(col("vec_id") % 3 === b), "embedding", "vec_id",
        batchId = Some(b.toLong))
    }
    val nRows = Similarity.readInt8Index(spark, dirR).count()
    assert(nRows == 300L, s"replay double-appended: $nRows rows")
    val replayed = Similarity.int8TopKStored(spark, dirR, df, "embedding",
      "vec_id", q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(replayed == mem)
    // the replay guard survives compaction (the applied-batch high-water
    // mark): a batch replayed AFTER its segment was folded is still a no-op
    Similarity.int8CompactStored(spark, dirR)
    Similarity.int8AppendToStored(spark, dirR,
      df.where(col("vec_id") % 3 === 1), "embedding", "vec_id",
      batchId = Some(1L))
    assert(Similarity.readInt8Index(spark, dirR).count() == 300L,
      "post-compaction replay double-appended")
    graft.batch.BatchState.deleteDir(dirR)

    // serveable-while-empty holds for a NON-default id column: the
    // canonical empty frame must name its id field from the caller's
    // idCol, or select(idCol) throws during the bootstrap window
    val dirE = java.nio.file.Files.createTempDirectory("graft_int8_idcol").toString
    val dfD = df.withColumnRenamed("vec_id", "doc_id")
    Similarity.int8WriteIndex(dfD.limit(0), "embedding", "doc_id", dirE)
    val emptyTopK = Similarity.int8TopKStored(spark, dirE, dfD, "embedding",
      "doc_id", q, 10).collect()
    assert(emptyTopK.isEmpty, "empty bootstrap window must serve an empty top-k")
    graft.batch.BatchState.deleteDir(dirE)

    // takedown deletes: serving equals an index built without the vectors;
    // idempotent + never-indexed ids leave the commit log untouched;
    // compaction folds the removal physically
    val dirD = java.nio.file.Files.createTempDirectory("graft_int8_del").toString
    Similarity.int8WriteIndex(df, "embedding", "vec_id", dirD)
    val delIds = (0 until 300 by 3).map(_.toLong)
    Similarity.int8DeleteFromStored(spark, dirD,
      delIds.toDF("vec_id"))
    val expectDel = Similarity.int8TopK(df.where(col("vec_id") % 3 =!= 0),
        "embedding", "vec_id", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    def storedDel() = Similarity.int8TopKStored(spark, dirD, df, "embedding",
      "vec_id", q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(storedDel() == expectDel, "delete != rebuild-without")
    val segsD = graft.batch.SegmentedStore.committedSegs(dirD)
    Similarity.int8DeleteFromStored(spark, dirD, Seq(0L, 99999L).toDF("vec_id"))
    assert(graft.batch.SegmentedStore.committedSegs(dirD) == segsD,
      "no-op delete committed a segment")
    Similarity.int8CompactStored(spark, dirD)
    assert(Similarity.readInt8Index(spark, dirD).count() == 200L,
      "deleted codes survived compaction")
    assert(storedDel() == expectDel, "compaction changed post-delete serving")
    graft.batch.BatchState.deleteDir(dirD)

    // delete then re-append the same ids: commit-time coverage means the
    // re-added vectors serve again with NO compaction in between
    val dirA = java.nio.file.Files.createTempDirectory("graft_int8_readd").toString
    Similarity.int8WriteIndex(df, "embedding", "vec_id", dirA)
    Similarity.int8DeleteFromStored(spark, dirA,
      delIds.toDF("vec_id"))
    Similarity.int8AppendToStored(spark, dirA,
      df.where(col("vec_id") % 3 === 0), "embedding", "vec_id")
    assert(Similarity.readInt8Index(spark, dirA).count() == 300L,
      "re-added vectors suppressed without a compaction")
    val reAdded = Similarity.int8TopKStored(spark, dirA, df, "embedding",
      "vec_id", q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(reAdded == mem, "re-added index != full index")
    // and a LATER streaming append whose pinned even segment id is smaller
    // than the delete's id is untouched by it (commit-time coverage):
    // committed now [1,3,5]; delete → seg 7; batch 2 → seg 6 < 7
    Similarity.int8DeleteFromStored(spark, dirA, Seq(5L).toDF("vec_id"))
    Similarity.int8AppendToStored(spark, dirA,
      Seq((5L, Array.tabulate(16)(d => math.sin(0.5 + d).toFloat)))
        .toDF("vec_id", "embedding"), "embedding", "vec_id",
      batchId = Some(2L))
    assert(graft.batch.SegmentedStore.committedSegs(dirA).contains(6L) &&
      graft.batch.SegmentedStore.committedSegs(dirA).contains(7L),
      "test no longer exercises the id leapfrog")
    assert(Similarity.readInt8Index(spark, dirA).count() == 300L,
      "delete leapfrogged a later streaming append")
    graft.batch.BatchState.deleteDir(dirA)

    // self-scheduling compaction: no-op below the threshold, folds above
    assert(!Similarity.int8CompactIfFragmented(spark, dir, maxSegments = 8))
    assert(Similarity.int8CompactIfFragmented(spark, dir, maxSegments = 2))
    assert(stored() == mem, "threshold compaction changed results")

    // compaction: one live segment afterwards, results identical
    Similarity.int8CompactStored(spark, dir)
    val live = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
    assert(live.length == 1, live.map(_.getName).mkString(","))
    assert(stored() == mem, "compaction changed results")
    graft.batch.BatchState.deleteDir(dir)
  }

  test("int8ReplaceInStored: atomic upsert equals a rebuild over the " +
      "corrected corpus; crashed takedown's orphan deletes dir cannot " +
      "ride a later append") {
    import graft.operators.Similarity
    val rows = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(16)(d => math.sin(0.1 * i + d).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = Array.tabulate(16)(d => math.cos(0.05 + d))
    // poisoned ingest: the vec_id % 5 == 2 slice arrived negated
    val poisoned = df.withColumn("embedding",
      when(col("vec_id") % 5 === 2,
        transform(col("embedding"), x => -x)).otherwise(col("embedding")))
    val dir = java.nio.file.Files.createTempDirectory("graft_int8_rep").toString
    Similarity.int8WriteIndex(poisoned, "embedding", "vec_id", dir)
    // correction batch: the true slice plus one brand-new vector (upsert)
    val extra = Seq((1000L,
      Array.tabulate(16)(d => math.sin(7.0 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val correction = df.where(col("vec_id") % 5 === 2).unionByName(extra)
    val before = graft.batch.SegmentedStore.committedSegs(dir).length
    Similarity.int8ReplaceInStored(spark, dir, correction, "embedding", "vec_id")
    assert(graft.batch.SegmentedStore.committedSegs(dir).length == before + 1,
      "replace must publish on exactly one commit")
    val full = df.unionByName(extra)
    val expect = Similarity.int8TopK(full, "embedding", "vec_id", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    def served() = Similarity.int8TopKStored(spark, dir, full, "embedding",
      "vec_id", q, 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(served() == expect, "replace != rebuild over the corrected corpus")
    assert(Similarity.readInt8Index(spark, dir).count() == 301L,
      "replace changed the live vector count")
    Similarity.int8CompactStored(spark, dir)
    assert(Similarity.readInt8Index(spark, dir).count() == 301L &&
      served() == expect, "compaction changed post-replace serving")
    graft.batch.BatchState.deleteDir(dir)

    // crash window: deletes dir + covers marker written at the next
    // ordinal id with NO commit; the next append reuses the id and its
    // pre-clear must drop the orphan instead of publishing it
    val dirC = java.nio.file.Files.createTempDirectory("graft_int8_orph").toString
    Similarity.int8WriteIndex(df, "embedding", "vec_id", dirC) // seg=1
    val orphanId = graft.batch.SegmentedStore.nextId(dirC)
    (0 until 300 by 3).map(_.toLong).toDF("vec_id").write.mode("overwrite")
      .parquet(s"$dirC/seg=$orphanId/deletes")
    graft.batch.SegmentedStore.writeDeleteCovers(dirC, orphanId, List(1L))
    Similarity.int8AppendToStored(spark, dirC, extra, "embedding", "vec_id")
    assert(Similarity.readInt8Index(spark, dirC).count() == 301L,
      "crashed takedown's orphan delete set resurrected")
    graft.batch.BatchState.deleteDir(dirC)
  }

  test("int8Dot approximates the true dot within the quantization error budget") {
    val pairs = vecs.where(col("vec_id") === 1L)
      .crossJoin(vecs.where(col("vec_id") === 2L)
        .select(col("embedding").as("emb2")))
    val r = pairs.select(
      VF.dot(col("embedding"), col("emb2")).as("true_dot"),
      VF.int8Dot(
        VF.int8Quantize(col("embedding")), VF.int8Scale(col("embedding")),
        VF.int8Quantize(col("emb2")), VF.int8Scale(col("emb2"))).as("approx"))
      .collect().head
    // per-element error <= (|a|·eb + |b|·ea + ea·eb), summed; generous 2%
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <=
      0.02 * math.max(1.0, math.abs(r.getDouble(0))),
      s"true ${r.getDouble(0)} vs approx ${r.getDouble(1)}")
  }
}
