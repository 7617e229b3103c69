package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Growth-shape probe for the heavy operators (the SURVEY "scale
  * evidence" methodology): self-union the sf inputs `factor`x with
  * shifted ids, write to scratch parquet, then time each operator warm
  * (second run) at 1x and at `factor`x. An operator whose cost tracks
  * data volume linearly (or better) at 4x is presumed shuffle-shaped
  * correctly for the 100 TB target; super-linear growth flags an
  * accidental pair blowup.
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> <factor> [op,...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(4)
    val opsArg = args.lift(2).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{SketchAggregates => SK}

    val scratch = java.nio.file.Files.createTempDirectory("graft_probe_").toString
    def selfUnion(df: DataFrame, idCol: String, n: Int): DataFrame =
      (0 until n).map(i => df.withColumn(idCol, col(idCol) + lit(i * 1000000L)))
        .reduce(_ unionByName _)
    def prep(name: String, df: DataFrame): String = {
      val p = s"$scratch/$name"
      df.write.mode("overwrite").parquet(p)
      p
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"), col("user_id"), col("value"))
    val docs1 = prep("docs1", docs)
    val docsN = prep(s"docs$factor", selfUnion(docs, "doc_id", factor))
    val ev1 = prep("ev1", events)
    val evN = prep(s"ev$factor", selfUnion(events, "user_id", factor))
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val emb1 = prep("emb1", embs)
    val embN = prep(s"emb$factor", selfUnion(embs, "vec_id", factor))

    def time(f: => Long): Double = {
      f // warm
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // every action folds the OUTPUT columns into a checksum, so column
    // pruning can't skip the work a bare count() would let Catalyst drop
    val ops: Map[String, String => Long] = Map(
      "exact_substr" -> (p =>
        Dedup.removeDuplicatedSpans(spark.read.parquet(p), "text", "doc_id", k = 8)
          .agg(sum(length(col("text_clean"))), sum(col("n_removed")))
          .collect().head.getLong(1)),
      "dedup_cc" -> (p =>
        Dedup.minhashLshTransitive(spark.read.parquet(p), "text", "doc_id",
          w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
          .agg(sum(length(col("text")))).collect().head.getLong(0)),
      // round-8: same transitive dedup via min-label propagation, for the
      // star-vs-min-label cost comparison on shallow LSH graphs
      "cc_minlabel" -> (p =>
        Dedup.minhashLshTransitive(spark.read.parquet(p), "text", "doc_id",
          w = 3, bands = 16, rowsPerBand = 4, threshold = 0.5,
          starContraction = false)
          .agg(sum(length(col("text")))).collect().head.getLong(0)),
      // round-8: REAL ImageIO encode+decode through the mapPartitions
      // batch path (one planted PNG per doc, geometry id-derived)
      "image_decode" -> { p =>
        import spark.implicits._
        import graft.functions.Multimodal
        val media = spark.read.parquet(p)
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .map { case (id, _) =>
            Multimodal.MediaRow(id, Multimodal.MediaMeta("image/png", 0, 0, 1, 0),
              Multimodal.encodeGrayPng(16 + (id % 16).toInt,
                16 + (id % 8).toInt, (id % 251).toInt))
          }
        Multimodal.featurizeImages(media)
          .agg(sum(col("width").cast("long") * col("height")))
          .collect().head.getLong(0)
      },
      "bloom_incr" -> { p =>
        val d = spark.read.parquet(p)
        Dedup.exactAgainstBloom(d.where(col("doc_id") % 5 === 0),
          d.where(col("doc_id") % 5 =!= 0), "text", "doc_id",
          numBits = 1 << 22, k = 5)
          .agg(sum(length(col("text")))).collect().head.getLong(0)
      },
      "heavy_hitters" -> (p =>
        spark.read.parquet(p).groupBy(col("event_type"))
          .agg(SK.spaceSaver(col("user_id"), 8192).as("hh"))
          .agg(sum(size(col("hh")))).collect().head.getLong(0)),
      "ann_pq" -> { p =>
        val e = spark.read.parquet(p)
        graft.operators.Similarity.pqTopK(e, "embedding", "vec_id",
          Array.tabulate(64)(i => math.sin(i + 1.0)), k = 10, dim = 64)
          .agg(sum(col("pq_sim"))).collect().head.getDouble(0).toLong
      },
      "ann_ivfpq" -> { p =>
        val e = spark.read.parquet(p)
        graft.operators.Similarity.ivfPqTopK(e, "embedding", "vec_id",
          Array.tabulate(64)(i => math.sin(i + 1.0)), k = 10, dim = 64)
          .agg(sum(col("ivfpq_score"))).collect().head.getDouble(0).toLong
      },
      "span_incr" -> { p =>
        val d = spark.read.parquet(p)
        Dedup.removeDuplicatedSpansAgainst(d.where(col("doc_id") % 5 === 0),
          Dedup.spanHashes(d.where(col("doc_id") % 5 =!= 0), "text", k = 8),
          "text", "doc_id", k = 8)
          .agg(sum(col("n_removed"))).collect().head.getLong(0)
      },
      "moments_bloom_quantile" -> { p =>
        val ev = spark.read.parquet(p)
        ev.groupBy(col("event_type")).agg(SK.bloomFilter(col("user_id")).as("b"))
          .agg(sum(length(col("b")))).collect().head.getLong(0)
        ev.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"), avg(col("value")), var_pop(col("value")))
          .agg(sum(col("n"))).collect().head.getLong(0)
      }
    )
    val selected = ops.filter { case (n, _) => opsArg.forall(_.contains(n)) }
    selected.toSeq.sortBy(_._1).foreach { case (name, f) =>
      val (d1, dp) = (name match {
        case "heavy_hitters" | "moments_bloom_quantile" => (ev1, evN)
        case "ann_pq" | "ann_ivfpq" => (emb1, embN)
        case _ => (docs1, docsN)
      })
      val t1 = time(f(d1))
      val tN = time(f(dp))
      spark.catalog.clearCache()
      println(f"PROBE $name%-24s 1x=${t1}%.2fs ${factor}x=${tN}%.2fs ratio=${tN / t1}%.2f")
    }
    spark.stop()
  }
}
