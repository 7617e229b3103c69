package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds and
  * per-query pass/fail status. A failing query keeps its (wasted) time,
  * is reported in "failed", and makes the process exit non-zero — a broken
  * query can never masquerade as a fast success.
  *
  * SPARK_GRAFT_BENCH_REPS=N (default 2) runs every query N times and adds
  * "queries_min" / "total_min" — per-query minimums across SUCCESSFUL reps
  * — next to the first-run "queries" / "value" numbers. The minimum is the
  * stall-resistant signal on a shared host (a co-tenant page-cache or CPU
  * stall inflates one rep, not all of them — the documented multi-minute
  * stall windows made single-run r7 totals swing 3x); first-run numbers
  * stay for continuity with earlier rounds. Default is 2 so the official
  * unattended run carries the stall-resistant signal, at roughly double
  * the wall-clock (~3 min at sf0.1); set 1 to restore single-shot.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JIT/codegen/parquet/shuffle/HOF codepaths so the first timed
    // query isn't billed for one-time JVM costs
    try {
      import org.apache.spark.sql.functions._
      spark.range(100000).selectExpr("sum(id)").collect()
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.join(n.select(col("n_nationkey"), col("n_name").as("n2")), Seq("n_nationkey"))
        .withColumn("h", aggregate(sequence(lit(1L), lit(8L)), lit(0L),
          (a, x) => least(a, xxhash64(x))))
        .groupBy(col("n_name")).agg(count(lit(1)), min(col("h")))
        .count()
      n.select(col("n_nationkey")).distinct().count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup skipped: $e")
    }
    // SPARK_GRAFT_ONLY=q_a,q_b runs a subset (local iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(2).max(1)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e"); false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // queries that persist intermediates must not leak cache across the
        // run — teardown happens OUTSIDE the query's timed window
        spark.catalog.clearCache()
        (elapsed, ok)
      }
      // the minimum counts SUCCESSFUL reps only: a fast-failing rep (e.g.
      // transient executor loss) must not shrink the "honest minimum"
      val okTimes = times.collect { case (t, true) => t }
      val minOk = if (okTimes.nonEmpty) okTimes.min else times.map(_._1).min
      name -> (times.head._1, minOk, times.forall(_._2))
    }
    val qs = results.map { case (k, (v, _, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, (_, v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, _, false)) => "\"" + k + "\"" }
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val totalMin = if (results.nonEmpty) results.values.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"total_min":$totalMin,"queries":$qs,"queries_min":$qsMin,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
