package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // commit-log flips in store-mutating gate rows go through the real
    // CAS backend by default (round 17; opt-out -Dgraft.cas.default=off)
    batch.StoreFs.ensureDefaultCasBackend()
    // schema contract FIRST: if the driver's tables changed representation
    // underneath us, the headline diagnostic is ONE loud message naming the
    // observed type — not N opaque per-query errors (the round-10 failure
    // mode). Non-fatal: the queries that don't touch events still run.
    try System.err.println(
      s"[verify] schema contract ok: ${sources.TableContract.probe(spark, sfDir)}")
    catch { case e: IllegalStateException =>
      System.err.println(s"[verify] SCHEMA CONTRACT BROKEN: ${e.getMessage}")
    }
    new java.io.File(outDir).mkdirs()
    // optional local-iteration subset (unset => all, the driver's mode)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // observability: every job counter the queries incremented, for
    // cross-round diffing (at-least-once totals — diagnostics, not billing)
    val counters = api.Counters.snapshot(spark)
      .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/counters.json"), counters)
    spark.stop()
  }
}
