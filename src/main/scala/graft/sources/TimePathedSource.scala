package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.time.BatchID

/** Availability planning for batch-partitioned sources — the rebuild of the
  * reference's `TimePathedSource.satisfiableHdfs` + `minify` (summingbird-
  * scalding/.../source/TimePathedSource.scala:25-104) and the planner's
  * interval shrink (ScaldingPlatform.scala:106-153): list what actually
  * exists on storage, intersect with the requested batch range, and plan
  * only the maximal satisfiable PREFIX — a missing middle partition
  * truncates the plan instead of producing silent holes (the later batches
  * are picked up by the next run, exactly like the reference's state
  * machine).
  *
  * This is driver-side planning on directory listings (Catalyst cannot do
  * it: it prunes partitions of paths it is GIVEN; deciding which paths are
  * safe to process is availability logic). Uses the Hadoop FileSystem API,
  * so it works identically on local disk, HDFS and object stores.
  */
object TimePathedSource {

  /** Batch ids with a `batch_id=N` directory under `path`, ascending. */
  def availableBatches(spark: SparkSession, path: String): Seq[BatchID] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("batch_id=") => s.stripPrefix("batch_id=") }
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .sorted.map(BatchID(_))
  }

  /** Shrink the requested inclusive range to the maximal available prefix;
    * None when even the first requested batch is missing (reference
    * semantics: a plan that cannot start must not run).
    */
  def satisfiable(spark: SparkSession, path: String,
      requested: (BatchID, BatchID)): Option[(BatchID, BatchID)] = {
    val (lo, hi) = requested
    require(lo <= hi, s"bad range $requested")
    val avail = availableBatches(spark, path).map(_.id).toSet
    if (!avail.contains(lo.id)) None
    else Some((lo, BatchID((lo.id to hi.id).takeWhile(avail.contains).last)))
  }

  /** Read the satisfiable prefix of the requested range — ONLY existing
    * partition dirs are handed to the reader (so no list-then-fail races on
    * late batches), and `basePath` keeps `batch_id` as a partition column.
    * Returns the actually-planned range alongside the data.
    */
  def read(spark: SparkSession, path: String,
      requested: (BatchID, BatchID)): Option[((BatchID, BatchID), DataFrame)] =
    satisfiable(spark, path, requested).map { case (lo, hi) =>
      val dirs = (lo.id to hi.id).map(b => s"$path/batch_id=$b")
      ((lo, hi), spark.read.option("basePath", path).parquet(dirs: _*))
    }
}
