package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.algebra.Semigroup
import graft.api.GraftStream
import graft.batch.{BatchDriver, BatchStore}
import graft.client.ClientStore
import graft.streaming.StreamingSum
import graft.time.{BatchID, Batcher}

/** The reference's canonical example job (summingbird-example
  * ExampleJob.scala:43-50 — wordCount), run through the whole engine the
  * way the reference's README describes its lambda deployment:
  *
  *   1. write timed events into a batch-partitioned landing zone,
  *   2. run the INCREMENTAL batch plan twice via [[BatchDriver]] (the
  *      second run picks up only newly-landed batches),
  *   3. run the SAME logical pipeline as a streaming job over a
  *      MemoryStream through [[StreamingSum]],
  *   4. serve merged lambda reads with [[ClientStore]]: batch snapshot +
  *      streaming deltas, equal to a full recompute.
  *
  * Run: `sbt "runMain graft.examples.WordCountExample"`.
  */
object WordCountExample {

  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .appName("graft-wordcount")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val batcher = Batcher.ofMillis(1000) // 1s batches
    val sentences = Seq(
      100L  -> "the quick brown fox",
      900L  -> "the lazy dog",
      1500L -> "quick quick fox",
      2200L -> "the end",
      3100L -> "fox again")

    def tokenize(s: GraftStream[(Long, String)]) =
      s.flatMap(_._2.split("\\s+").iterator.filter(_.nonEmpty))
        .asKeyedWith(identity[String], (_: String) => 1L)

    // -- 1. land the events batch-partitioned ---------------------------
    val landing = Files.createTempDirectory("graft_ex_landing_").toString
    sentences.groupBy { case (ts, _) => batcher.batchOf(graft.time.Timestamp(ts)).id }
      .foreach { case (b, rows) =>
        rows.toDF("ts_ms", "line").write.parquet(s"$landing/batch_id=$b")
      }

    // -- 2. incremental batch runs --------------------------------------
    val storeDir = Files.createTempDirectory("graft_ex_store_").toString
    val store = new BatchStore[String, Long](storeDir)
    def plan(df: org.apache.spark.sql.DataFrame) =
      tokenize(GraftStream.from(
        df.select("ts_ms", "line").as[(Long, String)])(_._1))
        .sumDeltasPerBatch(batcher)(Semigroup.longSemigroup)
    // batch layer deliberately lags (through batch 1): the streaming layer
    // serves the tail, the ClientStore guard keeps them disjoint
    val r1 = BatchDriver.runIncremental(spark, landing, store, BatchID(0))(plan)
    println(s"batch run 1: $r1")
    val r2 = BatchDriver.runIncremental(spark, landing, store, BatchID(1))(plan)
    println(s"batch run 2: $r2 (only the new batch)")
    println("snapshot: " + store.readLast(spark).get._2.collect().sortBy(_._1).toSeq)

    // -- 3. the same pipeline, streaming --------------------------------
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val streamed = StreamingSum.sumByKey[String, Long](
      tokenize(new GraftStream(ms.toDS().map(r => (r._1, r)))).ds, batcher)(
      Semigroup.longSemigroup, implicitly, implicitly)
      .map { case (k, b, (_, d)) => (k, b, d) }
    val q = streamed.writeStream.format("memory").queryName("wc_stream")
      .outputMode("append").start()
    ms.addData(sentences: _*); q.processAllAvailable(); q.stop()
    val onlineDeltas = spark.table("wc_stream").as[(String, Long, Long)]

    // -- 4. lambda serving read -----------------------------------------
    val served = ClientStore.merged(spark, store, onlineDeltas)(
      Semigroup.longSemigroup, implicitly, implicitly)
      .collect().sortBy(_._1).toSeq
    println(s"served (snapshot ++ online): $served")
    val recomputed = tokenize(GraftStream.from(sentences.toDS())(_._1))
      .sumByKeyAllTime(Semigroup.longSemigroup, implicitly)
      .collect().sortBy(_._1).toSeq
    require(served == recomputed, s"lambda read mismatch: $served vs $recomputed")
    println("lambda read == full recompute ✓")
    spark.stop()
  }
}
