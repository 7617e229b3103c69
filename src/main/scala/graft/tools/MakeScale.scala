package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Materialize an N-x scale-up of an sf directory into scratch parquet —
  * the sf1-equivalent input for headline bench runs (the driver generates
  * sf0.001/0.01/0.1 only). The three volume tables (events, documents,
  * embeddings) self-union N times with ids shifted into disjoint ranges
  * (same scheme as ScaleProbe); dimension tables copy through unchanged.
  *
  * HONEST CAVEAT, recorded with every number derived from this output:
  * a self-union is a pessimistic stand-in for a genuinely larger sf — every
  * document/vector becomes an N-way near-duplicate, so dedup/similarity
  * operators do STRICTLY MORE pair work than on organically larger data,
  * while key cardinalities (users, days) scale like the shifted-id
  * scheme, not like organic growth.
  *
  * Usage: runMain graft.tools.MakeScale <sfDir> <outDir> <factor>
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shift = 1000000L
    def scaled(name: String, idCols: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      // the shifted copies' id ranges must be disjoint, or uniqueness (and
      // every count/dedup oracle derived from this output) silently breaks
      // — e.g. running MakeScale on its own output would collide
      idCols.foreach { c =>
        val mx = df.agg(max(col(c))).collect().head.getLong(0)
        require(mx < shift,
          s"$name.$c max id $mx >= shift $shift — input ids would collide across " +
          "the shifted copies (is this already a MakeScale output?)")
      }
      (0 until factor).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * shift)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"MAKESCALE $name x$factor done")
    }
    // event_id stays unique; user_id shifts so distinct keys scale too
    scaled("events", Seq("event_id", "user_id"))
    scaled("documents", Seq("doc_id"))
    scaled("embeddings", Seq("vec_id"))
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"MAKESCALE $t copied")
    }
    spark.stop()
  }
}
