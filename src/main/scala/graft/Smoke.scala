package graft
import org.apache.spark.sql.SparkSession
/** Local smoke runner mirroring the driver's t1 check: entry() rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"SMOKE rows=${df.count()}")
    df.orderBy(org.apache.spark.sql.functions.desc("cnt")).show(5)
    spark.stop()
  }
}
