package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Startup schema contract for ALL the driver's volume tables — the
  * generalization of the events.ts lesson (round 10: one silent physical-
  * layout change disabled 56% of the gate). Each table gets a canonical-
  * access probe: the columns the engine reads must exist, carry a type the
  * engine's readers tolerate, and actually derive for one row. A failed
  * probe is ONE IllegalStateException naming table, column, and observed
  * type — not dozens of per-query analysis errors.
  */
object TableContract {

  private def read(spark: SparkSession, dir: String, table: String): DataFrame =
    try spark.read.parquet(s"$dir/$table.parquet")
    catch {
      case e: Throwable => throw new IllegalStateException(
        s"schema contract: cannot read $dir/$table.parquet: ${e.getMessage}", e)
    }

  private def field(df: DataFrame, table: String, name: String): DataType =
    df.schema.fields.find(_.name == name).map(_.dataType).getOrElse(
      throw new IllegalStateException(
        s"schema contract: $table has no `$name` column " +
        s"(schema: ${df.schema.simpleString})"))

  private def requireIntegral(table: String, name: String, dt: DataType): Unit = dt match {
    case LongType | IntegerType | ShortType | ByteType => ()
    case other => throw new IllegalStateException(
      s"schema contract: $table.$name is ${other.simpleString}, expected an " +
      "integral id type (the typed encoders upcast int->long but nothing wider)")
  }

  /** documents: `doc_id` integral, `text` string, one row derives. */
  def probeDocuments(spark: SparkSession, dir: String): String = {
    val df = read(spark, dir, "documents")
    requireIntegral("documents", "doc_id", field(df, "documents", "doc_id"))
    field(df, "documents", "text") match {
      case StringType => ()
      case other => throw new IllegalStateException(
        s"schema contract: documents.text is ${other.simpleString}, expected string")
    }
    val row = df.select(col("doc_id").cast("long"), length(col("text"))).limit(1).collect()
    if (row.isEmpty) throw new IllegalStateException(
      "schema contract: documents is empty")
    "documents ok"
  }

  /** embeddings: `vec_id` integral, `embedding` an array of a numeric
    * element type the native vector kernels dispatch on — proven by
    * actually running a kernel (self-dot) on one row, so an element type
    * the kernels reject (decimal, string) fails HERE with the table name
    * rather than inside 20 ANN/dedup queries.
    */
  def probeEmbeddings(spark: SparkSession, dir: String): String = {
    val df = read(spark, dir, "embeddings")
    requireIntegral("embeddings", "vec_id", field(df, "embeddings", "vec_id"))
    val elem = field(df, "embeddings", "embedding") match {
      case ArrayType(e @ (FloatType | DoubleType | IntegerType | LongType), _) => e
      case other => throw new IllegalStateException(
        s"schema contract: embeddings.embedding is ${other.simpleString}, " +
        "expected array<float|double|int|long> (native kernel input types)")
    }
    val row =
      try df.select(graft.functions.VectorFunctions.dot(
          col("embedding"), col("embedding")).as("__d")).limit(1).collect()
      catch {
        case e: Throwable => throw new IllegalStateException(
          s"schema contract: embeddings.embedding (${elem.simpleString} elements) " +
          s"failed the native-kernel self-dot: ${e.getMessage}", e)
      }
    if (row.isEmpty || row.head.isNullAt(0)) throw new IllegalStateException(
      "schema contract: embeddings self-dot derived NULL/empty")
    s"embeddings ok(array<${elem.simpleString}>)"
  }

  /** events: the [[EventTime]] ts probe plus integral ids and a numeric
    * value column.
    */
  def probeEvents(spark: SparkSession, dir: String): String = {
    val ts = EventTime.contractProbe(spark, dir)
    val df = read(spark, dir, "events")
    requireIntegral("events", "event_id", field(df, "events", "event_id"))
    requireIntegral("events", "user_id", field(df, "events", "user_id"))
    field(df, "events", "value") match {
      case DoubleType | FloatType => ()
      case other => throw new IllegalStateException(
        s"schema contract: events.value is ${other.simpleString}, expected " +
        "double/float (the typed encoders upcast float->double but nothing wider)")
    }
    ts
  }

  /** All three volume tables; returns the combined one-line description
    * for the verify/bench stdout.
    */
  def probe(spark: SparkSession, dir: String): String =
    Seq(probeEvents(spark, dir), probeDocuments(spark, dir),
      probeEmbeddings(spark, dir)).mkString("; ")
}
