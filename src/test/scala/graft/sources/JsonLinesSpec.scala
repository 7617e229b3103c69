package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** JSON-lines ingestion contract: schema-supplied round-trips are exact
  * (including JSON-escaped content), corrupt lines are fatal in strict
  * mode and quarantined verbatim in tolerant mode — never silently
  * nulled into the corpus.
  */
class JsonLinesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  test("round-trip is exact, including escapes and unicode") {
    val docs = Seq(
      (1L, "plain words"),
      (2L, "quotes \" and \\ backslash"),
      (3L, "newline\nand\ttab"),
      (4L, "unicode é中文"),
      (5L, "")).toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("jsonl_rt").toString
    JsonLines.write(docs, tmp, codec = Some("gzip"))
    val back = JsonLines.read(spark, tmp, schema)
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }

  test("strict read fails loudly on a corrupt line") {
    val tmp = Files.createTempDirectory("jsonl_bad").toString
    Files.writeString(Paths.get(s"$tmp/part-00000.json"),
      """{"doc_id": 1, "text": "good"}
        |this is not json at all
        |{"doc_id": 2, "text": "also good"}
        |""".stripMargin)
    val e = intercept[Exception] {
      JsonLines.read(spark, tmp, schema).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(m =>
        m.contains("FAILFAST") || m.contains("Malformed") ||
        m.contains("MALFORMED"))), e.toString)
  }

  test("tolerant read quarantines the corrupt lines verbatim, good rows intact") {
    val tmp = Files.createTempDirectory("jsonl_quar").toString
    Files.writeString(Paths.get(s"$tmp/part-00000.json"),
      """{"doc_id": 1, "text": "good"}
        |this is not json at all
        |{"doc_id": 2, "text": "also good"}
        |[1, 2, 3]
        |""".stripMargin)
    val (good, bad) = JsonLines.readWithQuarantine(spark, tmp, schema)
    assert(good.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == Seq((1L, "good"), (2L, "also good")))
    val badLines = bad.collect().map(_.getString(0)).toSet
    assert(badLines.contains("this is not json at all"), badLines)
    // a JSON array is not an object row; it must not become a null row
    assert(badLines.exists(_.startsWith("[1")), badLines)
    assert(good.schema.fieldNames.toSeq == Seq("doc_id", "text"))
  }

  test("a schema naming _corrupt_record is rejected") {
    intercept[IllegalArgumentException] {
      JsonLines.readWithQuarantine(spark, "/nonexistent",
        schema.add("_corrupt_record", StringType))
    }
  }
}
