package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CSV ingestion contract — the [[JsonLinesSpec]] laws for the delimited
  * form: quoted/delimiter-laden values round-trip, corrupt lines are
  * fatal in strict mode and quarantined verbatim in tolerant mode.
  */
class CsvLinesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  test("round-trip is exact, including delimiters and quotes in values") {
    val docs = Seq(
      (1L, "plain words"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" phrase"),
      (4L, "unicode é中文"),
      (5L, "trailing space ")).toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("csv_rt").toString
    CsvLines.write(docs, tmp, codec = Some("gzip"))
    val back = CsvLines.read(spark, tmp, schema)
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
  }

  test("strict read fails loudly on a malformed line") {
    val tmp = Files.createTempDirectory("csv_bad").toString
    Files.writeString(Paths.get(s"$tmp/part-00000.csv"),
      """1,good
        |not-a-long,still here
        |2,also good
        |""".stripMargin)
    val e = intercept[Exception] {
      CsvLines.read(spark, tmp, schema).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(m =>
      m.contains("FAILFAST") || m.toUpperCase.contains("MALFORMED"))), e.toString)
  }

  test("tolerant read quarantines malformed lines verbatim, good rows intact") {
    val tmp = Files.createTempDirectory("csv_quar").toString
    Files.writeString(Paths.get(s"$tmp/part-00000.csv"),
      """1,good
        |not-a-long,bad id
        |2,also good
        |""".stripMargin)
    val (good, bad) = CsvLines.readWithQuarantine(spark, tmp, schema)
    assert(good.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == Seq((1L, "good"), (2L, "also good")))
    assert(bad.collect().map(_.getString(0)).toSet == Set("not-a-long,bad id"))
  }
}
