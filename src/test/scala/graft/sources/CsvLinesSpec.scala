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

  test("round-trip is exact, including delimiters, quotes, newlines, " +
      "empty string, and null") {
    val docs = Seq(
      (1L, "plain words"),
      (2L, "comma, inside"),
      (3L, "a \"quoted\" phrase"),
      (4L, "unicode é中文"),
      (5L, "trailing space "),
      (6L, "two\nlines"),       // RFC-4180 quoted newline
      (7L, ""),                 // empty document ≠ null
      (8L, null)                // null ≠ empty document
    ).toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("csv_rt").toString
    CsvLines.write(docs, tmp, codec = Some("gzip"))
    val back = CsvLines.read(spark, tmp, schema)
    assert(back.except(docs).isEmpty && docs.except(back).isEmpty)
    // pin the empty/null distinction explicitly, not just via except()
    val m = back.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(m(7L).contains(""), s"empty string came back as ${m(7L)}")
    assert(m(8L).isEmpty, s"null came back as ${m(8L)}")
    assert(m(6L).contains("two\nlines"))
  }

  test("escaped variant: newline-bearing values round-trip EXACTLY through " +
      "the tolerant path; corrupt lines still quarantine verbatim") {
    val docs = Seq(
      (1L, "good"),
      (2L, "has\nnewline"),
      (3L, "literal %0A percent-escape"), // must survive double-encoding
      (4L, "cr\rlf\n mix %"),
      (5L, null.asInstanceOf[String]),
      (6L, ""),
      (7L, "\\N"),              // literal null-sentinel VALUE: the escaped
                                // path must keep it distinct from null
      (8L, "back\\slash %5C")).toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("csv_esc").toString
    CsvLines.writeEscaped(docs, tmp)
    // every record is ONE physical line — the structural guarantee that
    // makes a line-based quarantine scan safe for this corpus
    val nLines = spark.read.text(tmp).count()
    assert(nLines == 8L, s"expected 8 physical lines, got $nLines")
    val (good, bad) = CsvLines.readEscapedWithQuarantine(spark, tmp, schema)
    assert(bad.count() == 0)
    assert(good.except(docs).isEmpty && docs.except(good).isEmpty)
    // a corrupt line injected among the escaped parts still quarantines
    Files.writeString(Paths.get(s"$tmp/part-zz-corrupt.csv"),
      "not-a-long,oops\n")
    val (g2, b2) = CsvLines.readEscapedWithQuarantine(spark, tmp, schema)
    assert(g2.count() == 8L)
    assert(b2.collect().map(_.getString(0)).toSeq == Seq("not-a-long,oops"))
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
