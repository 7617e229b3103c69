package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** The generalized round-10 lesson: every volume table the gate reads gets
  * a startup canonical-access probe, and each way a regenerated table can
  * silently change representation must fail with ONE message naming the
  * table and column — never as a fan of per-query analysis errors.
  */
class TableContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("graft_contract_").toString

  test("the real driver testdata satisfies the full contract") {
    val desc = TableContract.probe(spark, "/root/testdata/sf0.001")
    assert(desc.contains("events.ts="), desc)
    assert(desc.contains("documents ok"), desc)
    assert(desc.contains("embeddings ok"), desc)
  }

  test("documents: missing text column and non-string text each fail loudly") {
    val s = spark; import s.implicits._
    val dirNoText = scratch()
    Seq((1L, "en")).toDF("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$dirNoText/documents.parquet")
    val eMissing = intercept[IllegalStateException] {
      TableContract.probeDocuments(spark, dirNoText)
    }
    assert(eMissing.getMessage.contains("documents") &&
      eMissing.getMessage.contains("`text`"), eMissing.getMessage)

    val dirBinText = scratch()
    Seq((1L, Array[Byte](1, 2))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirBinText/documents.parquet")
    val eType = intercept[IllegalStateException] {
      TableContract.probeDocuments(spark, dirBinText)
    }
    assert(eType.getMessage.contains("documents.text"), eType.getMessage)
  }

  test("documents: int32 doc_id is within contract (encoder upcast)") {
    val s = spark; import s.implicits._
    val dir = scratch()
    Seq((1, "hello")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(TableContract.probeDocuments(spark, dir) == "documents ok")
  }

  test("embeddings: a non-numeric element type fails at the probe, naming the table") {
    val s = spark; import s.implicits._
    val dir = scratch()
    Seq((1L, Seq("0.1", "0.2"))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException] {
      TableContract.probeEmbeddings(spark, dir)
    }
    assert(e.getMessage.contains("embeddings.embedding"), e.getMessage)
  }

  test("embeddings: double elements (a plausible regeneration drift) stay within contract") {
    val s = spark; import s.implicits._
    val dir = scratch()
    Seq((1L, Seq(0.6, 0.8))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val desc = TableContract.probeEmbeddings(spark, dir)
    assert(desc.contains("array<double>"), desc)
  }

  test("events: a decimal value column fails loudly (beyond encoder upcast range)") {
    val s = spark; import s.implicits._
    val dir = scratch()
    Seq((1L, 1700000000123456L, 2L, "click", BigDecimal(1.5), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] {
      TableContract.probeEvents(spark, dir)
    }
    assert(e.getMessage.contains("events.value"), e.getMessage)
  }
}
