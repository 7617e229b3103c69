package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Chunking laws: window math (counts, sizes, starts), overlap sharing,
  * lossless reconstruction, and the degenerate shapes (empty doc, short
  * doc, invalid parameters).
  */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docOf(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("window math: counts, starts, last-window shortening") {
    // chunkSize 5, overlap 2 -> stride 3; n=11 -> chunks at 0,3,6,9
    val df = Seq((1L, docOf(11))).toDF("doc_id", "text")
    val got = Chunking.chunk(df, "text", "doc_id", chunkSize = 5, overlap = 2)
      .orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.length == 3, got.mkString("; "))
    assert(got(0) == ((0, 5, "w1 w2 w3 w4 w5")))
    assert(got(1) == ((1, 5, "w4 w5 w6 w7 w8")))
    assert(got(2) == ((2, 5, "w7 w8 w9 w10 w11")))
    // n=12 -> a fourth, shorter window picks up the tail
    val got12 = Chunking.chunk(Seq((1L, docOf(12))).toDF("doc_id", "text"),
      "text", "doc_id", 5, 2).orderBy("chunk_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got12.length == 4 && got12(3) == ((3, 3, "w10 w11 w12")))
  }

  test("adjacent chunks share exactly `overlap` tokens; reconstruction is lossless") {
    val df = Seq((1L, docOf(37)), (2L, docOf(8)), (3L, "")).toDF("doc_id", "text")
    val chunks = Chunking.chunk(df, "text", "doc_id", chunkSize = 8, overlap = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3).split(" ").toSeq))
      .groupBy(_._1)
    assert(!chunks.contains(3L), "empty doc must yield no chunks")
    assert(chunks(2L).length == 1 && chunks(2L).head._3 == docOf(8).split(" ").toSeq)
    val ordered = chunks(1L).sortBy(_._2).map(_._3)
    ordered.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a.takeRight(3) == b.take(3),
        s"overlap mismatch: ${a.takeRight(3)} vs ${b.take(3)}")
      case _ =>
    }
    val rebuilt = ordered.head ++ ordered.tail.flatMap(_.drop(3))
    assert(rebuilt == docOf(37).split(" ").toSeq, "reconstruction lost tokens")
  }

  test("invalid parameters are rejected") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunk(df, "text", "doc_id", chunkSize = 0, overlap = 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunk(df, "text", "doc_id", chunkSize = 4, overlap = 4)
    }
  }
}
