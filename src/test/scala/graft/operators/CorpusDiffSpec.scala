package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CorpusDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("diff classifies added/removed/changed/same; null texts compare null-safely") {
    val s = spark; import s.implicits._
    val old = Seq(
      (1L, "unchanged"), (2L, "will change"), (3L, "will be removed"),
      (5L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val neu = Seq(
      (1L, "unchanged"), (2L, "changed!"), (4L, "brand new"),
      (5L, null.asInstanceOf[String]), (6L, "was null"))
      .toDF("doc_id", "text")
    val got = CorpusDiff.diff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "same", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "same", 6L -> "changed"))
    val counts = CorpusDiff.diffCounts(old, neu, "doc_id", "text")
      .collect().head
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2),
      counts.getLong(3)) == ((1L, 1L, 2L, 2L)))
  }

  test("identical snapshots: everything same; empty old: everything added") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(CorpusDiff.diff(docs, docs, "doc_id", "text")
      .collect().forall(_.getString(1) == "same"))
    assert(CorpusDiff.diff(docs.limit(0), docs, "doc_id", "text")
      .collect().forall(_.getString(1) == "added"))
  }
}
