package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Batch service laws: the windowed service expires state, the unique-keyed
  * service equals a plain lookup, the empty service always misses.
  */
class BatchServicesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("windowed service: in-window visible, expired null, strict tie-break") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 100L, 150L), (2L, 100L, 400L), (3L, 200L, 120L), (4L, 300L, 50L))
      .toDF("id", "k", "t")
    val right = Seq((100L, 100L, "a"), (100L, 380L, "b"), (200L, 115L, "c"))
      .toDF("k", "rt", "v")
    val out = BatchServices.windowed(left, right, Seq("k"), "t", "rt", Seq("v"),
        window = 100L)
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    // id=1: as-of match (k=100, rt=100) at t=150, age 50 <= 100 -> visible
    // id=2: as-of match rt=380 at t=400, age 20 -> visible ("b", not "a")
    // id=3: match rt=115 at t=120 -> visible
    // id=4: no match at all -> null
    assert(out == Map(1L -> Some("a"), 2L -> Some("b"), 3L -> Some("c"), 4L -> None))

    // shrink the window: id=1's match (age 50) expires with window 40
    val tight = BatchServices.windowed(left, right, Seq("k"), "t", "rt", Seq("v"),
        window = 40L)
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(tight(1L).isEmpty && tight(2L) == Some("b"))

    // strict: a write at exactly t is NOT visible (lookups before writes)
    val eq = BatchServices.windowed(
        Seq((9L, 100L, 100L)).toDF("id", "k", "t"), right,
        Seq("k"), "t", "rt", Seq("v"), window = 1000L, strict = true)
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(eq(9L).isEmpty)
  }

  test("uniqueKeyed == plain left equi-join; empty always misses") {
    val s = spark; import s.implicits._
    val left = Seq((1L, 10L), (2L, 20L), (3L, 99L)).toDF("id", "k")
    val dim = Seq((10L, "x"), (20L, "y")).toDF("k", "name")
    val out = BatchServices.uniqueKeyed(left, dim, Seq("k"))
      .select("id", "name").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("x"), 2L -> Some("y"), 3L -> None))

    val e = BatchServices.empty(left, Seq("name" -> "string", "score" -> "double"))
    assert(e.columns.toSeq == Seq("id", "k", "name", "score"))
    assert(e.where(col("name").isNotNull || col("score").isNotNull).count() == 0)
  }
}
