package graft.time

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Batcher/interval algebra laws — mirrors the reference's BatcherLaws
  * (summingbird-batch/src/test): batchOf/earliestTimeOf adjunction, cover /
  * batchesCoveredBy, Combined monotonicity.
  */
class BatcherSpec extends AnyFunSuite {
  private val rnd = new Random(42)
  private val batchers = Seq(
    "1s" -> Batcher.ofMillis(1000),
    "1m" -> Batcher.ofMinutes(1),
    "1h" -> Batcher.ofHours(1),
    "1d" -> Batcher.ofDays(1),
    "7ms" -> Batcher.ofMillis(7))

  test("batchOf(earliestTimeOf(b)) == b and time is inside its batch interval") {
    for ((name, b) <- batchers; _ <- 1 to 300) {
      val t = Timestamp(rnd.nextLong(4102444800000L) - 1000000000L) // incl pre-epoch
      val id = b.batchOf(t)
      assert(b.batchOf(b.earliestTimeOf(id)) == id, name)
      val iv = b.toInterval(id)
      assert(iv.contains(t.millis), s"$name: $t not in $iv")
    }
  }

  test("batch intervals tile: latestTimeOf(b) == earliestTimeOf(b.next)") {
    for ((name, b) <- batchers; _ <- 1 to 100) {
      val id = BatchID(rnd.nextLong(100000) - 50000)
      assert(b.latestTimeOf(id) == b.earliestTimeOf(id.next), name)
    }
  }

  test("cover returns smallest overlapping range; batchesCoveredBy only full batches") {
    val b = Batcher.ofMillis(100)
    // interval exactly [200, 500): batches 2,3,4 fully covered
    assert(b.cover(Interval(200, 500)) == ((BatchID(2), BatchID(4))))
    assert(b.batchesCoveredBy(Interval(200, 500)) == Some((BatchID(2), BatchID(4))))
    // ragged edges [250, 450): covers 2..4 but only 3 fully
    assert(b.cover(Interval(250, 450)) == ((BatchID(2), BatchID(4))))
    assert(b.batchesCoveredBy(Interval(250, 450)) == Some((BatchID(3), BatchID(3))))
    // too small for any full batch
    assert(b.batchesCoveredBy(Interval(250, 310)) == None)
  }

  test("unit batcher: everything in batch 0") {
    val b = Batcher.unit
    assert(b.batchOf(Timestamp(Long.MinValue + 1)) == BatchID(0))
    assert(b.batchOf(Timestamp(0)) == BatchID(0))
    assert(b.batchOf(Timestamp(Long.MaxValue)) == BatchID(0))
  }

  test("combined batcher: monotone batch ids across the switch") {
    val cut = Timestamp(86400000L * 10) // day 10
    val c = Batcher.Combined(Batcher.ofDays(1), Batcher.ofHours(1), cut)
    var prev = c.batchOf(Timestamp(0))
    for (t <- 0L until (86400000L * 12) by 3600000L) {
      val cur = c.batchOf(Timestamp(t))
      assert(cur >= prev, s"non-monotone at $t: $cur < $prev")
      prev = cur
    }
    // before the cut: daily ids
    assert(c.batchOf(Timestamp(86400000L * 3 + 5)) == BatchID(3))
    // at the cut: first post-switch batch
    assert(c.batchOf(cut) == c.batchOf(Timestamp(86400000L * 9)).next)
  }

  test("batchIdColumn agrees with batchOf inside Spark (incl. pre-epoch)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val ts = Seq(-100000L, -1L, 0L, 1L, 999L, 1000L, 86399999L, 86400000L,
      1704067200000L) ++ Seq.fill(50)(rnd.nextLong(4102444800000L) - 1000000000L)
    for ((name, b) <- batchers :+ ("unit" -> Batcher.unit)) {
      val df = ts.toDF("ts_ms")
      val got = df.select(org.apache.spark.sql.functions.col("ts_ms"),
        b.batchIdColumn(org.apache.spark.sql.functions.col("ts_ms")).as("bid"))
        .as[(Long, Long)].collect().toMap
      for (t <- ts)
        assert(got(t) == b.batchOf(Timestamp(t)).id, s"$name at t=$t")
    }
  }

  test("interval algebra: intersect/union/contains") {
    val a = Interval(0, 100); val b = Interval(50, 150)
    assert(a.intersect(b) == Interval(50, 100))
    assert(a.union(b) == Some(Interval(0, 150)))
    assert(Interval(0, 10).union(Interval(20, 30)) == None)
    assert(a.contains(0) && !a.contains(100))
    assert(Interval(5, 5).isEmpty)
  }
}
