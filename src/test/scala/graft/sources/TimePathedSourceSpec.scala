package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.time.BatchID

/** Availability-planning laws (reference TimePathedSourceTest semantics):
  * only existing partitions are planned, a gap truncates the range, and a
  * missing first batch refuses to plan.
  */
class TimePathedSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mkStore(batches: Seq[Long]): String = {
    val s = spark; import s.implicits._
    val root = Files.createTempDirectory("graft_tps_").toString
    batches.foreach { b =>
      Seq((b, s"row-$b")).toDF("batch", "payload")
        .write.parquet(s"$root/batch_id=$b")
    }
    root
  }

  test("listing, prefix shrink across a gap, refusal on missing start") {
    val root = mkStore(Seq(3L, 4L, 5L, 7L))
    assert(TimePathedSource.availableBatches(spark, root).map(_.id) == Seq(3L, 4L, 5L, 7L))
    // gap at 6 truncates
    assert(TimePathedSource.satisfiable(spark, root, (BatchID(3), BatchID(8)))
      .contains((BatchID(3), BatchID(5))))
    // fully available sub-range passes through
    assert(TimePathedSource.satisfiable(spark, root, (BatchID(4), BatchID(5)))
      .contains((BatchID(4), BatchID(5))))
    // resuming after the gap works
    assert(TimePathedSource.satisfiable(spark, root, (BatchID(7), BatchID(9)))
      .contains((BatchID(7), BatchID(7))))
    // missing first batch -> no plan
    assert(TimePathedSource.satisfiable(spark, root, (BatchID(6), BatchID(7))).isEmpty)
    assert(TimePathedSource.satisfiable(spark, root, (BatchID(0), BatchID(2))).isEmpty)
    // empty / missing dir
    assert(TimePathedSource.availableBatches(spark, root + "/nope").isEmpty)
  }

  test("read pulls only the satisfiable prefix and keeps batch_id") {
    val s = spark; import s.implicits._
    val root = mkStore(Seq(1L, 2L, 4L))
    val Some(((lo, hi), df)) = TimePathedSource.read(spark, root, (BatchID(1), BatchID(9)))
    assert((lo, hi) == (BatchID(1), BatchID(2)))
    val rows = df.select("batch_id", "payload").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "row-1"), (2L, "row-2")))
  }
}
