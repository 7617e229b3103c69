package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** groupedFlat laws (pure iterator machinery) + the distributed secondary
  * sort, checked against collection models.
  */
class SortedGroupsSpec extends AnyFunSuite {

  test("groupedFlat == groupBy model on key-sorted input") {
    val rnd = new Random(42)
    for (_ <- 1 to 50) {
      val xs = Seq.fill(rnd.nextInt(200))((rnd.nextInt(10), rnd.nextInt(100))).sortBy(_._1)
      val got = SortedGroups.groupedFlat[(Int, Int), Int, (Int, Int)](
        xs.iterator, _._1, (k, rows) => rows.map(r => (k, r._2 * 2))).toSeq
      val want = xs.map { case (k, v) => (k, v * 2) }
      assert(got == want)
    }
  }

  test("groupedFlat drains unconsumed rows when f takes a prefix") {
    val xs = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d"), (2, "e"), (3, "f"))
    // f consumes only the first row of each group
    val got = SortedGroups.groupedFlat[(Int, String), Int, String](
      xs.iterator, _._1, (_, rows) => Iterator.single(rows.next()._2)).toSeq
    assert(got == Seq("a", "d", "f"))
  }

  test("groupedFlat with lazy flatMap output (state mutated during consumption)") {
    val xs = Seq((1, 10), (1, 20), (2, 30))
    val got = SortedGroups.groupedFlat[(Int, Int), Int, Int](
      xs.iterator, _._1, { (_, rows) =>
        var acc = 0
        rows.map { r => acc += r._2; acc } // running sum, lazily
      }).toSeq
    assert(got == Seq(10, 30, 30))
  }

  test("groupedFlat on empty input and empty groups") {
    assert(SortedGroups.groupedFlat[Int, Int, Int](
      Iterator.empty, identity, (_, _) => Iterator.single(1)).toSeq == Nil)
    val xs = Seq((1, 1), (2, 2))
    val got = SortedGroups.groupedFlat[(Int, Int), Int, Int](
      xs.iterator, _._1, (k, rows) => { rows.size; Iterator.empty }).toSeq
    assert(got == Nil)
  }

  test("perKeyTimeSorted: per-key rows arrive time-ordered with tie-break tag") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rnd = new Random(7)
    val rows = Seq.fill(500)((rnd.nextLong(20), rnd.nextLong(5), rnd.nextInt(100)))
      .map { case (t, k, v) => (t, k, v) }
    val ds = spark.createDataset(rows)
    // tag: odd values are "right" rows → at equal ts, evens first
    val got = SortedGroups.perKeyTimeSorted(ds) { (k: Long, it: Iterator[(Long, Int)]) =>
      Iterator.single((k, it.toList))
    }(tagIsRight = r => r._3 % 2 == 1).collect().toMap

    val want = rows.groupBy(_._2).view.mapValues { g =>
      g.sortBy(r => (r._1, r._3 % 2)).map(r => (r._1, r._3)).toList
    }.toMap
    for ((k, lst) <- want) {
      val gotList = got(k)
      // stable order within (ts, tag) is not guaranteed; compare multisets per (ts, tag)
      assert(gotList.groupBy(r => (r._1, r._2 % 2)) == lst.groupBy(r => (r._1, r._2 % 2)), s"key $k")
      // and the (ts, tag) sequence itself must be sorted
      val tags = gotList.map(r => (r._1, r._2 % 2))
      assert(tags == tags.sorted, s"key $k order")
    }
  }
}
