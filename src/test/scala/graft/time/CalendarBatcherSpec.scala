package graft.time

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Calendar batcher laws, with emphasis on DST transitions and the
  * driver-side `batchOf` agreeing EXACTLY with the Catalyst
  * `batchIdColumn` (the property the store layout depends on).
  */
class CalendarBatcherSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val zones = Seq("UTC", "America/New_York", "Europe/Berlin", "Asia/Kolkata")
  // windows around 2024 DST transitions (US: Mar 10 / Nov 3; EU: Mar 31 / Oct 27)
  private val interesting = Seq(
    1710054000000L, // 2024-03-10 07:00Z (US spring forward)
    1730610000000L, // 2024-11-03 05:00Z (US fall back)
    1711843200000L, // 2024-03-31 00:00Z (EU spring forward)
    1729987200000L, // 2024-10-27 00:00Z (EU fall back)
    0L, 86399999L)

  private def samples: Seq[Long] = {
    val rnd = new scala.util.Random(9)
    interesting.flatMap(t => (-30 to 30).map(h => t + h * 3600000L + rnd.nextInt(60000))) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) % 4102444800000L)
  }

  test("batchOf matches batchIdColumn for calendar days and hours in every zone") {
    val s = spark; import s.implicits._
    val ts = samples
    val df = ts.toDF("ms")
    for (z <- zones; b <- Seq(Batcher.calendarDays(z), Batcher.calendarHours(z))) {
      val viaColumn = df.select(col("ms"), b.batchIdColumn(col("ms")).as("b"))
        .as[(Long, Long)].collect().toMap
      ts.foreach { t =>
        assert(viaColumn(t) == b.batchOf(Timestamp(t)).id,
          s"zone=$z batcher=$b t=$t")
      }
    }
  }

  test("batchIdColumn is session-timezone independent (non-UTC session)") {
    // the store-layout invariant: batchIdColumn must equal batchOf no matter
    // what spark.sql.session.timeZone is. civilMillis never renders through
    // the session zone's wall clock (an NTZ round-trip would mis-resolve
    // instants in the session zone's fall-back overlap hour — LA's
    // 2024-11-03 01:xx is in `samples`, so that case is covered here)
    val s = spark; import s.implicits._
    val prior = s.conf.get("spark.sql.session.timeZone")
    try {
      for (sessionTz <- Seq("Australia/Sydney", "America/Los_Angeles")) {
        s.conf.set("spark.sql.session.timeZone", sessionTz)
        val ts = samples
        val df = ts.toDF("ms")
        for (z <- Seq("America/New_York", "UTC");
             b <- Seq(Batcher.calendarDays(z), Batcher.calendarHours(z))) {
          val viaColumn = df.select(col("ms"), b.batchIdColumn(col("ms")).as("b"))
            .as[(Long, Long)].collect().toMap
          ts.foreach { t =>
            assert(viaColumn(t) == b.batchOf(Timestamp(t)).id,
              s"session=$sessionTz zone=$z batcher=$b t=$t")
          }
        }
      }
    } finally s.conf.set("spark.sql.session.timeZone", prior)
  }

  test("calendar days track local midnight: DST days are 23/25 civil hours") {
    val b = Batcher.CalendarDays("America/New_York")
    // 2024-03-10 (spring forward): 23 hours
    val d0310 = b.batchOf(Timestamp(1710079200000L)) // 2024-03-10 14:00Z
    val iv = b.toInterval(d0310)
    assert(iv.endMs - iv.startMs == 23L * 3600000L)
    // 2024-11-03 (fall back): 25 hours
    val d1103 = b.batchOf(Timestamp(1730649600000L)) // 2024-11-03 16:00Z
    val iv2 = b.toInterval(d1103)
    assert(iv2.endMs - iv2.startMs == 25L * 3600000L)
    // and a normal day is 24
    val dNorm = b.batchOf(Timestamp(1715000000000L))
    val iv3 = b.toInterval(dNorm)
    assert(iv3.endMs - iv3.startMs == 24L * 3600000L)
  }

  test("adjunction and tiling hold for calendar batchers on real timestamps") {
    for (z <- zones; b <- Seq(Batcher.calendarDays(z), Batcher.calendarHours(z))) {
      samples.foreach { t =>
        val id = b.batchOf(Timestamp(t))
        assert(b.batchOf(b.earliestTimeOf(id)) == id, s"$z $b $t")
        val iv = b.toInterval(id)
        assert(iv.contains(t), s"$z $b: $t not in $iv")
      }
    }
  }

  test("fall-back repeated hour folds into one batch; spring-forward skips one id") {
    val b = Batcher.CalendarHours("America/New_York")
    // 2024-11-03: 01:30 EDT (05:30Z) and 01:30 EST (06:30Z) — same civil hour
    assert(b.batchOf(Timestamp(1730611800000L)) == b.batchOf(Timestamp(1730615400000L)))
    // 2024-03-10: 01:xx EST (06:xxZ) then 03:xx EDT (07:xxZ) — the 02:xx id
    // is skipped
    val before = b.batchOf(Timestamp(1710050400000L + 1800000L)) // 01:30 EST
    val after = b.batchOf(Timestamp(1710054000000L + 1800000L))  // 03:30 EDT
    assert(after.id - before.id == 2)
  }
}
