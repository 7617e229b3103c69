package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** ScalaCheck laws for the range-join family: for ARBITRARY point sets,
  * interval sets (including empty, touching, nested, and huge-span
  * intervals, negative coordinates, and adversarial bucket widths), the
  * bucketized rewrite must equal the naive quadratic model exactly and
  * emit every pair exactly once.
  */
object RangeJoinProps extends Properties("RangeJoin") {
  private lazy val spark = SparkTestSession.spark

  // each case runs Spark jobs — keep the count modest
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val genCoord = Gen.choose(-200L, 200L)

  private val genPoints: Gen[List[(Long, Long, Long)]] = for {
    n  <- Gen.choose(0, 40)
    ps <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 3L); p <- genCoord
    } yield (u, p))
  } yield ps.zipWithIndex.map { case ((u, p), i) => (i.toLong, u, p) }

  private val genIntervals: Gen[List[(Long, Long, Long, Long)]] = for {
    n  <- Gen.choose(0, 30)
    is <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 3L)
      s <- genCoord
      len <- Gen.oneOf(Gen.choose(0L, 5L), Gen.choose(0L, 300L))
    } yield (u, s, s + len))
  } yield is.zipWithIndex.map { case ((u, s, e), i) => (i.toLong, u, s, e) }

  private val genWidth = Gen.oneOf(1L, 2L, 3L, 16L, 64L, 1000L)

  property("pointInInterval == naive model, each pair exactly once") =
    Prop.forAll(genPoints, genIntervals, genWidth) { (ps, is, w) =>
      val s = spark; import s.implicits._
      val pts = ps.toDF("pid", "puser", "p")
      val ivs = is.toDF("iid", "iuser", "s", "e")
      val got = RangeJoin.pointInInterval(pts, col("p"), ivs, col("s"),
          col("e"), bucketWidth = w,
          equiKeys = Seq(col("puser") -> col("iuser")))
        .select(col("pid"), col("iid"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val model = (for {
        (pid, pu, p) <- ps
        (iid, iu, st, en) <- is
        if pu == iu && st <= p && p < en
      } yield (pid, iid)).toSet
      (got.toSet == model) :| s"set mismatch W=$w: got ${got.toSet}, want $model" &&
        (got.length == got.toSet.size) :| s"duplicates at W=$w"
    }

  property("intervalOverlap == naive model, each pair exactly once") =
    Prop.forAll(genIntervals, genIntervals, genWidth) { (as, bs, w) =>
      val s = spark; import s.implicits._
      val l = as.toDF("aid", "auser", "as_", "ae")
      val r = bs.toDF("bid", "buser", "bs_", "be")
      val got = RangeJoin.intervalOverlap(l, col("as_"), col("ae"),
          r, col("bs_"), col("be"), bucketWidth = w,
          equiKeys = Seq(col("auser") -> col("buser")))
        .select(col("aid"), col("bid"))
        .collect().map(x => (x.getLong(0), x.getLong(1)))
      val model = (for {
        (aid, au, s1, e1) <- as
        (bid, bu, s2, e2) <- bs
        if au == bu && s1 < e2 && s2 < e1 && e1 > s1 && e2 > s2
      } yield (aid, bid)).toSet
      (got.toSet == model) :| s"set mismatch W=$w: got ${got.toSet}, want $model" &&
        (got.length == got.toSet.size) :| s"duplicates at W=$w"
    }
}
