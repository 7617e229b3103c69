package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** ScalaCheck laws for token-budget mixture sampling: for ARBITRARY
  * corpora (uneven domains, zero-token documents, missing domains),
  * weights, budgets, and caps, [[Sampling.mixtureByTokens]] must equal
  * the sequential scanLeft model, stay monotone in the budget, and obey
  * per-domain token accounting.
  */
object MixtureProps extends Properties("MixtureByTokens") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val domains = Vector("a", "b", "c", "d")

  private val genRows: Gen[List[(Long, String, Long)]] = for {
    n  <- Gen.choose(0, 60)
    rs <- Gen.listOfN(n, for {
      d <- Gen.oneOf(domains)
      t <- Gen.choose(0L, 12L) // zero-token docs included
    } yield (d, t))
  } yield rs.zipWithIndex.map { case ((d, t), i) => (i.toLong, d, t) }

  private val genWeights: Gen[Map[String, Double]] = for {
    ds <- Gen.someOf(domains).suchThat(_.nonEmpty)
    ws <- Gen.listOfN(ds.size, Gen.choose(1, 8))
  } yield ds.zip(ws.map(_.toDouble)).toMap

  private def u(id: Long): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(h, 16).toDouble / 4294967296.0
  }

  private def model(rows: List[(Long, String, Long)],
      weights: Map[String, Double], budget: Long,
      maxRepeat: Int): Set[(Long, Int)] = {
    val sumW = weights.values.sum
    // .toList before flatMap: flatMapping a Map with PAIR-typed results
    // rebuilds a Map keyed by doc id, silently collapsing the epochs
    rows.filter(r => weights.contains(r._2)).groupBy(_._2).toList.flatMap {
      case (d, rs) =>
        val target = budget.toDouble * weights(d) / sumW
        val ordered = rs.sortBy(r => (u(r._1), r._1.toString))
        val tot = ordered.map(_._3).sum
        for {
          e <- 0 until maxRepeat
          (r, ex) <- ordered.zip(ordered.scanLeft(0L)(_ + _._3).init)
          if e.toDouble * tot + ex < target
        } yield (r._1, e)
    }.toSet
  }

  property("== scanLeft model; monotone in budget; accounting holds") =
    Prop.forAllNoShrink(genRows, genWeights, Gen.choose(1L, 400L),
        Gen.choose(1, 4)) { (rows, weights, budget, maxRepeat) =>
      val s = spark; import s.implicits._
      val df = rows.toDF("id", "dom", "tok")
      def run(b: Long) = Sampling.mixtureByTokens(df, col("dom"), col("id"),
          col("tok"), weights, b, maxRepeat)
        .select(col("id"), col("epoch"))
        .collect().map(r => (r.getLong(0), r.getInt(1)))
      val got = run(budget)
      val want = model(rows, weights, budget, maxRepeat)
      val noDups = got.length == got.toSet.size
      val smaller = run(math.max(1L, budget / 2)).toSet
      // accounting: for each selected domain, either every available
      // (doc, epoch) was taken (supply or cap exhausted) or the selected
      // token total overshoots the target by LESS than one max document
      val byDom = rows.filter(r => weights.contains(r._2)).groupBy(_._2)
      val toks = rows.map(r => r._1 -> r._3).toMap
      val doms = rows.map(r => r._1 -> r._2).toMap
      val sumW = weights.values.sum
      // the (epoch, doc) positions tile [0, maxRepeat*T) contiguously, so
      // either the cap/supply binds (everything taken), the domain holds
      // only zero-token docs, or the selected total lands in
      // [target, target + maxDoc)
      val acct = byDom.forall { case (d, rs) =>
        val target = budget.toDouble * weights(d) / sumW
        val selTok = got.filter(p => doms(p._1) == d).map(p => toks(p._1)).sum
        val t = rs.map(_._3).sum
        val maxDoc = rs.map(_._3).max
        if (t == 0) true
        else if (maxRepeat.toDouble * t <= target) selTok == maxRepeat * t
        else selTok >= target && selTok < target + maxDoc
      }
      (got.toSet == want) :| s"model mismatch: got ${got.toSet}, want $want" &&
        noDups :| "duplicate (id, epoch) pairs" &&
        smaller.subsetOf(got.toSet) :| "not monotone in budget" &&
        acct :| "per-domain token accounting violated"
    }
}
