package graft.streaming

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestSession
import graft.algebra.Semigroup
import graft.operators.LoopJoin

/** Property form of the streaming ≡ batch loop-join equivalence: arbitrary
  * events (unique (ts, key), delivered in event-time order across an
  * arbitrary micro-batch split), arbitrary initial snapshots, and the same
  * valueFn family as LoopJoinProps — streaming output must equal the batch
  * operator on the concatenated input.
  */
object StreamingLoopJoinProps extends Properties("StreamingLoopJoin") {
  private lazy val spark = SparkTestSession.spark
  private implicit val sg: Semigroup[Long] = Semigroup.longSemigroup

  // each case runs a streaming query: keep the case count low
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val valueFns: Vector[(String, (Long, Option[Long]) => Option[Long])] = Vector(
    "write-u"      -> ((u, _) => Some(u)),
    "write-even"   -> ((u, _) => if (u % 2 == 0) Some(u) else None),
    "write-s-plus" -> ((u, s) => Some(s.getOrElse(0L) + u)))

  private val genEvents: Gen[List[(Long, Long, Long)]] = for {
    n   <- Gen.choose(0, 40)
    evs <- Gen.listOfN(n, for {
      t <- Gen.choose(0L, 30L)
      k <- Gen.choose(0L, 4L)
      u <- Gen.choose(-9L, 9L)
    } yield (t, k, u))
  } yield evs.groupBy(e => (e._1, e._2)).values.map(_.head).toList
    .sortBy(e => (e._1, e._2)) // event-time-ordered delivery

  private val genInitial: Gen[Map[Long, Long]] = for {
    ks <- Gen.someOf(0L to 5L)
    vs <- Gen.listOfN(ks.size, Gen.choose(-5L, 5L))
  } yield ks.zip(vs).toMap

  private var runId = 0

  property("streaming == batch on ordered input, any micro-batch split") =
    Prop.forAll(genEvents, genInitial, Gen.choose(0, valueFns.size - 1),
        Gen.choose(0.0, 1.0)) { (evs, init, fnIdx, cut) =>
      val s = spark; import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val fn = valueFns(fnIdx)._2
      val initDs = if (init.isEmpty) None else Some(init.toSeq.toDS())

      val split = (evs.size * cut).toInt
      val (b1, b2) = evs.splitAt(split)
      val ms = MemoryStream[(Long, Long, Long)]
      runId += 1
      val name = s"slj_prop_$runId"
      val out = StreamingLoopJoin.loopJoin[Long, Long, Long](ms.toDS(), initDs, fn)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        Seq(b1, b2).foreach { b =>
          if (b.nonEmpty) { ms.addData(b: _*); q.processAllAvailable() }
        }
      } finally q.stop()
      val streaming = spark.table(name).as[(Long, Long, (Long, Option[Long]))]
        .collect().map(r => (r._1, r._2, r._3._1, r._3._2)).toSet

      val batch = LoopJoin.loopJoin[Long, Long, Long](evs.toDS(), initDs, fn)
        .collect().map(r => (r._1, r._2, r._3._1, r._3._2)).toSet

      val label = s"fn=${valueFns(fnIdx)._1} n=${evs.size} split=$split init=${init.size}"
      Prop(streaming == batch) :| label
    }
}
