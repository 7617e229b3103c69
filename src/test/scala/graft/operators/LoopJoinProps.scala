package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkTestSession
import graft.algebra.Semigroup

/** ScalaCheck laws for the loop join: [[LoopJoin.joinAndState]] vs the
  * reference's in-Scala scanLeft model (`loopJoinInScala`,
  * summingbird-core-test TestGraphs.scala:60-102) — for arbitrary events,
  * initial snapshots and value functions, the join output AND the final
  * per-key store state must both match. (ts, key) pairs are deduplicated so
  * the model's processing order is total — the distributed sort is only
  * deterministic up to ties, exactly like the reference's grouped sort.
  */
object LoopJoinProps extends Properties("LoopJoin") {
  private lazy val spark = SparkTestSession.spark
  private implicit val sg: Semigroup[Long] = Semigroup.longSemigroup

  // fewer cases than the scalacheck default: each case runs a Spark job
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val valueFns: Vector[(String, (Long, Option[Long]) => Option[Long])] = Vector(
    "write-u"      -> ((u, _) => Some(u)),
    "write-1"      -> ((_, _) => Some(1L)),
    "write-even"   -> ((u, _) => if (u % 2 == 0) Some(u) else None),
    "write-s-plus" -> ((u, s) => Some(s.getOrElse(0L) + u)))

  private val genEvents: Gen[List[(Long, Long, Long)]] = for {
    n   <- Gen.choose(0, 60)
    evs <- Gen.listOfN(n, for {
      t <- Gen.choose(0L, 40L)
      k <- Gen.choose(0L, 5L)
      u <- Gen.choose(-10L, 10L)
    } yield (t, k, u))
  } yield evs.groupBy(e => (e._1, e._2)).values.map(_.head).toList

  private val genInitial: Gen[Map[Long, Long]] = for {
    ks <- Gen.someOf(0L to 7L)
    vs <- Gen.listOfN(ks.size, Gen.choose(-5L, 5L))
  } yield ks.zip(vs).toMap

  /** The reference model: per key, time-sorted scanLeft — lookup first,
    * then semigroup-merge the written value into the store.
    */
  private def model(
      events: Seq[(Long, Long, Long)],
      initial: Map[Long, Long],
      valueFn: (Long, Option[Long]) => Option[Long])
      : (Set[(Long, Long, (Long, Option[Long]))], Map[Long, Long]) = {
    val keys = events.map(_._2).toSet ++ initial.keySet
    val outs = Set.newBuilder[(Long, Long, (Long, Option[Long]))]
    val store = Map.newBuilder[Long, Long]
    keys.foreach { k =>
      var state: Option[Long] = initial.get(k)
      events.filter(_._2 == k).sortBy(_._1).foreach { case (t, _, u) =>
        outs += ((t, k, (u, state)))
        val written = valueFn(u, state)
        state = (state, written) match {
          case (Some(s), Some(w)) => Some(sg.plus(s, w))
          case (None, w)          => w
          case (s, None)          => s
        }
      }
      state.foreach(v => store += (k -> v))
    }
    (outs.result(), store.result())
  }

  property("joinAndState == time-sorted scanLeft model") =
    Prop.forAll(genEvents, genInitial, Gen.choose(0, valueFns.size - 1)) {
      (evs, init, fnIdx) =>
        val s = spark; import s.implicits._
        val fn = valueFns(fnIdx)._2
        val initDs = if (init.isEmpty) None else Some(init.toSeq.toDS())
        val result = LoopJoin.joinAndState[Long, Long, Long](evs.toDS(), initDs, fn)
          .collect()
        val joins = result.collect { case Left(r) => r }
        val stores = result.collect { case Right(kv) => kv }.toMap
        val (mJoins, mStore) = model(evs, init, fn)
        val label = s"fn=${valueFns(fnIdx)._1} events=${evs.size} init=${init.size}"
        Prop(joins.length == mJoins.size &&
          joins.toSet == mJoins && stores == mStore) :| label
    }

  property("loopJoinPreSplit == loopJoin for state-independent deltas") =
    Prop.forAll(genEvents, genInitial, Gen.oneOf(1L, 3L, 7L, 100L),
        Gen.choose(0, 2)) { (evs, init, granule, fnIdx) =>
      val s = spark; import s.implicits._
      val deltas: Vector[Long => Option[Long]] = Vector(
        u => Some(u), _ => Some(1L), u => if (u % 2 == 0) Some(u) else None)
      val delta = deltas(fnIdx)
      val initDs = if (init.isEmpty) None else Some(init.toSeq.toDS())
      val split = LoopJoin.loopJoinPreSplit[Long, Long, Long](
        evs.toDS(), initDs, delta, _ / granule).collect().toSet
      val (mJoins, _) = model(evs, init, (u, _) => delta(u))
      Prop(split == mJoins) :| s"granule=$granule fn=$fnIdx n=${evs.size}"
    }

  property("loopJoinPreSplit: non-commutative (list) semigroup, chunk order") =
    Prop.forAll(genEvents, Gen.oneOf(1L, 5L, 13L)) { (evs, granule) =>
      val s = spark; import s.implicits._
      implicit val lsg: Semigroup[List[Long]] = Semigroup.listSemigroup[Long]
      val delta: Long => Option[List[Long]] = u => Some(List(u))
      val split = LoopJoin.loopJoinPreSplit[Long, Long, List[Long]](
        evs.toDS(), None, delta, _ / granule).collect()
        .map { case (t, k, (u, st)) => (t, k, (u, st.getOrElse(Nil))) }.toSet
      // model: prior state is the time-ordered list of earlier events' values
      val want = evs.groupBy(_._2).flatMap { case (k, g) =>
        val sorted = g.sortBy(_._1)
        sorted.zipWithIndex.map { case ((t, _, u), i) =>
          (t, k, (u, sorted.take(i).map(_._3).toList))
        }
      }.toSet
      Prop(split == want) :| s"granule=$granule n=${evs.size}"
    }

  property("loopJoin emits exactly the join rows") =
    Prop.forAll(genEvents) { evs =>
      val s = spark; import s.implicits._
      val out = LoopJoin.loopJoin[Long, Long, Long](
        evs.toDS(), None, (u, _) => Some(u)).collect()
      val (mJoins, _) = model(evs, Map.empty, (u, _) => Some(u))
      out.toSet == mJoins && out.length == mJoins.size
    }
}
