package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.algebra.Semigroup
import graft.api.GraftStream
import graft.time.{Batcher, Timestamp}

/** The reference's paired job/model property harness (summingbird-core-test
  * TestGraphs.scala:106-597 + MemoryLaws): each property builds the same
  * logical job twice — once through the engine's operator surface over a
  * Spark Dataset, once over plain Scala collections — and asserts equal
  * results for arbitrary inputs and functions drawn from a pool. These are
  * the laws that make refactoring the operator layer safe.
  */
object TestGraphsProps extends Properties("TestGraphs") {
  private lazy val spark = SparkTestSession.spark
  private implicit val sg: Semigroup[Long] = Semigroup.longSemigroup

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // (ts, key, value) events; ts bounded so batches stay small
  private val genEvents: Gen[List[(Long, Long, Long)]] = for {
    n   <- Gen.choose(0, 80)
    evs <- Gen.listOfN(n, for {
      t <- Gen.choose(0L, 500L)
      k <- Gen.choose(0L, 9L)
      v <- Gen.choose(-20L, 20L)
    } yield (t, k, v))
  } yield evs

  private val fns: Vector[(String, Long => Long)] = Vector(
    "id" -> identity[Long],
    "x2" -> (v => v * 2),
    "mod3" -> (v => v % 3),
    "neg" -> (v => -v))

  private def stream(evs: Seq[(Long, Long, Long)]) = {
    val s = spark; import s.implicits._
    GraftStream.from(evs.toDS())(_._1)
  }

  property("singleStep: flatMap + sumByKey == model (TestGraphs.singleStepJob)") =
    Prop.forAll(genEvents, Gen.choose(0, fns.size - 1)) { (evs, fi) =>
      val s = spark; import s.implicits._
      val f = fns(fi)._2
      val job = stream(evs)
        .flatMap(e => Seq((e._2, f(e._3)), (e._2 + 100L, 1L)))
        .asKeyed[Long, Long]
        .sumByKeyAllTime(sg, implicitly).collect().toMap
      val model = evs.flatMap(e => Seq((e._2, f(e._3)), (e._2 + 100L, 1L)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      Prop(job == model) :| s"fn=${fns(fi)._1}"
    }

  property("diamond: two branches of one source, merged, summed == model (TestGraphs.diamondJob)") =
    Prop.forAll(genEvents) { evs =>
      val s = spark; import s.implicits._
      val src = stream(evs)
      val left = src.filter(_._3 % 2 == 0).map(e => (e._2, e._3))
      val right = src.map(e => (e._2, 1L))
      val job = (left ++ right).asKeyed[Long, Long]
        .sumByKeyAllTime(sg, implicitly).collect().toMap
      val model = (evs.filter(_._3 % 2 == 0).map(e => (e._2, e._3)) ++
          evs.map(e => (e._2, 1L)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      job == model
    }

  property("leftJoin(service) then sum == model (TestGraphs.leftJoinJob)") =
    Prop.forAll(genEvents, Gen.mapOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(1L, 5L)))) {
      (evs, service) =>
        val s = spark; import s.implicits._
        val svcDs = service.toSeq.toDS()
        val job = stream(evs).asKeyedWith(_._2, (_: (Long, Long, Long))._3)
          .leftJoinDs(svcDs)
          .mapValues { case (v, j) => v * j.getOrElse(1L) }
          .sumByKeyAllTime(sg, implicitly).collect().toMap
        val model = evs.map(e => (e._2, e._3 * service.getOrElse(e._2, 1L)))
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        job == model
    }

  property("twoSumByKey: store output feeds a re-keyed second summer (TestGraphs.twoSumByKey)") =
    Prop.forAll(genEvents) { evs =>
      val s = spark; import s.implicits._
      val first = stream(evs).asKeyedWith(_._2, (_: (Long, Long, Long))._3)
        .sumByKeyAllTime(sg, implicitly) // Dataset[(K, V)]
      val job = GraftStream.from(first)(_ => 0L)
        .asKeyed[Long, Long]
        .mapKeys(_ % 3)
        .sumByKeyAllTime(sg, implicitly).collect().toMap
      val firstModel = evs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      val model = firstModel.toSeq.map { case (k, v) => (k % 3, v) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      job == model
    }

  property("keyed operator family composes == model (collectKeys/collectValues/filter/swap)") =
    Prop.forAll(genEvents) { evs =>
      val s = spark; import s.implicits._
      val job = stream(evs).asKeyedWith(_._2, (_: (Long, Long, Long))._3)
        .collectKeys { case k if k < 8 => k }
        .mapValues(_ + 1)
        .filterValues(_ != 0)
        .swap
        .collectValues { case v if v >= 0 => v }
        .swap
        .mapKeys(identity[Long])
        .sumByKeyAllTime(sg, implicitly).collect().toMap
      val model = evs.map(e => (e._2, e._3))
        .collect { case (k, v) if k < 8 => (k, v + 1) }
        .filter(_._2 != 0)
        .filter(_._1 >= 0) // after swap, collectValues on original key
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      job == model
    }

  property("sumByKey(batcher) delta/prior contract == model per (key, batch)") =
    Prop.forAll(genEvents) { evs =>
      val s = spark; import s.implicits._
      val batcher = Batcher.ofMillis(100)
      val rows = stream(evs).asKeyedWith(_._2, (_: (Long, Long, Long))._3)
        .sumByKey(batcher)(sg).collect()
      val deltas = evs.groupBy(e => (e._2, batcher.batchOf(Timestamp(e._1)).id))
        .view.mapValues(_.map(_._3).sum).toMap
      val ok = rows.map(r => (r._1, r._2)).toSet == deltas.keySet &&
        rows.forall { case (k, b, (prior, delta)) =>
          val expPrior = deltas.collect { case ((`k`, b2), v) if b2 < b => v }.sum
          val hasEarlier = deltas.keys.exists { case (k2, b2) => k2 == k && b2 < b }
          delta == deltas((k, b)) &&
            prior == (if (hasEarlier) Some(expPrior) else None)
        }
      ok
    }

  property("multipleSummer: one source, two stores (also-fanout) == model (TestGraphs.multipleSummer)") =
    Prop.forAll(genEvents) { evs =>
      val s = spark; import s.implicits._
      val src = stream(evs)
      // two tails off one source — the reference's AlsoProducer multi-store
      // job; `also` sequences them into one logical job
      val storeA = src.asKeyedWith(_._2, (_: (Long, Long, Long))._3)
        .sumByKeyAllTime(sg, implicitly).collect().toMap
      val storeB = src.filter(_._3 > 0)
        .asKeyedWith(e => e._2 % 4, (_: (Long, Long, Long)) => 1L)
        .sumByKeyAllTime(sg, implicitly).collect().toMap
      val modelA = evs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val modelB = evs.filter(_._3 > 0).groupBy(_._2 % 4)
        .view.mapValues(_.size.toLong).toMap
      storeA == modelA && storeB == modelB
    }

  property("leftJoinAsof(stream service) == last-write-strictly-before model") =
    Prop.forAll(genEvents, genEvents) { (lefts0, rights0) =>
      val s = spark; import s.implicits._
      // distinct ts per key per side, and no left/right ts collision per key
      // (the tie-break is deterministic — lookups before writes — but the
      // model below is simpler without equal stamps across sides)
      val lefts = lefts0.groupBy(e => (e._1, e._2)).values.map(_.head).toList
      val rights = rights0.groupBy(e => (e._1, e._2)).values.map(_.head)
        .map(e => (e._1 * 2 + 1, e._2, e._3)).toList // odd ts
      val evens = lefts.map(e => (e._1 * 2, e._2, e._3)) // even ts
      val lStream = stream(evens).asKeyedWith(_._2, (_: (Long, Long, Long))._3)
      val rStream = stream(rights).asKeyedWith(_._2, (_: (Long, Long, Long))._3)
      val out = lStream.leftJoinAsof(rStream)
        .ds.map(r => (r._1, r._2, r._3._1, r._3._2)).collect().toSet
      val model = evens.map { case (t, k, v) =>
        val seen = rights.filter(r => r._2 == k && r._1 < t)
        (t, k, v, if (seen.isEmpty) None else Some(seen.maxBy(_._1)._3))
      }.toSet
      Prop(out == model) :| s"lefts=${evens.size} rights=${rights.size}"
    }

  property("lookup/optionMap/either surface == model") =
    Prop.forAll(genEvents, Gen.mapOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(1L, 5L)))) {
      (evs, service) =>
        val s = spark; import s.implicits._
        val svcDs = service.toSeq.toDS()
        val looked = stream(evs).map(_._2).lookup(svcDs)
          .ds.map(_._2).collect().toSeq
        val lookedModel = evs.map(e => (e._2, service.get(e._2)))
        val e1 = stream(evs).optionMap(e => if (e._3 > 0) Some(e._3) else None)
        val e2 = stream(evs).map(_._2)
        val tagged = e1.either(e2).ds.map {
          case (_, Left(v))  => ("L", v)
          case (_, Right(v)) => ("R", v)
        }.collect()
        val taggedModel =
          evs.collect { case e if e._3 > 0 => ("L", e._3) } ++ evs.map(e => ("R", e._2))
        Prop(looked.groupBy(identity).view.mapValues(_.size).toMap ==
          lookedModel.groupBy(identity).view.mapValues(_.size).toMap &&
          tagged.groupBy(identity).view.mapValues(_.size).toMap ==
            taggedModel.groupBy(identity).view.mapValues(_.size).toMap)
    }
}
