package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-19 registry split: SparkEntry concatenates the five
  * per-family gate registries, and `++` on Map silently drops duplicates —
  * so the split is only sound if the family key sets are pairwise disjoint
  * and the union preserves every row the monolithic map carried.
  */
class RegistrySplitSpec extends AnyFunSuite {

  private val families: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
      ("CoreGate", CoreGate.queries, CoreGate.oracleSql),
      ("StreamingGate", StreamingGate.queries, StreamingGate.oracleSql),
      ("DedupGate", DedupGate.queries, DedupGate.oracleSql),
      ("AnnGate", AnnGate.queries, AnnGate.oracleSql),
      ("TextGate", TextGate.queries, TextGate.oracleSql))

  test("family query keys are pairwise disjoint (++ would silently drop)") {
    for {
      (na, qa, _) <- families
      (nb, qb, _) <- families if na < nb
    } {
      val overlap = qa.keySet intersect qb.keySet
      assert(overlap.isEmpty, s"$na and $nb both register: $overlap")
    }
  }

  test("the concatenated registry preserves every family row") {
    assert(SparkEntry.queries.size === families.map(_._2.size).sum)
    assert(SparkEntry.oracleSql.size === families.map(_._3.size).sum)
  }

  test("every oracle key names a registered query, within its own family") {
    for ((name, qs, os) <- families) {
      val orphans = os.keySet -- qs.keySet
      assert(orphans.isEmpty,
        s"$name oracles without a query in the same family: $orphans")
    }
  }

  test("gate inventory matches the round-18 baseline or grows") {
    assert(SparkEntry.queries.size >= 182)
  }
}
