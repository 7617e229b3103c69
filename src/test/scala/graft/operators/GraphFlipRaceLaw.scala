package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Two-thread atomic-flip law for the stored graph tiers (round 17): a
  * reader resolving the index concurrently with a compaction's
  * commit-log flip must observe the OLD committed segment set or the NEW
  * one, never a mix — the codes/postings tiers pin their own flip laws;
  * this is the graph tiers' (shared body, parameterized by the tier's
  * read and compact verbs, like the tiers' shared compaction guard).
  *
  * The compaction must run with a sweep grace so superseded segment
  * FILES stay readable for a reader that resolved the old list — the
  * same discipline the bm25 deletion-grace law pins.
  */
object GraphFlipRaceLaw {
  def run(read: () => DataFrame, compact: () => Unit): Unit = {
    // a snapshot fingerprints one full resolution: commit-log read +
    // segment fold, rendered row-by-row (column set included, so a
    // pre-compaction tombstone column distinguishes states) PLUS the
    // resolved segment files (inputFiles — pre-pruning is exactly right
    // here: it names which segment generation the plan resolved, which
    // distinguishes the two legal states even when the fold is
    // content-invariant, e.g. the IVF tier's pure layout compaction)
    def snap(): Set[String] = {
      val df = read()
      df.toJSON.collect().toSet ++ df.inputFiles.map("file:" + _)
    }
    val before = snap()
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Set[String]]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val reader = new Thread(() => {
      try while (!stop.get()) observed.add(snap())
      catch { case t: Throwable => err.set(t) }
    })
    reader.start()
    try compact()
    finally { stop.set(true); reader.join() }
    assert(err.get() == null, s"racing reader failed: ${err.get()}")
    val after = snap()
    assert(after != before,
      "compaction did not change the resolved state — the race pinned nothing")
    var n = 0
    observed.forEach { o =>
      n += 1
      assert(o == before || o == after,
        s"racing reader observed a MIXED segment resolution (snapshot $n): " +
        s"rows in neither legal state: ${(o -- before -- after).take(3)}")
    }
    assert(n >= 1, "reader thread never completed a snapshot")
  }
}
