package graft

/** In-row phase attribution for the index-lifecycle gate rows (round 16,
  * r15 verdict "what's wrong" #3): rows like q_nsw_delete build their
  * index IN-ROW, so at organic 100x the row's wall time is dominated by
  * the BUILD while the number gets read as the cost of the TAKEDOWN.
  * Lifecycle rows wrap their phases in [[time]]; [[Bench]] drains the
  * split after each rep and publishes a "phases" map in the full
  * artifact, so a scale reading attributes cost to the phase that
  * actually spent it — no protocol change for rows that don't opt in.
  *
  * Spark-laziness caveat, by design: a phase here measures what the row
  * MATERIALIZES inside the wrapped block (index writes, localCheckpoint,
  * counts). The returned DataFrame's final aggregation executes in the
  * harness's count() — that residual (row total − sum of phases) is the
  * serve/search cost.
  */
object PhaseTimer {
  private val acc = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, Double]]()

  def time[A](query: String, phase: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally {
      val m = acc.computeIfAbsent(query,
        _ => new java.util.concurrent.ConcurrentHashMap[String, Double]())
      m.merge(phase, (System.nanoTime() - t0) / 1e9, (a, b) => a + b)
      ()
    }
  }

  /** Remove and return the phase splits recorded for `query` since the
    * last drain — one call per bench rep, so reps never blend.
    */
  def drain(query: String): Map[String, Double] =
    Option(acc.remove(query)) match {
      case None => Map.empty
      case Some(m) =>
        val it = m.entrySet().iterator()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
        b.result()
    }
}
