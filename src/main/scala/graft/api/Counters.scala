package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Job counters — the reference's user-defined Counter/Stats surface
  * (summingbird-core Counter.scala:28-40, Stats.scala:34-120: counters
  * registered per JobId, incremented inside operator closures, surfaced
  * through the platform's `PlatformStatProvider`). Spark-native mapping:
  * a named `LongAccumulator` per (job, group, name) — executors increment
  * inside any closure operator, the driver reads [[Counter.value]] live
  * (micro-batch streaming included), and the Spark UI lists the named
  * accumulator per stage, playing the stat-provider role.
  *
  * Scoping mirrors the reference's `JobCounters.registeredCountersForJob`
  * (one registry per JobId): counters are namespaced by a JOB name inside
  * the Spark application, so two graft jobs sharing a session can both
  * register ("core", "emitted") without colliding — [[Counters.counterFor]]
  * / [[Counters.forJob]] / [[Counters.snapshotFor]]. The job-less overloads
  * use [[Counters.DefaultJob]], preserving the original surface.
  *
  * Delivery contract matches the reference's online counters: updates
  * from re-executed tasks or recomputed lineage can double-count
  * (at-least-once) — diagnostics, not billing; anything exact belongs in
  * a real aggregation.
  */
final class Counter private[api] (val job: String, val group: String,
    val name: String, acc: LongAccumulator) extends Serializable {
  def incr(): Unit = acc.add(1L)
  def incrBy(amount: Long): Unit = acc.add(amount)
  /** Driver-side read of the current total. */
  def value: Long = acc.value
}

object Counters {
  /** Job scope used by the job-less overloads. */
  val DefaultJob = "default"

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String, String), Counter]()
  private val evictionHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Get-or-create the (group, name) counter in the [[DefaultJob]] scope —
    * the reference's `Counter(Group(g), Name(n))(jobId)` with the Spark
    * application id playing JobId. Re-requesting returns the SAME counter
    * (the reference registers into a per-job set the same way).
    */
  def counter(spark: SparkSession, group: String, name: String): Counter =
    counterFor(spark, DefaultJob, group, name)

  /** Get-or-create the (group, name) counter scoped to `job` — the
    * reference's per-JobId registry. The first registration per
    * application installs an application-end listener that evicts that
    * application's entries, so a long-lived JVM cycling sessions does not
    * accumulate dead accumulators.
    */
  def counterFor(spark: SparkSession, job: String, group: String,
      name: String): Counter = {
    val appId = spark.sparkContext.applicationId
    if (evictionHooked.add(appId)) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          registry.keySet.removeIf(_._1 == appId)
          evictionHooked.remove(appId)
        }
      })
    }
    val key = (appId, job, group, name)
    registry.computeIfAbsent(key, _ =>
      new Counter(job, group, name,
        spark.sparkContext.longAccumulator(s"graft.$job.$group.$name")))
  }

  /** All counters registered by this session across every job scope,
    * (job, group, name)-ordered.
    */
  def forSession(spark: SparkSession): Seq[Counter] = {
    val app = spark.sparkContext.applicationId
    import scala.jdk.CollectionConverters._
    registry.asScala.collect { case ((a, _, _, _), c) if a == app => c }
      .toSeq.sortBy(c => (c.job, c.group, c.name))
  }

  /** This session's counters in ONE job scope, (group, name)-ordered —
    * the `JobCounters.getCountersForJob` analogue.
    */
  def forJob(spark: SparkSession, job: String): Seq[Counter] =
    forSession(spark).filter(_.job == job)

  /** Point-in-time driver-side read of every session counter — the
    * PlatformStatProvider surface an operator dashboard (or the Verify
    * dump) polls; sorted-key map so successive snapshots diff cleanly
    * across runs. [[DefaultJob]] counters keep the historical
    * "group.name" key; other job scopes prefix theirs as
    * "job.group.name".
    */
  def snapshot(spark: SparkSession): scala.collection.immutable.SortedMap[String, Long] =
    scala.collection.immutable.SortedMap.from(
      forSession(spark).map { c =>
        val key = if (c.job == DefaultJob) s"${c.group}.${c.name}"
                  else s"${c.job}.${c.group}.${c.name}"
        key -> c.value
      })

  /** Snapshot of one job scope only, keyed "group.name". */
  def snapshotFor(spark: SparkSession, job: String): scala.collection.immutable.SortedMap[String, Long] =
    scala.collection.immutable.SortedMap.from(
      forJob(spark, job).map(c => s"${c.group}.${c.name}" -> c.value))
}
