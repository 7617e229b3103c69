package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Job counters — the reference's user-defined Counter/Stats surface
  * (summingbird-core Counter.scala:28-40, Stats.scala:34-120: counters
  * registered per JobId, incremented inside operator closures, surfaced
  * through the platform's `PlatformStatProvider`). Spark-native mapping:
  * a named `LongAccumulator` per (group, name) — executors increment
  * inside any closure operator, the driver reads [[Counter.value]] live
  * (micro-batch streaming included), and the Spark UI lists the named
  * accumulator per stage, playing the stat-provider role.
  *
  * Delivery contract matches the reference's online counters: updates
  * from re-executed tasks or recomputed lineage can double-count
  * (at-least-once) — diagnostics, not billing; anything exact belongs in
  * a real aggregation.
  */
final class Counter private[api] (val group: String, val name: String,
    acc: LongAccumulator) extends Serializable {
  def incr(): Unit = acc.add(1L)
  def incrBy(amount: Long): Unit = acc.add(amount)
  /** Driver-side read of the current total. */
  def value: Long = acc.value
}

object Counters {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), Counter]()
  private val evictionHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Get-or-create the (group, name) counter for this session — the
    * reference's `Counter(Group(g), Name(n))(jobId)` with the Spark
    * application id playing JobId. Re-requesting returns the SAME counter
    * (the reference registers into a per-job set the same way). The first
    * registration per application installs an application-end listener
    * that evicts that application's entries, so a long-lived JVM cycling
    * sessions does not accumulate dead accumulators.
    */
  def counter(spark: SparkSession, group: String, name: String): Counter = {
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
    val key = (appId, group, name)
    registry.computeIfAbsent(key, _ =>
      new Counter(group, name, spark.sparkContext.longAccumulator(s"graft.$group.$name")))
  }

  /** All counters registered by this session, (group, name)-ordered — the
    * `JobCounters.getCountersForJob` analogue.
    */
  def forSession(spark: SparkSession): Seq[Counter] = {
    val app = spark.sparkContext.applicationId
    import scala.jdk.CollectionConverters._
    registry.asScala.collect { case ((a, _, _), c) if a == app => c }
      .toSeq.sortBy(c => (c.group, c.name))
  }

  /** Point-in-time driver-side read of every session counter,
    * "group.name" → value — the PlatformStatProvider surface an operator
    * dashboard (or the Verify dump) polls; sorted-key map so successive
    * snapshots diff cleanly across runs.
    */
  def snapshot(spark: SparkSession): scala.collection.immutable.SortedMap[String, Long] =
    scala.collection.immutable.SortedMap.from(
      forSession(spark).map(c => s"${c.group}.${c.name}" -> c.value))
}
