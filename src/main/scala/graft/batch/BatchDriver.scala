package graft.batch

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

import graft.algebra.Semigroup
import graft.sources.TimePathedSource
import graft.time.BatchID

/** The incremental batch state machine — the rebuild of the reference's
  * run loop (`Scalding.run(state, mode, plan)`, ScaldingPlatform.scala:
  * 788-841 with HDFSState JobState.scala:23-40): each invocation
  *
  *  1. reads the store's commit log to find the last processed batch,
  *  2. asks [[TimePathedSource]] what input batches actually exist and
  *     shrinks the request to the maximal available prefix (availability
  *     planning — "at least one batch" or nothing, mirroring
  *     BatchedStore.scala:358-365),
  *  3. runs the user's delta pipeline over ONLY those batch partitions,
  *  4. merges into the store, committing one rolled-forward snapshot.
  *
  * Crash-safe by construction: deltas are recomputed from source (no
  * intermediate state), the snapshot commit is the atomic state-file
  * update, and an interrupted run leaves the previous snapshot authoritative.
  */
object BatchDriver {

  /** Outcome of one driver invocation. */
  sealed trait Result
  case object NothingToDo extends Result
  final case class Ran(from: BatchID, to: BatchID) extends Result

  /** Opt-in maintenance cadence for [[runIncremental]] (round 16): the
    * runbook verbs (MaintenanceExample) composed by hand —
    * `compactRevoked` on the KV store, `compactIfFragmented` /
    * `compactStored` on any stored index the pipeline also maintains —
    * run AUTOMATICALLY after a successful merge commit, so a nightly
    * driver schedule keeps layouts folded without a separate operations
    * job. Each verb takes the relevant store's own writer lease (the
    * same serialization a hand-run has); a maintenance failure
    * propagates loudly but can never un-commit the merge — the snapshot
    * flip already happened, and every verb here is itself atomic
    * (old-or-new) behind its own commit.
    *
    * @param revokedMaxDirs fold the store's revocation-digest dirs via
    *        [[BatchStore.compactRevoked]] once more than this many are
    *        live (None = off)
    * @param hooks arbitrary index-maintenance verbs (e.g.
    *        `Retrieval.compactIfFragmented(_, idxDir, buckets, max)`),
    *        run in order after the store-side fold
    */
  final case class Maintenance(
      revokedMaxDirs: Option[Int] = None,
      hooks: Seq[SparkSession => Unit] = Nil) {
    def isOff: Boolean = revokedMaxDirs.isEmpty && hooks.isEmpty
  }
  object Maintenance {
    val off: Maintenance = Maintenance()
    /** The runbook default: fold revocation dirs once more than 8 live. */
    val default: Maintenance = Maintenance(revokedMaxDirs = Some(8))
  }

  /** @param sourcePath  batch-partitioned input (batch_id=N dirs)
    * @param store       target snapshot store
    * @param upTo        inclusive upper bound of the request (e.g. "now")
    * @param maintenance opt-in post-commit maintenance (see [[Maintenance]])
    * @param deltas      user pipeline: planned input batches -> per-(K,
    *                    batch) Semigroup-summed deltas (typically
    *                    `KeyedGraftStream.sumDeltasPerBatch`)
    */
  def runIncremental[K, V](
      spark: SparkSession,
      sourcePath: String,
      store: BatchStore[K, V],
      upTo: BatchID,
      maintenance: Maintenance = Maintenance.off)(
      deltas: org.apache.spark.sql.DataFrame => Dataset[(K, Long, V)])(
      implicit sg: Semigroup[V], kEnc: Encoder[K], vEnc: Encoder[V]): Result = {
    // default-on conditional commit (round 17): the flip below goes
    // through CAS unless the deployment explicitly opted out or wired
    // its own backend — see StoreFs.ensureDefaultCasBackend
    StoreFs.ensureDefaultCasBackend()
    val firstNeeded = store.state.lastCommitted(upTo)
      .map(_.next).getOrElse(
        TimePathedSource.availableBatches(spark, sourcePath).headOption
          .getOrElse(return NothingToDo))
    if (firstNeeded > upTo) return NothingToDo
    TimePathedSource.read(spark, sourcePath, (firstNeeded, upTo)) match {
      case None => NothingToDo
      case Some(((lo, hi), input)) =>
        store.merge(spark, deltas(input), hi).count() // force + commit
        // maintenance cadence: after the commit, never inside it — the
        // merge is durable before any fold starts
        maintenance.revokedMaxDirs.foreach(store.compactRevoked(spark, _))
        maintenance.hooks.foreach(_(spark))
        Ran(lo, hi)
    }
  }
}
