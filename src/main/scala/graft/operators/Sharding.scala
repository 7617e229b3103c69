package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffling and trainer shard assignment — the
  * dataloader-facing export step of a training-data pipeline: give every
  * example a reproducible pseudo-random position, then stripe those
  * positions across `worldSize` data-parallel trainers so each rank reads
  * a disjoint, equally-sized, well-mixed slice.
  *
  * The reference's model has no global order at all (streams are
  * unordered-by-design; only time is meaningful —
  * summingbird-core/src/main/scala/com/twitter/summingbird/Producer.scala:139),
  * which is exactly why an exporter needs this layer: training consumption
  * demands a total order, and it must be a pure function of the data so a
  * re-run, a re-shard, or a different engine reproduces the same epoch.
  *
  * Order is the md5 of `(key, seed)` — the same engine-portable hash
  * [[graft.operators.Sampling.uniformCol]] uses — so the permutation is
  * uncorrelated across seeds (epoch 0 and epoch 1 share no order) and the
  * oracle can replay it verbatim. Position assignment is the distributed
  * prefix-sum ([[RowIndex.withRowIndex]]): a range shuffle on the hash
  * (balanced by sampling — md5 is uniform, so range bounds are too), never
  * an unpartitioned `row_number()` window; 100 TB sorts in one balanced
  * pass exactly like `orderBy`.
  */
object Sharding {

  /** The engine-portable shuffle sort key: md5 of `"<key>:<seed>"`.
    * DuckDB equivalent: `md5(CAST(k AS VARCHAR) || ':<seed>')` — both
    * engines emit lowercase hex, and hex strings order identically.
    */
  def shuffleKey(key: Column, seed: Long): Column =
    md5(concat(key.cast("string"), lit(":" + seed)))

  /** Appends `posCol`: the row's 0-based position in the deterministic
    * epoch-`seed` permutation of the whole dataset. `key` must be unique
    * per row (it is the identity the permutation is a function of); md5
    * ties — vanishingly rare — break by `key` so the order stays total.
    */
  def epochShuffle(df: DataFrame, key: Column, seed: Long,
      posCol: String = "pos"): DataFrame = {
    val withK = df.withColumn("__shuf", shuffleKey(key, seed))
    RowIndex.withRowIndex(withK, posCol, col("__shuf"), key).drop("__shuf")
  }

  /** Appends `shardCol` (0..worldSize-1) and `ordCol` (the row's 0-based
    * read order within its shard) by round-robin striping the epoch
    * permutation: shard = pos % worldSize, ord = pos DIV worldSize.
    * Striping (vs contiguous blocks) means every shard is a uniform sample
    * of the shuffled order — shard sizes differ by at most one, and rank
    * k's stream is as well-mixed as the global one.
    */
  def shardAssign(df: DataFrame, key: Column, worldSize: Int, seed: Long,
      shardCol: String = "shard", ordCol: String = "ord"): DataFrame = {
    require(worldSize > 0, s"worldSize must be positive, got $worldSize")
    epochShuffle(df, key, seed, "__pos")
      .withColumn(shardCol, (col("__pos") % worldSize).cast("int"))
      .withColumn(ordCol, expr(s"__pos DIV $worldSize"))
      .drop("__pos")
  }

  /** Materialize the epoch's trainer shards as files: one
    * `shard=<k>/` directory per rank, rows inside each part file sorted
    * by read order — the layout a streaming dataloader consumes with
    * zero further shuffling (rank k lists its directory, reads parts in
    * order, and its stream IS the epoch slice).
    *
    * Layout work is one hash repartition on the shard id (all of a
    * rank's rows land in one task — with `worldSize` output tasks this
    * is the minimum possible movement; hash collisions co-locate two
    * ranks in a task, and `partitionBy` still splits them into their own
    * directories) + a per-task sort. No global sort: the epoch position
    * was already assigned by the balanced prefix sum.
    */
  def writeShards(df: DataFrame, key: Column, worldSize: Int, seed: Long,
      path: String): Unit =
    shardAssign(df, key, worldSize, seed)
      .repartition(worldSize, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
