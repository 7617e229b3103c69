package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Laws for deterministic epoch shuffling and trainer shard assignment:
  * the permutation matches an independent local md5-sort model, shards
  * stripe it exactly, and different seeds decorrelate.
  */
class ShardingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val ids: Seq[Long] = (0L until 257L)

  test("epochShuffle positions are the local md5-sort permutation") {
    val got = Sharding.epochShuffle(ids.toDF("id"), col("id"), seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ids.sortBy(i => (md5Hex(s"$i:7"), i)).zipWithIndex
      .map { case (i, p) => i -> p.toLong }.toMap
    assert(got == want)
  }

  test("epochShuffle is a total 0..n-1 permutation, stable across runs, seed-sensitive") {
    val a = Sharding.epochShuffle(ids.toDF("id"), col("id"), seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sharding.epochShuffle(ids.toDF("id"), col("id"), seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = Sharding.epochShuffle(ids.toDF("id"), col("id"), seed = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.values.toSeq.sorted == (0L until ids.size.toLong))
    assert(a == b, "same seed must reproduce the same permutation")
    assert(a != c, "different seeds must permute differently")
    // decorrelated, not shifted: a meaningful fraction of ids move
    assert(ids.count(i => a(i) != c(i)) > ids.size / 2)
  }

  test("shardAssign stripes the epoch permutation: sizes within 1, orders contiguous") {
    val w = 8
    val got = Sharding.shardAssign(ids.toDF("id"), col("id"), w, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val pos = Sharding.epochShuffle(ids.toDF("id"), col("id"), seed = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact striping law: shard = pos % w, ord = pos / w
    got.foreach { case (id, shard, ord) =>
      assert(shard == (pos(id) % w).toInt && ord == pos(id) / w,
        s"id $id: ($shard, $ord) != stripe of pos ${pos(id)}")
    }
    val sizes = got.groupBy(_._2).view.mapValues(_.length).values.toSeq
    assert(sizes.size == w && (sizes.max - sizes.min) <= 1)
    // each shard reads ord = 0,1,2,... with no gaps
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length.toLong))
    }
  }

  test("writeShards lays out one ord-sorted directory per rank, union = input") {
    val w = 4
    val tmp = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Sharding.writeShards(ids.toDF("id"), col("id"), w, seed = 5L, tmp)
    val dirs = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.map(_.getName).toSet == (0 until w).map(i => s"shard=$i").toSet)
    val expect = Sharding.shardAssign(ids.toDF("id"), col("id"), w, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._2)
    dirs.foreach { d =>
      val shard = d.getName.stripPrefix("shard=").toInt
      // one part file per rank: the dataloader's sequential-read contract
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName}: ${parts.length} part files")
      val rows = spark.read.parquet(d.getAbsolutePath)
        .select("id", "ord").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq,
        s"${d.getName} not ord-sorted on disk")
      assert(rows.toSet == expect(shard).map(t => (t._1, t._3)).toSet)
    }
  }

  test("shardAssign rejects a non-positive world size") {
    intercept[IllegalArgumentException] {
      Sharding.shardAssign(ids.toDF("id"), col("id"), 0, seed = 1L)
    }
  }
}
