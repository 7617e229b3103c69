package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Deduplication operators for training-data pipelines, each designed around
  * its 100 TB shuffle shape:
  *
  *  - exact:   one hash-aggregate on a 16-byte digest (never shuffles the
  *             document text itself).
  *  - minhash: shingle → minhash signature (narrow) → band explosion →
  *             equi-join on (band, bandHash) → verified pairs. The classic
  *             MinHash+LSH pipeline; shuffle volume is #docs × #bands tiny
  *             rows, not text.
  *  - simhash: 64-bit signature, banded for hamming radius, verified by
  *             bit_count — candidate generation is again an equi-join.
  *  - ngram jaccard: exact verification metric used by the candidate stages.
  *  - embedding: cosine near-dup via random-hyperplane LSH buckets.
  *
  * "Drop" policy everywhere: the member with the SMALLEST id survives; a doc
  * is dropped if any candidate duplicate with a smaller id verifies. (Single
  * LSH pass, no transitive closure — the standard large-scale choice; full
  * connected components would need an iterative join.)
  */
object Dedup {

  /** Exact dedup: group rows by digest of `textCol`, keep the row with the
    * minimum `idCol`. Hashing first means the wide text column never enters
    * the shuffle: only (digest, id) pairs move.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df
      .select(col(idCol), md5(col(textCol)).as("__digest"))
      .groupBy(col("__digest")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Exact dedup on the NORMALIZED text (case/punct/whitespace folded). */
  def exactNormalized(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df
      .select(col(idCol), TextFunctions.fingerprintMd5(col(textCol)).as("__digest"))
      .groupBy(col("__digest")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash signature of the token w-shingle set: `numHashes` permutations
    * via the splitmix64 xor-multiply family over the shingle's 64-bit hash.
    * Returns array<long> of length numHashes.
    */
  def minhashSignature(textCol: Column, w: Int, numHashes: Int): Column = {
    val shingles = udf((s: String) => TextFunctions.shingleHashes(s, w)).apply(textCol)
    // minhash_i = min over shingles of xxhash64(seed_i, shingle) — built-in,
    // codegen'd, and ANSI-safe (no overflowing arithmetic in the plan)
    array((0 until numHashes).map { i =>
      aggregate(shingles, lit(Long.MaxValue),
        (acc, h) => least(acc, xxhash64(lit(i.toLong), h)))
    }: _*)
  }

  /** Candidate duplicate pairs via MinHash + LSH banding: signature split
    * into `bands` bands of `rowsPerBand`; docs sharing any band hash are
    * candidates. Returns (idA, idB) with idA < idB, deduplicated.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      w: Int = 3, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = df.select(col(idCol),
      minhashSignature(col(textCol), w, numHashes).as("__sig"))
    val banded = sig.select(col(idCol), posexplode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("__sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))).as(Seq("__band", "__bandhash")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col("a.__band") === col("b.__band") &&
        col("a.__bandhash") === col("b.__bandhash") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Full MinHash-LSH dedup: docs dropped when a candidate with smaller id
    * verifies at `threshold` exact n-gram Jaccard.
    */
  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
      w: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val cands = minhashCandidates(df, textCol, idCol, w, bands, rowsPerBand)
    val verified = verifyJaccard(df, cands, textCol, idCol, w, threshold)
    val drop = verified.select(col("id_b").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Exact token-w-shingle Jaccard for candidate pairs (the verification
    * stage): joins the shingle sets back per side — only candidate rows pay
    * the set cost.
    */
  def verifyJaccard(df: DataFrame, pairs: DataFrame, textCol: String,
      idCol: String, w: Int, threshold: Double): DataFrame = {
    val sh = df.select(col(idCol),
      array_distinct(udf((s: String) => TextFunctions.shingleHashes(s, w)).apply(col(textCol))).as("__sh"))
    pairs
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("__sh", "__sh_a"), "id_a")
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("__sh", "__sh_b"), "id_b")
      .withColumn("__inter", size(array_intersect(col("__sh_a"), col("__sh_b"))))
      .withColumn("__union", size(col("__sh_a")) + size(col("__sh_b")) - col("__inter"))
      .withColumn("jaccard", when(col("__union") > 0,
        col("__inter").cast("double") / col("__union")).otherwise(lit(1.0)))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup: 64-bit signatures; candidates share at least one of
    * four 16-bit bands (guaranteed complete for hamming distance <= 3 by
    * pigeonhole); verified with bit_count XOR <= maxHamming.
    */
  def simhash(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol), TextFunctions.simhashUdf(col(textCol)).as("__sim"))
    val banded = sig.select(col(idCol), col("__sim"), posexplode(array(
      (0 until 4).map(b => shiftrightunsigned(col("__sim"), b * 16).bitwiseAND(lit(0xffffL))): _*
    )).as(Seq("__band", "__bandval")))
    val a = banded.as("a"); val b = banded.as("b")
    val cands = a.join(b,
        col("a.__band") === col("b.__band") &&
        col("a.__bandval") === col("b.__bandval") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.__sim").as("__sim_a"), col("b.__sim").as("__sim_b"))
      .distinct()
    val drop = cands
      .where(TextFunctions.hammingDistance64(col("__sim_a"), col("__sim_b")) <= maxHamming)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Embedding cosine near-dup: random-hyperplane LSH buckets → in-bucket
    * pairs → exact cosine >= threshold drops the larger id. `nBits` trades
    * recall for bucket size (16 bits → ~dim/65k per bucket at scale).
    */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
      dim: Int, threshold: Double = 0.95, nBits: Int = 12): DataFrame = {
    val withBucket = df.select(col(idCol), col(vecCol),
      VectorFunctions.lshBucket(col(vecCol), dim, nBits).as("__bucket"))
    val a = withBucket.as("a"); val b = withBucket.as("b")
    val drop = a.join(b,
        col("a.__bucket") === col("b.__bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .where(VectorFunctions.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")) >= threshold)
      .select(col(s"b.$idCol").as(idCol)).distinct()
    df.join(drop, Seq(idCol), "left_anti")
  }
}
