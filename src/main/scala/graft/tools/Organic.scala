package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Organic N-x scale-up: keep the base table and SYNTHESIZE the remaining
  * (N-1)x rows as fresh independent samples from the same distribution
  * family — the honest complement to the self-union scheme (which turns
  * every document/vector into an N-way near-duplicate and so inflates
  * dedup/similarity pair volumes superlinearly by design). Every sampled
  * field is a pure function of (row id, salt) via xxhash64: deterministic,
  * fully distributed (`spark.range` → expressions), nothing collected to
  * the driver beyond tiny vocab/metadata arrays.
  */
object Organic {

  private def pick(arr: Array[String], h: org.apache.spark.sql.Column) =
    element_at(array(arr.map(lit): _*), (pmod(h, lit(arr.length)) + 1).cast("int"))

  /** Fresh documents drawn from the base corpus vocabulary AT THE BASE'S
    * OBSERVED TOKEN FREQUENCIES; lang/source sampled from the base's
    * observed values; 8..100 words to match the base generator's
    * 47..558-char envelope.
    *
    * Frequency preservation is the point (round-14 fix): a uniform draw
    * over the vocabulary makes EVERY token common as the corpus grows —
    * a token at 5% document frequency in the base lands in
    * ~1-(1-1/|V|)^len ≈ 70% of synthetic docs — which silently reshapes
    * the corpus the scale ratios claim to measure (df-dependent
    * operators like BM25/WAND, langid, n-gram stats all see a different
    * distribution at 10x than at 1x). Sampling tokens proportionally to
    * their observed counts keeps per-token document-frequency FRACTIONS
    * scale-invariant, which is what "fresh samples from the same
    * distribution family" must mean for text.
    */
  def docs(spark: SparkSession, base: DataFrame, factor: Int): DataFrame = {
    val n0 = base.count()
    // driver-side sample bounded even against a real-text corpus: the most
    // frequent 4096 tokens are plenty to synthesize in-distribution filler
    val vocabCounts = base.select(explode(split(col("text"), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("w")).limit(4096)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // frequency-preserving sampler: expand tokens into slots proportional
    // to their share of the sampled-vocab mass (~8192 slots ⇒ shares kept
    // to ~0.01%; every sampled token keeps ≥ 1 slot so none vanish); a
    // uniform hashed pick over slots IS a weighted pick over tokens.
    // Fidelity bound, stated honestly: the preservation is ABSOLUTE
    // (per-token df fractions held to ~1/8192 ≈ 0.012% of mass), not
    // RELATIVE — a tail token whose true share is far below 1/8192 is
    // oversampled by a large relative factor via the 1-slot floor, and
    // tokens beyond rank 4096 vanish entirely. Rare-token-sensitive
    // scale ratios (the WAND θ floor above all) therefore read the tail
    // as slightly denser than a true resample would; the common-token
    // mass, which dominates every df-dependent operator's cost, is
    // faithful to the bound above.
    val mass = vocabCounts.map(_._2).sum.toDouble
    val slots: Array[String] = vocabCounts.flatMap { case (w, n) =>
      Array.fill(math.max(1L, math.round(n / mass * 8192)).toInt)(w)
    }
    val langs = base.select(col("lang")).distinct().collect().map(_.getString(0)).sorted
    val srcs = base.select(col("source")).distinct().collect().map(_.getString(0)).sorted
    val fresh = spark.range(n0, n0 * factor).toDF("doc_id")
      .withColumn("__len", pmod(xxhash64(col("doc_id"), lit("len")), lit(93)) + 8)
      .withColumn("text", array_join(transform(
        sequence(lit(0), col("__len") - 1),
        i => pick(slots, xxhash64(col("doc_id"), i, lit("w")))), " "))
      .withColumn("lang", pick(langs, xxhash64(col("doc_id"), lit("lang"))))
      .withColumn("source", pick(srcs, xxhash64(col("doc_id"), lit("src"))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__len")
    base.unionByName(fresh.select(base.columns.map(col): _*))
  }

  /** Fresh unit vectors around the base's label-centroid mixture: centroid
    * components hash off the LABEL (shared within a cluster), noise off the
    * id, then L2-normalize — matching the base's unit-norm contract so
    * cosine thresholds mean the same thing on the synthetic rows.
    */
  def embeddings(spark: SparkSession, base: DataFrame, factor: Int): DataFrame = {
    val n0 = base.count()
    val dim = base.selectExpr("size(embedding) AS d").head().getInt(0)
    val nLabels = base.select(countDistinct(col("label"))).head().getLong(0).toInt
    val fresh = spark.range(n0, n0 * factor).toDF("vec_id")
      .withColumn("label", pmod(xxhash64(col("vec_id"), lit("lbl")), lit(nLabels)).cast("int"))
      .withColumn("__raw", transform(sequence(lit(0), lit(dim - 1)), j =>
        (pmod(xxhash64(col("label"), j, lit("c")), lit(2001)) / 1000.0 - 1.0) +
        (pmod(xxhash64(col("vec_id"), j, lit("n")), lit(2001)) / 1000.0 - 1.0) * 0.5))
      .withColumn("__ss", sqrt(aggregate(col("__raw"), lit(0.0), (a, x) => a + x * x)))
      .withColumn("embedding", transform(col("__raw"), x => (x / col("__ss")).cast("float")))
      .drop("__raw", "__ss")
    base.unionByName(fresh.select(base.columns.map(col): _*))
  }

  /** Fresh events over an N-x user space and the base time window — more
    * users, not the same users replayed. Expects (and returns) the
    * canonical nanos-Long `ts` (callers normalize the base through
    * [[graft.sources.EventTime]] first).
    */
  def events(spark: SparkSession, base: DataFrame, factor: Int): DataFrame = {
    val n0 = base.count()
    val nUsers = base.select(countDistinct(col("user_id"))).head().getLong(0)
    val types = base.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted
    val row = base.agg(min("ts"), max("ts")).head()
    val (tsMin, tsMax) = (row.getLong(0), row.getLong(1))
    val fresh = spark.range(n0, n0 * factor).toDF("event_id")
      .withColumn("user_id", pmod(xxhash64(col("event_id"), lit("u")), lit(nUsers * factor)))
      .withColumn("ts", lit(tsMin) +
        pmod(xxhash64(col("event_id"), lit("t")), lit(tsMax - tsMin + 1)))
      .withColumn("event_type", pick(types, xxhash64(col("event_id"), lit("e"))))
      .withColumn("value",
        round(pmod(xxhash64(col("event_id"), lit("v")), lit(20000)) / 100.0, 2))
      .withColumn("props", concat(lit("{\"k\": "),
        pmod(xxhash64(col("event_id"), lit("k")), lit(100)), lit("}")))
    base.unionByName(fresh.select(base.columns.map(col): _*))
  }
}
