package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The end-to-end pre-training corpus hygiene pipeline — the composition a
  * large-scale data release actually runs, in canonical stage order:
  *
  *   1. quality gate (length + stopword ratio — cheap columnar predicates)
  *   2. repetition gate (Gopher duplicate-2-gram fraction)
  *   3. exact dedup (digest group; min-id survives, text never shuffles)
  *   4. near-dup dedup (MinHash LSH verified at exact n-gram Jaccard)
  *   5. benchmark decontamination (broadcast n-gram overlap)
  *   6. deterministic sample + train/val/test split labels
  *
  * Stage order is the scale argument: the narrow codegen'd filters (1–2)
  * prune at the scan before anything shuffles; dedup (3–4) pays its
  * shuffles on the reduced corpus; decontamination (5) probes a broadcast
  * set with survivors only; sampling and split labels (6) are free
  * projections. Each stage is individually oracled by its own query
  * (q_quality/q_repetition/q_dedup_exact/q_dedup_minhash/q_decontaminate/
  * q_sample_stratified/q_split); q_pipeline oracles THIS composition.
  */
object PretrainPipeline {

  final case class Config(
      minChars: Int = 150,
      minStopwordRatio: Double = 0.02,
      maxDupBigramFrac: Double = 0.08,
      nearDupThreshold: Double = 0.5,
      decontamNgram: Int = 3,
      decontamMinOverlap: Int = 5,
      sampleFraction: Double = 0.9,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))

  /** Returns (idCol, split) for the documents that survive every stage. */
  def clean(docs: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, cfg: Config = Config()): DataFrame = {
    val text = col(textCol)
    val filtered = docs.where(
      TextFunctions.charCount(text) >= cfg.minChars &&
      TextFunctions.stopwordRatio(text) >= cfg.minStopwordRatio &&
      TextFunctions.duplicateNgramFraction(text, 2) <= cfg.maxDupBigramFrac)
    val exactDeduped = Dedup.exact(filtered, textCol, idCol)
    val nearDeduped = Dedup.minhashLsh(exactDeduped, textCol, idCol,
      w = 3, bands = 16, rowsPerBand = 4, threshold = cfg.nearDupThreshold)
    val contaminated = Dedup.decontaminate(nearDeduped, benchmark, textCol,
      idCol, n = cfg.decontamNgram, minOverlap = cfg.decontamMinOverlap)
      .select(col(idCol))
    val cleanDocs = nearDeduped.join(contaminated, Seq(idCol), "left_anti")
    // sample under a SALTED key: sampling and split membership must be
    // independent uniforms, or the sample would always empty the last split
    val sampleKey = concat(col(idCol).cast("string"), lit(":sample"))
    Sampling.sampled(cleanDocs, sampleKey, cfg.sampleFraction)
      .select(col(idCol), Sampling.splitCol(col(idCol), cfg.splits).as("split"))
  }
}
