package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k against a single query vector —
  *    a narrow scan + TakeOrdered; the correctness baseline. O(N·d), no
  *    shuffle beyond the final top-k reduction.
  *  - [[bruteForceTopKJoin]]: exact top-k for a *set* of query vectors — the
  *    queries are broadcast, each partition scores locally, per-query top-k
  *    via window rank. Exact but O(N·Q·d): only for small Q.
  *  - [[lshTopK]]: the scale path — random-hyperplane LSH with multi-probe
  *    (flip up to `probes` bits), so candidate generation is an equi-join on
  *    bucket id: per query only ~N/2^bits × probes vectors are scored. At
  *    100 TB this is the difference between a cross join and a keyed join.
  *  - [[ivfTopK]]: IVF-style variant — coarse centroids picked
  *    deterministically, vectors assigned to nearest centroid (the inverted
  *    file), queries probe the `nProbe` nearest centroids only.
  */
object Similarity {

  /** Exact cosine top-k of `df`'s `vecCol` against one literal query vector.
    * Plans as scan → project(cosine) → TakeOrderedAndProject: no shuffle of
    * the vectors, only k rows leave each partition.
    */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val qCol = array(query.map(lit(_)): _*)
    df.select(col(idCol),
        round(VectorFunctions.cosine(col(vecCol), qCol), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Exact per-query top-k for a query table (broadcast). */
  def bruteForceTopKJoin(df: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String, k: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(queries))
      .withColumn("cosine_sim", round(VectorFunctions.cosine(col(vecCol), col(qVecCol)), 6))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cosine_sim").desc, col(idCol))
    scored.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .select(col(qIdCol), col(idCol), col("cosine_sim"))
  }

  /** LSH-bucketed ANN top-k: both sides bucketed by sign-hyperplane LSH;
    * queries multi-probe their bucket plus all buckets at hamming distance 1
    * (flip each of nBits). Recall is tunable via nBits/probes; exactness is
    * NOT guaranteed — compare against bruteForce in tests.
    */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      dim: Int, k: Int, nBits: Int = 10, probeHamming1: Boolean = true): DataFrame = {
    val data = df.withColumn("__bucket",
      VectorFunctions.lshBucket(col(vecCol), dim, nBits))
    val qBucketed = queries.withColumn("__qbucket",
      VectorFunctions.lshBucket(col(qVecCol), dim, nBits))
    // multi-probe: original bucket + hamming-1 neighbors
    val probed =
      if (!probeHamming1) qBucketed.withColumn("__bucket", col("__qbucket"))
      else qBucketed.withColumn("__bucket",
        explode(array((lit(-1) +: (0 until nBits).map(lit(_))): _*)))
        .withColumn("__bucket",
          when(col("__bucket") === -1, col("__qbucket"))
            .otherwise(col("__qbucket").bitwiseXOR(pow(lit(2.0), col("__bucket").cast("int")).cast("long"))))
    val cands = data.join(broadcast(probed), Seq("__bucket"))
      .withColumn("cosine_sim", round(VectorFunctions.cosine(col(vecCol), col(qVecCol)), 6))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cosine_sim").desc, col(idCol))
    cands.withColumn("__rank", row_number().over(w))
      .where(col("__rank") <= k)
      .select(col(qIdCol), col(idCol), col("cosine_sim"))
  }

  /** IVF: deterministic coarse quantizer (every (N/nCentroids)-th vector by
    * id order seeds a centroid), invert the file by nearest centroid, probe
    * the nProbe nearest lists per query. One extra narrow join vs brute
    * force; candidate set shrinks by ~nCentroids/nProbe.
    */
  def ivfTopK(spark: SparkSession, df: DataFrame, vecCol: String, idCol: String,
      queries: DataFrame, qVecCol: String, qIdCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    // deterministic centroid seeds: rank by id, take evenly spaced rows
    val n = df.count()
    val step = math.max(n / nCentroids, 1L)
    val w0 = Window.orderBy(col(idCol))
    val centroids = df
      .withColumn("__rn", row_number().over(w0))
      .where((col("__rn") - 1) % step === 0 && col("__rn") <= step * nCentroids)
      .select(((col("__rn") - 1) / step).cast("int").as("__cid"), col(vecCol).as("__cvec"))
    val cB = broadcast(centroids)

    // assign every vector to its nearest centroid (narrow: centroids broadcast)
    val wAssign = Window.partitionBy(col(idCol)).orderBy(col("__cdist"))
    val assigned = df.crossJoin(cB)
      .withColumn("__cdist", -VectorFunctions.cosine(col(vecCol), col("__cvec")))
      .withColumn("__r", row_number().over(wAssign)).where(col("__r") === 1)
      .select(col(idCol), col(vecCol), col("__cid"))

    // queries probe nProbe nearest centroids
    val wProbe = Window.partitionBy(col(qIdCol)).orderBy(col("__cdist"))
    val probes = queries.crossJoin(cB)
      .withColumn("__cdist", -VectorFunctions.cosine(col(qVecCol), col("__cvec")))
      .withColumn("__r", row_number().over(wProbe)).where(col("__r") <= nProbe)
      .select(col(qIdCol), col(qVecCol), col("__cid"))

    val cands = assigned.join(broadcast(probes), Seq("__cid"))
      .withColumn("cosine_sim", round(VectorFunctions.cosine(col(vecCol), col(qVecCol)), 6))
    val wTop = Window.partitionBy(col(qIdCol)).orderBy(col("cosine_sim").desc, col(idCol))
    cands.withColumn("__rank", row_number().over(wTop))
      .where(col("__rank") <= k)
      .select(col(qIdCol), col(idCol), col("cosine_sim"))
  }
}
