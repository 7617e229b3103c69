package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Token-window document chunking with overlap — the retrieval-ingestion
  * primitive (a RAG/embedding pipeline chunks every document into
  * ~fixed-token windows before embedding; overlap keeps boundary context
  * in both neighbors). Deterministic and engine-portable: windows start
  * every `chunkSize - overlap` tokens, the last window may be shorter, a
  * document of ≤ chunkSize tokens yields exactly one window, an empty
  * document none.
  *
  * Columnar end to end: tokens → a `sequence` of window indexes exploded
  * → `slice`/`array_join` per window. One narrow projection + explode —
  * no shuffle, no UDF, no state; 100 TB chunks at scan speed.
  */
object Chunking {

  def chunk(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, overlap: Int,
      chunkIdCol: String = "chunk_id", chunkCol: String = "chunk_text"): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be > 0, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks)
    // ceil((n - chunkSize) / stride) + 1 in pure integer arithmetic (the
    // numerator is >= 0 in the branch it's used, so the double-division
    // floor-by-cast equals integer floor — and the oracle's `//`)
    val nChunks = when(n === 0, lit(0))
      .when(n <= chunkSize, lit(1))
      .otherwise(((n - chunkSize + stride - 1) / lit(stride)).cast("int") + 1)
    val withToks = df.select(col(idCol), toks.as("__t"), nChunks.as("__nc"))
    val idx = explode(when(col("__nc") > 0,
      sequence(lit(0), col("__nc") - 1)).otherwise(array().cast("array<int>")))
    withToks.select(col(idCol), idx.as(chunkIdCol), col("__t"))
      .select(col(idCol), col(chunkIdCol),
        size(slice(col("__t"), col(chunkIdCol) * stride + 1, lit(chunkSize)))
          .as("n_tokens"),
        array_join(slice(col("__t"), col(chunkIdCol) * stride + 1, lit(chunkSize)), " ")
          .as(chunkCol))
  }
}
