package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the pretraining/RAG shard step
  * that turns variable-length documents into fixed-token-budget chunks
  * with overlap (so no span longer than `stride` tokens is ever cut
  * without appearing whole in some chunk).
  *
  * Scan-local by construction: the only non-map operator is the explode
  * of per-document chunk ids, whose output size IS the result size
  * (Σ ceil((n−w)/s)+1 ≈ corpus_tokens/stride rows). No shuffle, no
  * state, linear scale-out at 100 TB.
  *
  * Plan-shape note: the chunk ids are exploded FIRST and the token
  * slice is taken in a projection ABOVE the Generate — never inside a
  * `transform` lambda. CollapseProject inlines derived expressions into
  * lambda bodies where referenced (see TextOps.shingles), so a
  * slice-inside-transform re-runs the regex tokenizer once per CHUNK
  * (O(n²/stride) chars per doc); a Generate is a collapse barrier, so
  * here the tokenizer runs once per document.
  */
object Chunking {

  /** Chunk each document into windows of `window` tokens every `stride`
    * tokens (overlap = window − stride). Every doc yields at least one
    * chunk (short docs → one partial chunk). Returns
    * (id, chunk_id, n_chunk_toks, chunk_md5) — the md5 stands in for
    * the chunk text so the result stays skinny while still pinning
    * byte-exact content cross-engine. */
  def chunkSliding(docs: DataFrame, idCol: String, textCol: String,
                   window: Int = 32, stride: Int = 24): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val nChunks = greatest(lit(1),
      ceil((size(col("toks")) - window).cast("double") / stride).cast("int") + 1)
    docs
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col("id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("chunk_id") * stride + 1, lit(window)).as("ch"))
      .select(col("id"), col("chunk_id"),
        size(col("ch")).cast("long").as("n_chunk_toks"),
        md5(array_join(col("ch"), " ")).as("chunk_md5"))
  }
}
