package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size sliding-window document chunking — the context-window
  * splitter every pre-training / RAG ingestion pipeline runs before
  * tokenization (reference scope: the LLM-data-pipeline surface; the
  * reference engine itself stops at row-level text ops).
  *
  * A document's word array is cut into windows of `chunkSize` words
  * advancing by `stride` (stride < chunkSize ⇒ overlapping chunks, the
  * usual RAG setting). Chunk starts are `0, stride, 2·stride, …` while
  * `start < len`, so every word lands in ≥1 chunk and the final partial
  * window is kept.
  *
  * Scale shape: a single narrow `explode` — no shuffle at all. Each input
  * row fans out to ⌈len/stride⌉ rows inside its own partition; output
  * size is (chunkSize/stride)× the corpus, which is the inherent cost of
  * overlap, not a plan artifact. Everything is codegen'd builtins
  * (`split`/`sequence`/`slice`/`array_join`) — no UDFs.
  */
object Chunking {

  /** One row per (doc, chunk): `chunk_idx`, `chunk_text`, `n_tokens`,
    * `start_token`. Tokens are the `split(text, " ")` words — the same
    * tokenization as the shingle/TF-IDF operators, so chunk boundaries
    * line up with the rest of the text stack.
    */
  def slidingWindow(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      chunkSize: Int = 50,
      stride: Int = 40): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be positive")
    require(stride <= chunkSize,
      s"stride $stride > chunkSize $chunkSize would skip words between windows")
    // NULL text behaves like EMPTY text (one empty chunk, ZERO tokens):
    // unguarded, size(null) is NULL and least() SKIPS nulls, so a null
    // doc would emit a phantom chunk claiming n_tokens = chunkSize
    val words: Column =
      coalesce(split(col(textCol), " "), array().cast("array<string>"))
    // sequence() is end-INCLUSIVE: stop at len-1 so the last start is the
    // greatest multiple of stride strictly below len (empty text ⇒ one
    // empty chunk at start 0 rather than a dropped document).
    docs
      .select(col(idCol), words.as("__w"))
      .select(col(idCol), col("__w"),
        posexplode(sequence(lit(0), greatest(size(col("__w")), lit(1)) - 1, lit(stride))))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        array_join(slice(col("__w"), col("col") + 1, lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize), size(col("__w")) - col("col")).cast("long").as("n_tokens"),
        col("col").cast("long").as("start_token"))
  }
}
