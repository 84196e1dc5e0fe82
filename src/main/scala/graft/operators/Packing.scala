package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly — the step that turns a
  * curated corpus into fixed-token-budget training rows. This is the
  * concat-and-chunk scheme (concatenate documents in a deterministic
  * order, cut every `budget` tokens, a document belongs to the chunk
  * where it starts): the standard large-corpus packer, because unlike
  * true bin-packing it needs no sequential fold — chunk assignment is a
  * pure prefix-sum, so it distributes and an external engine can replay
  * it exactly.
  *
  * Packing is per-shard (shard = source, path prefix, …): each shard's
  * token stream is independent, so the only shuffle is the per-shard
  * window sort and shards bound partition size at 100 TB. Within a shard
  * the order is (orderCol, id) — deterministic, and stable under
  * re-partitioning.
  */
object Packing {

  /** Assign each document a (shard, chunk) slot in the concatenated token
    * stream. Adds:
    *  - `n_tokens`   — whitespace token count (the packing weight),
    *  - `start_off`  — the document's first-token offset in its shard's
    *                   concatenated stream (exclusive prefix sum),
    *  - `chunk_id`   — `start_off div budget`: the fixed-size training
    *                   chunk the document starts in.
    * All-integer arithmetic — bit-exact on any engine (q41). */
  def concatChunk(
      docs: DataFrame,
      budget: Long,
      shardCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      // REAL tokens only: the unfiltered split counts the empty artifacts
      // of empty/leading-whitespace text, and a wrong weight here shifts
      // EVERY downstream offset — documents land in the wrong chunk and
      // chunks overflow their token budget (same convention as
      // TextOps.quality/tokenCounts)
      .withColumn("n_tokens",
        size(array_remove(split(col(textCol), "\\s+"), "")).cast("long"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("chunk_id", expr(s"start_off div ${budget}L"))
  }
}
