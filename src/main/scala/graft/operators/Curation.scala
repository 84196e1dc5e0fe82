package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline a pre-training data run
  * actually executes — exact dedup, language ID, quality gating, token
  * accounting — composed from the individual operators into one
  * declarative plan so Catalyst fuses the narrow stages.
  *
  * Plan shape at 100 TB: ONE shuffle on the content fingerprint (dedup),
  * then langid / quality / token counting are all narrow codegen'd maps
  * over the survivors, then ONE partial-aggregated rollup shuffle on the
  * (low-cardinality) predicted language. Ratio metrics aggregate as exact
  * integer sums and divide once at the end — never an average of per-row
  * doubles — so results are partial-aggregation-order independent and
  * bit-reproducible (q39).
  */
object Curation {

  /** Keep the lowest-doc_id copy of each whitespace-normalized content
    * fingerprint. Window `row_number`, not groupBy+self-join: one shuffle,
    * no second pass over the corpus. */
  def dedupCanonical(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))
    val fp = TextOps.fingerprint(docs, textCol)
    // NULL-text docs have a NULL fingerprint — the window would lump them
    // ALL into one partition and keep a single "canonical" copy of content
    // that was never compared; they pass through undeduped. They ride a
    // SEPARATE union branch (not an isNull disjunct inside the rank
    // filter): a disjunct defeats Catalyst's WindowGroupLimit pushdown, so
    // every duplicate row would flow through the full sort/window instead
    // of being pruned to top-1 per fingerprint before the exchange. The
    // branches split on the TEXT column, not the fingerprint: the md5/
    // trim/regexp/lower chain is null-intolerant, so fingerprint is null
    // iff text is null — and IsNull/IsNotNull on the stored column pushes
    // into the parquet scan (null-count row-group stats skip the null
    // branch almost entirely), where isnull(md5(...)) would re-decode the
    // whole text column a second time.
    fp.filter(col(textCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .unionByName(fp.filter(col(textCol).isNull))
  }

  /** Full curation rollup: dedup → langid → quality gate
    * (`quality_score > 0`, i.e. ≥5 words and sane word lengths) → per-
    * (predicted language, source) corpus accounting — the grain a data-mix
    * plan is written against — with doc/token totals and the aggregate
    * stopword ratio. */
  def curate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val gated = TextOps.tokenCounts(
      TextOps.quality(TextOps.langId(dedupCanonical(docs, textCol), textCol), textCol),
      textCol)
      .filter(col("quality_score") > 0.0)
    gated
      .groupBy(col("predicted_lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_ish_tokens")).as("total_bpe_tokens"),
        sum(col("n_words")).as("total_words"),
        sum(col("n_stopwords")).as("total_stopwords"),
        (sum(col("n_stopwords")).cast("double") / sum(col("n_words")).cast("double"))
          .as("corpus_stopword_ratio"))
  }
}
