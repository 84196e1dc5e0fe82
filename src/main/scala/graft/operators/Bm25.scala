package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 retrieval scoring — rank a corpus against a bag-of-words query
  * (Robertson/Okapi BM25, the lexical-retrieval baseline every RAG /
  * training-data-curation stack keeps next to its embedding ANN path).
  *
  *   score(D,Q) = Σ_{t∈Q} idf(t) · tf(t,D)·(k1+1)
  *                         / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
  *   idf(t)     = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))
  *
  * Scale shape: the token explode is narrow; `tf` is filtered to the
  * query's terms BEFORE its groupBy, so only matching (doc, term) pairs
  * shuffle — the full token stream never does. `df` aggregates the same
  * filtered stream; per-document length is a zero-shuffle array
  * expression; N/avgdl cross as a broadcast 1-row frame and the tiny
  * per-term df table broadcasts into the scoring join. Net: ONE shuffle
  * of query-matching pairs plus a TakeOrderedAndProject for the top-k —
  * no global sort.
  *
  * Determinism: per-term scores are rounded to 9 decimals before the
  * per-document sum (1-ulp `ln` differences between engines can't leak
  * into the hash), and the sum itself is an exact DECIMAL(28,12)
  * aggregate, so summation order is irrelevant. (doc_id) tiebreak makes
  * the top-k cut total.
  */
object Bm25 {

  def score(
      docs: DataFrame,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topN: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // SET semantics over the query, stated loudly: the isin + per-token
    // groupBy collapse multiplicity anyway, so a repeated term would be
    // silently deduplicated — dedupe explicitly and reject degenerate
    // terms ("" would match the empty artifacts split() emits on doubled
    // spaces, scoring a "term" that dl deliberately excludes)
    val terms = queryTerms.distinct
    require(terms.forall(t => t != null && t.nonEmpty),
      "queryTerms must not contain null or empty strings")
    // null-id docs cannot ride the scoring join (and merging them into
    // one pseudo-doc would be worse) — exclude them from scoring AND the
    // N/avgdl stats consistently, rather than counting them in one and
    // dropping them from the other
    val scoped = docs.filter(col(idCol).isNotNull)
    val words: Column = split(col(textCol), " ")
    // |D| in non-empty words — a narrow per-row expression, no shuffle
    val withDl = scoped.select(
      col(idCol),
      size(filter(words, w => w =!= "")).cast("long").as("dl"))

    val toks = scoped
      .select(col(idCol), explode(words).as("token"))
      .filter(col("token").isin(terms: _*)) // pushed below the shuffle

    // r21: df derives FROM tf IN-PLANE — tf rows are exactly the distinct
    // (id, token) pairs of the term-filtered stream (ids non-null via
    // `scoped`), so `count(id) over (partition by token)` on tf ≡
    // `countDistinct(id)` per token over the raw stream. The window
    // spelling keeps ONE tokenize-explode chain (previously df re-ran the
    // full corpus explode) and shuffles only the tiny ≤ |docs|·|terms| tf
    // table — measured faster than both the two-chain original and a
    // checkpointed-tf variant (guide §2.3/§2.4).
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .withColumn("df",
        count(col(idCol)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("token"))))
    val stats = withDl.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl"))

    val nd = col("n_docs").cast("double")
    val dfd = col("df").cast("double")
    val tfd = col("tf").cast("double")
    val dld = col("dl").cast("double")
    val avgdl = col("total_dl").cast("double") / nd
    val idf = log(lit(1.0) + (nd - dfd + lit(0.5)) / (dfd + lit(0.5)))
    val tfNorm = (tfd * lit(k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dld / avgdl))

    tf
      .join(withDl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("term_score", round(idf * tfNorm, 9))
      .groupBy(col(idCol))
      .agg(
        sum(col("term_score").cast(org.apache.spark.sql.types.DecimalType(28, 12)))
          .cast("double").as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topN)
  }
}
