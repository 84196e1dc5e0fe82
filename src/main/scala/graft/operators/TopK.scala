package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k for LOW-CARDINALITY groups — "best k documents per
  * language" style curation cuts.
  *
  * The naive plan (one window rank partitioned by the group key) shuffles
  * the ENTIRE corpus onto |groups| reducers: with 5 languages over 100 TB
  * that is 5 tasks sorting 20 TB each — the canonical low-cardinality
  * window skew. This operator runs the standard two-level refinement
  * instead:
  *
  *   1. prune: rank within (group, salt) — `salt` even sub-partitions per
  *      group, derived from a deterministic row hash — and keep k rows per
  *      sub-partition. Any row in a group's global top-k is by definition
  *      in the top-k of whichever sub-partition holds it, so the prune is
  *      lossless; it just caps each reducer at its share of the group.
  *   2. final: rank the ≤ k·salt survivors per group with the real window
  *      — now a trivially small sort.
  *
  * Two shuffles, but the first is even (salt-spread) and the second moves
  * ≤ k·salt·|groups| rows. The `ordering` must be a TOTAL order (include
  * a unique tiebreak column) — otherwise which of two order-equal rows
  * survives stage 1 is partition-dependent.
  */
object TopK {

  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      ordering: Seq[Column],
      k: Int,
      salt: Int = 64): DataFrame = {
    require(k > 0, "k must be positive")
    require(salt > 0, "salt must be positive")
    val saltCol = pmod(xxhash64(df.columns.map(col): _*), lit(salt.toLong))
    val prune = Window.partitionBy(groupCols.map(col) :+ saltCol: _*).orderBy(ordering: _*)
    val fin = Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rk_prune", row_number().over(prune))
      .filter(col("__rk_prune") <= k)
      .drop("__rk_prune")
      .withColumn("rnk", row_number().over(fin).cast("long"))
      .filter(col("rnk") <= k)
  }
}
