package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopKPerGroupPlan, TopKPerGroupStrategy}

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
    // hashable columns only — a map-bearing frame must not fail at
    // analysis when the map plays no role in grouping or ordering
    val saltCol = pmod(Skew.rowSpreadHash(df), lit(salt.toLong))
    val prune = Window.partitionBy(groupCols.map(col) :+ saltCol: _*).orderBy(ordering: _*)
    val fin = Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rk_prune", row_number().over(prune))
      .filter(col("__rk_prune") <= k)
      .drop("__rk_prune")
      .withColumn("rnk", row_number().over(fin).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** The NATIVE whole-operator route (plans/TopKPerGroup): k-bounded heaps
    * instead of sorts, partial pass before the shuffle — O(n log k) and at
    * most k rows per (group × partition) on the wire. Same contract as
    * `topKPerGroup` (the order must be total — include a tiebreak), same
    * output schema (input columns + `rnk`). `orderSpec` is (column,
    * ascending) by name; names resolve through the analyzer like any SQL
    * reference. Installs the planner strategy into the session on first
    * use (also available globally via GraftExtensions). */
  def topKPerGroupNative(
      df: DataFrame,
      groupCols: Seq[String],
      orderSpec: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(groupCols.nonEmpty, "groupCols must be non-empty (a global top-k needs no grouping operator)")
    // the frame's OWN session: the strategy must be installed on the
    // session that plans this frame — SparkSession.active can be a
    // different session entirely in multi-session apps
    val spark = df.sparkSession
    // check-then-append under a lock: two threads hitting first use
    // concurrently would otherwise both append, and extraStrategies is a
    // plain var on ExperimentalMethods with no internal synchronization
    TopK.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    val order = orderSpec.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute.quoted(name), if (asc) Ascending else Descending)
    }
    GraftPlanBridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(UnresolvedAttribute.quoted), order, k,
        df.queryExecution.analyzed))
  }
}
