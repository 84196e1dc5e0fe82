package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Channel-level reporting — the reference's one real declarative query
  * (src/etl/reporting.py:57-98,150-167), re-expressed as a single Catalyst
  * plan instead of SQLite-materialize-then-reselect.
  *
  * Pipeline shape (SURVEY §3.3):
  *   attribution ⋈ sessions (J3) ⋈ conversions (J4) → attributed revenue
  *   (P7), channel/date rollup (A2), cost side via sessions ⟕ costs (J5),
  *   revenue-grain ⟕ cost-grain (J6), HAVING with uncorrelated scalar
  *   subquery (A3), cpo/roas projection (P7), ORDER BY (O1).
  *
  * Two cost-join modes:
  *   - `strict` (default): costs are pre-aggregated to (channel, date)
  *     grain BEFORE the join — the scalable, semantically-correct plan.
  *   - `fanout`: reproduces the reference's chasm-trap J6 exactly
  *     (src/etl/reporting.py:91-94 joins session-grain revenue rows to
  *     session-grain cost rows on (channel, date), multiplying each cost by
  *     the number of attribution rows that day and vice versa — the golden
  *     CSVs embody this). Kept behind a flag for parity; do NOT use at
  *     scale (the join output is |rev_rows_per_group| × |cost_rows_per_
  *     group| per channel-day).
  *
  * Determinism: every SUM over doubles goes through an exact DECIMAL cast
  * so partial-aggregation order (Spark) vs single-threaded order (DuckDB
  * oracle) cannot flip low bits; final metrics are cast back to DOUBLE.
  */
object Reporting {

  /** P6: the reference's COALESCE(NULLIF(channel_name,''),'unknown') and
    * date normalization (src/etl/reporting.py:60-63,76-78). */
  def normalizedChannel(c: String): org.apache.spark.sql.Column =
    coalesce(nullif(col(c), lit("")), lit("unknown"))

  private val costDec = DecimalType(18, 2)   // raw costs/revenue have cents grain
  private val ihcDec  = DecimalType(28, 12)  // attribution weights / products

  /** Exact-decimal sum emitted as a DOUBLE both engines convert
    * identically. The DECIMAL(38,12) sum is rescaled HALF_UP to scale 6
    * first so the unscaled value stays below 2^53: past that, an engine
    * converting decimal→double via (double)unscaled / 10^scale (DuckDB's
    * int128 path) lands one ulp away from a correctly-rounded conversion
    * (Spark's BigDecimal path) — measured as 1-ulp mismatches on sums
    * ≥ ~10^4 at sf0.1. The oracle mirrors the HALF_UP rescale as
    * truncate(sum + 0.0000005), since its decimal→decimal cast truncates. */
  private def sumExact(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(ihcDec)).cast(DecimalType(28, 6)).cast("double")

  /** The channel/date rollup (A2+J3..J6+A3). `attribution` must carry
    * (conversion_id, session_id, ihc); `sessions` the channel/date/cost;
    * `conversions` the revenue. */
  def channelReport(
      attribution: DataFrame,
      sessions: DataFrame,
      conversions: DataFrame,
      fanout: Boolean = false,
      excludeChannel: String = "unknown"): DataFrame = {

    // J3/J4: attribution rows decorated with channel/date and revenue.
    // Project attribution down to its key+measure first: callers often pass
    // the full journey frame and duplicate-name columns would collide.
    val ar = attribution
      .select(col("conversion_id"), col("session_id"), col("ihc"))
      .join(sessions.select(
        col("session_id"),
        normalizedChannel("channel_name").as("channel_name"),
        date_format(col("session_ts"), "yyyy-MM-dd").as("date")),
        Seq("session_id"))
      .join(conversions.select(col("conv_id").as("conversion_id"), col("revenue")),
        Seq("conversion_id"))
      .withColumn("attributed_revenue", col("revenue") * col("ihc"))

    // Cost side (J5 analogue): session-grain channel/date/cost rows.
    val costRows = sessions.select(
      normalizedChannel("channel_name").as("channel_name"),
      date_format(col("session_ts"), "yyyy-MM-dd").as("date"),
      coalesce(col("cost"), lit(0.0)).as("cost"))

    // A3: uncorrelated scalar subquery — Catalyst executes it once and
    // broadcasts the literal (reference: reporting.py:97's
    // `(SELECT MIN(conv_date) FROM conversions)`).
    val minDate = conversions.agg(
      date_format(min(col("conv_ts")), "yyyy-MM-dd").as("d"))

    val grouped =
      if (fanout) {
        // Reference-faithful J6: session-grain × session-grain join on
        // (channel, date), THEN aggregate — the double-counting the golden
        // CSVs bake in.
        ar.join(costRows, Seq("channel_name", "date"), "left")
          .groupBy(col("channel_name"), col("date"))
          .agg(
            sum(coalesce(col("cost"), lit(0.0)).cast(costDec)).cast("double").as("cost"),
            sumExact(col("ihc")).as("ihc"),
            sumExact(col("attributed_revenue")).as("ihc_revenue"))
      } else {
        // Strict mode: aggregate each grain first, then a (channel, date)
        // equi left join of two already-small aggregates.
        val revAgg = ar
          .groupBy(col("channel_name"), col("date"))
          .agg(
            sumExact(col("ihc")).as("ihc"),
            sumExact(col("attributed_revenue")).as("ihc_revenue"))
        val costAgg = costRows
          .groupBy(col("channel_name"), col("date"))
          .agg(sum(col("cost").cast(costDec)).cast("double").as("cost"))
        revAgg
          .join(costAgg, Seq("channel_name", "date"), "left")
          .select(
            col("channel_name"), col("date"),
            coalesce(col("cost"), lit(0.0)).as("cost"),
            col("ihc"), col("ihc_revenue"))
      }

    grouped
      .join(minDate)
      .filter(col("channel_name") =!= excludeChannel && col("date") >= col("d"))
      .drop("d")
  }

  /** P7 + O1: the export projection with CPO / ROAS
    * (src/etl/reporting.py:150-167). */
  def exportReport(report: DataFrame): DataFrame =
    report
      .withColumn(
        "cpo",
        when(col("ihc") > 0, col("cost") / col("ihc")).otherwise(lit(0.0)))
      .withColumn(
        "roas",
        when(col("cost") > 0, col("ihc_revenue") / col("cost")).otherwise(lit(0.0)))
      .orderBy(col("channel_name"), col("date"))
}
