package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) joins in both directions. `backward`: for each
  * left row, the LATEST right row with the same key and
  * `right.time <= left.time`, plus the count of all such prior rows;
  * `forward` mirrors it (earliest at-or-after + `n_next`).
  *
  * The reference's journey join keeps ALL prior sessions per conversion
  * (reference: src/etl/transform.py:229-238); the as-of join is its
  * latest-only sibling (SURVEY.md §2.3 J1 "as-of-style"), the operator a
  * feature-store / last-touch pipeline needs and Spark lacks natively.
  *
  * Implementation is the scalable union-and-carry shape, not a per-key
  * lookup: tag both sides, union them, shuffle ONCE on the key, sort each
  * partition by (time, tag), then a running `last(payload, ignoreNulls)`
  * window carries the freshest right payload forward onto every left row.
  * Cost at 100 TB: one exchange + one sort over |L|+|R| rows — identical to
  * a sort-merge join's shuffle — with no build-side materialization, no
  * per-key quadratic scan, and both the carried payload and the prior-count
  * computed in the SAME window pass (one physical Window operator).
  * Skewed keys shard like any sort shuffle; the window state is O(1) per
  * partition (running last + running count).
  */
object AsofJoin {

  /** @param left     probe side; all its columns survive
    * @param right    build side; `payload` columns are carried onto left rows
    * @param key      equi-key column name, present on both sides
    * @param time     event-time column name, present on both sides
    * @param payload  right columns to carry (emitted as `asof_<name>`);
    *                 `time` itself is always carried as `asof_<time>`
    *
    * Matching is inclusive (`right.time <= left.time`): at equal times the
    * right row sorts first (tag 0 < tag 1). Equal-time right rows tie-break
    * by the payload struct itself (largest wins), so the result is fully
    * deterministic. Left rows with no prior right row get null payload and
    * `n_prior = 0`.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String] = Nil): DataFrame =
    unionCarry(left, right, key, time, payload, fwd = false)

  /** Backward as-of join with a tolerance (pandas `merge_asof(tolerance=…)`):
    * the carried payload is the latest prior right row ONLY if it lies
    * within `toleranceUs` microseconds of the left row's time, and
    * `n_prior` counts just the right rows inside
    * `[left.time − tolerance, left.time]`. The feature-store freshness
    * variant: a signal older than the SLA is no signal at all.
    *
    * Same single-exchange union-and-carry plan as [[backward]]; the
    * tolerance adds one value-range window (`rangeBetween(-tol, 0)` over
    * epoch-micros) for the bounded count plus a null-out on the stale
    * carry. The range window re-sorts within the SAME hash partitions —
    * no second exchange — and its state is O(1) per partition. Requires a
    * TimestampType `time` column (the range frame runs on `unix_micros`).
    */
  def backwardWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String] = Nil,
      toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"asof tolerance must be >= 0 us: $toleranceUs")
    val (tagged, carriedCols) = unionTagged(left, right, key, time, payload,
      rightTag = 0, leftTag = 1, extraReserved = Set("__n", "__tm", "n_prior"))
    val all = tagged.withColumn("__tm", unix_micros(col(time)))
    val rowsW = Window.partitionBy(key)
      .orderBy(col(time), col("__tag"), col("__asof"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // value-based frame: counts right rows with time in [t - tol, t]
    // regardless of the tie-break tag (range frames compare values)
    val rangeW = Window.partitionBy(key).orderBy(col("__tm"))
      .rangeBetween(-toleranceUs, Window.currentRow)
    val fresh = col("__m").isNotNull &&
      unix_micros(col(s"__m.$time")) >= col("__tm") - lit(toleranceUs)
    all
      .withColumn("__m", last(col("__asof"), ignoreNulls = true).over(rowsW))
      .withColumn("__n", count(col("__hit")).over(rangeW))
      .filter(col("__tag") === 1)
      .select(
        left.columns.toSeq.map(col) ++
          carriedCols.map(c =>
            when(fresh, col(s"__m.$c")).as(s"asof_$c")) :+
          col("__n").as("n_prior"): _*)
  }

  /** Forward as-of join — the mirror (pandas `merge_asof`
    * direction='forward'): for each left row, the EARLIEST right row with
    * the same key and `right.time >= left.time`, plus the count of all
    * such subsequent rows as `n_next`. Same single-exchange union-and-
    * carry plan, with the window running [currentRow, unboundedFollowing]
    * and `first(…, ignoreNulls)`; at equal times the right row sorts
    * AFTER the left (so an equal-time right row is inside the left row's
    * window — matching stays inclusive), and equal-time right rows
    * tie-break by the payload struct with the SMALLEST winning (the first
    * in window order). */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String] = Nil): DataFrame =
    unionCarry(left, right, key, time, payload, fwd = true)

  /** Shared construction for every union-and-carry variant: the reserved-
    * name collision check, the tagged right/left projections, and the
    * union. The plan manufactures internal columns and emits
    * asof_&lt;c&gt; and n_prior|n_next — a left frame already carrying one of those
    * names would be silently clobbered or break resolution, so this ONE
    * copy of the check guards all variants (a fix here reaches every
    * path). Tags order equal-time rows so the inclusive match holds in
    * both directions; __hit doubles as the count indicator: precomputing
    * it (instead of a when() inside the window expression) lets Spark
    * collapse the carry and the count into ONE physical Window operator. */
  private def unionTagged(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String],
      rightTag: Int,
      leftTag: Int,
      extraReserved: Set[String]): (DataFrame, Seq[String]) = {
    val carriedCols = (time +: payload).distinct
    val reserved = Set("__asof", "__tag", "__hit", "__m") ++ extraReserved ++
      carriedCols.map(c => s"asof_$c")
    val collisions = left.columns.filter(reserved.contains)
    require(collisions.isEmpty,
      s"asof join: left columns collide with reserved/emitted names: " +
        collisions.mkString(", "))
    val r = right.select(
      col(key),
      col(time),
      struct(carriedCols.map(col): _*).as("__asof"),
      lit(rightTag).as("__tag"),
      lit(1).as("__hit"))
    val l = left.withColumn("__tag", lit(leftTag)).withColumn("__hit", lit(null).cast("int"))
    // allowMissingColumns: left's extra columns are null on right rows and
    // vice versa for __asof — nothing is materialized twice
    (r.unionByName(l, allowMissingColumns = true), carriedCols)
  }

  private def unionCarry(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payload: Seq[String],
      fwd: Boolean): DataFrame = {
    val countName = if (fwd) "n_next" else "n_prior"
    // backward scans [-∞, current] and needs the right row BEFORE the
    // left at ties; forward scans [current, +∞] and needs it AFTER
    val (rightTag, leftTag) = if (fwd) (1, 0) else (0, 1)
    val (all, carriedCols) = unionTagged(left, right, key, time, payload,
      rightTag, leftTag, extraReserved = Set("__n", countName))
    val base = Window.partitionBy(key).orderBy(col(time), col("__tag"), col("__asof"))
    val w =
      if (fwd) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried =
      if (fwd) first(col("__asof"), ignoreNulls = true).over(w)
      else last(col("__asof"), ignoreNulls = true).over(w)
    all
      .withColumn("__m", carried)
      .withColumn("__n", count(col("__hit")).over(w))
      .filter(col("__tag") === leftTag)
      .select(
        left.columns.toSeq.map(col) ++
          carriedCols.map(c => col(s"__m.$c").as(s"asof_$c")) :+
          col("__n").as(countName): _*)
  }
}
