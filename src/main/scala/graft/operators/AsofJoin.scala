package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward (point-in-time) as-of join: for each left row, the LATEST right
  * row with the same key and `right.time <= left.time`, plus the count of
  * all such prior rows.
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
      payload: Seq[String] = Nil): DataFrame = {
    val carriedCols = (time +: payload).distinct
    // the union-and-carry plan manufactures internal columns and emits
    // asof_*/n_prior — a left frame already carrying one of those names
    // would be silently clobbered or break resolution; fail loudly
    val reserved = Set("__asof", "__tag", "__hit", "__m", "__n", "n_prior") ++
      carriedCols.map(c => s"asof_$c")
    val collisions = left.columns.filter(reserved.contains)
    require(collisions.isEmpty,
      s"asof backward(): left columns collide with reserved/emitted names: " +
        collisions.mkString(", "))
    // __hit doubles as the count indicator: precomputing it (instead of a
    // when() inside the window expression) lets Spark collapse the carry
    // and the prior-count into ONE physical Window operator
    val r = right.select(
      col(key),
      col(time),
      struct(carriedCols.map(col): _*).as("__asof"),
      lit(0).as("__tag"),
      lit(1).as("__hit"))
    val l = left.withColumn("__tag", lit(1)).withColumn("__hit", lit(null).cast("int"))
    // allowMissingColumns: left's extra columns are null on right rows and
    // vice versa for __asof — nothing is materialized twice
    val all = r.unionByName(l, allowMissingColumns = true)
    val w = Window
      .partitionBy(key)
      .orderBy(col(time), col("__tag"), col("__asof"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all
      .withColumn("__m", last(col("__asof"), ignoreNulls = true).over(w))
      .withColumn("__n", count(col("__hit")).over(w))
      .filter(col("__tag") === 1)
      .select(
        left.columns.map(col) ++
          carriedCols.map(c => col(s"__m.$c").as(s"asof_$c")) :+
          col("__n").as("n_prior"): _*)
  }
}
