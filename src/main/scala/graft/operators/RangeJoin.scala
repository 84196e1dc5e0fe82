package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bucketized interval (range) join: for each anchor row, the follower rows
  * of the same key with event time strictly inside `(t, t + windowUs]`.
  *
  * The reference's v1 lookback join is the same shape (SURVEY.md §2.3 J2 —
  * a range join); executed naively, a time-range theta join degenerates to
  * a per-key nested loop (exactly how the reference runs it, reference:
  * src/etl/transform.py:113-119). Here the range predicate is turned into
  * an EQUI-join: time is tiled into `windowUs`-wide buckets, each anchor is
  * published into its own bucket and the next (an interval of width W spans
  * at most two W-tiles), and followers join on `(key, bucket)` with the
  * exact range check left as a cheap residual filter. An anchor meets a
  * given follower under exactly one of its two bucket copies, so no dedup
  * pass is needed. Cost at 100 TB: one shuffle of 2·|A| + |F| rows on a
  * well-distributed composite key plus the final per-anchor rollup — no
  * cartesian, no per-key quadratic blowup, AQE-shardable. This is the same
  * trick Databricks' range-join optimization applies under the hood; built
  * from primitives here so it runs on stock Spark.
  *
  * Follower sums are exact DECIMAL(28,12) aggregates rescaled HALF_UP to
  * scale 6 — summation-order independent, so the driver oracle reproduces
  * them bit-for-bit (see SparkEntry determinism rules).
  */
object RangeJoin {

  /** @param anchors   one row per interval start: `anchorId`, `key`, `time`
    * @param followers rows to aggregate per anchor: `key`, `time`, `valueCol`
    * @param windowUs  interval width in microseconds
    * @return one row per anchor: `anchor_id`, key, `anchor_us`,
    *         `n_follow` (0 when none), `sum_value` (0.0 when none)
    */
  def followWithin(
      anchors: DataFrame,
      followers: DataFrame,
      key: String,
      anchorId: String,
      time: String,
      valueCol: String,
      windowUs: Long): DataFrame = {
    // windowUs buckets the time axis (`div windowUs`): 0 would be a
    // DIVIDE_BY_ZERO mid-shuffle under ANSI mode, and a negative width
    // silently matches nothing — fail fast with the real reason
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val a = anchors
      .select(
        col(anchorId).as("anchor_id"),
        col(key),
        unix_micros(col(time)).as("anchor_us"))
      .withColumn("__b",
        explode(array(expr(s"anchor_us div ${windowUs}L"),
                      expr(s"anchor_us div ${windowUs}L") + 1L)))
    val f = followers.select(
      col(key).as("__fk"),
      unix_micros(col(time)).as("f_us"),
      col(valueCol).as("__v"))
      .withColumn("__fb", expr(s"f_us div ${windowUs}L"))
    // LEFT join: both bucket copies of a matchless anchor survive with null
    // f_us, so the rollup below keeps every anchor — no join-back needed
    a.join(f,
        a(key) === f("__fk") && a("__b") === f("__fb") &&
          col("f_us") > col("anchor_us") &&
          col("f_us") <= col("anchor_us") + windowUs,
        "left")
      .groupBy(col("anchor_id"), col(key), col("anchor_us"))
      .agg(
        count(col("f_us")).as("n_follow"),
        coalesce(
          sum(col("__v").cast(DecimalType(28, 12)))
            .cast(DecimalType(28, 6)).cast("double"),
          lit(0.0)).as("sum_value"))
  }
}
