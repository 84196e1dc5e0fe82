package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gap-based sessionization over the raw event stream — the batch twin of
  * graft.streaming's stateful sessionizer. The reference has no explicit
  * sessionization (its `session_sources` rows arrive pre-sessionized), but
  * any attribution pipeline at 100 TB must build sessions from raw events
  * first, so this is a first-class operator here.
  *
  * Algorithm: one window per user ordered by (ts, event_id); a session
  * boundary opens where the gap to the previous event exceeds `gapSeconds`;
  * the running sum of boundary flags is the session ordinal. One shuffle on
  * user_id serves both windows and the final rollup (same key), and all
  * arithmetic is exact integer micros ⇒ bit-stable vs the oracle.
  */
object Sessionize {

  def sessions(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapSeconds * 1000000L

    val flagged = events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn(
        "is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn(
        "session_num",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))

    flagged
      .groupBy(col("user_id"), col("session_num"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"),
        countDistinct(col("event_type")).as("n_event_types"))
  }
}
