package graft.funnel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maps the harness `events` table onto the reference's marketing-funnel
  * data model (reference DDL: data/sql/challenge_db_create.sql:6-32):
  *
  *   - `conversions(conv_id, user_id, conv_ts, revenue)` — purchase events.
  *   - `sessions(session_id, user_id, session_ts, channel_name, cost,
  *     holder_engagement, closer_engagement, impression_interaction)` —
  *     every non-purchase event is a touchpoint; its `event_type` plays the
  *     role of `channel_name` and its `value` the role of media cost.
  *
  * The reference stores time as zero-padded `TEXT` date + time columns
  * compared lexicographically (src/etl/transform.py:232-242); here the
  * native `TimestampType` column is authoritative and string timestamps are
  * derived only at serialization boundaries (see JourneySchema).
  *
  * Engagement flags mirror the 0/1 INTEGER flags of `session_sources`
  * (challenge_db_create.sql:27-30) and are derived deterministically from
  * the event type so that the oracle SQL can reproduce them byte-for-byte.
  */
object Funnel {

  /** Purchase events as the `conversions` table. */
  def conversions(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("conv_id"),
        col("user_id"),
        col("ts").as("conv_ts"),
        col("value").as("revenue"))

  /** Non-purchase events as the `session_sources` (+ cost) table. */
  def sessions(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") =!= "purchase")
      .select(
        col("event_id").as("session_id"),
        col("user_id"),
        col("ts").as("session_ts"),
        col("event_type").as("channel_name"),
        col("value").as("cost"),
        (col("event_type") === "view").cast("int").as("holder_engagement"),
        (col("event_type") === "click").cast("int").as("closer_engagement"),
        (col("event_type") === "signup").cast("int").as("impression_interaction"))
}
