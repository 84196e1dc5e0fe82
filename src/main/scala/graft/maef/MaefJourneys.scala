package graft.maef

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's transform step on its own schema (v2 semantics,
  * src/etl/transform.py:206-274): string-timestamp journey construction +
  * journey-entry projection + NaN/Inf scrub.
  *
  * Timestamps are `date || ' ' || time` TEXT compared lexicographically
  * (src/etl/transform.py:232,237,242) — zero-padded ISO strings, so string
  * order == chronological order. Kept as strings for exact parity; the
  * equi-join-on-user + residual `<` shape is identical to
  * operators.Journeys, replacing the reference's O(C×S) pandas loop.
  */
object MaefJourneys {

  /** P1: timestamp synthesis. */
  def withTs(df: DataFrame, dateCol: String, timeCol: String, out: String): DataFrame =
    df.withColumn(out, concat_ws(" ", col(dateCol), col(timeCol)))

  /** P4: NaN/±Inf → 0.0 (src/etl/transform.py:194-204). */
  def scrub(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(isnan(c) || c === Double.PositiveInfinity || c === Double.NegativeInfinity, 0.0)
      .otherwise(c)

  /** J1 + P2 + P3: journeys in the API's journey-entry shape
    * (src/etl/transform.py:229-260). `lookbackDays` enables the commented
    * v1 window semantics (transform.py:113-119). */
  def transform(
      conversions: DataFrame,
      sessions: DataFrame,
      lookbackDays: Option[Int] = None,
      inclusive: Boolean = false,
      dropInvalidSessions: Boolean = false): DataFrame = {
    val conv = withTs(conversions, "conv_date", "conv_time", "conv_ts")
    // P5 (v1, transform.py:70-73): keep only sessions with a channel and a
    // date — dirty-source hygiene ahead of the join.
    val cleaned =
      if (dropInvalidSessions)
        sessions.filter(col("channel_name").isNotNull && col("event_date").isNotNull)
      else sessions
    val sess = withTs(cleaned, "event_date", "event_time", "session_ts")
    val cmp =
      if (inclusive) col("session_ts") <= col("conv_ts")
      else col("session_ts") < col("conv_ts") // strict: conversion flag always 0
    val cond = lookbackDays match {
      case Some(d) =>
        // v1 window: session date within [conv_date - d, conv_date]
        cmp && col("event_date") >= date_format(
          date_sub(to_date(col("conv_date")), d), "yyyy-MM-dd")
      case None => cmp
    }
    val entries = conv.join(sess, Seq("user_id")).filter(cond)
      .select(
        col("conv_id").cast("string").as("conversion_id"),
        col("session_id").cast("string").as("session_id"),
        col("session_ts").as("timestamp"),
        col("channel_name").cast("string").as("channel_label"),
        col("holder_engagement").cast("int").as("holder_engagement"),
        col("closer_engagement").cast("int").as("closer_engagement"),
        when(col("session_ts") === col("conv_ts"), 1).otherwise(0).as("conversion"),
        col("impression_interaction").cast("int").as("impression_interaction"))
    // P4 applied IN the transform, like the reference's clean_dict over
    // every entry (transform.py:194-204): scrub any double column so
    // NaN/Inf can never reach the JSON artifact. The canonical entry
    // schema carries no doubles, so this is a no-op projection there —
    // but a variant schema (revenue-bearing entries) flows through the
    // same guard instead of silently skipping it.
    entries.select(entries.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.DoubleType) scrub(col(f.name)).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }
}
