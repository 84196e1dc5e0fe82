package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native IHC-style attribution — replaces the reference's external HTTP
  * attribution API (src/api/ihc_api.py:104-161) with an in-engine,
  * deterministic model computed entirely with window functions.
  *
  * The reference treats the API as a black box, but its response schema
  * (data/output/api_response.json: `initializer/holder/closer/ihc`) and the
  * redistribution parameters (src/api/ihc_api.py:54-72) pin down the shape:
  * per-journey weights in [0,1], with `ihc` a convex combination that sums
  * to ~1 per journey (single-session journeys get exactly 1.0).
  *
  * Model (documented here as the engine's spec, property-tested in
  * AttributionSpec):
  *   - `initializer` = 1.0 for the journey's first session (first touch).
  *   - `closer`      = 1.0 for the journey's last session (last touch).
  *   - `holder`      = engagement-weighted share: weight w = 1 +
  *     holder_engagement, holder = w / Σ_journey w. Integer weight sums ⇒
  *     the division is bit-deterministic across engines.
  *   - `ihc` = 0.3·initializer + 0.4·holder + 0.3·closer  (Σ_journey = 1).
  *
  * Scale notes: one shuffle on `conversion_id` serves all four windows
  * (same partitioning key), and the aggregation is map-side combinable.
  * No UDFs — everything stays inside whole-stage codegen.
  */
object Attribution {

  val InitializerWeight = 0.3
  val HolderWeight      = 0.4
  val CloserWeight      = 0.3

  /** Input: journeys with (conversion_id, session_id, session_ts,
    * holder_engagement). Output adds initializer/holder/closer/ihc, the
    * same shape the reference loads into `attribution_customer_journey`
    * (challenge_db_create.sql:34-39).
    */
  def ihc(journeys: DataFrame): DataFrame = {
    val ordered = Window
      .partitionBy("conversion_id")
      .orderBy(col("session_ts"), col("session_id"))
    val whole = Window.partitionBy("conversion_id")

    journeys
      .withColumn("journey_pos", row_number().over(ordered))
      .withColumn("journey_len", count(lit(1)).over(whole))
      .withColumn("holder_w", lit(1) + col("holder_engagement"))
      .withColumn("holder_wsum", sum(col("holder_w")).over(whole))
      .withColumn(
        "initializer",
        when(col("journey_pos") === 1, lit(1.0)).otherwise(lit(0.0)))
      .withColumn(
        "closer",
        when(col("journey_pos") === col("journey_len"), lit(1.0)).otherwise(lit(0.0)))
      .withColumn(
        "holder",
        col("holder_w").cast("double") / col("holder_wsum").cast("double"))
      .withColumn(
        "ihc",
        lit(InitializerWeight) * col("initializer") +
          lit(HolderWeight) * col("holder") +
          lit(CloserWeight) * col("closer"))
      .drop("holder_w", "holder_wsum")
  }

  /** One component's redistribution rule (src/api/ihc_api.py:54-72): credit
    * held by sessions whose channel is in `channels` is taken away and
    * re-spread over eligible sessions — `earlier_sessions_only`,
    * `later_sessions_only`, or `any_session` relative to the donor, with
    * receivers additionally required to hold ≥ `receiveThreshold` of the
    * component already. */
  final case class Redistribution(
      direction: String,
      receiveThreshold: Double,
      channels: Seq[String])

  /** The API's documented defaults (ihc_api.py:56-72). */
  val ReferenceRedistribution: Map[String, Redistribution] = Map(
    "initializer" -> Redistribution("earlier_sessions_only", 0.0, Seq("Direct", "Email_NewsLetter")),
    "holder" -> Redistribution("any_session", 0.0, Seq("Direct", "Email_NewsLetter")),
    "closer" -> Redistribution("later_sessions_only", 0.1, Seq("Direct")))

  /** Apply per-component redistribution to an `ihc` output. Within each
    * journey: donor weight = Σ component over sessions whose channel is in
    * the rule's list; those sessions drop to 0 and the donated mass is
    * split pro-rata over eligible receivers (direction is evaluated
    * against the EARLIEST donor position — a deterministic simplification
    * of the API's per-donor spreading that preserves the direction
    * semantics and total mass). If no receiver is eligible the component
    * is left unchanged (mass cannot vanish). `ihc` is recomputed from the
    * redistributed components. */
  def redistribute(
      attributed: DataFrame,
      rules: Map[String, Redistribution] = ReferenceRedistribution,
      channelCol: String = "channel_label"): DataFrame = {
    val whole = Window.partitionBy("conversion_id")
    val withComponents = rules.foldLeft(attributed) { case (df, (component, rule)) =>
      val c = col(component)
      val isDonor = col(channelCol).isin(rule.channels: _*)
      val donated = sum(when(isDonor, c).otherwise(lit(0.0))).over(whole)
      val donorPos = min(when(isDonor, col("journey_pos"))).over(whole)
      val directionOk = rule.direction match {
        case "earlier_sessions_only" => col("journey_pos") < donorPos
        case "later_sessions_only"   => col("journey_pos") > donorPos
        case _                       => lit(true)
      }
      val eligible = !isDonor && directionOk && c >= lit(rule.receiveThreshold)
      val eligibleMass = sum(when(eligible, c).otherwise(lit(0.0))).over(whole)
      val nEligible = sum(when(eligible, 1L).otherwise(0L)).over(whole)
      val redistributed =
        when(nEligible === 0 || donated === 0.0, c) // nothing to move or nowhere to go
          .when(isDonor, lit(0.0))
          .when(eligible && eligibleMass > 0.0, c + donated * c / eligibleMass)
          .when(eligible, c + donated / nEligible.cast("double")) // receivers all at 0
          .otherwise(c)
      df.withColumn(component, redistributed)
    }
    withComponents.withColumn(
      "ihc",
      lit(InitializerWeight) * col("initializer") +
        lit(HolderWeight) * col("holder") +
        lit(CloserWeight) * col("closer"))
  }
}
