package graft.maef

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Attribution

/** The reference's 5-step pipeline (main.py:20-83) as a single Spark
  * driver: warehouse → transform → attribution → load → report. Stage
  * boundaries that were Airflow tasks + XCom file paths
  * (dags/ihc_api_dag.py:257-307) become plain function calls over
  * DataFrames — one Catalyst plan per output, no intermediate
  * materialization unless a sink is requested.
  */
object MaefPipeline {

  /** Semantics toggles (SURVEY §7.4): v1/v2 journey window, inclusive
    * conversion session, reference-faithful fanout costs, API-style ihc
    * rounding. Defaults reproduce the reference's v2 run. */
  case class Config(
      lookbackDays: Option[Int] = None,
      inclusive: Boolean = false,
      fanoutCosts: Boolean = true,
      roundIhcTo: Option[Int] = Some(4),
      exactSums: Boolean = false)

  /** S3/S4: copy tables to the warehouse dir and verify row counts —
    * the reference's source→target copy + COUNT(*) check
    * (src/database/db_utils.py:67-102). */
  def copyAndVerify(tables: Map[String, DataFrame], targetDir: String): Map[String, Long] = {
    tables.map { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$targetDir/$name")
      val spark = df.sparkSession
      val copied = spark.read.parquet(s"$targetDir/$name").count()
      val src = df.count()
      require(src == copied, s"verification failed for $name: $src != $copied")
      name -> copied
    }
  }

  /** §7.2: native IHC attribution over journey entries (the drop-in
    * replacement for the external API; same output schema as
    * attribution_customer_journey + component weights). */
  def nativeAttribution(journeyEntries: DataFrame, roundTo: Option[Int]): DataFrame = {
    val attributed = Attribution.ihc(
      journeyEntries.withColumnRenamed("timestamp", "session_ts"))
    val rounded = roundTo match {
      case Some(d) => attributed
        .withColumn("initializer", round(col("initializer"), d))
        .withColumn("holder", round(col("holder"), d))
        .withColumn("closer", round(col("closer"), d))
        .withColumn("ihc", round(col("ihc"), d))
      case None => attributed
    }
    rounded.select(
      col("conversion_id").as("conv_id"), col("session_id"),
      col("initializer"), col("holder"), col("closer"), col("ihc"))
  }

  /** Non-empty gate (transform.py:264-265) on an UN-persisted plan:
    * `limit(1)` short-circuits after the first produced row, so the gate
    * costs one partial pass — never a full materialization. Shared by both
    * entry points (MaefPipeline.run, MaefMain.run) so the gate pattern
    * can't drift. Call BEFORE persisting the frame: gating a persisted
    * frame would partially cache and pay the serialization barrier. */
  private[maef] def requireNonEmpty(df: DataFrame, msg: String): Unit =
    require(df.limit(1).count() == 1L, msg)

  /** Transform → attribute → report → export, end to end. Returns the
    * export-shaped report (channel_name, date, cost, ihc, ihc_revenue,
    * cpo, roas). Pass `recordedResponses` to substitute the reference's
    * recorded api_response.json for the native model (golden replay). */
  def run(
      spark: SparkSession,
      conversions: DataFrame,
      sessions: DataFrame,
      costs: DataFrame,
      cfg: Config = Config(),
      recordedResponses: Option[String] = None): DataFrame = {
    // The journey join has exactly one downstream consumer (the attribution
    // pass), so caching it would buy nothing and force a full
    // materialization + serialization barrier into the plan — measured at a
    // 1.67× slowdown of the whole pipeline at sf0.1.
    val journeys = MaefJourneys.transform(conversions, sessions, cfg.lookbackDays, cfg.inclusive)
    requireNonEmpty(journeys, "transform produced no journey entries")
    val attribution = recordedResponses match {
      case Some(path) => Loader.load(spark, path)
      case None       => nativeAttribution(journeys, cfg.roundIhcTo)
    }
    MaefReporting.`export`(
      MaefReporting.channelReport(
        attribution, sessions, costs, conversions, cfg.fanoutCosts, cfg.exactSums))
  }
}
