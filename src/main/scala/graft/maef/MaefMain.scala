package graft.maef

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's `main.py` as a runnable Spark CLI — the literal drop-in
  * entry point (main.py:20-83's five steps, same artifacts, same order):
  *
  *   1. warehouse copy + row-count verify          (db_utils.py:67-102)
  *   2. transform → `target_data.json`             (transform.py:229-260)
  *   3. attribution → `api_response.json`          (native model replaces
  *      the external IHC API; `AttributionApiConnector` remains available
  *      for a real endpoint)
  *   4. load + verification gates                  (load.py:120-169)
  *   5. channel report → `channel_report.csv`      (reporting.py:57-167)
  *
  * Run:
  *   runMain graft.maef.MaefMain <warehouseDir> <outputDir> [start end]
  *
  * `<warehouseDir>` holds parquet tables `conversions`, `session_sources`,
  * `session_costs` (MaefModel schemas — land a SQLite/JDBC warehouse there
  * with `sources.JdbcWarehouse.migrate`). The optional [start end]
  * (yyyy-MM-dd, validated like the reference's DAG window) filters
  * conversions by `conv_date`; when absent, the CLI falls back like the
  * DAG (ihc_api_dag.py:40-63): `ATTRIBUTION_START_DATE`/
  * `ATTRIBUTION_END_DATE` env vars (the Airflow Variables), then the
  * reference's hardcoded 2023-08-01..09-30 window. `run()` with
  * `window = None` stays unfiltered for library callers. Single-file JSON/CSV artifacts exist for
  * reference parity — they are API-boundary sized; bulk data stays in
  * partitioned parquet.
  */
object MaefMain {

  final case class Artifacts(
      transformedRows: Long, attributionRows: Long, positiveIhcRows: Long,
      reportRows: Long)

  def run(
      spark: SparkSession,
      warehouseDir: String,
      outDir: String,
      window: Option[DateWindow.Window] = None): Artifacts = {
    // Step 1: copy the warehouse and verify counts (S3/S4)
    val tables = Map(
      "conversions" -> spark.read.schema(MaefModel.Conversions).parquet(s"$warehouseDir/conversions"),
      "session_sources" -> spark.read.schema(MaefModel.SessionSources).parquet(s"$warehouseDir/session_sources"),
      "session_costs" -> spark.read.schema(MaefModel.SessionCosts).parquet(s"$warehouseDir/session_costs"))
    MaefPipeline.copyAndVerify(tables, s"$outDir/warehouse")
    val target = (name: String) => spark.read.parquet(s"$outDir/warehouse/$name")

    // Step 2: transform (windowed like the reference's date-bounded runs)
    val conversions = window match {
      case Some(w) => target("conversions")
        .filter(col("conv_date") >= w.startString && col("conv_date") <= w.endString)
      case None => target("conversions")
    }
    // Gate on the un-persisted plan (shared helper — one partial pass),
    // THEN persist: journeys has three consumers here (JSON sink, count,
    // attribution), so the cache is justified, unlike MaefPipeline.run.
    val journeysPlan = MaefJourneys.transform(conversions, target("session_sources"))
    MaefPipeline.requireNonEmpty(journeysPlan, "transform produced no journey entries") // transform.py:264-265
    val journeys = journeysPlan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    JsonArrayIO.writePrettyJsonArray(journeys, s"$outDir/target_data.json")
    val nTransformed = journeys.count()

    // Step 3: attribution (native model in place of the external API)
    val attribution = MaefPipeline.nativeAttribution(journeys, roundTo = Some(4))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the artifact is ENVELOPE-shaped like the reference's api_response.json
    // (an array of {statusCode, value:[records]}) so the pipeline's own
    // output replays through MaefPipeline.run(recordedResponses = ...) —
    // a flat record array would read back as zero records under the
    // ResponseEnvelope schema and fail the Σihc gate. One native "chunk" =
    // one 200 envelope; records sorted for a deterministic artifact.
    val responseEnvelope = attribution
      .agg(sort_array(collect_list(struct(
        col("conv_id").as("conversion_id"), col("session_id"),
        col("initializer"), col("holder"), col("closer"), col("ihc")))).as("value"))
      .select(
        lit(200).as("statusCode"),
        col("value"),
        lit(null).cast(MaefModel.ResponseEnvelope("data").dataType).as("data"),
        lit(null).cast(MaefModel.ResponseEnvelope("results").dataType).as("results"),
        lit(null).cast(MaefModel.ResponseEnvelope("partialFailureErrors").dataType)
          .as("partialFailureErrors"))
    JsonArrayIO.writePrettyJsonArray(responseEnvelope, s"$outDir/api_response.json")

    // Step 4: load-side verification gates (A4/A6)
    val totalIhc = attribution.agg(coalesce(sum(col("ihc")), lit(0.0))).first().getDouble(0)
    require(totalIhc > 0, s"Attribution data contains no valid IHC values (total=$totalIhc)")
    val nPositive = Loader.verifyLoaded(attribution)

    // Step 5: channel report + export. The FULL conversions table feeds
    // the report, not the windowed view: reporting.py:97's HAVING bound is
    // `(SELECT MIN(conv_date) FROM conversions)` over the whole table, so
    // report rows dated before the run window (attribution from pre-window
    // sessions of in-window conversions) must survive — the windowed
    // attribution already scopes WHICH conversions are reported
    val report = MaefReporting.`export`(
      MaefReporting.channelReport(
        attribution, // nativeAttribution already emits (conv_id, session_id, ihc)
        target("session_sources"), target("session_costs"), target("conversions"),
        fanout = false, exactSums = true))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    JsonArrayIO.writeSingleCsv(report, s"$outDir/channel_report.csv")

    Artifacts(nTransformed, attribution.count(), nPositive, report.count())
  }

  /** Stage a SQLite warehouse file into `stagingDir` as parquet, cast to
    * the reference DDL types (SQLite INTEGER affinity widens to i64 on
    * page-level read; the cast is the same one a JDBC driver applies).
    * Returns the directory `run` accepts as its `warehouseDir` — the
    * migrate-once pattern the JdbcWarehouse scaladoc prescribes. */
  def stageSqliteWarehouse(spark: SparkSession, dbPath: String, stagingDir: String): String = {
    graft.sources.SQLiteWarehouse.migrate(spark, dbPath,
      Seq("conversions", "session_sources", "session_costs"), s"$stagingDir/raw")
    for ((name, schema) <- Seq(
        "conversions" -> MaefModel.Conversions,
        "session_sources" -> MaefModel.SessionSources,
        "session_costs" -> MaefModel.SessionCosts)) {
      val src = spark.read.parquet(s"$stagingDir/raw/$name")
      src.select(schema.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(s"$stagingDir/$name")
    }
    stagingDir
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: MaefMain <warehouseDir|warehouse.db> <outputDir> [startDate endDate]")
    // The DAG's window chain (ihc_api_dag.py:40-63): explicit CLI dates →
    // ATTRIBUTION_START_DATE/ATTRIBUTION_END_DATE env vars (the Airflow
    // Variables) → the reference's hardcoded 2023-08-01..09-30 fallback.
    val window = Some(DateWindow.resolve(
      explicit = if (args.length >= 4) Some((args(2), args(3))) else None,
      variables = sys.env.get,
      today = java.time.LocalDate.now()))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // literal drop-in for the reference's entry point: pointing the CLI
      // at the SQLite file itself (main.py:43-47 opens challenge.db)
      // stages the warehouse into parquet first
      val warehouseDir =
        if (args(0).endsWith(".db") || args(0).endsWith(".sqlite"))
          stageSqliteWarehouse(spark, args(0), s"${args(1)}/sqlite_warehouse")
        else args(0)
      val a = run(spark, warehouseDir, args(1), window)
      println(s"pipeline complete: ${a.transformedRows} journey rows, " +
        s"${a.attributionRows} attribution rows (${a.positiveIhcRows} with ihc>0), " +
        s"${a.reportRows} report rows")
    } finally spark.stop()
  }
}
