package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.funnel.Funnel
import graft.operators.{Attribution, Journeys, Reporting, Sessionize}

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each paired with DuckDB oracle SQL over the same parquet tables.
  *
  * Determinism rules (so the driver's hash compare is bit-exact):
  *   - integers in outputs are BIGINT on both sides;
  *   - timestamps cross the boundary as epoch micros (`unix_micros` ≡
  *     DuckDB `epoch_us`) or `yyyy-MM-dd` strings;
  *   - every SUM over doubles goes through an exact DECIMAL cast so
  *     aggregation order can't flip low bits; ratios divide identical
  *     doubles on both sides.
  */
object SparkEntry {

  // ---- shared oracle fragments: the events→funnel mapping (Funnel.scala) ----
  private val ConvSql =
    "SELECT event_id AS conv_id, user_id, ts AS conv_ts, value AS revenue " +
      "FROM events WHERE event_type = 'purchase'"
  private val SessSql =
    "SELECT event_id AS session_id, user_id, ts AS session_ts, " +
      "event_type AS channel_name, value AS cost, " +
      "CAST(event_type = 'view' AS INT) AS holder_engagement, " +
      "CAST(event_type = 'click' AS INT) AS closer_engagement, " +
      "CAST(event_type = 'signup' AS INT) AS impression_interaction " +
      "FROM events WHERE event_type <> 'purchase'"
  private val JourneySql =
    s"""WITH conv AS ($ConvSql), sess AS ($SessSql),
       |j AS (
       |  SELECT c.conv_id, s.session_id, s.session_ts, s.holder_engagement
       |  FROM conv c JOIN sess s
       |    ON c.user_id = s.user_id AND s.session_ts < c.conv_ts
       |)""".stripMargin
  /** Oracle twin of Attribution.ihc over the journey CTE `j`. */
  private val AttributionSql =
    s"""$JourneySql,
       |p AS (
       |  SELECT conv_id, session_id,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY session_ts, session_id) AS journey_pos,
       |    count(*) OVER (PARTITION BY conv_id) AS journey_len,
       |    (1 + holder_engagement) AS w,
       |    CAST(sum(1 + holder_engagement) OVER (PARTITION BY conv_id) AS BIGINT) AS wsum
       |  FROM j
       |),
       |attribution AS (
       |  SELECT conv_id, session_id, journey_pos, journey_len,
       |    CASE WHEN journey_pos = 1 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS initializer,
       |    CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE) AS holder,
       |    CASE WHEN journey_pos = journey_len THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS closer,
       |    CAST(0.3 AS DOUBLE) * (CASE WHEN journey_pos = 1 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
       |      + CAST(0.4 AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE))
       |      + CAST(0.3 AS DOUBLE) * (CASE WHEN journey_pos = journey_len THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) AS ihc
       |  FROM p
       |)""".stripMargin
  /** Oracle twin of Reporting.channelReport (strict cost mode). */
  private val ChannelReportSql =
    s"""$AttributionSql,
       |ar AS (
       |  SELECT COALESCE(NULLIF(s.channel_name, ''), 'unknown') AS channel_name,
       |         strftime(s.session_ts, '%Y-%m-%d') AS date,
       |         a.ihc, c.revenue * a.ihc AS attributed_revenue
       |  FROM attribution a
       |  JOIN sess s ON a.session_id = s.session_id
       |  JOIN conv c ON a.conv_id = c.conv_id
       |),
       |ra AS (
       |  SELECT channel_name, date,
       |    CAST(SUM(CAST(ihc AS DECIMAL(28,12))) AS DOUBLE) AS ihc,
       |    CAST(SUM(CAST(attributed_revenue AS DECIMAL(28,12))) AS DOUBLE) AS ihc_revenue
       |  FROM ar GROUP BY channel_name, date
       |),
       |ca AS (
       |  SELECT COALESCE(NULLIF(channel_name, ''), 'unknown') AS channel_name,
       |         strftime(session_ts, '%Y-%m-%d') AS date,
       |         CAST(SUM(CAST(COALESCE(cost, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS cost
       |  FROM sess GROUP BY 1, 2
       |),
       |report AS (
       |  SELECT ra.channel_name, ra.date, COALESCE(ca.cost, 0.0) AS cost,
       |         ra.ihc, ra.ihc_revenue
       |  FROM ra LEFT JOIN ca ON ra.channel_name = ca.channel_name AND ra.date = ca.date
       |  WHERE ra.channel_name <> 'unknown'
       |    AND ra.date >= (SELECT strftime(MIN(conv_ts), '%Y-%m-%d') FROM conv)
       |)""".stripMargin

  private def events(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)
  private def journey(s: SparkSession, dir: String): DataFrame =
    Journeys.construct(Funnel.conversions(events(s, dir)), Funnel.sessions(events(s, dir)))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q05_report_export")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // J1 — journey construction: equi join on user_id + strict `<` residual
    // (reference: src/etl/transform.py:229-238, O(C×S) loop → hash join).
    "q01_journey" -> ((s, dir) => journey(s, dir).select(
      col("conversion_id"), col("session_id"), col("user_id"),
      unix_micros(col("session_ts")).as("session_ts_us"),
      unix_micros(col("conv_ts")).as("conv_ts_us"),
      col("channel_label"),
      col("holder_engagement").cast("long").as("holder_engagement"),
      col("closer_engagement").cast("long").as("closer_engagement"),
      col("conversion").cast("long").as("conversion"),
      col("impression_interaction").cast("long").as("impression_interaction"))),

    // J2 — bounded lookback variant (reference v1: src/etl/transform.py:113-119).
    "q02_journey_window" -> ((s, dir) =>
      Journeys.construct(
        Funnel.conversions(events(s, dir)),
        Funnel.sessions(events(s, dir)),
        lookback = Some(expr("INTERVAL 7 DAYS")))
        .select(
          col("conversion_id"), col("session_id"),
          unix_micros(col("session_ts")).as("session_ts_us"),
          col("channel_label"))),

    // §7.2 — native IHC attribution via windows (replaces the external API).
    "q03_attribution" -> ((s, dir) => Attribution.ihc(journey(s, dir)).select(
      col("conversion_id"), col("session_id"),
      col("journey_pos").cast("long").as("journey_pos"),
      col("journey_len"),
      col("initializer"), col("holder"), col("closer"), col("ihc"))),

    // A2+J3..J6+A3+P6 — the reporting rollup (src/etl/reporting.py:57-98).
    "q04_channel_report" -> ((s, dir) =>
      Reporting.channelReport(
        Attribution.ihc(journey(s, dir)),
        Funnel.sessions(events(s, dir)),
        Funnel.conversions(events(s, dir)))),

    // P7+O1 — export projection with CPO/ROAS (src/etl/reporting.py:150-167).
    "q05_report_export" -> ((s, dir) =>
      Reporting.exportReport(Reporting.channelReport(
        Attribution.ihc(journey(s, dir)),
        Funnel.sessions(events(s, dir)),
        Funnel.conversions(events(s, dir))))),

    // A1/A5 — per-journey rollup: exact integer micros arithmetic.
    "q06_journey_stats" -> ((s, dir) => Journeys.journeyStats(journey(s, dir))),

    // Gap sessionization — batch twin of the streaming operator.
    "q07_sessionize" -> ((s, dir) => Sessionize.sessions(events(s, dir))),

    // S2/A2 — pricing summary over lineitem (scan+filter+hash agg; decimal-
    // exact sums so partial-agg order can't flip bits).
    "q08_pricing" -> ((s, dir) => Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(28, 10)))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))),

    // J3/J4-style star join: orders ⋈ customer ⋈ broadcast(nation).
    "q09_market" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val o = Tables.orders(s, dir)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total_price"))
    }),

    // Window top-k per group (deterministic tiebreak on key).
    "q10_top_customers" -> ((s, dir) => Tables.customer(s, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))).cast("long"))
      .filter(col("rn") <= 10)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rn"))),

    // A3 — uncorrelated scalar subquery (src/etl/reporting.py:96-97).
    "q11_first_week_orders" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val minD = o.agg(min(col("o_orderdate")).as("mind"))
      o.join(minD)
        .filter(col("o_orderdate") < col("mind") + expr("INTERVAL 7 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total_price"))
    }),

    // P8/A7 — semi-structured payload extraction + histogram
    // (src/etl/load.py:34-67's envelope dispatch, as regexp extraction).
    "q12_payload_histogram" -> ((s, dir) => events(s, dir)
      .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_records"),
        sum(col("k")).as("k_sum"),
        countDistinct(col("k")).as("k_distinct"))),

    // L2-style exact dedup by content fingerprint (md5 ≡ DuckDB md5).
    "q13_dedup_exact" -> ((s, dir) => Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(
        min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("source")).as("n_sources"))),
  )

  def oracleSql: Map[String, String] = ListMap(
    "q01_journey" ->
      s"""WITH conv AS ($ConvSql), sess AS ($SessSql)
         |SELECT c.conv_id AS conversion_id, s.session_id, c.user_id,
         |  epoch_us(s.session_ts) AS session_ts_us,
         |  epoch_us(c.conv_ts) AS conv_ts_us,
         |  s.channel_name AS channel_label,
         |  CAST(s.holder_engagement AS BIGINT) AS holder_engagement,
         |  CAST(s.closer_engagement AS BIGINT) AS closer_engagement,
         |  CAST(CASE WHEN s.session_ts = c.conv_ts THEN 1 ELSE 0 END AS BIGINT) AS conversion,
         |  CAST(s.impression_interaction AS BIGINT) AS impression_interaction
         |FROM conv c JOIN sess s
         |  ON c.user_id = s.user_id AND s.session_ts < c.conv_ts""".stripMargin,

    "q02_journey_window" ->
      s"""WITH conv AS ($ConvSql), sess AS ($SessSql)
         |SELECT c.conv_id AS conversion_id, s.session_id,
         |  epoch_us(s.session_ts) AS session_ts_us,
         |  s.channel_name AS channel_label
         |FROM conv c JOIN sess s
         |  ON c.user_id = s.user_id AND s.session_ts < c.conv_ts
         | AND s.session_ts >= c.conv_ts - INTERVAL 7 DAY""".stripMargin,

    "q03_attribution" ->
      s"""$AttributionSql
         |SELECT conv_id AS conversion_id, session_id,
         |  journey_pos, journey_len, initializer, holder, closer, ihc
         |FROM attribution""".stripMargin,

    "q04_channel_report" ->
      s"""$ChannelReportSql
         |SELECT channel_name, date, cost, ihc, ihc_revenue FROM report""".stripMargin,

    "q05_report_export" ->
      s"""$ChannelReportSql
         |SELECT channel_name, date, cost, ihc, ihc_revenue,
         |  CASE WHEN ihc > 0 THEN cost / ihc ELSE CAST(0.0 AS DOUBLE) END AS cpo,
         |  CASE WHEN cost > 0 THEN ihc_revenue / cost ELSE CAST(0.0 AS DOUBLE) END AS roas
         |FROM report ORDER BY channel_name, date""".stripMargin,

    "q06_journey_stats" ->
      s"""WITH conv AS ($ConvSql), sess AS ($SessSql),
         |j2 AS (
         |  SELECT c.conv_id, s.session_ts, s.channel_name AS channel_label
         |  FROM conv c JOIN sess s
         |    ON c.user_id = s.user_id AND s.session_ts < c.conv_ts
         |)
         |SELECT conv_id AS conversion_id, COUNT(*) AS n_sessions,
         |  COUNT(DISTINCT channel_label) AS n_channels,
         |  MIN(epoch_us(session_ts)) AS first_touch_us,
         |  MAX(epoch_us(session_ts)) AS last_touch_us,
         |  MAX(epoch_us(session_ts)) - MIN(epoch_us(session_ts)) AS span_us
         |FROM j2 GROUP BY conv_id""".stripMargin,

    "q07_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |),
        |numbered AS (
        |  SELECT *, CAST(SUM(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_num
        |  FROM flagged
        |)
        |SELECT user_id, session_num, COUNT(*) AS n_events,
        |  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
        |  MAX(ts_us) - MIN(ts_us) AS duration_us,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  COUNT(DISTINCT event_type) AS n_event_types
        |FROM numbered GROUP BY user_id, session_num""".stripMargin,

    "q08_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q09_market" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q10_top_customers" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer
        |) t WHERE rn <= 10""".stripMargin,

    "q11_first_week_orders" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_orderdate < (SELECT MIN(o_orderdate) FROM orders) + INTERVAL 7 DAY
        |GROUP BY o_orderpriority""".stripMargin,

    "q12_payload_histogram" ->
      """SELECT event_type, COUNT(*) AS n_records,
        |  CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
        |  COUNT(DISTINCT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS k_distinct
        |FROM events GROUP BY event_type""".stripMargin,

    "q13_dedup_exact" ->
      """SELECT md5(text) AS fp, MIN(doc_id) AS canonical_id,
        |  COUNT(*) AS n_copies, COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY md5(text)""".stripMargin,
  )
}
