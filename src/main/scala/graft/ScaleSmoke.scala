package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.funnel.Funnel
import graft.operators.{Attribution, Journeys, Reporting, Sessionize}

/** Scale smoke: synthesizes an events table N× the sf0.1 shape (same
  * schema/distributions, deterministic from ids — no RNG) in /tmp and runs
  * the core funnel chain, printing stage timings. Answers "does the plan
  * survive a 10× scale-up" with measurements instead of claims.
  * Run: `runMain graft.ScaleSmoke [multiplier]` (default 10 ⇒ ~1M events).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nEvents = 100000L * mult
    val nUsers = 1500L * mult // user count scales too: per-user density fixed
    val path = s"/tmp/graft_scale_${mult}x"
    val types = array(lit("view"), lit("click"), lit("signup"), lit("error"), lit("purchase"))
    spark.range(nEvents)
      .select(
        col("id").as("event_id"),
        timestamp_micros(lit(1704067200000000L) + col("id") * lit(25920000L)) // ~30 days spread
          .as("ts"),
        pmod(xxhash64(col("id"), lit("u")), lit(nUsers)).as("user_id"),
        element_at(types, pmod(xxhash64(col("id"), lit("t")), lit(5)).cast("int") + 1)
          .as("event_type"),
        (pmod(xxhash64(col("id"), lit("v")), lit(20000)).cast("double") / 100.0).as("value"),
        concat(lit("{\"k\": "), pmod(xxhash64(col("id"), lit("k")), lit(100)), lit("}"))
          .as("props"))
      .write.mode("overwrite").parquet(path)

    val events = spark.read.parquet(path)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    println(s"== scale smoke: ${mult}x sf0.1 (${nEvents} events, $nUsers users) ==")
    val conv = Funnel.conversions(events)
    val sess = Funnel.sessions(events)
    time("journey join (J1)")(Journeys.construct(conv, sess).count())
    time("attribution")(Attribution.ihc(Journeys.construct(conv, sess)).count())
    time("channel report")(
      Reporting.channelReport(
        Attribution.ihc(Journeys.construct(conv, sess)), sess, conv).count())
    time("sessionize")(Sessionize.sessions(events).count())
    spark.stop()
  }
}
