package graft

import org.apache.spark.sql.functions._

/** Pins the events reader's conf discipline (r7 residual nit): the legacy
  * nanosAsLong conf is consumed at schema-resolution time, so events()
  * restores it before returning — and the returned DataFrame must keep
  * executing correctly AFTER the restore. No other query's environment may
  * depend on whether an events read ran first. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeTs maps every historical ts layout to the same instant") {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val us = 1722470400123456L // 2024-08-01T00:00:00.123456Z
    // raw long nanos (the pre-r10 TIMESTAMP(NANOS)+nanosAsLong layout):
    // truncation of sub-µs nanos toward zero = floor for positive epochs
    val fromNanos = Seq(us * 1000L + 789L).toDF("ts")
      .select(Tables.normalizeTs(LongType).as("ts"))
    assert(fromNanos.schema("ts").dataType === TimestampType)
    assert(fromNanos.select(unix_micros(col("ts"))).as[Long].head() === us)
    // TIMESTAMP_NTZ (the r10 timestamp[us] layout): UTC session TZ makes
    // the cast value-preserving
    val ntz = java.time.LocalDateTime.ofEpochSecond(
      us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)
    val fromNtz = Seq(ntz).toDF("ts")
      .select(Tables.normalizeTs(TimestampNTZType).as("ts"))
    assert(fromNtz.schema("ts").dataType === TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).as[Long].head() === us)
    // session-TZ timestamp passes through untouched
    val inst = java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
    val fromTs = Seq(inst).toDF("ts")
      .select(Tables.normalizeTs(TimestampType).as("ts"))
    assert(fromTs.select(unix_micros(col("ts"))).as[Long].head() === us)
    // anything else is a loud error, not a silent misread
    intercept[IllegalArgumentException] {
      Tables.normalizeTs(org.apache.spark.sql.types.StringType)
    }
  }

  test("events() restores nanosAsLong; the DataFrame executes after restore") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val ev = Tables.events(spark, TinySf)
    assert(spark.conf.getOption(key) === before, "conf must be restored, not left sticky")
    assert(spark.conf.get(key, "false") !== "true")
    // execution AFTER restore: scan still reads the NANOS column correctly
    assert(ev.count() > 0)
    val maxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
    // a sane 21st-century microsecond epoch — a nanos/micros mix-up would
    // land three orders of magnitude off in either direction
    assert(maxUs > 1000000000000000L && maxUs < 4000000000000000L,
      s"ts out of plausible micros range: $maxUs")
  }
}
