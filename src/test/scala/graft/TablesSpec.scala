package graft

import org.apache.spark.sql.functions._

/** Pins the events reader's conf discipline (r7 residual nit): the legacy
  * nanosAsLong conf is consumed at schema-resolution time, so events()
  * restores it before returning — and the returned DataFrame must keep
  * executing correctly AFTER the restore. No other query's environment may
  * depend on whether an events read ran first. */
class TablesSpec extends SparkSpec {
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
