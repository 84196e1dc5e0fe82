package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical readers for the harness parquet tables (TESTDATA.md).
  *
  * The reference engine reads whole SQLite tables with `SELECT *`
  * (reference: src/database/db_utils.py:75); here every read is a parquet
  * scan whose column pruning / predicate pushdown is handled by Catalyst —
  * callers `select` only what they need and the scan narrows automatically.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in more than one physical layout across
    * testdata generations: parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects unless the legacy nanosAsLong conf reads it
    * as a raw Long), and TIMESTAMP(MICROS) without UTC adjustment (which
    * Spark reads as TIMESTAMP_NTZ). [[normalizeTs]] maps whichever layout
    * the scan inferred to one canonical type — session-TZ TimestampType at
    * micro precision — so every downstream operator sees a single shape.
    *
    * The legacy conf is saved and RESTORED around the read: it is consumed
    * at schema-resolution time (the returned DataFrame keeps executing
    * correctly after restore — TablesSpec pins this), so leaving it set
    * session-globally would make later queries' environment depend on
    * whether an events read ran first. Same discipline as SparkEntry's
    * fileStreamHarness.
    */
  def events(spark: SparkSession, dir: String): DataFrame = Tables.synchronized {
    // synchronized: the set/read/restore below mutates SESSION-GLOBAL
    // conf — without the lock a concurrent thread on the same session
    // could observe the transient setting on ITS parquet read, or two
    // interleaved events() calls could restore in the wrong order and
    // leave the flag permanently set (the exact leak the save/restore
    // exists to prevent). The conf only matters at schema-resolution
    // time, so the critical section is just the read() call.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = read(spark, dir, "events")
      raw.withColumn("ts", normalizeTs(raw.schema("ts").dataType))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Canonical `ts` conversion for the three layouts `events.ts` can scan
    * as (see [[events]]): raw Long nanos → `timestamp_micros(ts div 1000)`
    * (`div` is integral — epoch-2024 nanos ~1.7e18 overflow double's
    * 53-bit mantissa, so a float path would corrupt timestamps;
    * truncation-toward-zero equals floor for positive epochs, matching
    * DuckDB's ns→µs conversion); TIMESTAMP_NTZ → cast to session-TZ
    * timestamp (value-preserving because every SparkSession in this engine
    * pins `spark.sql.session.timeZone=UTC`); TimestampType passes through.
    * Shared by the batch reader above and the streaming readers in
    * SparkEntry, whose `readStream.schema(rawSchema)` sees the same
    * layout variance.
    */
  def normalizeTs(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    dt match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalArgumentException(
        s"unsupported events.ts physical type: $other")
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
