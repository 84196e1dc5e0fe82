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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and rebuild a
    * session-TZ timestamp at micro precision. `div` is integral division —
    * epoch-2024 nanos (~1.7e18) overflow double's 53-bit mantissa, so a
    * float path would corrupt timestamps; truncation-toward-zero equals
    * floor for positive epochs, matching DuckDB's ns→µs conversion.
    *
    * The legacy conf is saved and RESTORED around the read: it is consumed
    * at schema-resolution time (the returned DataFrame keeps executing
    * correctly after restore — TablesSpec pins this), so leaving it set
    * session-globally would make later queries' environment depend on
    * whether an events read ran first. Same discipline as SparkEntry's
    * fileStreamHarness.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try
      read(spark, dir, "events")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
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
