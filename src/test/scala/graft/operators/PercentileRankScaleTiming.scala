package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing harness for the percentileRank window-vs-bucketed
  * crossover (round-10 advice #5): synthesizes N rows over 5 groups
  * (ScaleSmoke's low-cardinality shape), materializes parquet, and times
  * both plans. The measured bracket backs
  * `Quantiles.RowsPerGroupThreshold` — the auto switch must only take the
  * bucketed plan where it actually wins.
  * Run: `Test/runMain graft.operators.PercentileRankScaleTiming [rows...]`.
  * Not a spec — evidence for the threshold constant. */
object PercentileRankScaleTiming {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(100000L, 1000000L, 10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up

    def time[A](label: String, iters: Int = 3)(f: => A): Double = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.length / 2)
      println(f"[prank-scale] $label%-34s median ${med}%.3f s  (runs: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      med
    }

    for (n <- sizes) {
      val path = s"/tmp/graft_prank_scale_$n"
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
        // deterministic synthetic: 5 groups, value = a hash-ish mix so the
        // sort is not pre-ordered, distinct tie ids
        spark.range(n)
          .select(
            concat(lit("g"), (col("id") % 5).cast("string")).as("g"),
            ((col("id") * 2654435761L) % 1000003L).cast("double").as("v"),
            col("id").as("tie"))
          .write.mode("overwrite").parquet(path)
      }
      val df = spark.read.parquet(path)
      val perGroup = n / 5
      println(s"== n=$n (${perGroup} rows/group, 5 groups) ==")
      time(s"window n=$n") {
        Quantiles.percentileRank(df, "g", "v", "tie")
          .filter(col("pct_rank") >= 0.999).count()
      }
      time(s"bucketed n=$n") {
        Quantiles.percentileRankBucketed(df, "g", "v", "tie")
          .filter(col("pct_rank") >= 0.999).count()
      }
    }
    spark.stop()
  }
}
