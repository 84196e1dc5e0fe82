package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session (codegen compiler, FS metadata, shuffle service)
    // so the first timed query doesn't absorb JVM start-up costs
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      SparkEntry.queries.headOption.foreach { case (_, fn) => fn(spark, sfDir).count() }
    } catch { case _: Throwable => () }
    // Per-query median of `iters` runs: one-off JIT/GC noise on sub-second
    // queries is indistinguishable from a real regression at n=1.
    val runs = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times
    }
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted; s(s.length / 2)
    }
    val medians = runs.map { case (k, ts) => k -> median(ts) }
    val qs = medians.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rs = runs.map { case (k, ts) => s"\"" + k + "\":" + ts.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = if (medians.nonEmpty) medians.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$rs,"iters":$iters,"sf":"$sfDir"}""")
    spark.stop()
  }
}
