package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Medians-line key for a query: `"q18_ngram_jaccard"` → `"18"`.
   *
   * The driver's bench artifact keeps only a ~2 KB tail of combined
   * stdout; at 76+ queries the full names alone blow that budget (r5/r6
   * lost their medians lines to truncation). The number is the stable,
   * unique part of the name — full names live in the runs FILE, and the
   * medians line carries `"keys":"short"` so a reader knows the scheme.
   * Names without the `qNN_` shape pass through unchanged; uniqueness of
   * the short keys is asserted by SparkEntrySpec at authoring time. */
  private val QNum = "^q0*([0-9]+)_.*$".r
  def shortKey(name: String): String = name match {
    case QNum(n) => n
    case _       => name
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // non-numeric → default, ≤0 → 1: a bad env var must not crash the bench
    val iters = math.max(1, sys.env.get("SPARK_GRAFT_ITERS").flatMap(_.toIntOption).getOrElse(3))
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
    // A run that THROWS records the -1.0 sentinel, not its elapsed time —
    // a fast failure must not read as a speedup.
    // Iteration order is ROUND-ROBIN (all queries once, then repeat), not
    // per-query back-to-back: a host-noise burst lasting seconds used to
    // land on ALL iterations of whichever query was running and poison
    // its median; spread out, the same burst touches one iteration of
    // several queries and the median absorbs it.
    val names = SparkEntry.queries.keys.toSeq
    val acc = scala.collection.mutable.LinkedHashMap(
      names.map(n => n -> Vector.empty[Double]): _*)
    for (_ <- 1 to iters; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val t = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
              catch { case _: Throwable => -1.0 }
      acc(name) = acc(name) :+ t
    }
    val runs = acc.map { case (k, v) => k -> (v: Seq[Double]) }
    // any failed run poisons the query's median to the sentinel
    def median(ts: Seq[Double]): Double =
      if (ts.exists(_ < 0)) -1.0 else { val s = ts.sorted; s(s.length / 2) }
    val medians = runs.map { case (k, ts) => k -> median(ts) }
    // The stdout contract is ONE SHORT JSON line: the harness that collects
    // it keeps only a bounded (~2 KB) tail of combined output, and anything
    // printed after the medians line evicts its FRONT. The per-iteration
    // arrays used to go to stderr, but sbt flushes stderr after stdout, so
    // since r5 the long bench_runs line landed LAST in the combined capture
    // and pushed the medians line out of the tail entirely (BENCH_r05/r06
    // contain only truncated per-iter arrays). Raw runs now go to a FILE
    // (under FULL names); the medians line is the final print, under SHORT
    // keys (`shortKey` above) so it fits the tail past 90 queries.
    // Medians at 3 decimals: 2 decimals collapsed sub-10 ms queries to
    // 0.00/0.01 (r7 advice) — 1 ms granularity keeps per-query signal
    // while the short keys more than pay for the extra digit.
    def fmt(v: Double): String = if (v < 0) "-1.0" else f"$v%.3f"
    val qs = medians.map { case (k, v) => s"\"" + shortKey(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val rs = runs.map { case (k, ts) => s"\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = if (medians.nonEmpty) medians.values.sum else 0.0
    try {
      val p = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_RUNS_FILE", "/tmp/graft_bench_runs.json"))
      java.nio.file.Files.write(p, s"""{"bench_runs":$rs,"iters":$iters}""".getBytes("UTF-8"))
    } catch { case _: Throwable => () } // diagnostics only — never fail the bench
    spark.stop()
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","keys":"short","queries":$qs,"iters":$iters,"sf":"$sfDir"}""")
  }
}
