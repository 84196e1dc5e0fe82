package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions exposes vector_dot and rolling_hash to SQL") {
    // extensions bind at session build time: temporarily clear the shared
    // default session so getOrCreate constructs a fresh session (reusing
    // the JVM's SparkContext) with the extensions applied, then restore.
    // `withExtensions` is the programmatic twin of setting
    // spark.sql.extensions=graft.GraftExtensions at launch (the conf form
    // is a static conf — it cannot attach to an already-running context,
    // which is exactly the test-JVM situation here).
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val dot = spark.sql(
        "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").first().getDouble(0)
      assert(dot === 11.0)
      val h = spark.sql("SELECT rolling_hash('spark') AS h").first().getLong(0)
      val expected = "spark".getBytes("UTF-8").foldLeft(0L)((a, b) => a * 31L + (b & 0xff))
      assert(h === expected)
      // the injected planner strategy plans TopKPerGroupPlan without the
      // experimental-strategies fallback TopK.topKPerGroupNative installs
      assert(spark.sessionState.planner.strategies
        .contains(graft.plans.TopKPerGroupStrategy),
        "TopKPerGroupStrategy not injected by GraftExtensions")
      import spark.implicits._
      val df = Seq(("a", 1L, 2.0), ("a", 2L, 3.0), ("b", 3L, 1.0)).toDF("g", "id", "v")
      val topped = org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
        graft.plans.TopKPerGroupPlan(
          Seq(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("g")),
          Seq(org.apache.spark.sql.catalyst.expressions.SortOrder(
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("v"),
            org.apache.spark.sql.catalyst.expressions.Descending)),
          1, df.queryExecution.analyzed))
        .select("g", "id").as[(String, Long)].collect().toSet
      assert(topped === Set(("a", 2L), ("b", 3L)))
    } finally {
      // do NOT stop: the SparkContext is shared with the other suites
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
