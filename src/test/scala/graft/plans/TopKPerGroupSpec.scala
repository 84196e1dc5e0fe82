package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.{TextOps, TopK}

class TopKPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("native heap top-k ≡ window rank, including ties broken by the total order") {
    val df = Seq(
      ("a", 1L, 3.0), ("a", 2L, 3.0), ("a", 3L, 2.0), ("a", 4L, 1.0),
      ("b", 5L, 9.0), ("b", 6L, 9.5),
      ("c", 7L, 0.0))
      .toDF("g", "id", "score")
      .repartition(4) // spread groups over partitions → partial stage does real work
    val native = TopK.topKPerGroupNative(df, Seq("g"), Seq(("score", false), ("id", true)), k = 2)
      .select("g", "id", "rnk").as[(String, Long, Long)].collect().toSet
    assert(native === Set(
      ("a", 1L, 1L), ("a", 2L, 2L), // 3.0-tie broken by id
      ("b", 6L, 1L), ("b", 5L, 2L),
      ("c", 7L, 1L)))
  }

  test("native ≡ salted two-level on the corpus; plan has partial+final stages and no sort") {
    val docs = TextOps.quality(Tables.documents(spark, TinySf))
      .select(col("lang"), col("doc_id"), col("quality_score"))
    val native = TopK.topKPerGroupNative(
      docs, Seq("lang"), Seq(("quality_score", false), ("doc_id", true)), k = 5)
    val salted = TopK.topKPerGroup(
      docs, Seq("lang"), Seq(col("quality_score").desc, col("doc_id")), k = 5)
      .select("lang", "doc_id", "quality_score", "rnk")
    assert(native.as[(String, Long, Double, Long)].collect().toSet ===
      salted.as[(String, Long, Double, Long)].collect().toSet)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"native operator missing from plan:\n$plan")
    assert(!plan.contains("SortExec"), s"heap operator must not sort:\n$plan")
    // both stages present: partial (pre-exchange) and final
    assert("TopKPerGroup".r.findAllIn(plan).length >= 2, s"partial stage missing:\n$plan")
  }

  test("k larger than any group returns whole groups, fully ranked") {
    val df = Seq(("a", 1L, 2.0), ("a", 2L, 1.0), ("b", 3L, 5.0)).toDF("g", "id", "score")
    val out = TopK.topKPerGroupNative(df, Seq("g"), Seq(("score", false), ("id", true)), k = 10)
      .select("g", "id", "rnk").as[(String, Long, Long)].collect().toSet
    assert(out === Set(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 1L)))
  }

  test("empty group list is rejected at construction, not at planning") {
    val df = Seq(("a", 1L, 2.0)).toDF("g", "id", "score")
    val e = intercept[IllegalArgumentException] {
      TopK.topKPerGroupNative(df, Nil, Seq(("score", false)), k = 1)
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("partial-stage group cap degrades to pass-through without changing output") {
    // high-cardinality group key (200 groups, cap 8): the partial stage may
    // hold at most 8 heaps per partition; every other key's rows must ship
    // unpruned and still come out exactly top-k'd by the final stage
    val df = spark.range(1000)
      .select((col("id") % 200).as("g"), col("id"),
        (col("id") * 37 % 101).cast("double").as("score"))
      .repartition(4)
    val expected = TopK.topKPerGroup(
      df.toDF(), Seq("g"), Seq(col("score").desc, col("id")), k = 3)
      .select("g", "id", "score", "rnk").as[(Long, Long, Double, Long)].collect().toSet
    spark.conf.set("spark.graft.topk.maxPartialGroups", "8")
    // AQE wraps the executed plan in leaf stage nodes that hide the exec
    // from TreeNode.collect — plain planning keeps the metric reachable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // ONE dataset for both the action and the metric read: a derived
      // .select/.as would carry its own (unexecuted) QueryExecution
      val capped = TopK.topKPerGroupNative(
        df.toDF(), Seq("g"), Seq(("score", false), ("id", true)), k = 3)
        .select("g", "id", "score", "rnk").as[(Long, Long, Double, Long)]
      val got = capped.collect().toSet
      assert(got === expected)
      // the cap actually fired: the partial exec's pass-through metric is > 0
      val passedThrough = capped.queryExecution.executedPlan.collect {
        case e: TopKPerGroupExec if e.partial => e.metrics("passThroughRows").value
      }.sum
      assert(passedThrough > 0L,
        s"expected the 8-group cap to pass rows through (200 groups over 4 partitions)")
    } finally {
      spark.conf.unset("spark.graft.topk.maxPartialGroups")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }
}
