package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics backing q100: update-mode unwindowed aggregation re-emits a
  * key in exactly the micro-batches that touch it, with the cumulative
  * running total; the last update per key equals the batch aggregate. */
class StreamingUpdateCountersSpec extends SparkSpec {
  import spark.implicits._

  test("each batch re-emits only touched keys with running totals; last update = batch agg") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val counters = StreamingFunnel.runningCounters(
      input.toDF().toDF("event_type", "value"))
    var perBatch = Vector.empty[(Long, Set[(String, Long, Double)])]
    val q = counters.writeStream
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        perBatch = perBatch :+ (id ->
          b.select(col("event_type"), col("n_events"), col("sum_value"))
            .as[(String, Long, Double)].collect().toSet)
        ()
      }
      .start()
    try {
      input.addData(("view", 1.0), ("view", 2.0), ("click", 10.0))
      q.processAllAvailable()
      input.addData(("view", 4.0)) // batch 2 touches ONLY view
      q.processAllAvailable()
      input.addData(("purchase", 100.0)) // batch 3 touches ONLY purchase
      q.processAllAvailable()
      val emitted = perBatch.filter(_._2.nonEmpty).map(_._2)
      assert(emitted === Vector(
        Set(("view", 2L, 3.0), ("click", 1L, 10.0)),
        Set(("view", 3L, 7.0)), // click NOT re-emitted: untouched
        Set(("purchase", 1L, 100.0))))
      // last-write-wins over all updates = the batch group-by
      val last = emitted.flatten
        .groupBy(_._1).map { case (k, vs) => vs.last }.toSet
      assert(last === Set(
        ("view", 3L, 7.0), ("click", 1L, 10.0), ("purchase", 1L, 100.0)))
    } finally q.stop()
  }
}
