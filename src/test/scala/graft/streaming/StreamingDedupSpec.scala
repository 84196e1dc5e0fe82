package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("fingerprint dedup keeps one row per content within the watermark, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamingDedup.byFingerprint(
      input.toDF().toDF("doc_id", "ts", "text"),
      eventTimeCol = "ts", delay = "1 hour")
    val q = deduped.writeStream
      .format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      // batch 1: two distinct texts + an in-batch duplicate (whitespace
      // variant — the batch fingerprint normalizes it away)
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "alpha beta gamma"),
        (2L, ts("2024-01-01 10:00:30"), "  Alpha   beta GAMMA "),
        (3L, ts("2024-01-01 10:01:00"), "delta epsilon"))
      q.processAllAvailable()
      val b1 = spark.table("stream_dedup").select("text").as[String].collect()
      assert(b1.length === 2, s"in-batch duplicate not dropped: ${b1.mkString("|")}")

      // batch 2: cross-batch duplicate (dropped — state carried) + new text
      input.addData(
        (4L, ts("2024-01-01 10:05:00"), "alpha beta gamma"),
        (5L, ts("2024-01-01 10:06:00"), "zeta eta"))
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").select("doc_id").as[Long].collect().toSet
      assert(!ids.contains(4L), "cross-batch duplicate leaked through")
      assert(ids.contains(5L))
      assert(spark.table("stream_dedup").count() === 3)

      // distinct fingerprints in output = batch-distinct fingerprints seen
      val outFps = spark.table("stream_dedup")
        .select("fingerprint").as[String].collect().toSet
      assert(outFps.size === 3)
    } finally q.stop()
  }

  test("state is evicted past the watermark: a late re-occurrence starts fresh") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamingDedup.byFingerprint(
      input.toDF().toDF("doc_id", "ts", "text"),
      eventTimeCol = "ts", delay = "10 minutes")
    val q = deduped.writeStream
      .format("memory").queryName("stream_dedup_evict")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00"), "alpha")) ; q.processAllAvailable()
      // push the watermark hours past the first key, evicting its state
      input.addData((2L, ts("2024-01-01 15:00:00"), "other")) ; q.processAllAvailable()
      // same content again, far outside the horizon → kept (windowed contract)
      input.addData((3L, ts("2024-01-01 15:01:00"), "alpha")) ; q.processAllAvailable()
      val ids = spark.table("stream_dedup_evict").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L, 3L))
    } finally q.stop()
  }
}
