package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("sliding windows cover every token and overlap by chunkSize - stride") {
    val docs = Seq((1L, (1 to 35).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Chunking.slidingWindow(docs, chunkSize = 20, stride = 15)
      .orderBy("chunk_idx")
      .as[(Long, Long, String, Long, Long)].collect()
    // 35 words, starts 0/15/30
    assert(chunks.map(_._5).toSeq === Seq(0L, 15L, 30L))
    assert(chunks.map(_._4).toSeq === Seq(20L, 20L, 5L))
    assert(chunks(0)._3.endsWith("w20") && chunks(1)._3.startsWith("w16"))
    // trailing chunk is the remainder
    assert(chunks(2)._3 === "w31 w32 w33 w34 w35")
  }

  test("every word appears in at least one chunk; no chunk exceeds chunkSize") {
    val docs = Tables.documents(spark, TinySf)
    val chunks = Chunking.slidingWindow(docs, chunkSize = 20, stride = 15)
    assert(chunks.filter(col("n_tokens") > 20 || col("n_tokens") < 1).count() === 0)
    // per-doc coverage: last chunk must reach the end of the word array
    val bad = chunks.groupBy("doc_id")
      .agg(max(col("start_token") + col("n_tokens")).as("covered"))
      .join(docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("len")), "doc_id")
      .filter(col("covered") =!= col("len"))
    assert(bad.count() === 0)
  }

  test("empty text still yields one (empty) chunk") {
    val docs = Seq((1L, "")).toDF("doc_id", "text")
    val out = Chunking.slidingWindow(docs).as[(Long, Long, String, Long, Long)].collect()
    assert(out.length === 1 && out(0)._3 === "")
  }
}

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("nearest-rank quantiles pick the element at ceil(p*n)") {
    // group of 10: p25 -> rank 3, p50 -> rank 5, p75 -> rank 8, p90 -> rank 9
    val df = (1 to 10).map(i => ("g", i.toLong * 10, i.toLong)).toDF("g", "v", "id")
    val r = Quantiles.discrete(df, "g", "v", "id")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(r === (("g", 30L, 50L, 80L, 90L, 10L)))
  }

  test("singleton group returns its only element for every p") {
    val df = Seq(("g", 7L, 1L)).toDF("g", "v", "id")
    val r = Quantiles.discrete(df, "g", "v", "id")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(r === (("g", 7L, 7L, 7L, 7L, 1L)))
  }
}

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("latestByKey keeps exactly the max-(time, tie) row per key") {
    val df = Seq(
      (1L, "a", 10L, "old"), (1L, "a", 20L, "new"),
      (1L, "b", 5L, "only"),
      (2L, "a", 20L, "lo-tie"), (2L, "a", 20L, "hi-tie"))
      .toDF("k1", "k2", "t", "payload")
      .withColumn("tie", monotonically_increasing_id())
    val out = Compaction.latestByKey(df, Seq("k1", "k2"), "t", "tie")
      .select("k1", "k2", "payload").as[(Long, String, String)].collect().toSet
    assert(out.map(r => (r._1, r._2)).size === 3) // one row per key
    assert(out.contains((1L, "a", "new")))
    assert(out.contains((1L, "b", "only")))
    assert(out.exists(r => r._1 == 2L && r._3.endsWith("tie"))) // deterministic tie pick
  }

  test("equals groupBy max_by on the event log") {
    val ev = Tables.events(spark, TinySf)
    val win = Compaction.latestByKey(ev, Seq("user_id", "event_type"), "ts", "event_id")
      .select("user_id", "event_type", "event_id")
      .as[(Long, String, Long)].collect().toSet
    val agg = ev.groupBy("user_id", "event_type")
      .agg(max_by(col("event_id"), struct(col("ts"), col("event_id"))).as("event_id"))
      .as[(Long, String, Long)].collect().toSet
    assert(win === agg)
  }
}

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("hand-computed BM25 on a 3-doc corpus") {
    val docs = Seq(
      (1L, "cat dog cat"),   // tf(cat)=2, dl=3
      (2L, "dog dog dog"),   // no query term match below
      (3L, "cat fish"))      // tf(cat)=1, dl=2
      .toDF("doc_id", "text")
    val out = Bm25.score(docs, Seq("cat"), topN = 10)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    // N=3, df(cat)=2, avgdl=8/3; idf = ln(1 + 1.5/2.5)
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def tfn(tf: Double, dl: Double) =
      (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (8.0 / 3.0)))
    def r9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    assert(out.keySet === Set(1L, 3L))
    assert(math.abs(out(1L) - r9(idf * tfn(2.0, 3.0))) < 1e-9)
    assert(math.abs(out(3L) - r9(idf * tfn(1.0, 2.0))) < 1e-9)
    assert(out(1L) > out(3L), "higher tf at similar length must score higher")
  }

  test("longer documents are penalized at equal tf") {
    val docs = Seq(
      (1L, "cat " + ("filler " * 50).trim),
      (2L, "cat pad"))
      .toDF("doc_id", "text")
    val out = Bm25.score(docs, Seq("cat"), topN = 10)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out(2L) > out(1L))
  }
}
