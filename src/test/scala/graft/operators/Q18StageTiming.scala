package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** One-off stage-timing harness for q18 (the carried ≤2.5 s target):
  * isolates the three stages of the all-pairs exact-Jaccard plan on
  * materialized inputs so their costs don't blur through lazy evaluation.
  * Run: `Test/runMain graft.operators.Q18StageTiming [sfDir]`. Not a spec — evidence
  * for retiring or landing the target (round-8 item 3). */
object Q18StageTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up

    def time[A](label: String, iters: Int = 3)(f: => A): Double = {
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.length / 2)
      println(f"[q18-stage] $label%-28s median ${med}%.3f s  (runs: ${ts.map(t => f"$t%.3f").mkString(", ")})")
      med
    }

    val docs = Tables.documents(spark, sfDir)
    graft.functions.OrderedPairsPacked.register(spark)
    def orderedPairsPacked(c: org.apache.spark.sql.Column) =
      call_function("ordered_pairs_packed", c)

    // end-to-end baseline (what the bench measures)
    time("end_to_end") { Dedup.ngramJaccard(docs, minJaccard = 0.5).count() }

    // planning actions the auto path runs on EVERY invocation
    time("p1_prefixWorthIt") { Dedup.prefixWorthIt(docs) }
    time("p2_stats_scan") {
      docs.agg(count(lit(1)), min(col("doc_id").cast("long")),
        max(col("doc_id").cast("long"))).head()
    }

    // end-to-end with caller-supplied hints (no planning actions)
    val hint = {
      val r = docs.agg(count(lit(1)), min(col("doc_id").cast("long")),
        max(col("doc_id").cast("long"))).head()
      Dedup.CorpusHint(r.getLong(0), r.getLong(1), r.getLong(2))
    }
    time("e2e_hinted") {
      Dedup.ngramJaccard(docs, minJaccard = 0.5,
        prefixFilter = Some(false), corpusHint = Some(hint)).count()
    }

    // stage 1: shingle explode + postings groupBy (collect_list + sort)
    val sh = docs.select(col("doc_id"), explode(TextOps.shingles(col("text"), 3)).as("shingle"))
    val postings = sh.groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
    time("s1_postings_build") { postings.count() }

    // materialize postings so downstream stages time in isolation
    val mat = postings.localCheckpoint(true)
    val big = mat.filter(size(col("docs")) > 1)

    // candidate volume: Σ|p|·(|p|−1)/2 over multi-doc postings
    val vol = big.agg(
      sum(size(col("docs")).cast("long") * (size(col("docs")) - 1) / 2).as("pairs"),
      count(lit(1)).as("postings"), max(size(col("docs"))).as("max_df")).head()
    println(s"[q18-stage] candidate_pairs=${vol.get(0)} multi_postings=${vol.getLong(1)} max_df=${vol.getInt(2)}")

    // stage 2a: packed-pair explode alone (no aggregation)
    time("s2a_pair_explode") {
      big.select(explode(orderedPairsPacked(col("docs"))).as("pk"))
        .select(count(lit(1))).head()
    }

    // stage 2b: explode + groupBy(pk) count (the n_common aggregate)
    val pairCounts = big
      .select(explode(orderedPairsPacked(col("docs"))).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("n_common"))
    time("s2b_pairs_grouped") { pairCounts.count() }

    // stage 3: sizes broadcast-join + jaccard filter, from materialized pairs
    val pcMat = pairCounts.localCheckpoint(true)
    val sizes = mat.select(explode(col("docs")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("sz")).localCheckpoint(true)
    time("s3_sizes_join") {
      pcMat
        .select(shiftrightunsigned(col("pk"), 32).as("a"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b"), col("n_common"))
        .join(broadcast(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sz_a")), Seq("a"))
        .join(broadcast(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sz_b")), Seq("b"))
        .withColumn("jaccard", col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= 0.5).count()
    }

    spark.stop()
  }
}
