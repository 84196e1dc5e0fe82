package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Measurement-only probe for VERDICT r21 item #6: A/B the two
  * ngram-Jaccard plans (AllPairs inverted-index vs AllPairs prefix
  * filtering) on a given corpus dir — intended for the 3× slope corpus,
  * where candidate volume Σ|posting|² has grown 9× while the prefix
  * machinery's overhead grew 3× — and report what the auto-switch
  * (`Dedup.prefixWorthIt`, the 64·m threshold) would decide there.
  * Test-scope, not part of any driver contract (BenchAuditProbe
  * precedent).
  *
  * Usage: sbt "Test/runMain graft.NgramPlanProbe /tmp/graft_3x [iters]"
  */
object NgramPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_3x")
    val iters = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val hint = Dedup.measureCorpus(docs)
    println(s"CORPUS dir=$dir docs=${hint.docCount} idRange=[${hint.minId},${hint.maxId}]")
    println("AUTO prefixWorthIt=" + Dedup.prefixWorthIt(docs, corpusSize = Some(hint.docCount)))
    def time(tag: String, prefix: Boolean): Unit = {
      spark.sparkContext.setJobDescription(s"ngram-probe:$tag")
      // warm-up, untimed
      Dedup.ngramJaccard(docs, minJaccard = 0.5, prefixFilter = Some(prefix),
        corpusHint = Some(hint)).write.mode("overwrite").format("noop").save()
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        Dedup.ngramJaccard(docs, minJaccard = 0.5, prefixFilter = Some(prefix),
          corpusHint = Some(hint)).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.length / 2)
      println(f"NGRAM $tag%-9s median=$med%7.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("allpairs", prefix = false)
    time("prefix", prefix = true)
    spark.stop()
  }
}
