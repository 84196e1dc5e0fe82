package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Decontamination, TextOps}

/** Round-12 bench-audit measurement harness (test scope, like
  * Q18StageTiming / PercentileRankScaleTiming):
  *
  *   Test/runMain graft.BenchAuditProbe [iters]   — the q56/q83 join A/B
  *   Test/runMain graft.BenchAuditProbe q100      — q100 phase profile
  *
  * Modes:
  *   default: medians-of-N A/B of the null-safe (`<=>`) rollup joins in
  *     repetitionSignals / decontaminate against their pre-r11 equi-join
  *     formulations AND against the bare aggregate with no join. The
  *     equi variants measure FASTER than the aggregate alone because
  *     Catalyst eliminates the left join (unique keys from the groupBy,
  *     no right-side columns under count()) and prunes the whole
  *     aggregation subtree — i.e. the old bench numbers never executed
  *     the operator's real work. See README "Round-12 bench audit".
  *   q100: replays the q100 file-stream harness with a
  *     StreamingQueryListener, printing per-phase wall times and
  *     per-batch durationMs splits. */
object BenchAuditProbe {

  // r9 formulation of repetitionSignals: plain equi rollup join
  private def repetitionEqui(docs: DataFrame): DataFrame = {
    val toks = array_remove(split(col("text"), " "), "")
    val n1 = greatest(size(col("__toks")) - 1, lit(0))
    val base = docs
      .select(col("doc_id"), toks.as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("__toks"))).cast("long"))
    val bigrams = base.select(
      col("doc_id"),
      explode(zip_with(
        slice(col("__toks"), lit(1), n1),
        slice(col("__toks"), lit(2), n1),
        (x, y) => concat(x, lit(" "), y))).as("bigram"))
    val agg = bigrams
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("top_bigram_count"), sum(col("cnt")).as("n_bigrams"))
    base.drop("__toks")
      .join(agg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("top_bigram_count", "n_bigrams"))
      .withColumn("keep",
        ((col("n_distinct") * 2 > col("n_tokens")) &&
          (col("n_bigrams") === 0 || col("top_bigram_count") * 5 <= col("n_bigrams")))
          .cast("long"))
  }

  // phase-level profile of the q100 harness: where do the ~2.5 s go?
  private def profileQ100(spark: SparkSession): Unit = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val dir = "/root/testdata/sf0.1"
    val scratch = "/tmp/graft_probe_q100"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q100] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val splitDir = s"$scratch/split"
    t("split write (3 jobs)") {
      val src = spark.read.schema(rawSchema).parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("event_type"), col("value"))
      for (k <- 0 until 3)
        src.filter(pmod(coalesce(col("event_id"), lit(0L)), lit(3)) === k).coalesce(1)
          .write.mode(if (k == 0) "overwrite" else "append").parquet(splitDir)
    }
    val batches = scala.collection.mutable.Buffer.empty[String]
    val listener = new StreamingQueryListener {
      def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        batches += f"batch=${p.batchId} rows=${p.numInputRows} " +
          f"durMs=${p.durationMs}"
      }
      def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    t("stream (3 batches)") {
      val ev = spark.readStream.schema(spark.read.parquet(splitDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(splitDir)
      val q = graft.streaming.StreamingFunnel.runningCounters(ev)
        .writeStream
        .option("checkpointLocation", s"$scratch/ckpt")
        .outputMode("update")
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.withColumn("batch_id", lit(id)).write.mode("append").parquet(s"$scratch/out")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.streams.removeListener(listener)
    batches.foreach(b => println(s"[q100]   $b"))
    t("final window+count") {
      val w = Window.partitionBy(col("event_type")).orderBy(col("batch_id").desc)
      spark.read.parquet(s"$scratch/out")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("event_type"), col("n_events"), col("sum_value"))
        .count()
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("q100")) {
      for (_ <- 1 to 3) profileQ100(spark)
      spark.stop(); return
    }
    if (args.headOption.contains("prune-audit")) {
      // Which gated queries does Catalyst PARTIALLY ELIMINATE under the
      // bench's count() action? Dataset.count() == groupBy().count(), and
      // the optimizer may drop whole subtrees under it (left join on
      // unique keys with no right-side columns referenced → the entire
      // right branch vanishes — the q56/q83 artifact). A query flagged
      // here has bench numbers measuring LESS work than its oracle-gated
      // result performs. Leaf-relation counts compare the optimized plan
      // of the output frame vs the optimized plan under the count.
      // Two signatures per plan: leaf-relation count (dropped JOIN/UNION
      // branches) and work-node count — Window / Join / Aggregate /
      // Generate (count() also prunes cardinality-preserving interiors:
      // a window compute vanishes wholesale, which leaf counts miss —
      // q30's 4 fused window passes measure 6× under noop).
      import org.apache.spark.sql.catalyst.plans.{logical => lp}
      def sig(plan: lp.LogicalPlan): (Int, Int) = {
        val leaves = plan.collectLeaves().size
        val work = plan.collect {
          case _: lp.Window | _: lp.Join | _: lp.Aggregate | _: lp.Generate => 1
        }.sum
        (leaves, work)
      }
      val sfDir = "/root/testdata/sf0.01" // cheap: queries EXECUTE side effects when built
      var flagged = 0
      for ((name, fn) <- SparkEntry.queries) {
        try {
          val df = fn(spark, sfDir)
          val (fl, fw) = sig(df.queryExecution.optimizedPlan)
          // count() adds its own Aggregate — subtract it from the compare
          val (cl, cw0) = sig(df.groupBy().count().queryExecution.optimizedPlan)
          val cw = cw0 - 1
          if (cl < fl || cw < fw) {
            flagged += 1
            println(s"[prune-audit] $name: output plan $fl scans/$fw work nodes, " +
              s"under count() $cl/$cw — bench count() under-measures this query")
          }
        } catch { case e: Throwable =>
          println(s"[prune-audit] $name: skipped (${e.getClass.getSimpleName})")
        }
      }
      println(s"[prune-audit] done: $flagged of ${SparkEntry.queries.size} flagged")
      spark.stop(); return
    }
    if (args.headOption.contains("q39")) {
      // curate() end-to-end: measures the dedup split-branch formulation
      val d = Tables.documents(spark, "/root/testdata/sf0.1")
      graft.operators.Curation.curate(d).count() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.Curation.curate(d).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[q39] median=${ts(2)}%6.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
      spark.stop(); return
    }
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)

    val variants: Seq[(String, () => Long)] = Seq(
      "q83_cur" -> (() => TextOps.repetitionSignals(docs).count()),
      "q83_equi" -> (() => repetitionEqui(docs).count()),
      "q56_cur" -> (() => Decontamination.decontaminate(
        docs.filter(col("doc_id") % 10 =!= 0), docs.filter(col("doc_id") % 10 === 0)).count()),
      "q56_equi" -> (() => {
        val d = docs
        val train = d.filter(col("doc_id") % 10 =!= 0)
        val eval = d.filter(col("doc_id") % 10 === 0)
        val evalSh = eval
          .select(explode(TextOps.shingles(spark, col("text"), 3)).as("shingle"))
          .distinct().withColumn("hit", lit(1L))
        val perDoc = train
          .select(col("doc_id"), explode(TextOps.shingles(spark, col("text"), 3)).as("shingle"))
          .join(broadcast(evalSh), Seq("shingle"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"), sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        train.select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)) > 0L).cast("long").as("contaminated"))
          .count()
      }),
      "q56_nojoin" -> (() => {
        // upper bound: perDoc aggregate alone, no restore join
        val d = docs
        val train = d.filter(col("doc_id") % 10 =!= 0)
        val eval = d.filter(col("doc_id") % 10 === 0)
        val evalSh = eval
          .select(explode(TextOps.shingles(spark, col("text"), 3)).as("shingle"))
          .distinct().withColumn("hit", lit(1L))
        train
          .select(col("doc_id"), explode(TextOps.shingles(spark, col("text"), 3)).as("shingle"))
          .join(broadcast(evalSh), Seq("shingle"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"), sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .count()
      }),
      "q83_nojoin" -> (() => {
        val toks = array_remove(split(col("text"), " "), "")
        val n1 = greatest(size(col("__toks")) - 1, lit(0))
        val base = docs
          .select(col("doc_id"), toks.as("__toks"))
          .withColumn("n_tokens", size(col("__toks")).cast("long"))
          .withColumn("n_distinct", size(array_distinct(col("__toks"))).cast("long"))
        base.select(
          col("doc_id"),
          explode(zip_with(
            slice(col("__toks"), lit(1), n1),
            slice(col("__toks"), lit(2), n1),
            (x, y) => concat(x, lit(" "), y))).as("bigram"))
          .groupBy(col("doc_id"), col("bigram"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("doc_id"))
          .agg(max(col("cnt")).as("top_bigram_count"), sum(col("cnt")).as("n_bigrams"))
          .count()
      }))

    // warmup all
    variants.foreach { case (_, f) => f() }
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector())
    for (_ <- 1 to iters; (n, f) <- variants) {
      val t0 = System.nanoTime(); f()
      times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
    }
    for ((n, _) <- variants) {
      val ts = times(n).sorted
      println(f"$n%-12s median=${ts(ts.length / 2)}%6.3f  all=${times(n).map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
