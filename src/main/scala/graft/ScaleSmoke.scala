package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.funnel.Funnel
import graft.operators.{AsofJoin, Attribution, Bm25, Chunking, Compaction, Dedup, FuzzyJoin, Journeys, Layout, MarkovAttribution, Multimodal, Packing, PageRank, Quantiles, RangeJoin, Redaction, Reporting, Sampling, Sessionize, Similarity, Sketches, TextOps}
import graft.sources.{ParquetWarehouse, SQLiteWarehouse}

/** Scale smoke: synthesizes events / documents / embeddings tables N× the
  * sf0.1 shape (same schema/distributions, deterministic from ids — no
  * RNG) in /tmp and runs the core funnel chain plus the training-data
  * operators, printing stage timings. Answers "does the plan survive a
  * 10–100× scale-up" with measurements instead of claims.
  * Run: `runMain graft.ScaleSmoke [multiplier]` (default 10 ⇒ ~1M events;
  * 100 ⇒ 10M events ≈ 100× the sf0.1 journey-join input).
  *
  * The exact embedding near-dup stage is capped at 10× regardless of the
  * multiplier: its COMPUTE is Θ(n²) by definition (exact threshold join
  * over dense vectors); what must scale is the PLAN — bounded-memory
  * triangle block join, no broadcast — and the subquadratic story is the
  * SRP-LSH ANN stage, which does run at the full multiplier. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nEvents = 100000L * mult
    val nUsers = 1500L * mult // user count scales too: per-user density fixed
    val path = s"/tmp/graft_scale_${mult}x"
    val types = array(lit("view"), lit("click"), lit("signup"), lit("error"), lit("purchase"))
    spark.range(nEvents)
      .select(
        col("id").as("event_id"),
        timestamp_micros(lit(1704067200000000L) + col("id") * lit(25920000L)) // ~30 days spread
          .as("ts"),
        pmod(xxhash64(col("id"), lit("u")), lit(nUsers)).as("user_id"),
        element_at(types, pmod(xxhash64(col("id"), lit("t")), lit(5)).cast("int") + 1)
          .as("event_type"),
        (pmod(xxhash64(col("id"), lit("v")), lit(20000)).cast("double") / 100.0).as("value"),
        concat(lit("{\"k\": "), pmod(xxhash64(col("id"), lit("k")), lit(100)), lit("}"))
          .as("props"))
      .write.mode("overwrite").parquet(path)

    val events = spark.read.parquet(path)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    println(s"== scale smoke: ${mult}x sf0.1 (${nEvents} events, $nUsers users) ==")
    val conv = Funnel.conversions(events)
    val sess = Funnel.sessions(events)
    // Each stage is timed over a MATERIALIZED input (parquet written by the
    // previous stage) so a stage's number is that stage alone — not "stage
    // plus a recompute of everything upstream". (Timing lazy plans
    // end-to-end inside every downstream timer is what produced the
    // round-3/4 "attribution is superlinear" artifact.) Window-producing
    // stages (attribution, redistribution) are forced through a parquet
    // WRITE of their full output: a bare `count()` lets ColumnPruning drop
    // the unreferenced window projections and times an empty shell. Their
    // timings therefore include materializing the 53M-row output — the
    // honest cost of the stage in a real pipeline.
    val journeysPath = s"/tmp/graft_scale_journeys_${mult}x"
    time("journey join (J1)")(Journeys.construct(conv, sess).count())
    Journeys.construct(conv, sess).write.mode("overwrite").parquet(journeysPath)
    val journeys = spark.read.parquet(journeysPath)
    val ihcPath = s"/tmp/graft_scale_ihc_${mult}x"
    time("attribution (+write)") {
      Attribution.ihc(journeys).write.mode("overwrite").parquet(ihcPath)
      spark.read.parquet(ihcPath).count()
    }
    val ihc = spark.read.parquet(ihcPath)
    val redistPath = s"/tmp/graft_scale_redist_${mult}x"
    time("redistribution (+write)") {
      Attribution.redistribute(ihc,
        rules = Map(
          "initializer" -> Attribution.Redistribution("earlier_sessions_only", 0.0, Seq("error", "signup")),
          "holder" -> Attribution.Redistribution("any_session", 0.0, Seq("error", "signup")),
          "closer" -> Attribution.Redistribution("later_sessions_only", 0.1, Seq("error"))))
        .write.mode("overwrite").parquet(redistPath)
      spark.read.parquet(redistPath).count()
    }
    time("channel report")(
      Reporting.channelReport(ihc, sess, conv).count())
    time("sessionize")(Sessionize.sessions(events).count())
    // alternative attribution models over the materialized journeys —
    // same one-window shuffle as ihc, forced through a write like it
    val decayPath = s"/tmp/graft_scale_decay_${mult}x"
    time("time-decay attr (+write)") {
      Attribution.timeDecay(journeys).write.mode("overwrite").parquet(decayPath)
      spark.read.parquet(decayPath).count()
    }
    val posPath = s"/tmp/graft_scale_pos_${mult}x"
    time("position attr (+write)") {
      Attribution.positionBased(journeys).write.mode("overwrite").parquet(posPath)
      spark.read.parquet(posPath).count()
    }
    // incremental last-wins upsert: the decay "re-run" merges over the
    // ihc "initial load" by journey key — one unionByName + one keyed
    // window dedup + rewrite, the read-merge-rewrite incremental pattern
    val upsertPath = s"/tmp/graft_scale_upsert_${mult}x"
    time("incremental upsert (+write)") {
      ihc.select(col("conversion_id"), col("session_id"), col("ihc"))
        .write.mode("overwrite").parquet(upsertPath)
      ParquetWarehouse.upsert(
        spark.read.parquet(decayPath)
          .select(col("conversion_id"), col("session_id"),
            col("decay_weight").as("ihc")),
        upsertPath, Seq("conversion_id", "session_id"))
      spark.read.parquet(upsertPath).count()
    }
    // PARTITION-SCOPED upsert (r13): a daily-grain warehouse table and a
    // one-day update batch. The batch is the SAME ~3 300 rows at every
    // multiplier (events/day is scale-invariant here: the event span
    // grows with mult), so the flat-vs-growing contrast is pure merge
    // scope — upsertPartitioned reads and rewrites one partition;
    // upsert reads, merges, and rewrites the whole table.
    locally {
      val daily = events.select(
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("user_id"), col("value"))
        .groupBy(col("event_date"), col("user_id"))
        .agg(sum(col("value")).as("spend"), count(lit(1)).as("n_events"))
      val batchPath = s"/tmp/graft_scale_pupbatch_${mult}x"
      daily.filter(col("event_date") === "2024-01-11")
        .withColumn("spend", col("spend") * 1.1)
        .write.mode("overwrite").parquet(batchPath)
      val oneDay = spark.read.parquet(batchPath)
      val pupPath = s"/tmp/graft_scale_pup_${mult}x/t"
      val fullPath = s"/tmp/graft_scale_pupfull_${mult}x/t"
      time("daily table seed (+write)") {
        ParquetWarehouse.writeDatePartitioned(daily, pupPath, "event_date")
        daily.write.mode("overwrite").parquet(fullPath)
        spark.read.parquet(pupPath).count()
      }
      time("partition-scoped upsert (1 day)") {
        ParquetWarehouse.upsertPartitioned(oneDay, pupPath,
          Seq("event_date", "user_id"), "event_date")
        spark.read.parquet(pupPath + "/event_date=2024-01-11").count()
      }
      time("full-rewrite upsert (same batch)") {
        ParquetWarehouse.upsert(oneDay, fullPath, Seq("event_date", "user_id"))
        spark.read.parquet(fullPath).count()
      }
    }
    // Markov attribution: the distributed part is transition counting
    // (one window + one groupBy over 53M journey rows); the chain solve
    // is the collected |channels|² matrix
    time("markov removal effects")(
      MarkovAttribution.removalEffects(spark, journeys).count())
    // sketches over the event stream: the count-min exchange carries 256
    // counter rows no matter the input; the bloom bit set is <= 4096 rows
    time("count-min build+query")(
      Sketches.countMinEstimate(
        Sketches.countMinBuild(events.select(col("user_id")), "user_id"),
        events.select(col("user_id")).distinct(), "user_id").count())
    time("bloom build+probe")(
      Sketches.bloomMightContain(
        Sketches.bloomBuild(
          events.filter(col("event_type") === "purchase" && col("value") > 195)
            .select(col("user_id")).distinct(),
          "user_id", k = 3, bits = 4096),
        events.select(col("user_id")).distinct(), "user_id", k = 3, bits = 4096)
        .count())
    // 5 event types → the low-cardinality regime: percentileRankAuto takes
    // the bucketed path (G·B-way parallel sorts + broadcast prefix
    // offsets) instead of 5 serial per-group total sorts
    time("percentile rank")(
      Quantiles.percentileRankAuto(
        events.select(col("event_id"), col("event_type"), col("value")),
        groupCol = "event_type", valueCol = "value", tieCol = "event_id",
        groupCountHint = Some(5L))
        .filter(col("pct_rank") >= 0.99).count())
    // STREAMING attribution over the same synthesized event table: the
    // stateful flatMapGroupsWithState operator consumes the parquet dir as
    // a file-source stream (AvailableNow) and writes attributed rows to
    // parquet — measuring that per-user journey state keeps up at N×.
    locally {
      import spark.implicits._
      val streamScratch = s"/tmp/graft_scale_stream_${mult}x"
      val fs2 = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs2.delete(new org.apache.hadoop.fs.Path(streamScratch), true)
      time("streaming attribution") {
        val ev = spark.readStream
          .schema(events.schema).parquet(path)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
          .as[graft.streaming.StreamingFunnel.Event]
        val attributed = new graft.streaming.StreamingAttribution.Attributor().attribute(ev)
        val q = attributed.writeStream
          .outputMode("append")
          .option("checkpointLocation", s"$streamScratch/ckpt")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[graft.streaming.StreamingAttribution.AttributedRow],
             _: Long) => b.write.mode("append").parquet(s"$streamScratch/out")
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        spark.read.parquet(s"$streamScratch/out").count()
      }
    }
    // the join rewrites: outputs forced through a parquet write — their
    // window/agg columns are otherwise prunable under a bare count()
    val asofPath = s"/tmp/graft_scale_asof_${mult}x"
    time("as-of join (+write)") {
      AsofJoin.backward(
        events.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("ts")),
        events.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts")),
        key = "user_id", time = "ts")
        .write.mode("overwrite").parquet(asofPath)
      spark.read.parquet(asofPath).count()
    }
    val asofFwdPath = s"/tmp/graft_scale_asoffwd_${mult}x"
    time("forward as-of join (+write)") {
      AsofJoin.forward(
        events.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("ts")),
        events.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts")),
        key = "user_id", time = "ts")
        .write.mode("overwrite").parquet(asofFwdPath)
      spark.read.parquet(asofFwdPath).count()
    }
    val asofTolPath = s"/tmp/graft_scale_asoftol_${mult}x"
    time("tolerance as-of (+write)") {
      AsofJoin.backwardWithin(
        events.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"), col("ts")),
        events.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts")),
        key = "user_id", time = "ts", toleranceUs = 3600000000L)
        .write.mode("overwrite").parquet(asofTolPath)
      spark.read.parquet(asofTolPath).count()
    }
    val rangePath = s"/tmp/graft_scale_range_${mult}x"
    time("range join (+write)") {
      RangeJoin.followWithin(
        events.filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"), col("ts")),
        events.filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("ts"), col("value")),
        key = "user_id", anchorId = "event_id", time = "ts",
        valueCol = "value", windowUs = 3600000000L)
        .write.mode("overwrite").parquet(rangePath)
      spark.read.parquet(rangePath).count()
    }

    // ---- training-data operators over synthesized docs / embeddings ----
    val nDocs = 5000L * mult
    val vocab = array((0 until 31).map(i => lit(s"w$i")): _*)
    val docsPath = s"/tmp/graft_scale_docs_${mult}x"
    spark.range(nDocs)
      .select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 50).map(j =>
          element_at(vocab, pmod(xxhash64(col("id"), lit(j)), lit(31)).cast("int") + 1)): _*)
          .as("text"))
      .write.mode("overwrite").parquet(docsPath)
    val docs = spark.read.parquet(docsPath)
    time("minhash LSH dedup")(Dedup.minhashLshDedup(docs, minJaccard = 0.8).count())
    // n-gram Jaccard with the prefix/all-pairs AUTO-SWITCH over a
    // boilerplate-skewed corpus (25% of docs share one of 10 boilerplate
    // prefixes — the heavy-tailed posting-list regime of web text). This
    // is the operator whose plan CHOICE is the scale story: all-pairs
    // candidate volume is Σdf², which grows quadratically with corpus
    // size on shared shingles, while the prefix machinery's overhead
    // grows linearly — so the correct plan flips as the corpus grows.
    // The stage prints which plan the sampled rule picked, then runs it.
    locally {
      val jacPath = s"/tmp/graft_scale_jac_${mult}x"
      spark.range(nDocs).select(
        col("id").as("doc_id"),
        when(pmod(xxhash64(col("id"), lit("bp")), lit(4)) === 0,
          concat(
            concat_ws(" ", (0 until 8).map(j =>
              concat(lit("b"), pmod(xxhash64(pmod(xxhash64(col("id"), lit("which")), lit(10)), lit(j)), lit(1000)))): _*),
            lit(" "),
            concat_ws(" ", (0 until 12).map(j =>
              concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(10000)))): _*)))
          .otherwise(
            concat_ws(" ", (0 until 20).map(j =>
              concat(lit("w"), pmod(xxhash64(col("id"), lit(j)), lit(10000)))): _*))
          .as("text"))
        .write.mode("overwrite").parquet(jacPath)
      val jacDocs = spark.read.parquet(jacPath)
      val usePrefix = Dedup.prefixWorthIt(jacDocs, "doc_id", "text", n = 3,
        corpusSize = Some(nDocs))
      println(s"   (ngram jaccard auto-switch picked: ${if (usePrefix) "prefix-filter" else "all-pairs"})")
      // corpus stats are KNOWN here (range ids) — pass the hint so the
      // all-pairs branch doesn't re-run measureCorpus inside the timer
      time("ngram jaccard (auto)")(
        Dedup.ngramJaccard(jacDocs, minJaccard = 0.5,
          prefixFilter = Some(usePrefix),
          corpusHint = Some(Dedup.CorpusHint(nDocs, 0L, nDocs - 1))).count())
    }
    time("simhash near-dups")(Dedup.simhashNearDups(docs, maxHamming = 3).count())
    // dedup clustering over the simhash candidate pairs (materialized so the
    // CC timer measures label propagation, not pair generation again)
    val simPairsPath = s"/tmp/graft_scale_simpairs_${mult}x"
    Dedup.simhashNearDups(docs, maxHamming = 3).select(col("a"), col("b"))
      .write.mode("overwrite").parquet(simPairsPath)
    time("dedup clustering (CC)")(
      Dedup.connectedComponents(spark.read.parquet(simPairsPath)).count())
    time("stars CC (same pairs)")(
      Dedup.connectedComponentsStars(spark.read.parquet(simPairsPath)).count())
    time("vocabulary top-100")(TextOps.vocabulary(docs).count())
    time("tf-idf top-3/doc") {
      // q46's shape over the synthesized corpus: two token-keyed partial
      // aggs, broadcast scalar N, per-doc row_number cut
      val toks = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      val tf = toks.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val dfreq = toks.groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
      val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("score").desc, col("token"))
      tf.join(dfreq, "token").crossJoin(broadcast(n))
        .withColumn("score", round(col("tf").cast("double") *
          log((col("n_docs").cast("double") + 1.0) / (col("df").cast("double") + 1.0)), 9))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .count()
    }

    // packing / sampling over the same docs (8 synthetic shards); the
    // packing prefix-sum windows are prunable under count(), so the stage
    // is forced through a write like the other window producers
    val sharded = docs.withColumn("source",
      pmod(xxhash64(col("doc_id"), lit("s")), lit(8)).cast("string"))
    val packPath = s"/tmp/graft_scale_pack_${mult}x"
    time("sequence packing (+write)") {
      Packing.concatChunk(sharded, budget = 2048L)
        .write.mode("overwrite").parquet(packPath)
      spark.read.parquet(packPath).count()
    }
    time("stratified sample n=100")(
      Sampling.stratifiedQuota(sharded, "source", "doc_id", n = 100).count())
    time("mixture sample")(
      Sampling.mixture(sharded, "source", "doc_id",
        rates = (0 until 8).map(i => i.toString -> (0.05 + 0.1 * i)).toMap).count())
    time("doc chunking 20/15")(
      Chunking.slidingWindow(docs, chunkSize = 20, stride = 15).count())
    time("exact quantiles")(
      Quantiles.discrete(
        sharded.withColumn("n_chars", length(col("text")).cast("long")),
        groupCol = "source", valueCol = "n_chars", tieCol = "doc_id").count())
    // percentile-cutoff filter: one window shuffle for the bounds, then a
    // broadcast-join filter pass — the count can't prune the window (the
    // predicate needs lo/hi)
    time("percentile filter p10-p90")(
      Quantiles.percentileFilter(
        sharded.withColumn("n_chars", length(col("text")).cast("long")),
        groupCol = "source", valueCol = "n_chars", tieCol = "doc_id").count())
    // epoch resampling: narrow hash + explode, weights as literal CASEs
    time("epoch resample")(
      Sampling.epochResample(sharded,
        weights = (0 until 8).map(i => i.toString -> (0.25 + 0.5 * i)).toMap,
        stratumCol = "source", keyCol = "doc_id").count())
    // repetition signals: narrow array math + the (doc,bigram) partial-agg
    // histogram; the keep flag needs every signal, so count() prunes nothing
    time("repetition signals")(
      TextOps.repetitionSignals(docs).filter(col("keep") === 1).count())
    // PII redaction: pure narrow regexp map — synthesize contact strings
    // with real email/digit hits from the doc ids so both patterns fire
    time("PII redaction")(
      Redaction.redact(
        docs.select(col("doc_id"),
          concat(col("text"), lit(" contact u"), col("doc_id"),
            lit("@example.com ref "), col("doc_id") + 1000000L).as("contact")),
        "contact")
        .filter(col("n_emails") + col("n_numbers") > 0).count())
    time("BPE merge scan")(TextOps.mergeCandidates(docs, topN = 50).count())
    // BPE apply: learn-once (collect 20 rules) then a compiled
    // shuffle-free projection pass over the corpus + histogram rollup
    time("BPE apply (20 rules)") {
      val rules = TextOps.mergeCandidates(docs, topN = 20).collect()
        .map { r => val Array(a, b) = r.getString(0).split(" ", 2); (a, b) }.toSeq
      TextOps.bpeTokenize(docs, rules)
        .select(explode(col("tokens")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n")).count()
    }
    // substring dedup: O(n) k-gram hash projection, then the only
    // exchanges are the fingerprint hash-partition and the per-doc rollup
    time("substring dedup k=20")(
      Dedup.substringDedup(docs, k = 20, modSelect = 16)
        .filter(col("n_dup") > 0).count())
    // shard shuffle: the pos window is prunable under count(), so force the
    // full (shard, pos) materialization through a write
    val shardPath = s"/tmp/graft_scale_shards_${mult}x"
    time("shard shuffle (+write)") {
      Sampling.shardShuffle(docs, "doc_id", numShards = 64)
        .write.mode("overwrite").parquet(shardPath)
      spark.read.parquet(shardPath).count()
    }
    // fuzzy join: FastSS deletion-variant blocking over id-like names —
    // candidates stay ~linear (one-digit-apart ids collide on a variant)
    time("fuzzy join (lev<=1)")(
      FuzzyJoin.selfMatch1(
        docs.select(col("doc_id"),
          format_string("User#%09d", col("doc_id")).as("name")),
        "doc_id", "name").count())
    // PageRank: synthesized hash graph ∝ mult (10 edges/node), 3 rounds —
    // one dst-keyed shuffle per round, lineage truncated between rounds
    time("pagerank 3 iters")(
      PageRank.run(
        spark.range(50000L * mult).select(
          pmod(xxhash64(col("id"), lit("ps")), lit(5000L * mult)).cast("string").as("src"),
          pmod(xxhash64(col("id"), lit("pd")), lit(5000L * mult)).cast("string").as("dst")),
        "src", "dst", iterations = 3).count())
    // media codecs: columnar encode + codegen-expression decode. The
    // decode is a PRUNABLE projection now (no longer an opaque RDD map),
    // so a bare count() would skip the parse entirely — aggregate the
    // decoded outputs to force the full codec pass
    // (filtering on a decoded field forces the parse: every field comes
    // from ONE struct-returning expression, so the full decode runs even
    // when other fields are pruned)
    time("PPM encode+decode")(
      Multimodal.decodePpm(Multimodal.encodePpm(Multimodal.asMedia(sharded)))
        .filter(col("width").isNotNull).count())
    time("WAV encode+decode")(
      Multimodal.decodeWav(Multimodal.encodeWav(Multimodal.asMedia(sharded)))
        .filter(col("n_samples").isNotNull).count())
    // resize chains encode→resize→decode in ONE codegen projection
    time("PPM resize 4x4->2x2")(
      Multimodal.decodePpm(Multimodal.resizePpm(
        Multimodal.encodePpm(Multimodal.asMedia(sharded)), w2 = 2, h2 = 2))
        .filter(col("width").isNotNull).count())
    // substring REMOVAL: q98's fingerprint exchange + interval merge +
    // binary-slice stitch — filtering on the stitch hash forces the whole
    // surgery (clean_md5 depends on every upstream stage)
    time("substring removal k=20")(
      Dedup.substringRemoveDups(docs, k = 20, modSelect = 16)
        .filter(col("clean_md5").isNotNull).count())
    time("bm25 top-20")(
      Bm25.score(docs, Seq("w1", "w7", "w13", "w19", "w25")).count())
    time("latest-per-key")(
      Compaction.latestByKey(events,
        keys = Seq("user_id", "event_type"), timeCol = "ts", tieCol = "event_id").count())
    val zPath = s"/tmp/graft_scale_zorder_${mult}x"
    time("z-order write") {
      Layout.writeZOrdered(
        events.select(col("event_id"),
          col("user_id").bitwiseAND(lit(65535L)).as("a"),
          dayofmonth(col("ts")).cast("long").as("b")),
        zPath, "a", "b")
      spark.read.parquet(zPath).count()
    }

    val nVecs = 5000L * mult
    val embPath = s"/tmp/graft_scale_emb_${mult}x"
    spark.range(nVecs)
      .select(
        col("id").as("vec_id"),
        array((0 until 16).map(d =>
          (pmod(xxhash64(col("id"), lit(d)), lit(2000)).cast("double") / 1000.0 - 1.0)): _*)
          .as("embedding"))
      .write.mode("overwrite").parquet(embPath)
    val emb = spark.read.parquet(embPath)
    time("SRP-LSH ANN top-k")(
      Similarity.lshAnnTopK(emb.filter(col("vec_id") % 50 === 0), emb, bits = 8, k = 10).count())
    // IVF cost = assignment n·nlist + probing q·(nprobe/nlist)·n: with
    // queries ∝ corpus the probe term is ∝ n²/nlist, so nlist must GROW
    // with the corpus (FAISS guidance nlist ≈ √n) — a fixed nlist would
    // read as superlinear here and mean nothing but a mis-sized index.
    val nlist = math.max(16, (math.sqrt(nVecs.toDouble) / 4).toInt)
    time(s"IVF ANN top-k (nlist=$nlist)")(
      Similarity.ivfAnnTopK(emb.filter(col("vec_id") % 50 === 0), emb,
        nlist = nlist, nprobe = 4, k = 10).count())
    time(s"IVF refined 1 Lloyd (nlist=$nlist)")(
      Similarity.ivfAnnTopK(emb.filter(col("vec_id") % 50 === 0), emb,
        nlist = nlist, nprobe = 4, k = 10, refineRounds = 1).count())
    // int8 brute force is Θ(|queries|·n): the query set is FIXED (100) so
    // the stage scales linearly in the corpus — the quantized-scan story
    time("int8 ANN (100 queries)")(
      Similarity.int8AnnTopK(emb.filter(col("vec_id") < 100), emb, k = 10).count())
    val capped = math.min(mult, 10)
    val embSmall = emb.filter(col("vec_id") < 5000L * capped)
    time(s"exact near-dup (${capped}x)")(
      Dedup.embeddingNearDups(embSmall, minCosine = 0.4).count())

    // ---- SQLite codec at scale: the one operator family with DRIVER-
    // bound components. Four costs measured separately: (1) writeTable —
    // single-file sink, collect + byte assembly on the driver by design
    // (the same boundary as the reference's own warehouse); (2) the
    // interior b-tree walk — the only part of readTable that runs on the
    // driver, sequential pointer-page reads ≈ leaves/250 pages at 4 KB;
    // (3) the full distributed read — leaf decode fanned out one task
    // per leaf batch; (4) migrate — read + parquet land + count verify,
    // the intended 100 TB ingestion pattern. session_sources-shaped rows
    // (db_utils.py:29-65): ~85 B/record ⇒ ~26 MB at 10×, ~260 MB at
    // 100× (the writer's single-buffer cap is 2 GiB — fail-loud above).
    val dbPath = s"$path-sqlite.db"
    val sqliteRows = 30000L * mult
    val sqliteDf = spark.range(sqliteRows).select(
      concat(lit("sess-"), lpad(col("id").cast("string"), 24, "0")).as("session_id"),
      concat(lit("u"), pmod(xxhash64(col("id"), lit("su")), lit(nUsers)).cast("string"))
        .as("user_id"),
      date_format(
        timestamp_micros(lit(1704067200000000L) + col("id") * lit(864000L)),
        "yyyy-MM-dd").as("event_date"),
      date_format(
        timestamp_micros(lit(1704067200000000L) + col("id") * lit(864000L)),
        "HH:mm:ss").as("event_time"),
      element_at(types, pmod(xxhash64(col("id"), lit("ch")), lit(5)).cast("int") + 1)
        .as("channel_name"),
      pmod(xxhash64(col("id"), lit("he")), lit(2)).as("holder_engagement"),
      pmod(xxhash64(col("id"), lit("ce")), lit(2)).as("closer_engagement"),
      pmod(xxhash64(col("id"), lit("ii")), lit(2)).as("impression_interaction"))
    time("sqlite write (driver)") {
      SQLiteWarehouse.writeTable(sqliteDf, dbPath, "session_sources"); sqliteRows
    }
    println(f"   (.db size: ${new java.io.File(dbPath).length() / 1e6}%.1f MB)")
    time("sqlite interior walk") {
      SQLiteWarehouse.leafPageNumbers(dbPath, "session_sources").size.toLong
    }
    time("sqlite read (decode)") {
      SQLiteWarehouse.readTable(spark, dbPath, "session_sources").count()
    }
    time("sqlite migrate+verify") {
      SQLiteWarehouse.migrate(spark, dbPath, Seq("session_sources"),
        s"$path-sqlite-mig")("session_sources")
    }
    spark.stop()
  }
}
