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
  *   Test/runMain graft.BenchAuditProbe q39ab     — dedup split-union vs
  *     disjunct across duplication rates (r13 #2)
  *   Test/runMain graft.BenchAuditProbe state [m] — per-micro-batch
  *     state-store rows/bytes for Sessionizer + Attributor, bounded vs
  *     unbounded, skewed m× stream (r13 #5)
  *   Test/runMain graft.BenchAuditProbe contentkey [mults…] — canonical
  *     content key, binary (production) vs JSON (r14) vs structural
  *     hash, key-only cost on documents/upsert shapes (r15 #2)
  *   Test/runMain graft.BenchAuditProbe lsh-ab [mults…] — MinHash-LSH
  *     dedup (q19) vs the exact prefix plan on a planted near-dup
  *     corpus: candidates, wall time, recall, band/row params (r16 #3)
  *   Test/runMain graft.BenchAuditProbe sweep-scale [mults…] — the
  *     sweepLocks janitor's driver-side recursive walk timed over a
  *     synthetic many-table/many-partition root at growing file
  *     counts, with and without litter (r17 #5)
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
    if (args.headOption.contains("state")) {
      // r13 directive #5: per-micro-batch STATE-STORE profile for the two
      // heaviest stateful shapes (Sessionizer, StreamingAttribution)
      // under a skewed 10× event stream. "Watermark-bounded" is an
      // argument; a flat state-rows curve across batches is evidence.
      // Each shape runs twice: BOUNDED (event-time timeout via
      // flushWatermark — state must plateau at the active-user set) and
      // UNBOUNDED (NoTimeout — state must grow monotonically with users
      // ever seen, the failure mode the bound exists to prevent).
      import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
      import spark.implicits._
      val mult = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(10)
      val nEvents = 100000L * mult
      val nUsers = 1500L * mult
      val nFiles = 20
      val spanUs = 2592000000000L // 30 days regardless of mult
      val stepUs = spanUs / nEvents
      val scratch = s"/tmp/graft_state_probe_${mult}x"
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(scratch), true)
      // skew: one hot user owns ~20% of events; the rest draw from a
      // CHURNING population — ten successive 3-day cohorts of `nUsers`
      // each (total universe 10·nUsers), so users retire as the stream
      // advances. That is what separates the two regimes: bounded state
      // must plateau at ~one cohort (retired users evicted by the
      // event-time timeout), unbounded must climb toward the full
      // universe (every user ever seen stays in state). A static
      // population would cap BOTH curves at the same user count and show
      // nothing. Files are split by id RANGE = time order, so the
      // watermark advances batch over batch the way a live stream's would.
      val types = array(lit("view"), lit("click"), lit("signup"), lit("error"), lit("purchase"))
      val cohort = floor(col("id") / lit(nEvents / 10))
      val src = spark.range(nEvents).select(
        col("id").as("event_id"),
        timestamp_micros(lit(1704067200000000L) + col("id") * lit(stepUs)).as("ts"),
        when(pmod(xxhash64(col("id"), lit("h")), lit(5)) === 0, lit(0L))
          .otherwise(lit(1L) + cohort * nUsers + pmod(xxhash64(col("id"), lit("u")), lit(nUsers)))
          .as("user_id"),
        element_at(types, pmod(xxhash64(col("id"), lit("t")), lit(5)).cast("int") + 1)
          .as("event_type"),
        (pmod(xxhash64(col("id"), lit("v")), lit(20000)).cast("double") / 100.0).as("value"))
      val perFile = nEvents / nFiles
      for (k <- 0 until nFiles)
        src.filter(col("event_id") >= k * perFile &&
            (col("event_id") < (k + 1) * perFile || lit(k == nFiles - 1)))
          .coalesce(1)
          .write.mode(if (k == 0) "overwrite" else "append").parquet(s"$scratch/in")
      val schema = spark.read.parquet(s"$scratch/in").schema
      def run(tag: String, out: org.apache.spark.sql.Dataset[_] => org.apache.spark.sql.DataFrame): Unit = {
        val rows = scala.collection.mutable.Buffer.empty[String]
        val listener = new StreamingQueryListener {
          def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
          def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
            val p = e.progress
            val st = p.stateOperators.headOption
            rows += f"[state] $tag%-18s batch=${p.batchId}%2d in=${p.numInputRows}%7d " +
              st.map(s => f"stateRows=${s.numRowsTotal}%8d updated=${s.numRowsUpdated}%8d " +
                f"mem=${s.memoryUsedBytes / 1024}%7d KiB").getOrElse("stateRows=n/a")
          }
          def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        }
        spark.streams.addListener(listener)
        val t0 = System.nanoTime()
        val ev = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$scratch/in")
          .as[graft.streaming.StreamingFunnel.Event]
        val q = out(ev).writeStream
          .outputMode("append")
          .option("checkpointLocation", s"$scratch/ckpt-$tag")
          .format("noop")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // progress events are delivered ASYNC on the listener bus; removing
        // the listener right after awaitTermination can drop the tail
        // batches — exactly the ones proving the plateau. No public drain
        // API on the streaming bus, so give delivery a bounded grace.
        Thread.sleep(2000L)
        spark.streams.removeListener(listener)
        rows.foreach(println)
        println(f"[state] $tag%-18s total=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      def evCast(ds: org.apache.spark.sql.Dataset[_]) =
        ds.asInstanceOf[org.apache.spark.sql.Dataset[graft.streaming.StreamingFunnel.Event]]
      // r15 directive #4: the plateau claim must hold on the state store
      // a 100 TB deployment actually runs — RocksDB (bounded off-heap +
      // disk, changelog-checkpointed) — not just the executor-heap
      // HDFSBacked default the specs exercise. Same shapes, both
      // providers; `state <m> rocksdb|hdfs` forces one.
      val providers = args.drop(1).collectFirst {
        case "rocksdb" => Seq("rocksdb")
        case "hdfs" => Seq("hdfs")
      }.getOrElse(Seq("hdfs", "rocksdb"))
      val provClass = Map(
        "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
        "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val provWas = spark.conf.get(provKey)
      try for (prov <- providers) {
        spark.conf.set(provKey, provClass(prov))
        run(s"$prov/sess-bounded", ds =>
          new graft.streaming.StreamingFunnel.Sessionizer(
            gapSeconds = 1800L, flushWatermark = Some("1 hour"))
            .sessionize(evCast(ds)).toDF())
        run(s"$prov/sess-unbounded", ds =>
          new graft.streaming.StreamingFunnel.Sessionizer(gapSeconds = 1800L)
            .sessionize(evCast(ds)).toDF())
        run(s"$prov/attr-bounded", ds =>
          new graft.streaming.StreamingAttribution.Attributor(
            lookbackUs = Some(6L * 3600000000L), flushWatermark = Some("1 hour"))
            .attribute(evCast(ds)).toDF())
        run(s"$prov/attr-unbounded", ds =>
          new graft.streaming.StreamingAttribution.Attributor(
            lookbackUs = Some(6L * 3600000000L))
            .attribute(evCast(ds)).toDF())
      } finally spark.conf.set(provKey, provWas)
      spark.stop(); return
    }
    if (args.headOption.contains("sweep-scale")) {
      // r17 verdict #5: sweepLocks walks the ENTIRE tree via a recursive
      // listing and fresh-stats every lock-named match on the driver —
      // O(all files under root), not O(litter). This prices that walk at
      // growing file counts over a synthetic warehouse (20 tables ×
      // 50·m hive partitions × 2 data files) so an operator can budget a
      // sweep, and separates the two cost terms: the walk-only column is
      // a litter-free root (the pure listing), the +litter column adds a
      // CONSTANT 20 pieces of litter (10 aged locks + 10 aged tombstones)
      // — if judging were accidentally O(files) the delta would grow with
      // m; if the walk is the real cost, the delta stays flat. Informs
      // whether a name-filtered per-table listing is warranted (README).
      //
      // MEASUREMENT CAVEAT (why the default tops out at 16×/32k files):
      // on this container Hadoop's native lib is absent, so RawLocal's
      // recursive listFiles loads each entry's permissions by FORKING an
      // `ls` per file (Shell.execCommand via loadPermissionInfoByNonNativeIO,
      // jstack-verified) — ~2-4 ms/file of pure process-spawn overhead
      // that a real HDFS/object-store listing (batched server-side RPC,
      // ~1000 entries/round-trip) does not pay. The µs/file column is
      // therefore an UPPER bound dominated by the local shim; the LINEAR
      // growth across mults is the portable finding, and the printed
      // extrapolation prices larger roots under both cost models.
      import java.nio.file.{Files, Paths}
      val mults = {
        val extra = args.drop(1).flatMap(_.toIntOption)
        if (extra.nonEmpty) extra.toSeq else Seq(1, 4, 16)
      }
      val nTables = 20
      val filesPerPart = 2
      val hfs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      def time(f: => Unit): Double = {
        val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
      }
      println("[sweep-scale]    files  synth(s)  walk-only med(s)  +litter med(s)  per-table med(s)  max unit(s)  entries  walk µs/file")
      var lastPerFileUs = 0.0
      var lastMaxUnitS = 0.0
      for (m <- mults) {
        val partsPerTable = 50 * m
        // unique per run (r17 ADVICE): a fixed /tmp name let two
        // concurrent probe runs corrupt each other's timings — or
        // recursively delete a foreign process's files under a
        // predictable path
        val root = Files.createTempDirectory(s"graft_sweep_scale_${m}x_").toString
        val t0 = System.nanoTime()
        var nFiles = 0L
        for (t <- 0 until nTables; p <- 0 until partsPerTable) {
          val d = Paths.get(root, s"t$t", f"date=2024-$p%06d")
          Files.createDirectories(d)
          for (f <- 0 until filesPerPart) {
            Files.write(d.resolve(s"part-$f.parquet"), Array[Byte](80, 65, 82, 49))
            nFiles += 1
          }
        }
        val synthS = (System.nanoTime() - t0) / 1e9
        val walkOnly = med((1 to 3).map(_ => time {
          val r = graft.sources.ParquetWarehouse.sweepLocks(spark, root)
          require(r.isEmpty, s"litter-free root must report nothing, got ${r.size}")
        }))
        val horizon = graft.sources.ParquetWarehouse.LockStaleMs
        val old = System.currentTimeMillis() - horizon - 60000
        for (t <- 0 until 10) {
          val lock = Paths.get(root, s"t$t.__lock")
          Files.write(lock, graft.sources.ParquetWarehouse
            .lockPayload("other-host", 1L, s"tok-$t", old).getBytes("UTF-8"))
          Files.setLastModifiedTime(lock,
            java.nio.file.attribute.FileTime.fromMillis(old))
          val tomb = Paths.get(root, s"t$t.__lock.__tomb-aged$t")
          Files.write(tomb, s"retired ts=$old\n".getBytes("UTF-8"))
          Files.setLastModifiedTime(tomb,
            java.nio.file.attribute.FileTime.fromMillis(old))
        }
        var entries = 0
        val withLitter = med((1 to 3).map(_ => time {
          entries = graft.sources.ParquetWarehouse.sweepLocks(spark, root).size
        }))
        require(entries == 20, s"expected the 20 planted litter entries, got $entries")
        // per-table sweep (r18, verdict #4): the SAME total work split
        // into O(tables) bounded increments — unit 0 (root's direct
        // files, where all 20 planted litter pieces live) plus one
        // recursive unit per table dir. The total should track the
        // monolithic walk (same files listed once each); the MAX single
        // unit is the bound an operator's loop actually pays per
        // increment — the number that turns "one ~100 min walk" into
        // resumable slices.
        var ptEntries = 0
        var maxUnitS = 0.0
        val perTable = med((1 to 3).map { _ =>
          var n = 0
          var mx = 0.0
          val t0p = System.nanoTime()
          val tShallow = time {
            n += graft.sources.ParquetWarehouse
              .sweepLocksShallowOn(hfs, root, clean = false).size
          }
          mx = tShallow
          for (u <- graft.sources.ParquetWarehouse.sweepUnitsOn(hfs, root)) {
            val tU = time {
              n += graft.sources.ParquetWarehouse.sweepLocksOn(hfs, u, clean = false).size
            }
            mx = math.max(mx, tU)
          }
          ptEntries = n
          maxUnitS = mx
          (System.nanoTime() - t0p) / 1e9
        })
        require(ptEntries == 20,
          s"per-table sweep must report the same 20 litter entries, got $ptEntries")
        lastPerFileUs = walkOnly * 1e6 / nFiles
        lastMaxUnitS = maxUnitS
        println(f"[sweep-scale] $nFiles%8d  $synthS%8.2f       $walkOnly%10.3f      $withLitter%10.3f        $perTable%10.3f   $maxUnitS%9.3f    $entries%5d    $lastPerFileUs%8.2f")
        hfs.delete(new org.apache.hadoop.fs.Path(root), true)
      }
      println("[sweep-scale] cost model: the walk is O(all files under root) driver-side; " +
        "judging adds O(litter) fresh stats+payload reads on top (the delta column)")
      // µs/file × 1e6 files = that many SECONDS for a 1M-file root
      println(f"[sweep-scale] extrapolation at the measured local-shim rate: 1M files ≈ " +
        f"${lastPerFileUs / 60}%.0f min, 10M ≈ ${lastPerFileUs * 10 / 3600}%.1f h " +
        "(HDFS batched listings are ~2-3 orders cheaper per entry, but still one full listing per sweep)")
      println(f"[sweep-scale] per-table (r18): same judgment in O(tables) bounded increments — " +
        f"largest single unit ${lastMaxUnitS}%.3f s at the top mult (one table's walk); " +
        "an operator loops sweepUnits with checkpointing instead of paying one unbounded walk")
      spark.stop(); return
    }
    if (args.headOption.contains("pup")) {
      // focused re-measure of the ScaleSmoke partitioned-upsert stages
      // (seed / partition-scoped merge / full-rewrite merge) against the
      // events table a prior `runMain graft.ScaleSmoke <mult>` left in
      // /tmp — iterating on the merge path without paying the full smoke.
      val mult = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(10)
      val events = spark.read.parquet(s"/tmp/graft_scale_${mult}x")
      val daily = events.select(
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("user_id"), col("value"))
        .groupBy(col("event_date"), col("user_id"))
        .agg(sum(col("value")).as("spend"), count(lit(1)).as("n_events"))
      val batchPath = s"/tmp/graft_pup_batch_${mult}x"
      daily.filter(col("event_date") === "2024-01-11")
        .withColumn("spend", col("spend") * 1.1)
        .write.mode("overwrite").parquet(batchPath)
      val oneDay = spark.read.parquet(batchPath)
      val pupPath = s"/tmp/graft_pup_${mult}x/t"
      val fullPath = s"/tmp/graft_pup_full_${mult}x/t"
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"/tmp/graft_pup_${mult}x"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"/tmp/graft_pup_full_${mult}x"), true)
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val n = f
        println(f"[pup] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
      }
      t("daily table seed (+write)") {
        graft.sources.ParquetWarehouse.writeDatePartitioned(daily, pupPath, "event_date")
        daily.write.mode("overwrite").parquet(fullPath)
        spark.read.parquet(pupPath).count()
      }
      t("partition-scoped upsert (1 day)") {
        graft.sources.ParquetWarehouse.upsertPartitioned(oneDay, pupPath,
          Seq("event_date", "user_id"), "event_date")
        spark.read.parquet(pupPath + "/event_date=2024-01-11").count()
      }
      t("full-rewrite upsert (same batch)") {
        graft.sources.ParquetWarehouse.upsert(oneDay, fullPath,
          Seq("event_date", "user_id"))
        spark.read.parquet(fullPath).count()
      }
      spark.stop(); return
    }
    if (args.headOption.contains("lsh-ab")) {
      // r16 #3: the MinHash-LSH dedup path (q19) is the 100 TB dedup
      // workhorse, but jac-ab only measured the n-gram Jaccard siblings —
      // this closes the missing decade: candidate-pair count, wall time,
      // and RECALL vs the exact operator at 10x/100x, with the band/row
      // parameters recorded. The corpus makes ground truth analytic: docs
      // come in groups of 4 where doc 4g is a near-copy of doc 4g+1 with
      // words 5 and 25 mutated — 40 unique-in-doc words → 38 tri-shingles,
      // 6 shingles differ per side, so every planted pair has Jaccard
      // 32/44 ≈ 0.727 (≥ the 0.7 threshold) and there are EXACTLY
      // nDocs/4 true pairs; everything else shares no shingle. Expected
      // sketch recall at s=0.727: k=32,b=8,r=4 → 1-(1-s⁴)⁸ ≈ 0.927;
      // k=32,b=16,r=2 → ≈ 1.0 (more bands, more candidate volume). The
      // exact baseline runs the lossless prefix-filter plan — identical
      // output to all-pairs by contract, feasible at 100x.
      val mults = {
        val extra = args.drop(1).flatMap(_.toIntOption)
        if (extra.nonEmpty) extra.toSeq else Seq(10, 100)
      }
      val threshold = 0.7
      for (mult <- mults) {
        val nDocs = 5000L * mult
        val dir = s"/tmp/graft_lshab_${mult}x"
        // word j of doc i draws from doc (i+1)'s sequence when i%4==0,
        // except the two mutated positions; the j prefix keeps words
        // unique WITHIN a doc so both operators compute set-Jaccard
        val base = when(pmod(col("id"), lit(4)) === 0, col("id") + 1).otherwise(col("id"))
        spark.range(nDocs).select(
          col("id").as("doc_id"),
          concat_ws(" ", (0 until 40).map { j =>
            val default = concat(lit(s"w${j}_"), pmod(xxhash64(base, lit(j)), lit(1000000000L)))
            if (j == 5 || j == 25)
              when(pmod(col("id"), lit(4)) === 0,
                concat(lit(s"w${j}_m"), pmod(xxhash64(col("id"), lit(j)), lit(1000000000L))))
                .otherwise(default)
            else default
          }: _*).as("text"))
          .write.mode("overwrite").parquet(dir)
        val docs = spark.read.parquet(dir)
        val truePairs = nDocs / 4
        def time[A](f: => A): (A, Double) = {
          val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
        }
        // exact baseline (lossless prefix plan — q18's scale path)
        val (exactN, exactT) = time {
          graft.operators.Dedup.ngramJaccard(docs, minJaccard = threshold,
            prefixFilter = Some(true),
            corpusHint = Some(graft.operators.Dedup.CorpusHint(nDocs, 0L, nDocs - 1))).count()
        }
        println(f"[lsh-ab] ${mult}%3dx (${nDocs}%6d docs) exact-prefix      " +
          f"pairs=$exactN%7d (planted=$truePairs) t=$exactT%7.2f s")
        for ((bands, rows) <- Seq((8, 4), (16, 2))) {
          val (candN, candT) = time {
            graft.operators.Dedup.minhashLshCandidates(docs, k = 32, bands = bands).count()
          }
          val (lshN, lshT) = time {
            graft.operators.Dedup.minhashLshDedup(docs, k = 32, bands = bands,
              minJaccard = threshold).count()
          }
          // verified-LSH output is a SUBSET of exact output (same shingles,
          // same formula) — recall is the one number that can drop
          val recall = lshN.toDouble / exactN.toDouble
          println(f"[lsh-ab] ${mult}%3dx (${nDocs}%6d docs) k=32 b=$bands%2d r=$rows%d  " +
            f"cands=$candN%8d cand_t=$candT%7.2f s  e2e_pairs=$lshN%7d e2e_t=$lshT%7.2f s  " +
            f"recall=$recall%.4f")
        }
      }
      spark.stop(); return
    }
    if (args.headOption.contains("jac-ab")) {
      // Does the scale-aware auto-switch flip at the RIGHT point? The
      // rule picks all-pairs at 1x and prefix at 10x on the boilerplate
      // corpus — this measures both plans at both sizes so the flip is
      // validated against reality, not just the cost model. Extra
      // multipliers can be passed as args (`jac-ab 100` runs just the
      // 100x decade): 100x all-pairs is ~10^10 candidate pairs — the
      // regime the switch exists to avoid — so timing it is a deliberate
      // budgeted run, not part of the default pair.
      val mults = {
        val extra = args.drop(1).flatMap(_.toIntOption)
        if (extra.nonEmpty) extra.toSeq else Seq(1, 10)
      }
      // one variant can be forced by name — kept for budgeted
      // single-variant runs. (Historical: before r14's tiled pair
      // generation the 100x all-pairs plan did not slow down, it DIED —
      // |posting|² packed longs in ONE row buffer, OOM at a 64 GiB
      // heap. Tiling caps the buffer at PairBlockSize² longs, which
      // turns the 100x forced all-pairs run from a crash into a timable
      // 1150.8 s at SPARK_DRIVER_MEM=32g — the heap its ~10^10-pair
      // partial aggregation genuinely needs at 32-way concurrency; at
      // the default 8 GiB it still dies, but in Spark's generic
      // spill-merge under that agg state, not in any one row's buffer.
      // Lower decades run both variants at the default heap.)
      val variants = args.drop(1).collectFirst {
        case "prefix" => Seq(true)
        case "allpairs" => Seq(false)
      }.getOrElse(Seq(false, true))
      for (mult <- mults) {
        val nDocs = 5000L * mult
        val dir = s"/tmp/graft_jacab_${mult}x"
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
          .write.mode("overwrite").parquet(dir)
        val docs = spark.read.parquet(dir)
        val hint = Some(graft.operators.Dedup.CorpusHint(nDocs, 0L, nDocs - 1))
        val auto = graft.operators.Dedup.prefixWorthIt(docs, corpusSize = Some(nDocs))
        for (usePrefix <- variants) {
          val vn = if (usePrefix) "prefix" else "allpairs"
          def run(): Long = graft.operators.Dedup.ngramJaccard(docs,
            minJaccard = 0.5, prefixFilter = Some(usePrefix), corpusHint = hint).count()
          // 100x is a budgeted single-shot: the losing plan alone runs
          // minutes, so warm + 3 iters would burn the whole probe budget
          // on a magnitude question (which plan is faster by >2x)
          val iters = if (mult >= 100) 1 else 3
          if (mult < 100) run() // warm
          val ts = (1 to iters).map { _ =>
            val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
          }.sorted
          val mark = if (usePrefix == auto) " <- auto" else ""
          println(f"[jac-ab] ${mult}%3dx (${nDocs}%6d docs) $vn%-8s median=${ts(iters / 2)}%7.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}$mark")
        }
      }
      spark.stop(); return
    }
    if (args.headOption.contains("compact")) {
      // compactPartitions cost profile: fragment the pup daily table
      // (re-written unshaped: 8 tasks per date) and time compaction back
      // to one file per date, at a given multiplier. Requires a prior
      // `pup <mult>` (or ScaleSmoke) run to have left the events table.
      val mult = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(10)
      val events = spark.read.parquet(s"/tmp/graft_scale_${mult}x")
      val daily = events.select(
        date_format(col("ts"), "yyyy-MM-dd").as("event_date"),
        col("user_id"), col("value"))
        .groupBy(col("event_date"), col("user_id"))
        .agg(sum(col("value")).as("spend"), count(lit(1)).as("n_events"))
      val dir = s"/tmp/graft_compact_${mult}x/t"
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"/tmp/graft_compact_${mult}x"), true)
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val n = f
        println(f"[compact] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s   n=$n")
      }
      t("fragmented seed (8 files/date)") {
        daily.repartition(8).write.partitionBy("event_date").parquet(dir)
        spark.read.parquet(dir).count()
      }
      t("compactPartitions (to 1/date)") {
        graft.sources.ParquetWarehouse.compactPartitions(spark, dir, "event_date").toLong
      }
      t("post-compact full scan") {
        spark.read.parquet(dir).count()
      }
      // uniformSchema pass cost profile, on the now-compacted table:
      //  1. all-uniform no-op — pure footer-sweep price (one driver-side
      //     footer read per file; the pass's fixed cost at table scale);
      //  2. evolve ONE day via upsertPartitioned(evolveSchema), leaving
      //     every OTHER partition stale-schema, then time the
      //     uniformization that rewrites all of them — the worst-case
      //     rewrite (O(stale partitions), here ≈ the whole table);
      //  3. repeat-call no-op confirming idempotence at the same sweep
      //     price.
      t("uniformSchema no-op (footer sweep)") {
        graft.sources.ParquetWarehouse.compactPartitions(spark, dir, "event_date",
          uniformSchema = true).toLong
      }
      t("evolve one day (upsertPartitioned)") {
        val day = spark.read.parquet(dir)
          .agg(max(col("event_date")).cast("string")).head.getString(0)
        val batch = spark.read.parquet(s"$dir/event_date=$day")
          .withColumn("event_date", lit(day)).withColumn("model", lit("v2"))
        graft.sources.ParquetWarehouse.upsertPartitioned(batch, dir,
          Seq("event_date", "user_id"), "event_date", evolveSchema = true)
        1L
      }
      t("uniformSchema rewrite (all stale)") {
        graft.sources.ParquetWarehouse.compactPartitions(spark, dir, "event_date",
          uniformSchema = true).toLong
      }
      t("uniformSchema repeat no-op") {
        graft.sources.ParquetWarehouse.compactPartitions(spark, dir, "event_date",
          uniformSchema = true).toLong
      }
      t("plain read sees evolved column") {
        spark.read.parquet(dir).filter(col("model").isNull).count()
      }
      spark.stop(); return
    }
    if (args.headOption.contains("prefix-stats")) {
      // planning-rule calibration for Dedup.prefixWorthIt: print the
      // sampled posting-mass stats (m = shingle rows, m1 = singleton
      // shingles, s2rep = Σdf² over df≥2 shingles) plus corpus size for
      // the real documents tables and boilerplate-skewed synth corpora —
      // the inputs a scale-aware prefix/all-pairs switch decides from.
      // SAME sampling as the production rule (2048 DOCS, then explode) —
      // the first cut of this probe capped shingle ROWS instead, so its
      // stats could diverge from what prefixWorthIt actually sees; the
      // authoritative column is `prod`, the rule's own verdict.
      def stats(tag: String, docs: DataFrame, n: Long): Unit = {
        val row = docs
          .select(col("text"))
          .limit(2048)
          .select(explode(TextOps.shingles(spark, col("text"), 3)).as("shingle"))
          .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .agg(
            coalesce(sum(col("df")), lit(0L)).as("m"),
            coalesce(sum(when(col("df") === 1, lit(1L))), lit(0L)).as("m1"),
            coalesce(sum(when(col("df") >= 2, col("df") * col("df"))), lit(0L)).as("s2rep"))
          .first()
        val (m, m1, s2rep) = (row.getLong(0), row.getLong(1), row.getLong(2))
        val nS = math.min(2048L, n)
        val r = n.toDouble / nS
        val prod = graft.operators.Dedup.prefixWorthIt(docs, corpusSize = Some(n))
        println(f"[prefix-stats] $tag%-16s n=$n%8d m=$m%8d m1=$m1%8d s2rep=$s2rep%12d " +
          f"old=${if (s2rep + m1 > 64L * m) "prefix" else "allpairs"}%-8s " +
          f"scaled=${if (s2rep * r + m1 > 64.0 * m) "prefix" else "allpairs"}%-8s " +
          f"prod=${if (prod) "prefix" else "allpairs"}")
      }
      for (sf <- Seq("0.01", "0.1")) {
        val d = Tables.documents(spark, s"/root/testdata/sf$sf")
        stats(s"documents sf$sf", d, d.count())
      }
      for (mult <- Seq(1, 10, 100)) {
        val nDocs = 5000L * mult
        // boilerplate-skewed synth: 25% of docs start with one of 10
        // shared 8-word boilerplates; body words from a 10k hash-vocab
        val synth = spark.range(nDocs).select(
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
        stats(s"synth ${mult}x", synth, nDocs)
      }
      spark.stop(); return
    }
    if (args.headOption.contains("q39ab")) {
      // r13 directive #2: measure the dedupCanonical SPLIT-UNION form
      // (WindowGroupLimit pushes top-1-per-fingerprint below the
      // exchange; costs a partial sort) against the r9-style DISJUNCT
      // form (`__rn === 1 || text IS NULL` — no pushdown, every dup row
      // rides the full sort/window) across duplication rates. The split
      // form's bet is that pruning dup rows before the shuffle pays once
      // duplicates are plentiful; the dup-light bench corpus only ever
      // charged it the sort. Corpora are written to parquet first so the
      // split branches' IsNull/IsNotNull scan pushdown is in play, as in
      // the real gate.
      val rows = 200000L
      val base = Tables.documents(spark, "/root/testdata/sf0.1")
        .select(col("doc_id").as("bid"), col("text").as("btext"), col("source").as("bsource"))
      def disjunct(docs: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))
        TextOps.fingerprint(docs, "text")
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1 || col("text").isNull)
          .drop("__rn")
      }
      // third form = PRODUCTION since r13: one scan, one window, WGL
      // intact, null rows spread by the synthetic per-doc key
      def synthKey(docs: DataFrame): DataFrame =
        graft.operators.Curation.dedupCanonical(docs)
      // (dup%, base-pool size): pool 5000 = duplicates SCATTERED (copies/
      // partition/group ≈ 1 — WGL has nothing to prune map-side); pool 50
      // = mega-clusters (3600 copies each — the regime WGL exists for).
      // 1% null texts exercise the null-handling path of every form.
      val shapes = Seq((0, 5000L), (50, 5000L), (90, 5000L), (90, 50L))
      val dirs = shapes.map { case (pct, pool) =>
        val dir = s"/tmp/graft_q39ab/dup${pct}_p$pool"
        val uniqueRows = rows * (100 - pct) / 100
        spark.range(rows)
          .withColumn("bid",
            when(col("id") < uniqueRows, pmod(col("id"), lit(5000L)))
              .otherwise(pmod(col("id"), lit(pool))))
          .join(broadcast(base), "bid")
          .select(
            col("id").as("doc_id"),
            when(pmod(col("id"), lit(100)) === 99, lit(null).cast("string"))
              .when(col("id") < uniqueRows, concat(col("btext"), lit(" u"), col("id")))
              .otherwise(col("btext")).as("text"),
            col("bsource").as("source"))
          .write.mode("overwrite").parquet(dir)
        (pct, pool, dir)
      }
      val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
        // the r12 split-union form, INLINED: dedupCanonical itself became
        // the synthetic-key form after this probe's first measurements —
        // aliasing it here would silently measure synthkey twice and the
        // split form never, making the README crossover table
        // irreproducible
        "split" -> { d =>
          val w = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))
          val fp = TextOps.fingerprint(d, "text")
          fp.filter(col("text").isNotNull)
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .drop("__rn")
            .unionByName(fp.filter(col("text").isNull))
        },
        "disjunct" -> (d => disjunct(d)),
        "synthkey" -> (d => synthKey(d)))
      // all three forms are the same operator: pin output equality once
      locally {
        val d = spark.read.parquet(dirs.last._3)
        val sigs = variants.map { case (vn, fn) =>
          val r = fn(d).agg(count(lit(1)), bit_xor(xxhash64(col("doc_id")))).head()
          vn -> (r.getLong(0), r.getLong(1))
        }
        println(s"[q39ab] output signatures: $sigs")
        require(sigs.map(_._2).distinct.size == 1, "variant outputs diverge")
      }
      for ((pct, pool, dir) <- dirs; (vn, fn) <- variants) {
        val docs = spark.read.parquet(dir)
        val plan = fn(docs).queryExecution.executedPlan.toString
        val wgl = if (plan.contains("WindowGroupLimit")) "WGL" else "no-WGL"
        fn(docs).write.mode("overwrite").format("noop").save() // warm
        val ts = (1 to 5).map { _ =>
          val t0 = System.nanoTime()
          fn(docs).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[q39ab] dup=$pct%2d%% pool=$pool%4d $vn%-8s $wgl%-6s median=${ts(2)}%6.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
      }
      spark.stop(); return
    }
    if (args.headOption.contains("contentkey")) {
      // r15 directive #2: price both canonical content-key encodings —
      // "json" = ContentKey.contentHashJson (the r14 to_json render) and
      // "binary" = ContentKey.contentHash (the r15 null-flag-framed form
      // BOTH production sites pay for) — against the structural xxhash64
      // they replaced, KEY COMPUTATION ONLY (select the key, noop sink),
      // on the two shapes that pay it in production: documents-shaped
      // (dedupCanonical's synthetic-key tier hashes the non-text
      // columns) and upsert-shaped (lastWins hashes the value columns).
      // The structural baseline is NOT a candidate to return to — it
      // carries the certain collision classes ContentKey exists to fix —
      // it is the lower bound the encodings are priced against.
      // Optional args: multipliers (default 10 100) of a 100 k-row base.
      val mults = {
        val extra = args.drop(1).flatMap(_.toIntOption)
        if (extra.nonEmpty) extra.toSeq else Seq(10, 100)
      }
      for (mult <- mults) {
        val n = 100000L * mult
        // documents-shaped: the sf tables' exact column set minus text
        val docsDir = s"/tmp/graft_ckey_docs_${mult}x"
        spark.range(n).select(
          col("id").as("doc_id"),
          concat(lit("lang"), pmod(col("id"), lit(30))).as("lang"),
          concat(lit("src"), pmod(col("id"), lit(1000))).as("source"),
          (pmod(xxhash64(col("id")), lit(5000)) + 10).as("n_chars"))
          .write.mode("overwrite").parquet(docsDir)
        // upsert-shaped: string keys, a double metric, a timestamp
        val upsDir = s"/tmp/graft_ckey_ups_${mult}x"
        spark.range(n).select(
          concat(lit("c"), col("id")).as("conv_id"),
          concat(lit("s"), pmod(xxhash64(col("id")), lit(n))).as("session_id"),
          (pmod(xxhash64(col("id"), lit(1)), lit(10000)) / 10000.0).as("ihc"),
          timestamp_micros(lit(1600000000000000L) + col("id")).as("ts"))
          .write.mode("overwrite").parquet(upsDir)
        for ((tag, dir) <- Seq(("docs", docsDir), ("upsert", upsDir))) {
          val df = spark.read.parquet(dir)
          val fields = df.schema.fields.toSeq
          val variants = Seq(
            "structural" -> xxhash64(fields.map(f => col(f.name)): _*),
            "json" -> graft.functions.ContentKey.contentHashJson(fields).get,
            "binary" -> graft.functions.ContentKey.contentHash(fields).get)
          val meds = variants.map { case (vn, key) =>
            def run(): Unit =
              df.select(key.as("k")).write.mode("overwrite").format("noop").save()
            run() // warm
            val ts = (1 to 5).map { _ =>
              val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
            }.sorted
            println(f"[ckey] ${mult}%3dx ($n%9d rows) $tag%-6s $vn%-10s " +
              f"median=${ts(2)}%7.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
            vn -> ts(2)
          }.toMap
          println(f"[ckey] ${mult}%3dx $tag%-6s overhead vs structural: " +
            f"json ${(meds("json") / meds("structural") - 1) * 100}%6.1f%%, " +
            f"binary ${(meds("binary") / meds("structural") - 1) * 100}%6.1f%%")
        }
      }
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
