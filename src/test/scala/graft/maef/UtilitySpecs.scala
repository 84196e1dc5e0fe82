package graft.maef

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Skew
import graft.sources.ParquetWarehouse

class DateWindowSpec extends SparkSpec {
  private val today = LocalDate.of(2023, 10, 15)

  test("validate accepts a padded ISO range and computes the span") {
    val w = DateWindow.validate("2023-08-01", "2023-09-30", today)
    assert(w.startString === "2023-08-01")
    assert(w.endString === "2023-09-30")
    assert(w.days === 60)
  }

  test("validate rejects reversed, future, overlong, and malformed ranges") {
    intercept[IllegalArgumentException](DateWindow.validate("2023-09-30", "2023-08-01", today))
    intercept[IllegalArgumentException](DateWindow.validate("2023-08-01", "2023-12-01", today))
    intercept[IllegalArgumentException](DateWindow.validate("2021-01-01", "2023-01-01", today))
    intercept[IllegalArgumentException](DateWindow.validate("08/01/2023", "2023-09-30", today))
  }

  test("default window is the last 30 days; reference fallback is pinned") {
    val w = DateWindow.default(today)
    assert(w.days === 30)
    assert(w.endString === "2023-10-15")
    assert(DateWindow.ReferenceFallback.startString === "2023-08-01")
    assert(DateWindow.ReferenceFallback.endString === "2023-09-30")
  }

  test("resolve follows the DAG chain: explicit > variables > fallback") {
    val vars = Map(
      "ATTRIBUTION_START_DATE" -> "2023-09-01",
      "ATTRIBUTION_END_DATE" -> "2023-09-10")
    // 1. explicit CLI dates win over variables
    val w1 = DateWindow.resolve(Some(("2023-08-05", "2023-08-07")), vars.get, today)
    assert(w1.startString === "2023-08-05" && w1.endString === "2023-08-07")
    // 2. variables used when no explicit dates
    val w2 = DateWindow.resolve(None, vars.get, today)
    assert(w2.startString === "2023-09-01" && w2.endString === "2023-09-10")
    // 3. missing variables → reference fallback (ihc_api_dag.py:49-54)
    assert(DateWindow.resolve(None, _ => None, today) === DateWindow.ReferenceFallback)
    // 4. unparseable variables → fallback (the DAG catches parse errors)
    val bad = Map("ATTRIBUTION_START_DATE" -> "09/01/2023",
      "ATTRIBUTION_END_DATE" -> "2023-09-10")
    assert(DateWindow.resolve(None, bad.get, today) === DateWindow.ReferenceFallback)
    // 5. a PARSED-but-invalid variable window propagates — validate_date_range
    //    runs outside the DAG's try block (ihc_api_dag.py:56-63)
    val reversed = Map("ATTRIBUTION_START_DATE" -> "2023-09-10",
      "ATTRIBUTION_END_DATE" -> "2023-09-01")
    intercept[IllegalArgumentException](DateWindow.resolve(None, reversed.get, today))
    // 6. explicit dates are strict: parse failures propagate too
    intercept[IllegalArgumentException](
      DateWindow.resolve(Some(("08/01/2023", "2023-08-07")), vars.get, today))
  }
}

class AttributionApiConnectorSpec extends SparkSpec {
  import spark.implicits._
  import AttributionApiConnector._

  test("chunk payloads serialize each chunk's journey entries as one JSON array") {
    val chunked = Seq(
      (0, "c1", "s1", "2023-08-01 10:00:00", "Direct", 1, 0, 0, 0),
      (0, "c1", "s2", "2023-08-01 11:00:00", "Email", 0, 1, 0, 0),
      (1, "c2", "s3", "2023-08-02 09:00:00", "Direct", 1, 0, 0, 0))
      .toDF("chunk_id", "conversion_id", "session_id", "timestamp", "channel_label",
        "holder_engagement", "closer_engagement", "conversion", "impression_interaction")
    val payloads = chunkPayloads(chunked)
    assert(payloads.map(_.chunkId) === Seq(0, 1))
    assert(payloads.head.body.startsWith("[{"))
    assert(payloads.head.body.contains("\"conversion_id\":\"c1\""))
    assert(payloads(1).body.contains("\"session_id\":\"s3\""))
  }

  test("chunk payloads are byte-identical across partitionings (journey order inside each chunk)") {
    // collect_list order is shuffle-arrival order — unsorted, two runs
    // over the same data could send byte-different request bodies
    val rows = (1 to 40).map(i => (i % 3, s"c${i % 5}", s"s$i",
      f"2023-08-01 ${i % 24}%02d:00:00", "Direct", 1, 0, 0, 0))
    val df = rows.toDF("chunk_id", "conversion_id", "session_id", "timestamp",
      "channel_label", "holder_engagement", "closer_engagement", "conversion",
      "impression_interaction")
    val a = chunkPayloads(df.repartition(1)).map(_.body)
    val b = chunkPayloads(df.repartition(13)).map(_.body)
    assert(a === b)
    // and entries ride in journey order: conversion, then time, then session
    assert(a.head.indexOf("\"c0\"") >= 0)
  }

  test("error histogram: a NULL statusCode with no payload is invalid_structure, not ok") {
    val envelopes = spark.read.schema(MaefModel.ResponseEnvelope)
      .json(Seq(
        """{"statusCode": 200, "value": [{"conversion_id":"c1","session_id":"s1","ihc":1.0}]}""",
        """{"statusCode": null, "value": null, "data": null, "results": null}""",
        """{"statusCode": 500, "data": null, "results": null}""").toDS())
    val got = Loader.errorHistogram(envelopes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("invalid_structure", 0L) === 2L) // the null AND the 500
    assert(got.getOrElse("ok", 0L) === 1L)
  }

  test("delivery retries with exponential backoff and paces successful chunks") {
    val sleeps = Seq.newBuilder[Long]
    var calls = 0
    val transport: ChunkPayload => String = { p =>
      calls += 1
      // chunk 0 fails twice then succeeds; chunk 1 succeeds immediately
      if (p.chunkId == 0 && calls < 3) throw new RuntimeException("boom")
      s"ok-${p.chunkId}"
    }
    val out = deliver(
      Seq(ChunkPayload(0, "[]"), ChunkPayload(1, "[]")),
      transport, Policy(), sleeps += _)
    assert(out === Seq("ok-0", "ok-1"))
    // 2^1, 2^2 backoff for the failures, then 1s pacing after chunk 0
    assert(sleeps.result() === Seq(2000L, 4000L, 1000L))
  }

  test("delivery drops a chunk after max attempts but fails only if nothing succeeded") {
    val bad: ChunkPayload => String = p =>
      if (p.chunkId == 0) throw new RuntimeException("down") else "ok-1"
    val out = deliver(Seq(ChunkPayload(0, "[]"), ChunkPayload(1, "[]")), bad, Policy(), _ => ())
    assert(out === Seq("ok-1"))
    intercept[IllegalArgumentException] {
      deliver(Seq(ChunkPayload(0, "[]")), bad, Policy(), _ => ())
    }
  }
}

class ParquetWarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("upsert is last-wins by key and preserves untouched rows (S8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/t"
    ParquetWarehouse.upsert(
      Seq(("c1", "s1", 0.5), ("c2", "s2", 0.7)).toDF("conv_id", "session_id", "ihc"),
      dir, Seq("conv_id", "session_id"))
    ParquetWarehouse.upsert(
      Seq(("c1", "s1", 0.9), ("c3", "s3", 0.1)).toDF("conv_id", "session_id", "ihc"),
      dir, Seq("conv_id", "session_id"))
    val got = spark.read.parquet(dir)
      .as[(String, String, Double)].collect().toSet
    assert(got === Set(("c1", "s1", 0.9), ("c2", "s2", 0.7), ("c3", "s3", 0.1)))
  }

  test("upsert rebalances the rewrite into advisory-tracked files above the size gate") {
    // r22: the pre-write REBALANCE is gated on the COMMITTED table's
    // on-disk bytes vs 2× the AQE advisory partition size — shrink the
    // advisory so a ~MB table is "large" and the rebalance must engage
    // on the SECOND upsert (the create branch has no committed bytes and
    // never rebalances, by design), splitting the single window
    // partition into several files; results are a set, so content is
    // unchanged either way. minPartitionSize is lowered with the
    // advisory: its 1 MB default would re-merge these deliberately tiny
    // test partitions (at production advisories it is far below the
    // advisory and never binds).
    // the decision itself, spec'd directly (shouldAbortHold pattern):
    // create branch (0 committed bytes) never rebalances; the boundary
    // is strict
    assert(!ParquetWarehouse.shouldRebalance(0L, 64L << 20))
    assert(!ParquetWarehouse.shouldRebalance(128L << 20, 64L << 20))
    assert(ParquetWarehouse.shouldRebalance((128L << 20) + 1, 64L << 20))
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val minKey = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    val prev = spark.conf.get(advisoryKey)
    val prevMin = spark.conf.get(minKey)
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_rb").toString + "/t"
    try {
      // create at the default advisory: a ~1.4 MB table lands as one file
      val rng = new scala.util.Random(42)
      val rows = (1L to 20000L).map(i => (i, rng.alphanumeric.take(64).mkString))
      ParquetWarehouse.upsert(rows.toDF("id", "body"), dir, Seq("id"))
      def files() = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).toSeq
      val createdFiles = files().size
      // merge under a shrunk advisory: the committed ~1.4 MB table is far
      // above 2×8 KB, the rebalance engages, and the rewrite's files
      // track the (tiny) advisory instead of the window partitioning.
      // minPartitionSize is lowered with the advisory: its 1 MB default
      // would re-merge these deliberately tiny partitions (at production
      // advisories it is far below the advisory and never binds).
      // Incompressible payloads keep the volume honest — the rebalance
      // targets COMPRESSED shuffle sizes.
      spark.conf.set(advisoryKey, "8KB")
      spark.conf.set(minKey, "1KB")
      ParquetWarehouse.upsert(
        Seq((1L, "replaced")).toDF("id", "body"), dir, Seq("id"))
      assert(files().size > createdFiles,
        s"merge above the gate should split the rewrite toward the advisory; " +
          s"got ${files().size} file(s) from $createdFiles")
      val got = spark.read.parquet(dir)
      assert(got.count() === 20000L)
      assert(got.filter(col("id") === 1L).select("body").head().getString(0) === "replaced")
    } finally {
      spark.conf.set(advisoryKey, prev)
      spark.conf.set(minKey, prevMin)
    }
  }

  test("upsert schema evolution: an added column null-fills history; strict mode throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_ev").toString + "/t"
    ParquetWarehouse.upsert(
      Seq(("c1", 0.5), ("c2", 0.7)).toDF("conv_id", "ihc"),
      dir, Seq("conv_id"))
    val v2 = Seq(("c1", 0.9, "modelB"), ("c3", 0.1, "modelB"))
      .toDF("conv_id", "ihc", "model")
    // strict default: silent drift is a bug, the mismatch must throw
    intercept[org.apache.spark.sql.AnalysisException] {
      ParquetWarehouse.upsert(v2, dir, Seq("conv_id"))
    }
    ParquetWarehouse.upsert(v2, dir, Seq("conv_id"), evolveSchema = true)
    val got = spark.read.parquet(dir)
      .as[(String, Double, Option[String])].collect().toSet
    assert(got === Set(
      ("c1", 0.9, Some("modelB")), // replaced, carries the new column
      ("c2", 0.7, None),           // untouched history null-fills it
      ("c3", 0.1, Some("modelB"))))
    // a later run missing the evolved column still merges when evolving
    ParquetWarehouse.upsert(
      Seq(("c2", 0.8)).toDF("conv_id", "ihc"), dir, Seq("conv_id"), evolveSchema = true)
    val got2 = spark.read.parquet(dir)
      .as[(String, Double, Option[String])].collect().toSet
    assert(got2 === Set(
      ("c1", 0.9, Some("modelB")), ("c2", 0.8, None), ("c3", 0.1, Some("modelB"))))
  }

  test("upsert survivor for intra-batch duplicate keys is partitioning-independent") {
    // three same-key rows in ONE batch: the survivor must be a function of
    // row content (hash tiebreak), not of partition/shuffle order
    val dup = Seq(("c1", "a"), ("c1", "b"), ("c1", "c"), ("c2", "x"))
      .toDF("conv_id", "v")
    val survivors = Seq(1, 3, 7).map { n =>
      val dir = java.nio.file.Files.createTempDirectory("graft_dup").toString + "/t"
      ParquetWarehouse.upsert(dup.repartition(n), dir, Seq("conv_id"))
      spark.read.parquet(dir).as[(String, String)].collect().toSet
    }
    assert(survivors.distinct.size === 1,
      s"survivor set varied with partitioning: $survivors")
    assert(survivors.head.size === 2)
    // merge branch: intra-batch dups in UPDATES over an existing table
    // resolve the same way, and still beat the existing row
    val mergeSurvivors = Seq(2, 5).map { n =>
      val dir = java.nio.file.Files.createTempDirectory("graft_dup_m").toString + "/t"
      ParquetWarehouse.upsert(Seq(("c1", "old")).toDF("conv_id", "v"), dir, Seq("conv_id"))
      ParquetWarehouse.upsert(
        Seq(("c1", "p"), ("c1", "q")).toDF("conv_id", "v").repartition(n),
        dir, Seq("conv_id"))
      spark.read.parquet(dir).as[(String, String)].collect().toSet
    }
    assert(mergeSurvivors.distinct.size === 1)
    assert(!mergeSurvivors.head.exists(_._2 == "old"), "updates must beat existing")
  }

  test("upsert tolerates map-typed value columns (canonicalized into the tiebreak hash)") {
    // xxhash64 rejects MapType — a map column enters the content tiebreak
    // through its canonical sorted-entry form, and must never crash the
    // upsert (regression guard: the pre-tiebreak upsert accepted
    // map-typed tables)
    val dir = java.nio.file.Files.createTempDirectory("graft_map").toString + "/t"
    val withMap = Seq(("c1", Map("a" -> 1)), ("c2", Map("b" -> 2)))
      .toDF("conv_id", "props")
    ParquetWarehouse.upsert(withMap, dir, Seq("conv_id"))
    ParquetWarehouse.upsert(
      Seq(("c1", Map("a" -> 9))).toDF("conv_id", "props"), dir, Seq("conv_id"))
    val rows = spark.read.parquet(dir).as[(String, Map[String, Int])].collect().toMap
    assert(rows.keySet === Set("c1", "c2"))
    assert(rows("c1") === Map("a" -> 9), "updates must still beat existing")
  }

  test("upsert refuses reserved __src/__rn columns; accepts dotted column names") {
    // __src/__rn are the merge's internal batch marker and window rank —
    // a user table carrying either would have it consumed as ordering
    // and silently DROPPED from the written table (silent column loss);
    // refuse loudly instead
    val dir0 = java.nio.file.Files.createTempDirectory("graft_resv").toString + "/t"
    val e = intercept[IllegalArgumentException] {
      ParquetWarehouse.upsert(
        Seq(("c1", "x")).toDF("conv_id", "__src"), dir0, Seq("conv_id"))
    }
    assert(e.getMessage.contains("reserved"))
    // a legal dotted column name must resolve as a COLUMN in the content
    // tiebreak, not parse as a nested-field path and crash the merge
    val dir1 = java.nio.file.Files.createTempDirectory("graft_dotted").toString + "/t"
    val dotted = Seq(("c1", "v1"), ("c1", "v2")).toDF("conv_id", "a.b")
    ParquetWarehouse.upsert(dotted, dir1, Seq("conv_id"))
    assert(spark.read.parquet(dir1).count() === 1L)
  }

  test("upsert survivor for swapped-null contents is partitioning-independent") {
    // Spark's hash functions SKIP nulls, so a structural tiebreak hash
    // cannot tell (a=NULL, b="x") from (a="x", b=NULL) — under the old
    // tiebreak the two rows tied and the survivor fell to partition
    // order; the null-explicit canonical rendering keys them apart.
    // The c2 rows guard the NEW rendering's precision instead: a JSON
    // key with to_json's default millisecond timestampFormat would
    // render micros-apart rows identically and re-tie them (the old
    // structural hash keyed raw micros and never had this case).
    val t1 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00.000001")
    val t2 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00.000002")
    val rows = Seq(
      ("c1", Option.empty[String], Option("x"), t1),
      ("c1", Option("x"), Option.empty[String], t1),
      ("c2", Option("y"), Option("y"), t1),
      ("c2", Option("y"), Option("y"), t2))
    val survivors = Seq(1, 2, 5, 8).map { n =>
      val dir = java.nio.file.Files.createTempDirectory("graft_nullswap").toString + "/t"
      ParquetWarehouse.upsert(
        rows.toDF("conv_id", "a", "b", "ts").repartition(n), dir, Seq("conv_id"))
      spark.read.parquet(dir)
        .as[(String, Option[String], Option[String], java.sql.Timestamp)].collect().toSet
    }
    assert(survivors.distinct.size === 1,
      s"swapped-null / micro-timestamp survivor varied with partitioning: $survivors")
    assert(survivors.head.map(_._1) === Set("c1", "c2"))
  }

  test("upsert survivor for rows differing ONLY in a map column is partitioning-independent") {
    // the tiebreak boundary the round-10 advice flagged: two same-key rows
    // whose every non-map column is identical used to tie silently (maps
    // were excluded from the hash → survivor fell to partition order).
    // The canonical sorted-entry form makes the survivor a function of the
    // MAP's content too — same winner whatever the partitioning, and
    // insensitive to map-internal entry order on the way in.
    val rows = Seq(
      ("c1", "same", Map("x" -> 1, "y" -> 2)),
      ("c1", "same", Map("z" -> 9)),
      ("c1", "same", Map("y" -> 2, "x" -> 1)), // = row 1's map, other entry order
      ("c2", "same", Map.empty[String, Int]))
    val survivors = Seq(1, 2, 5, 8).map { n =>
      val dir = java.nio.file.Files.createTempDirectory("graft_map_dup").toString + "/t"
      ParquetWarehouse.upsert(
        rows.toDF("conv_id", "v", "props").repartition(n), dir, Seq("conv_id"))
      spark.read.parquet(dir)
        .as[(String, String, Map[String, Int])].collect()
        .map { case (k, v, m) => (k, v, m.toSeq.sorted) }.toSet
    }
    assert(survivors.distinct.size === 1,
      s"map-only-difference survivor varied with partitioning: $survivors")
    assert(survivors.head.map(_._1) === Set("c1", "c2"))
  }

  test("upsert rejects an existing table missing a merge key (symmetric guard)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_keyguard").toString + "/t"
    // seed a table that has no conv_id column at all
    Seq((0.5, "m")).toDF("ihc", "model").write.parquet(dir)
    val up = Seq(("c1", 0.9, "m")).toDF("conv_id", "ihc", "model")
    val e = intercept[IllegalArgumentException] {
      ParquetWarehouse.upsert(up, dir, Seq("conv_id"), evolveSchema = true)
    }
    assert(e.getMessage.contains("conv_id"))
  }

  test("upsert heals an interrupted swap: .__old restores, stale tmp dirs removed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_crash").toString + "/t"
    ParquetWarehouse.upsert(
      Seq(("c1", 0.5), ("c2", 0.7)).toDF("conv_id", "ihc"), dir, Seq("conv_id"))
    // simulate a crash BETWEEN the two swap renames: the committed table
    // sits in .__old, dest is missing, and a never-committed tmp write
    // from the dead run is orphaned alongside
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.rename(
      new org.apache.hadoop.fs.Path(dir), new org.apache.hadoop.fs.Path(dir + ".__old")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".__tmp-deadbeef"))
    // the next upsert must MERGE into the restored history — the failure
    // mode was rebuilding the table from the updates batch alone and
    // deleting the .__old backup unexamined
    ParquetWarehouse.upsert(Seq(("c1", 0.9)).toDF("conv_id", "ihc"), dir, Seq("conv_id"))
    val got = spark.read.parquet(dir).as[(String, Double)].collect().toSet
    assert(got === Set(("c1", 0.9), ("c2", 0.7)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".__old")))
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(dir + ".__tmp-*")).isEmpty)
  }

  test("a failing upsert write leaves the table live and no orphan tmp dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_failwrite").toString + "/t"
    ParquetWarehouse.upsert(Seq(("c1", "x")).toDF("conv_id", "v"), dir, Seq("conv_id"))
    // poison batch: schema says string, but evaluating it throws at write
    // time (ANSI to_date on garbage) — the tmp write dies mid-job
    val poison = Seq(("c2", "not-a-date")).toDF("conv_id", "v")
      .withColumn("v", to_date(col("v")).cast("string"))
    intercept[Exception] { ParquetWarehouse.upsert(poison, dir, Seq("conv_id")) }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(spark.read.parquet(dir).as[(String, String)].collect().toSet
      === Set(("c1", "x")))
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(dir + ".__tmp-*")).isEmpty,
      "failed write left an orphaned staging dir")
  }

  test("writeBucketed emits exactly ONE file per bucket (repartition-aligned)") {
    // the pre-write repartition(buckets, keys) uses the same murmur3
    // modulus as the bucketing spec, so each task owns one bucket; a
    // drift here silently multiplies file count by the input partition
    // count (the small-files problem the scaladoc warns about)
    val dir = java.nio.file.Files.createTempDirectory("graft_bkt").toString + "/t"
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("k", "v").repartition(13)
    ParquetWarehouse.writeBucketed(df, "bucketed_onefile", Seq("k"), buckets = 4,
      location = Some(dir))
    val files = new java.io.File(dir).listFiles()
      .map(_.getName).filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
    assert(files.length === 4, s"expected 4 bucket files, got:\n${files.mkString("\n")}")
    assert(spark.table("bucketed_onefile").count() === 500)
  }

  test("bucketed tables join with zero Exchange (co-located join)") {
    val a = (1L to 200L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 200L).map(i => (i, s"b$i")).toDF("k", "vb")
    ParquetWarehouse.writeBucketed(a, "bucketed_a", Seq("k"), 4)
    ParquetWarehouse.writeBucketed(b, "bucketed_b", Seq("k"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bucketed_a").join(spark.table("bucketed_b"), "k")
      assert(joined.count() === 200)
      // after execution the AQE plan string shows the final operators;
      // bucket-aligned sides must produce no Exchange of any kind
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed equi join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("q103: bucketed journey join plans zero Exchange and matches q01") {
    val q103 = graft.SparkEntry.queries("q103_bucketed_join")(spark, TinySf)
    // force planning + execution, then read the final (AQE) physical plan
    val n103 = q103.count()
    val plan = q103.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed journey join must be co-located (no shuffle, no broadcast):\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ over bucketed scans:\n$plan")
    val n01 = graft.SparkEntry.queries("q01_journey")(spark, TinySf).count()
    assert(n103 === n01, "bucketing must not change the logical result")
  }

  test("date-partitioned write produces hive-style partition dirs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/t"
    val df = Seq(("2023-08-01", 1L), ("2023-08-02", 2L)).toDF("date", "v")
    ParquetWarehouse.writeDatePartitioned(df, dir, "date")
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("date="))
    assert(dirs.toSet === Set("date=2023-08-01", "date=2023-08-02"))
    // partition filter prunes: only one partition's files are read
    val pruned = spark.read.parquet(dir).filter(col("date") === "2023-08-01")
    assert(pruned.count() === 1)
  }

  test("date-partitioned write emits ONE data file per partition from a many-task input") {
    // the dynamic-partition small-files guard: a T-task frame spanning D
    // dates must land D files, not T×D (ScaleSmoke r13 measured the
    // unshaped write turning a 10× data step into a 32× write-time step
    // at 3 000 dates × 32 tasks)
    val dir = java.nio.file.Files.createTempDirectory("graft_part1f").toString + "/t"
    val df = (1 to 600).map(i => (f"2023-08-${i % 3 + 1}%02d", i.toLong))
      .toDF("date", "v").repartition(13)
    ParquetWarehouse.writeDatePartitioned(df, dir, "date")
    for (d <- Seq("date=2023-08-01", "date=2023-08-02", "date=2023-08-03")) {
      val files = new java.io.File(s"$dir/$d").listFiles()
        .map(_.getName).filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      assert(files.length === 1, s"$d has ${files.length} files: ${files.mkString(",")}")
    }
    assert(spark.read.parquet(dir).count() === 600)
  }
}

class JdbcWarehouseSpec extends SparkSpec {
  import graft.sources.JdbcWarehouse

  // Embedded Derby as the JDBC fixture (it ships in Spark's jar dir; the
  // sqlite path is the same code with url jdbc:sqlite:… + its driver).
  private lazy val dbUrl: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jdbc").toString
    val url = s"jdbc:derby:$dir/wh;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE session_sources (session_id VARCHAR(32), channel_name VARCHAR(32), cost DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO session_sources VALUES (?, ?, ?)")
      for (i <- 1 to 100) {
        ins.setString(1, s"s$i"); ins.setString(2, if (i % 2 == 0) "Direct" else "Email")
        ins.setDouble(3, i * 1.5); ins.executeUpdate()
      }
      st.execute("CREATE TABLE conversions (conv_id INT, revenue DOUBLE)")
      val ins2 = conn.prepareStatement("INSERT INTO conversions VALUES (?, ?)")
      for (i <- 1 to 40) { ins2.setInt(1, i); ins2.setDouble(2, i * 10.0); ins2.executeUpdate() }
    } finally conn.close()
    url
  }

  test("JDBC read: full scan and range-partitioned parallel scan agree (S2 drop-in)") {
    val whole = JdbcWarehouse.readTable(spark, dbUrl, "session_sources")
    assert(whole.count() === 100)
    assert(whole.columns.map(_.toLowerCase).toSet === Set("session_id", "channel_name", "cost"))
    val par = JdbcWarehouse.readTable(
      spark, dbUrl, "conversions", partition = Some(("conv_id", 1L, 40L, 4)))
    assert(par.rdd.getNumPartitions === 4)
    assert(par.agg(org.apache.spark.sql.functions.sum("revenue")).first().getDouble(0) === 8200.0)
  }

  test("migrate lands JDBC tables into parquet with verified counts (S3/S4)") {
    val target = java.nio.file.Files.createTempDirectory("graft_jdbc_mig").toString
    val counts = JdbcWarehouse.migrate(
      spark, dbUrl, Seq("session_sources", "conversions"), target)
    assert(counts === Map("session_sources" -> 100L, "conversions" -> 40L))
    assert(spark.read.parquet(s"$target/conversions").count() === 40)
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    val large = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")
    val plain = large.join(small, Seq("key")).select("key", "v", "label")
      .as[(String, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(large, small, Seq("key"), salt = 8)
      .select("key", "v", "label").as[(String, Long, String)].collect().toSet
    assert(salted === plain)
    assert(salted.count(_._1 == "hot") === 100)
  }
}

/** Partition-scoped upsert (r13): the O(affected-partitions) merge path.
  * The contract under test is twofold — SAME merge semantics as the
  * full-rewrite [[ParquetWarehouse.upsert]] when the partition column is
  * part of the key, and UNTOUCHED partitions' files physically left in
  * place (names and mtimes identical), which is the whole scale claim. */
class ParquetWarehousePartitionedSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def listing(dir: String): Set[(String, Long)] = {
    val d = new java.io.File(dir)
    if (!d.exists) Set.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet
  }

  test("upsertPartitioned merges like upsert and preserves other-partition rows") {
    val dir = freshDir("graft_pup")
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", 10.0), ("2023-09-01", "ch2", 20.0),
          ("2023-09-02", "ch1", 30.0)).toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", 11.0), ("2023-09-03", "ch9", 99.0))
        .toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    val got = spark.read.parquet(dir)
      .select("date", "channel", "spend").as[(String, String, Double)].collect().toSet
    assert(got === Set(
      ("2023-09-01", "ch1", 11.0), ("2023-09-01", "ch2", 20.0),
      ("2023-09-02", "ch1", 30.0), ("2023-09-03", "ch9", 99.0)))
  }

  test("a single-partition batch leaves every other partition's files untouched") {
    val dir = freshDir("graft_pup_touch")
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", 10.0), ("2023-09-02", "ch1", 30.0),
          ("2023-09-03", "ch1", 40.0)).toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    val before02 = listing(s"$dir/date=2023-09-02")
    val before03 = listing(s"$dir/date=2023-09-03")
    assert(before02.nonEmpty && before03.nonEmpty)
    Thread.sleep(1100) // mtime granularity can be a full second
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", 11.0), ("2023-09-01", "ch2", 12.0))
        .toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    assert(listing(s"$dir/date=2023-09-02") === before02,
      "untouched partition 09-02 was rewritten")
    assert(listing(s"$dir/date=2023-09-03") === before03,
      "untouched partition 09-03 was rewritten")
    // 09-01: ch1 replaced + ch2 added; 09-02 and 09-03 untouched
    assert(spark.read.parquet(dir).count() === 4)
  }

  test("upsertPartitioned with an all-new-partition batch reads nothing and touches nothing") {
    // affectedDirs is empty: the existing table has no dir for any
    // touched value, so the merge is the batch alone and no existing
    // partition's files move
    val dir = freshDir("graft_pup_newonly")
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", 10.0)).toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    val before = listing(s"$dir/date=2023-09-01")
    Thread.sleep(1100)
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-05", "ch1", 50.0), ("2023-09-05", "ch1", 51.0))
        .toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    assert(listing(s"$dir/date=2023-09-01") === before)
    val got = spark.read.parquet(dir)
      .select("date", "channel", "spend").as[(String, String, Double)].collect().toSet
    assert(got.map(_._1) === Set("2023-09-01", "2023-09-05"))
    assert(got.size === 2, "intra-batch duplicate keys must dedup in the no-existing-overlap path")
  }

  test("upsertPartitioned create branch dedups the initial batch (merge everywhere)") {
    val dir = freshDir("graft_pup_create")
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", 1.0), ("2023-09-01", "ch1", 2.0))
        .toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    assert(spark.read.parquet(dir).count() === 1)
  }

  test("upsertPartitioned guards: partitionCol must be a key, null partition values rejected") {
    val dir = freshDir("graft_pup_guard")
    val df = Seq(("2023-09-01", "ch1", 1.0)).toDF("date", "channel", "spend")
    val e1 = intercept[IllegalArgumentException] {
      ParquetWarehouse.upsertPartitioned(df, dir, Seq("channel"), "date")
    }
    assert(e1.getMessage.contains("partition"))
    val withNull = Seq((null.asInstanceOf[String], "ch1", 1.0))
      .toDF("date", "channel", "spend")
    val e2 = intercept[IllegalArgumentException] {
      ParquetWarehouse.upsertPartitioned(withNull, dir, Seq("date", "channel"), "date")
    }
    assert(e2.getMessage.contains("null"))
  }

  test("upsertPartitioned heals an interrupted partition swap before merging") {
    val dir = freshDir("graft_pup_crash")
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", 10.0), ("2023-09-02", "ch1", 30.0))
        .toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // simulate a crash between the two renames of partition 09-01: its
    // live dir is gone, the committed copy sits in a .__pold backup, and
    // a dead run's staging dir is orphaned alongside
    val pold = new org.apache.hadoop.fs.Path(dir + ".__pold-deadbeef")
    fs.mkdirs(pold)
    require(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/date=2023-09-01"),
      new org.apache.hadoop.fs.Path(pold, "date=2023-09-01")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".__ptmp-deadbeef"))
    // next call must restore 09-01 and merge INTO it, not rebuild from
    // the batch alone
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch2", 12.0)).toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    val got = spark.read.parquet(dir)
      .select("date", "channel", "spend").as[(String, String, Double)].collect().toSet
    assert(got === Set(
      ("2023-09-01", "ch1", 10.0), ("2023-09-01", "ch2", 12.0),
      ("2023-09-02", "ch1", 30.0)))
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(dir + ".__pold-*")).isEmpty)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(dir + ".__ptmp-*")).isEmpty)
  }

  test("upsertPartitioned evolveSchema: touched partition carries the new column; mergeSchema sees it table-wide") {
    val dir = freshDir("graft_pup_evolve")
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", 10.0), ("2023-09-02", "ch1", 30.0))
        .toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    // strict default: the added column must throw, like upsert
    val v2 = Seq(("2023-09-01", "ch1", 11.0, "modelB"))
      .toDF("date", "channel", "spend", "model")
    intercept[org.apache.spark.sql.AnalysisException] {
      ParquetWarehouse.upsertPartitioned(v2, dir, Seq("date", "channel"), "date")
    }
    ParquetWarehouse.upsertPartitioned(v2, dir, Seq("date", "channel"), "date",
      evolveSchema = true)
    // the documented mixed-schema contract: only the TOUCHED partition's
    // files carry the column; a mergeSchema read sees it table-wide with
    // untouched history null-filled
    val all = spark.read.option("mergeSchema", "true").parquet(dir)
      .select("date", "channel", "spend", "model")
      .as[(String, String, Double, Option[String])].collect().toSet
    assert(all === Set(
      ("2023-09-01", "ch1", 11.0, Some("modelB")),
      ("2023-09-02", "ch1", 30.0, None)))
    // and the untouched partition's files really don't have the column
    val untouched = spark.read.parquet(s"$dir/date=2023-09-02")
    assert(!untouched.columns.contains("model"))
  }

  test("compactPartitions rewrites only fragmented partitions, preserving rows and healthy files") {
    val dir = freshDir("graft_compact")
    // fragment 09-01 (5-task unshaped write → up to 5 files); 09-02 stays
    // healthy at one file
    (1 to 200).map(i => ("2023-09-01", i.toLong)).toDF("date", "v")
      .repartition(5).write.partitionBy("date").mode("append").parquet(dir)
    (201 to 300).map(i => ("2023-09-02", i.toLong)).toDF("date", "v")
      .coalesce(1).write.partitionBy("date").mode("append").parquet(dir)
    def files(d: String): Seq[String] = listing(s"$dir/$d").toSeq.map(_._1)
    assert(files("date=2023-09-01").length > 1, "fixture must start fragmented")
    val healthyBefore = listing(s"$dir/date=2023-09-02")
    val before = spark.read.parquet(dir).select("date", "v")
      .as[(String, Long)].collect().toSet
    Thread.sleep(1100)
    val n = ParquetWarehouse.compactPartitions(spark, dir, "date")
    assert(n === 1, "exactly the fragmented partition compacts")
    assert(files("date=2023-09-01").length === 1)
    assert(listing(s"$dir/date=2023-09-02") === healthyBefore,
      "healthy partition's files must not be touched")
    val after = spark.read.parquet(dir).select("date", "v")
      .as[(String, Long)].collect().toSet
    assert(after === before, "compaction must be row-preserving")
    // idempotent: nothing left to compact
    assert(ParquetWarehouse.compactPartitions(spark, dir, "date") === 0)
  }

  test("compactPartitions merges mixed partition schemas instead of dropping evolved columns") {
    // the data-loss hazard: a partition fed by files with DIFFERENT
    // schemas (append after evolution) must compact to the union schema —
    // a single sampled footer would silently drop the evolved column and
    // the swap would delete the only copy
    val dir = freshDir("graft_compact_mixed")
    Seq(("2023-09-01", 1L)).toDF("date", "v")
      .coalesce(1).write.partitionBy("date").mode("append").parquet(dir)
    Seq(("2023-09-01", 2L, "m")).toDF("date", "v", "model")
      .coalesce(1).write.partitionBy("date").mode("append").parquet(dir)
    assert(ParquetWarehouse.compactPartitions(spark, dir, "date") === 1)
    val got = spark.read.parquet(dir).select("v", "model")
      .as[(Long, Option[String])].collect().toSet
    assert(got === Set((1L, None), (2L, Some("m"))))
  }

  test("compactPartitions preserves dir names that do not round-trip typed inference") {
    // "007" would infer as int 7 and be rewritten under channel=7 while
    // channel=007 stayed live (duplicated rows, never-idempotent
    // compact); untyped partition reading keeps the dir name verbatim
    val dir = freshDir("graft_compact_007")
    Seq(("007", 1L)).toDF("channel", "v")
      .coalesce(1).write.partitionBy("channel").mode("append").parquet(dir)
    Seq(("007", 2L)).toDF("channel", "v")
      .coalesce(1).write.partitionBy("channel").mode("append").parquet(dir)
    assert(ParquetWarehouse.compactPartitions(spark, dir, "channel") === 1)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("channel="))
    assert(dirs.toSet === Set("channel=007"), s"dir names drifted: ${dirs.mkString(",")}")
    assert(spark.read.parquet(dir).count() === 2)
    assert(ParquetWarehouse.compactPartitions(spark, dir, "channel") === 0)
  }

  test("compactPartitions fails loudly on a wrong partition column") {
    val dir = freshDir("graft_compact_wrongcol")
    Seq(("2023-09-01", 1L)).toDF("date", "v")
      .write.partitionBy("date").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      ParquetWarehouse.compactPartitions(spark, dir, "event_dt")
    }
    assert(e.getMessage.contains("event_dt"))
  }

  test("a failing CREATE-branch write leaves no torn table at the live path") {
    // the create branch must stage through .__ptmp + rename like every
    // other path: a direct write would leave a partial table that the
    // next call mistakes for committed history (fs.exists → merge branch)
    val dir = freshDir("graft_pup_createfail")
    val poison = Seq(("2023-09-01", "ch1", "not-a-date")).toDF("date", "channel", "v")
      .withColumn("v", to_date(col("v")).cast("string"))
    intercept[Exception] {
      ParquetWarehouse.upsertPartitioned(poison, dir, Seq("date", "channel"), "date")
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)),
      "failed create left a (possibly torn) table at the live path")
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(dir + ".__ptmp-*")).isEmpty)
  }

  test("a failing partitioned write leaves the table live and no staging dirs") {
    val dir = freshDir("graft_pup_fail")
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", "x")).toDF("date", "channel", "v"),
      dir, Seq("date", "channel"), "date")
    // poison: evaluates fine at plan time, throws at write time (ANSI)
    val poison = Seq(("2023-09-01", "ch2", "not-a-date")).toDF("date", "channel", "v")
      .withColumn("v", to_date(col("v")).cast("string"))
    intercept[Exception] {
      ParquetWarehouse.upsertPartitioned(poison, dir, Seq("date", "channel"), "date")
    }
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(spark.read.parquet(dir).select("channel", "v")
      .as[(String, String)].collect().toSet === Set(("ch1", "x")))
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(dir + ".__ptmp-*")).isEmpty)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(dir + ".__pold-*")).isEmpty)
  }

  test("upsertPartitioned merge path round-trips partition values typed inference would re-spell") {
    // the merge-path sibling of the compactPartitions "007" trap: with
    // partition-type inference ON, the affected-dirs read re-infers
    // "007" as int 7, the cast back to string spells it "7", and the
    // rewrite lands under channel=7 while channel=007 stays live —
    // silent row duplication. The inference-off read keeps the dir
    // string verbatim, so the merge collapses onto the one true dir.
    val dir = freshDir("graft_pup_007")
    ParquetWarehouse.upsertPartitioned(
      Seq(("007", "s1", 1.0)).toDF("channel", "session_id", "v"),
      dir, Seq("channel", "session_id"), "channel")
    ParquetWarehouse.upsertPartitioned(
      Seq(("007", "s1", 2.0), ("007", "s2", 3.0)).toDF("channel", "session_id", "v"),
      dir, Seq("channel", "session_id"), "channel")
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("channel="))
    assert(dirs.toSet === Set("channel=007"), s"partition dir re-spelled: ${dirs.mkString(",")}")
    val got = spark.read.parquet(dir).select("session_id", "v")
      .as[(String, Double)].collect().toSet
    assert(got === Set(("s1", 2.0), ("s2", 3.0)), "old-spelling rows survived as duplicates")
  }

  test("compactPartitions retires zero-row partitions instead of re-selecting them forever") {
    // a partition holding only zero-row parquet files (streaming-sink or
    // filtered-rewrite leftovers) produces NO staged dir when rewritten;
    // leaving it live would make every subsequent pass select it again —
    // the pass must retire it (crash-safely, through the backup) so the
    // table converges to "0 compacted"
    val dir = freshDir("graft_compact_zerorow")
    Seq(("2023-09-01", 1L)).toDF("date", "v")
      .coalesce(1).write.partitionBy("date").mode("append").parquet(dir)
    // fabricate date=2023-09-02 from two ZERO-ROW parquet files (written
    // schema-only, then moved in) so the partition reads as fragmented
    val scratch = java.nio.file.Files.createTempDirectory("graft_zerorow_src").toString + "/s"
    Seq((1L)).toDF("v").filter(lit(false)).coalesce(1).write.parquet(scratch)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val emptyPart = fs.listStatus(new org.apache.hadoop.fs.Path(scratch))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    assert(emptyPart.nonEmpty, "fixture needs a schema-only parquet file")
    val zp = new org.apache.hadoop.fs.Path(s"$dir/date=2023-09-02")
    fs.mkdirs(zp)
    fs.rename(emptyPart.head.getPath, new org.apache.hadoop.fs.Path(zp, "part-a.parquet"))
    fs.copyFromLocalFile(new org.apache.hadoop.fs.Path(zp, "part-a.parquet"),
      new org.apache.hadoop.fs.Path(zp, "part-b.parquet"))
    assert(ParquetWarehouse.compactPartitions(spark, dir, "date") === 1)
    assert(!fs.exists(zp), "zero-row partition must be retired, not left live")
    assert(ParquetWarehouse.compactPartitions(spark, dir, "date") === 0,
      "pass must converge after retiring the zero-row partition")
    assert(spark.read.parquet(dir).select("v").as[Long].collect().toSeq === Seq(1L))
  }

  test("compactPartitions still fails loudly on a FLAT (non-partitioned) parquet table") {
    // the _SUCCESS-only relaxation must not extend to real data files at
    // the table root — that is a non-hive layout, the original misuse
    // the guard exists to catch
    val dir = freshDir("graft_compact_flat")
    Seq(("2023-09-01", 1L)).toDF("date", "v").write.parquet(dir)
    val e = intercept[IllegalArgumentException] {
      ParquetWarehouse.compactPartitions(spark, dir, "date")
    }
    assert(e.getMessage.contains("partition"))
  }

  test("compactPartitions returns 0 on a legitimately empty partitioned table") {
    // an empty partitioned write leaves a dir holding only _SUCCESS; the
    // wrong-column guard must not mistake that for a mis-named column
    val dir = freshDir("graft_compact_empty")
    ParquetWarehouse.writeDatePartitioned(
      Seq.empty[(String, Long)].toDF("date", "v"), dir, "date")
    assert(new java.io.File(dir).exists, "fixture must write the table dir")
    assert(ParquetWarehouse.compactPartitions(spark, dir, "date") === 0)
  }

  test("compactPartitions uniformSchema rewrites stale-schema partitions so a plain read sees evolved columns") {
    val dir = freshDir("graft_compact_uniform")
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", 10.0), ("2023-09-02", "ch1", 30.0))
        .toDF("date", "channel", "spend"),
      dir, Seq("date", "channel"), "date")
    ParquetWarehouse.upsertPartitioned(
      Seq(("2023-09-01", "ch1", 11.0, "modelB")).toDF("date", "channel", "spend", "model"),
      dir, Seq("date", "channel"), "date", evolveSchema = true)
    // the documented evolveSchema loose end: 09-02 is single-file and
    // old-schema, so the default (fragmentation-only) compact leaves it
    // stale forever and every reader pays mergeSchema indefinitely
    assert(ParquetWarehouse.compactPartitions(spark, dir, "date") === 0)
    val evolvedBefore = listing(s"$dir/date=2023-09-01")
    Thread.sleep(1100)
    assert(ParquetWarehouse.compactPartitions(spark, dir, "date", uniformSchema = true) === 1,
      "exactly the stale-schema partition rewrites")
    assert(listing(s"$dir/date=2023-09-01") === evolvedBefore,
      "already-uniform partition must be physically untouched")
    // the point of the pass: a PLAIN read — no mergeSchema, no declared
    // schema — now sees the evolved column table-wide, null-filled where
    // history predates it. The stale partition missed `model` even
    // though every OTHER selected partition missed it too (the column
    // lives only in the already-uniform dir), so this also pins the
    // representative-file schema recovery.
    val plain = spark.read.parquet(dir)
      .select("date", "channel", "spend", "model")
      .as[(String, String, Double, Option[String])].collect().toSet
    assert(plain === Set(
      ("2023-09-01", "ch1", 11.0, Some("modelB")),
      ("2023-09-02", "ch1", 30.0, None)))
    // idempotent: everything uniform now
    assert(ParquetWarehouse.compactPartitions(spark, dir, "date", uniformSchema = true) === 0)
  }

  test("warehouse writers hold an advisory single-writer lock: held fails loudly, stale breaks, always released") {
    val dir = freshDir("graft_lock")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val lock = new org.apache.hadoop.fs.Path(dir + ".__lock")
    ParquetWarehouse.upsert(Seq(("c1", "a")).toDF("conv_id", "v"), dir, Seq("conv_id"))
    assert(!fs.exists(lock), "lock must be released after a successful write")
    // a FRESH lock means a live concurrent writer: every writer entry
    // point must fail loudly instead of corrupting its staging dirs
    val out = fs.create(lock, false)
    out.write("pid=test\n".getBytes("UTF-8")); out.close()
    val e1 = intercept[IllegalArgumentException] {
      ParquetWarehouse.upsert(Seq(("c2", "b")).toDF("conv_id", "v"), dir, Seq("conv_id"))
    }
    assert(e1.getMessage.contains("lock"))
    val e2 = intercept[IllegalArgumentException] {
      ParquetWarehouse.upsertPartitioned(
        Seq(("2023-09-01", "c2", "b")).toDF("date", "conv_id", "v"),
        dir, Seq("date", "conv_id"), "date")
    }
    assert(e2.getMessage.contains("lock"))
    val e3 = intercept[IllegalArgumentException] {
      ParquetWarehouse.compactPartitions(spark, dir, "date")
    }
    assert(e3.getMessage.contains("lock"))
    assert(spark.read.parquet(dir).count() === 1, "locked-out writers must not have written")
    // a STALE lock is a crashed holder: the next writer breaks it and
    // proceeds (backdate past the stale horizon to simulate the crash age)
    fs.setTimes(lock, System.currentTimeMillis() - ParquetWarehouse.LockStaleMs - 60000, -1)
    ParquetWarehouse.upsert(Seq(("c2", "b")).toDF("conv_id", "v"), dir, Seq("conv_id"))
    assert(!fs.exists(lock), "stale lock must be broken, then released")
    assert(spark.read.parquet(dir).count() === 2)
    // the failure path releases too — a held-forever lock after a failed
    // write would wedge the table until the stale horizon
    val poison = Seq(("c3", "not-a-date")).toDF("conv_id", "v")
      .withColumn("v", to_date(col("v")).cast("string"))
    intercept[Exception] { ParquetWarehouse.upsert(poison, dir, Seq("conv_id")) }
    assert(!fs.exists(lock), "lock must be released after a FAILED write")
  }

  test("a dead same-host holder's lock breaks immediately — a crash mid-write heals on the next call") {
    val dir = freshDir("graft_lock_deadpid")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    ParquetWarehouse.upsert(Seq(("c1", "a")).toDF("conv_id", "v"), dir, Seq("conv_id"))
    // fabricate the lock of a crashed holder: OUR host, a pid that has
    // provably exited — the next writer must break it without waiting
    // out the age horizon (the lock is FRESH, only liveness says dead)
    val dead = new ProcessBuilder("true").start()
    dead.waitFor()
    assert(java.lang.ProcessHandle.of(dead.pid()).isEmpty, "fixture pid must be dead")
    val lock = new org.apache.hadoop.fs.Path(dir + ".__lock")
    val out = fs.create(lock, false)
    out.write(ParquetWarehouse.lockPayload(
      ParquetWarehouse.lockHost, dead.pid(), "crashed-token").getBytes("UTF-8"))
    out.close()
    ParquetWarehouse.upsert(Seq(("c2", "b")).toDF("conv_id", "v"), dir, Seq("conv_id"))
    assert(!fs.exists(lock), "broken lock must be replaced and then released")
    assert(spark.read.parquet(dir).count() === 2)
    // and the inverse: a LIVE same-host pid (ours) is never broken while
    // fresh, however the payload reads otherwise plausible
    val out2 = fs.create(lock, false)
    out2.write(ParquetWarehouse.lockPayload(
      ParquetWarehouse.lockHost, ProcessHandle.current().pid(), "live-token").getBytes("UTF-8"))
    out2.close()
    val e = intercept[IllegalArgumentException] {
      ParquetWarehouse.upsert(Seq(("c3", "c")).toDF("conv_id", "v"), dir, Seq("conv_id"))
    }
    assert(e.getMessage.contains("lock"))
    assert(fs.exists(lock), "a live holder's lock must survive the failed acquisition")
    fs.delete(lock, false)
  }
}
