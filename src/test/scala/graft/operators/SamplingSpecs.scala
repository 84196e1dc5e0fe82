package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("bernoulli: deterministic, rate-respecting, and coordinated across tables") {
    val docs = Tables.documents(spark, TinySf).cache()
    val total = docs.count()
    val a = Sampling.bernoulli(docs, "doc_id", 0.5).select("doc_id").as[Long].collect().toSet
    val b = Sampling.bernoulli(docs, "doc_id", 0.5).select("doc_id").as[Long].collect().toSet
    assert(a === b, "same salt+rate must reproduce the same sample")
    assert(math.abs(a.size.toDouble / total - 0.5) < 0.15, s"rate off: ${a.size}/$total")
    // coordination: sampling a projection of the same keys agrees exactly
    val proj = Sampling.bernoulli(docs.select("doc_id", "lang"), "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(proj === a)
    // different salt decorrelates
    val c = Sampling.bernoulli(docs, "doc_id", 0.5, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(c !== a)
    docs.unpersist()
  }

  test("stratifiedQuota: at most n per stratum, contiguous ranks, nested prefixes") {
    val docs = Tables.documents(spark, TinySf).cache()
    val q20 = Sampling.stratifiedQuota(docs, "lang", "doc_id", n = 20)
      .select(col("lang"), col("doc_id"), col("sample_rank"))
      .as[(String, Long, Long)].collect()
    val byLang = q20.groupBy(_._1)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length <= 20, s"$lang over quota")
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"$lang ranks not contiguous")
    }
    val q10 = Sampling.stratifiedQuota(docs, "lang", "doc_id", n = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(q10.subsetOf(q20.map(_._2).toSet), "smaller quota must be a prefix of larger")
    docs.unpersist()
  }

  test("trainValTest: total partition, ~80/10/10, and stable under corpus growth") {
    val docs = Tables.documents(spark, TinySf).cache()
    val total = docs.count()
    val split = Sampling.trainValTest(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(split.length === total, "split must cover every row exactly once")
    val byLabel = split.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    assert(math.abs(byLabel("train").toDouble / total - 0.8) < 0.15)
    // growth stability: adding new rows never moves an existing row's split
    val maxId = docs.agg(max("doc_id")).as[Long].head()
    val grown = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + lit(maxId + 1)))
    val regrown = Sampling.trainValTest(grown, "doc_id")
      .filter(col("doc_id") <= maxId)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    split.foreach { case (id, s) => assert(regrown(id) === s, s"doc $id moved to ${regrown(id)}") }
    docs.unpersist()
  }

  test("bernoulli prefilter preserves the exact per-stratum top-n (the documented 100 TB path)") {
    val docs = Tables.documents(spark, TinySf).cache()
    val n = 5
    val full = Sampling.stratifiedQuota(docs, "lang", "doc_id", n)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    val thinned = Sampling.stratifiedQuota(
      Sampling.bernoulli(docs, "doc_id", 0.5), "lang", "doc_id", n)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    // survivors per stratum ≥ n on this fixture, so membership (a prefix of
    // the hash order) must agree exactly
    val survivors = Sampling.bernoulli(docs, "doc_id", 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(survivors.values.forall(_ >= n), s"fixture too thin: $survivors")
    assert(thinned === full)
    docs.unpersist()
  }
}

class EpochResampleSpec extends SparkSpec {
  import spark.implicits._

  test("epochResample: integer weights repeat exactly, fractions hash-gate, zero drops") {
    val docs = Tables.documents(spark, TinySf).cache()
    val out = Sampling.epochResample(docs,
      weights = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0),
      stratumCol = "source", keyCol = "doc_id")
      .select("doc_id", "source", "epoch").as[(Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    val srcOf = docs.select("doc_id", "source").as[(Long, String)].collect().toMap
    // epochs are a contiguous 0-based prefix per doc
    byDoc.foreach { case (id, es) => assert(es === (0L until es.length).toSeq, s"doc $id: $es") }
    val copies = srcOf.keys.map(id => srcOf(id) -> byDoc.getOrElse(id, Nil).size).toSeq
    def stats(src: String) = copies.filter(_._1 == src).map(_._2)
    // src0 (w=2.5): every doc 2 or 3 copies; mean near 2.5
    assert(stats("src0").forall(c => c == 2 || c == 3))
    // src1 (w=0.25): 0 or 1 copies; src2 (w=0): always 0
    assert(stats("src1").forall(c => c == 0 || c == 1))
    assert(stats("src2").forall(_ == 0))
    // default weight 1.0: exactly one copy each
    assert(copies.filter(c => !Set("src0", "src1", "src2").contains(c._1)).forall(_._2 == 1))
    // deterministic: the SAME docs carry the extra epoch on a rerun
    val rerun = Sampling.epochResample(docs,
      weights = Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 0.0),
      stratumCol = "source", keyCol = "doc_id")
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSet
    assert(rerun === out.map(t => (t._1, t._3)).toSet)
    docs.unpersist()
  }

  test("percentileFilter: bounds are group quantiles; every kept row is inside them") {
    val docs = Tables.documents(spark, TinySf).cache()
    val kept = Quantiles.percentileFilter(docs, "lang", "n_chars", "doc_id")
      .select("doc_id", "lang", "n_chars", "lo", "hi")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(kept.forall(r => r._3 >= r._4 && r._3 <= r._5))
    // bounds match the standalone quantile operator's nearest-rank picks
    val q = Quantiles.discrete(docs, "lang", "n_chars", "doc_id")
      .select("lang", "p90").as[(String, Long)].collect().toMap
    // p90 from discrete() uses the same ceil-rank arithmetic as the filter's hi
    val hiOf = kept.groupBy(_._2).view.mapValues(_.head._5).toMap
    hiOf.foreach { case (lang, hi) => assert(hi === q(lang), s"$lang hi != p90") }
    // tails are actually trimmed: fewer rows than the corpus, none dropped inside
    assert(kept.length < docs.count())
    docs.unpersist()
  }

  test("percentileFilter: p = 0.0 means the group minimum, not an empty result") {
    // ceil(0·n) = 0 matches no rank — without the clamp the lo bound is
    // NULL and every row silently drops (round-8 review finding)
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L))
      .toDF("doc_id", "lang", "n_chars")
    val kept = Quantiles.percentileFilter(df, "lang", "n_chars", "doc_id",
      pLo = 0.0, pHi = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L), "[0, 1] window must keep everything")
    // pHi = 0.5 ⇒ hi = rank ceil(1.5) = 2 ⇒ value 20
    val lower = Quantiles.percentileFilter(df, "lang", "n_chars", "doc_id",
      pLo = 0.0, pHi = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(lower === Set(1L, 2L), "upper-tail-only trim must keep the lower rows")
  }

  test("percentileFilter: a NULL group key filters against its own bounds, not dropped") {
    // null-safe bounds join: the window ranks the null group like any
    // other, so the filter must too — a plain equi-join dropped every
    // null-group row wholesale
    val df = Seq(
      (1L, Some("a"), 10L), (2L, Some("a"), 20L),
      (3L, Option.empty[String], 5L), (4L, None, 15L), (5L, None, 500L))
      .toDF("doc_id", "lang", "n_chars")
    val kept = Quantiles.percentileFilter(df, "lang", "n_chars", "doc_id",
      pLo = 0.0, pHi = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // null group n=3, hi = rank ceil(0.5*3) = 2 → hi value 15: docs 3,4
    // kept INSIDE the null group's own bounds, doc 5 (500) trimmed by
    // them — proving the group participates rather than vanishing
    assert(kept.contains(3L) && kept.contains(4L),
      "null-group rows inside bounds must be kept")
    assert(!kept.contains(5L), "null-group tail must trim by the null group's hi")
    assert(kept.contains(1L), "'a' group unaffected")
  }
}

class MixturePackingSpec extends SparkSpec {
  import spark.implicits._

  test("mixture: per-stratum rates, whitelist semantics, nested under rate increases") {
    val docs = Tables.documents(spark, TinySf).cache()
    val rates = Map("en" -> 0.8, "de" -> 0.25, "zh" -> 1.0)
    val got = Sampling.mixture(docs, "lang", "doc_id", rates)
      .select("lang", "doc_id").as[(String, Long)].collect()
    assert(got.nonEmpty)
    assert(got.map(_._1).toSet.subsetOf(rates.keySet), "non-whitelisted stratum leaked")
    // rate 1.0 keeps everything
    val zhAll = docs.filter(col("lang") === "zh").count()
    assert(got.count(_._1 == "zh").toLong === zhAll)
    // raising a rate only adds rows (same hash ordering)
    val raised = Sampling.mixture(docs, "lang", "doc_id", rates + ("de" -> 0.8))
      .select("doc_id").as[Long].collect().toSet
    assert(got.map(_._2).toSet.subsetOf(raised))
    // per-stratum agreement with plain bernoulli at the same rate
    val bernEn = Sampling.bernoulli(docs.filter(col("lang") === "en"), "doc_id", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(got.filter(_._1 == "en").map(_._2).toSet === bernEn)
    docs.unpersist()
  }

  test("concatChunk: offsets tile each shard's token stream; chunk ids are start-offset div budget") {
    val docs = Tables.documents(spark, TinySf)
    val packed = Packing.concatChunk(docs, budget = 512L)
      .select(col("source"), col("doc_id"), col("n_tokens"), col("start_off"), col("chunk_id"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (shard, rows) =>
      val ordered = rows.sortBy(_._2)
      var expectedOff = 0L
      ordered.foreach { case (_, id, n, off, chunk) =>
        assert(off === expectedOff, s"$shard/$id: offset gap")
        assert(chunk === off / 512, s"$shard/$id: chunk mismatch")
        expectedOff += n
      }
      // consecutive docs land in non-decreasing chunks
      assert(ordered.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }
}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curate: dedup absorbs injected duplicates; gates and ratios hold") {
    val docs = Tables.documents(spark, TinySf).cache()
    val base = Curation.curate(docs)
      .orderBy("predicted_lang", "source")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(base.nonEmpty)
    base.foreach { case (lang, src, nDocs, chars, ws, bpe, words, stops, ratio) =>
      assert(nDocs > 0 && chars > 0 && ws > 0 && bpe > 0)
      assert(words >= 5 * nDocs, s"$lang/$src: quality gate admits <5-word docs")
      assert(ratio >= 0.0 && ratio < 1.0, s"$lang/$src: ratio out of range $ratio")
      assert(stops <= words)
    }
    // re-appending every document under fresh ids changes nothing: the
    // canonical (lowest-id) copy wins and the dupes are absorbed
    val maxId = docs.agg(max("doc_id")).as[Long].head()
    val doubled = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + lit(maxId + 1)))
    val again = Curation.curate(doubled)
      .orderBy("predicted_lang", "source")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Double)].collect()
    assert(again.toSeq === base.toSeq)
    docs.unpersist()
  }
}

class ShardShuffleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 500L).map(i => (i, s"src${i % 7}")).toDF("doc_id", "source")

  test("total partition: every row lands in exactly one shard with a dense 1-based pos") {
    val out = Sampling.shardShuffle(docs, "doc_id", numShards = 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect()
    assert(out.length === 500)
    assert(out.map(_._1).toSet === (1L to 500L).toSet)
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $shard pos not dense")
    }
  }

  test("deterministic across runs; the order decorrelates from the input order") {
    val a = Sampling.shardShuffle(docs, "doc_id", numShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = Sampling.shardShuffle(docs, "doc_id", numShards = 4)
      .select("doc_id", "shard", "pos").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    // within a shard, hash order must not follow doc_id order
    val shard0 = a.filter(_._2 == 0L).sortBy(_._3).map(_._1).toSeq
    assert(shard0 !== shard0.sorted, "hash order should scramble the key order")
  }

  test("a different salt reshuffles; shard counts stay roughly uniform") {
    val a = Sampling.shardShuffle(docs, "doc_id", numShards = 4)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val b = Sampling.shardShuffle(docs, "doc_id", numShards = 4, salt = "epoch2")
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert((1L to 500L).count(i => a(i) != b(i)) > 200,
      "salt change should move ~3/4 of rows")
    val sizes = a.values.groupBy(identity).values.map(_.size)
    assert(sizes.min > 60 && sizes.max < 190, s"shard sizes far from uniform: $sizes")
  }
}

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 1000L).map(i => (i, 1L + (i % 100))).toDF("doc_id", "w")

  test("priorities are hash div weight; the n smallest win; deterministic") {
    val a = Sampling.weightedSample(docs, "w", "doc_id", n = 50)
      .as[(Long, Long, Long)].collect()
    val b = Sampling.weightedSample(docs, "w", "doc_id", n = 50)
      .as[(Long, Long, Long)].collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 50)
    // replicate the priority definition independently
    val all = docs.select($"doc_id", $"w",
      (Sampling.hashKey($"doc_id", "graft") / $"w").cast("long").as("p"))
      .as[(Long, Long, Long)].collect()
    val expect = all.sortBy(r => (r._3, r._1)).take(50).map(_._1).toSeq
    assert(a.map(_._1).toSeq === expect)
  }

  test("heavier rows are sampled far above their uniform share; zero weight never") {
    val skewed = (1L to 2000L).map(i => (i, if (i <= 100) 1000L else 1L))
      .toDF("doc_id", "w")
    val got = Sampling.weightedSample(skewed, "w", "doc_id", n = 100)
      .as[(Long, Long, Long)].collect().map(_._1)
    val heavy = got.count(_ <= 100)
    assert(heavy > 60, s"heavy rows (5% of corpus, 1000x weight) won only $heavy/100")
    val withZero = skewed.withColumn("w", when($"doc_id" === 1L, 0L).otherwise($"w"))
    val got2 = Sampling.weightedSample(withZero, "w", "doc_id", n = 100)
      .as[(Long, Long, Long)].collect().map(_._1)
    assert(!got2.contains(1L))
  }

  test("decimal weights are accepted exactly; doubles are still rejected") {
    // integer-valued decimals must reproduce the long-weight draw
    val asDecimal = docs.withColumn("w", $"w".cast("decimal(10,0)"))
    val longDraw = Sampling.weightedSample(docs, "w", "doc_id", n = 50)
      .select($"doc_id", $"priority").as[(Long, Long)].collect().toSeq
    val decDraw = Sampling.weightedSample(asDecimal, "w", "doc_id", n = 50)
      .select($"doc_id", $"priority").as[(Long, Long)].collect().toSeq
    assert(decDraw === longDraw)
    // fractional decimal: div stays exact floor division (no long truncation
    // of the WEIGHT — doc 1's weight 1.5 must not behave like weight 1)
    val frac = Seq((1L, BigDecimal("1.5"))).toDF("doc_id", "w")
    val p = Sampling.weightedSample(frac, "w", "doc_id", n = 1)
      .select($"priority").as[Long].head()
    val h = docs.sparkSession.range(1).select(
      Sampling.hashKey(lit(1L), "graft").as("h")).as[Long].head()
    assert(p === (BigDecimal(h) / BigDecimal("1.5")).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedSample(docs.withColumn("w", $"w".cast("double")), "w", "doc_id", n = 5)
    }
    assert(e.getMessage.contains("integral or decimal"))
  }

  test("case-mismatched weight column resolves like the analyzer, not a crash") {
    // col("W") resolves field "w" (spark.sql.caseSensitive=false), so the
    // type guard's schema lookup must resolve it the same way
    val draw = Sampling.weightedSample(docs, "W", "doc_id", n = 50)
      .select($"doc_id").as[Long].collect().toSet
    val expected = Sampling.weightedSample(docs, "w", "doc_id", n = 50)
      .select($"doc_id").as[Long].collect().toSet
    assert(draw === expected)
  }
}
