package graft.operators

import scala.util.Random

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

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def signals(rows: Seq[(Long, String)]) =
    TextOps.repetitionSignals(rows.toDF("doc_id", "text"))
      .select("doc_id", "n_tokens", "n_distinct", "top_bigram_count", "n_bigrams", "keep")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("hand-computed signals: repeats, diverse, empty, singleton") {
    val out = signals(Seq(
      (1L, "a b a b a"),                   // ab,ba,ab,ba → top 2 of 4; 2 distinct of 5
      (2L, "a b c d e f g h i j k l"),     // fully diverse, 11 bigrams
      (3L, ""),                            // no tokens at all
      (4L, "w"),                           // one token, no bigrams
      (5L, "a  b")))                       // double space → empty token dropped
    assert(out(1L) === ((5L, 2L, 2L, 4L, 0L)))   // dup-word gate fails
    assert(out(2L) === ((12L, 12L, 1L, 11L, 1L)))
    assert(out(3L) === ((0L, 0L, 0L, 0L, 0L)))   // 0*2 > 0 is false
    assert(out(4L) === ((1L, 1L, 0L, 0L, 1L)))   // no bigrams → gate vacuous
    assert(out(5L) === ((2L, 2L, 1L, 1L, 0L)))   // 1*5 > 1 → short-doc drop
  }

  test("randomized differential vs a plain-Scala computation") {
    val rng = new Random(17)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 200L).map { i =>
      val n = rng.nextInt(30)
      i -> (1 to n).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val got = signals(docs)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty).toSeq
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val top = if (bigrams.isEmpty) 0L else bigrams.groupBy(identity).values.map(_.size).max.toLong
      val keep =
        if (toks.distinct.size * 2 > toks.size &&
          (bigrams.isEmpty || top * 5 <= bigrams.size)) 1L else 0L
      assert(got(id) === ((toks.size.toLong, toks.distinct.size.toLong,
        top, bigrams.size.toLong, keep)), s"doc $id: '$text'")
    }
  }
}

class MergeCandidatesSpec extends SparkSpec {
  import spark.implicits._

  test("counts adjacent pairs corpus-wide; ties order lexicographically; topN cuts") {
    val docs = Seq(
      (1L, "lo w lo w"),      // "lo w" x2, "w lo" x1
      (2L, "lo w er"),        // "lo w" x1, "w er" x1
      (3L, "n e w e s t"))    // five singleton pairs
      .toDF("doc_id", "text")
    val all = TextOps.mergeCandidates(docs, topN = 100)
      .as[(String, Long)].collect().toSeq
    assert(all.head === (("lo w", 3L)))
    // singleton ties are sorted lexicographically after the count
    assert(all.tail.map(_._2).forall(_ == 1L))
    assert(all.tail.map(_._1) === all.tail.map(_._1).sorted)
    val cut = TextOps.mergeCandidates(docs, topN = 2).as[(String, Long)].collect()
    assert(cut.toSeq === all.take(2))
  }
}

class RedactionSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String) =
    Redaction.redact(Seq((1L, text)).toDF("id", "t"), "t")
      .select("redacted", "n_emails", "n_numbers")
      .as[(String, Long, Long)].collect().head

  test("emails then long digit runs; short numbers survive") {
    assert(run("mail john.doe@x.com ref 1234567 or 12345") ===
      (("mail [EMAIL] ref [NUMBER] or 12345", 1L, 1L)))
  }

  test("digits inside an email count once, as the email") {
    assert(run("a123456@b.example.org") === (("[EMAIL]", 1L, 0L)))
  }

  test("multiple hits all masked; clean text untouched") {
    assert(run("x@y.com 111111 z@w.net 222222") ===
      (("[EMAIL] [NUMBER] [EMAIL] [NUMBER]", 2L, 2L)))
    assert(run("no pii here 123") === (("no pii here 123", 0L, 0L)))
  }
}

class TextEdgeContractsSpec extends SparkSpec {
  import spark.implicits._

  test("langId: NULL text predicts NULL, never the last language in the chain") {
    // null scores make every CASE condition null — unguarded, the chain
    // bottoms out at "zh" and misattributes unknown content
    val docs = Seq((1L, Some("the cat is on the mat")), (2L, None))
      .toDF("doc_id", "text")
    val got = TextOps.langId(docs)
      .select("doc_id", "predicted_lang").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === Some("en"))
    assert(got(2L) === None)
  }

  test("quality: empty split artifacts are not words; zero-word docs get NULL ratios, gate 0") {
    val docs = Seq(
      (1L, "lion  tiger  bear"),       // 3 real words, 2 double spaces
      (2L, "   "),                     // all whitespace: ZERO words
      (3L, "the cat is on the mat ok") // 7 real words, clean
    ).toDF("doc_id", "text")
    val got = TextOps.quality(docs)
      .select("doc_id", "n_words", "quality_score").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 === 3L) // not 5 — a 3-word doc must not pass the >=5 gate
    assert(got(1L)._2 === 0.0)
    assert(got(2L)._1 === 0L)
    assert(got(2L)._2 === 0.0)
    assert(got(3L)._1 === 7L)
    assert(got(3L)._2 > 0.0)
    // ratios are NULL (not 0/0 noise) when there are no words
    val ratios = TextOps.quality(docs).filter($"doc_id" === 2L)
      .select("avg_word_len", "stopword_ratio").head()
    assert(ratios.isNullAt(0) && ratios.isNullAt(1))
  }

  test("tokenCounts: empty and padded text count real tokens, not split artifacts") {
    val docs = Seq((1L, ""), (2L, " a b "), (3L, "a\tb\nc")).toDF("doc_id", "text")
    val got = TextOps.tokenCounts(docs)
      .select("doc_id", "ws_tokens").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 3L))
  }

  test("repetitionSignals: a NULL-id doc keeps its bigram stats (null-safe rollup join)") {
    // 10 tokens, 8 distinct (dup gate passes); top bigram "x y" = 2 of 9
    // bigrams → 2*5 > 9 fails the bigram gate → keep = 0. A null-unsafe
    // join loses the stats and vacuously PASSES the doc instead.
    val docs = Seq((Option.empty[Long], "x y x y a b c d e f"))
      .toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(docs)
      .select("keep", "n_bigrams", "top_bigram_count").head()
    assert(got.getLong(1) === 9L)
    assert(got.getLong(2) === 2L)
    assert(got.getLong(0) === 0L)
  }

  test("dedupCanonical: NULL-text docs pass through undeduped, not collapsed into one") {
    val docs = Seq(
      (1L, Some("same same")), (2L, Some("same same")), // true dups: keep 1
      (3L, None), (4L, None), (5L, None)                // unknown content: keep all
    ).toDF("doc_id", "text")
    val kept = Curation.dedupCanonical(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L, 5L))
  }

  test("dedupCanonical: NULL-text NULL-id rows spread by content hash, distinct contents survive") {
    // the key's third tier: no fingerprint, no doc_id — the content hash
    // over the remaining columns must keep distinct rows apart (and give
    // each its own window group, not one null-key reducer); only
    // byte-identical unidentified rows collapse, there being nothing to
    // tell copies apart by
    val docs = Seq(
      (Option(7L), Option("kept text"), "s1"),
      (Option.empty[Long], Option.empty[String], "s1"),
      (Option.empty[Long], Option.empty[String], "s2"), // distinct content: kept
      (Option.empty[Long], Option.empty[String], "s2")  // identical: collapses
    ).toDF("doc_id", "text", "source")
    val kept = Curation.dedupCanonical(docs)
      .select("source").as[String].collect().toList.sorted
    assert(kept === List("s1", "s1", "s2"))
  }

  test("dedupCanonical: duplicate doc_ids with NULL text and distinct content all survive") {
    // nothing in the operator requires id uniqueness: two null-text rows
    // sharing doc_id=5 but differing in content must BOTH pass through
    // (the key's content-hash component tells them apart); only the
    // byte-identical pair collapses
    val docs = Seq(
      (5L, Option.empty[String], "a"),
      (5L, Option.empty[String], "b"),
      (5L, Option.empty[String], "b")
    ).toDF("doc_id", "text", "source")
    val kept = Curation.dedupCanonical(docs)
      .select("source").as[String].collect().toList.sorted
    assert(kept === List("a", "b"))
  }

  test("dedupCanonical: null-text rows differing only in a MAP column both survive") {
    // maps are unhashable raw (entry order undefined) but canonicalize
    // as array_sort(map_entries(m)); silently EXCLUDING them from the
    // content hash — the pre-r14 behavior — was row loss: these two
    // distinct rows shared doc_id and every hashable cell, got the same
    // synthetic key, and one was dropped
    val docs = Seq(
      (5L, Option.empty[String], Map("k" -> "v1")),
      (5L, Option.empty[String], Map("k" -> "v2")), // differs ONLY in the map
      (5L, Option.empty[String], Map("k" -> "v2"))  // byte-identical: collapses
    ).toDF("doc_id", "text", "meta")
    val kept = Curation.dedupCanonical(docs)
      .select(map_values(col("meta")).getItem(0)).as[String].collect().toList.sorted
    assert(kept === List("v1", "v2"))
    // map equality is entry-SET equality: same entries, any order, still
    // one group (the canonical form is what enters the hash)
    val reordered = Seq(
      (6L, Option.empty[String], Map("a" -> "1", "b" -> "2")),
      (6L, Option.empty[String], Map("b" -> "2", "a" -> "1"))
    ).toDF("doc_id", "text", "meta")
    assert(Curation.dedupCanonical(reordered).count() === 1L)
  }

  test("dedupCanonical: null-text rows differing only in a NESTED map both survive") {
    // a map inside a struct canonicalizes recursively (key-sorted entry
    // arrays at every depth) rather than being silently excluded —
    // exclusion would merge these two distinct rows' keys and drop one
    // (the same row-loss class as the bare-map case)
    val docs = Seq(
      (5L, Option.empty[String], ("s", Map("k" -> "v1"))),
      (5L, Option.empty[String], ("s", Map("k" -> "v2"))),
      (5L, Option.empty[String], ("s", Map("k" -> "v2")))
    ).toDF("doc_id", "text", "meta")
    val kept = Curation.dedupCanonical(docs)
      .select(map_values(col("meta._2")).getItem(0)).as[String].collect().toList.sorted
    assert(kept === List("v1", "v2"))
  }

  test("dedupCanonical: NESTED map equality is entry-set equality, and null structs stay null") {
    // the r14 intermediate form hashed nested maps via to_json, which is
    // entry-ORDER-sensitive: these two logically-equal rows got distinct
    // keys and both survived (over-keeping). The recursive canonical form
    // collapses them — at every depth, including a map VALUE that is
    // itself a map
    val reordered = Seq(
      (6L, Option.empty[String], ("s", Map("a" -> Map("x" -> 1, "y" -> 2)))),
      (6L, Option.empty[String], ("s", Map("a" -> Map("y" -> 2, "x" -> 1))))
    ).toDF("doc_id", "text", "meta")
    assert(Curation.dedupCanonical(reordered).count() === 1L)
    // a NULL struct vs a struct of all NULLs are distinct values and
    // must both survive. Spark's hash expressions cannot tell them
    // apart (hash SKIPS nulls — both leave the seed untouched), which
    // is why the content key hashes a null-explicit JSON rendering
    // instead of the columns structurally; the canonical rebuild must
    // also keep the NULL struct NULL (a bare struct(fields...) of a
    // null row yields a struct of nulls and re-merges the pair)
    val nullStruct = Seq(
      (7L, Option.empty[String], Option.empty[(String, Map[String, String])]),
      (7L, Option.empty[String], Some((null: String, null: Map[String, String])))
    ).toDF("doc_id", "text", "meta")
    assert(Curation.dedupCanonical(nullStruct).count() === 2L)
  }

  test("dedupCanonical: null-skipping hash collisions cannot merge swapped-null rows") {
    // hash(a=NULL, b="x") == hash(a="x", b=NULL) under Spark's hash
    // functions (null inputs leave the seed unchanged) — a CERTAIN
    // collision, not a random one: keyed structurally these two
    // distinct null-text rows collapse to one synthetic key and one is
    // silently dropped. The null-explicit JSON rendering keys them apart.
    val docs = Seq(
      (9L, Option.empty[String], Option.empty[String], Option("x")),
      (9L, Option.empty[String], Option("x"), Option.empty[String])
    ).toDF("doc_id", "text", "a", "b")
    assert(Curation.dedupCanonical(docs).count() === 2L)
  }

  test("dedupCanonical: timestamps one microsecond apart key as distinct rows") {
    // to_json's DEFAULT timestampFormat renders milliseconds while Spark
    // stores micros — rows differing only below the millisecond rendered
    // (and keyed) identically, one silently dropped; the canonical
    // rendering pins six fraction digits, at top level and nested
    val ts1 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00.000001")
    val ts2 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00.000002")
    val docs = Seq(
      (10L, Option.empty[String], ts1, ("s", ts1)),
      (10L, Option.empty[String], ts2, ("s", ts1)),
      (10L, Option.empty[String], ts2, ("s", ts2))
    ).toDF("doc_id", "text", "ts", "meta")
    assert(Curation.dedupCanonical(docs).count() === 3L)
  }

  test("dedupCanonical: signed zeros key as EQUAL, matching Spark's SQL equality") {
    // Spark treats -0.0 and 0.0 as equal (comparisons, grouping, and the
    // structural hash all normalize the sign), but they RENDER as
    // different JSON text — an unnormalized render would key these two
    // SQL-equal rows apart and keep both (over-keying: a silent behavior
    // change from the structural hash the canonical key replaced). The
    // canonical form adds `+ 0.0` to every float/double, so only the
    // genuinely-distinct value survives separately — at top level, inside
    // a struct, and inside an array (the HOF-rebuild path)
    val docs = Seq(
      (11L, Option.empty[String], -0.0, (-0.0f, "s"), Seq(-0.0)),
      (11L, Option.empty[String], 0.0, (0.0f, "s"), Seq(0.0)),
      (11L, Option.empty[String], 1.0, (0.0f, "s"), Seq(0.0))
    ).toDF("doc_id", "text", "v", "meta", "arr")
    val kept = Curation.dedupCanonical(docs)
      .select("v").as[Double].collect().toList.sorted
    assert(kept === List(0.0, 1.0))
    // NaN keys as one value regardless of payload bits (Spark's
    // all-NaNs-equal semantics; every NaN renders as the same text)
    val nan1 = java.lang.Double.longBitsToDouble(0x7ff8000000000000L)
    val nan2 = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val nans = Seq(
      (12L, Option.empty[String], nan1),
      (12L, Option.empty[String], nan2)
    ).toDF("doc_id", "text", "v")
    assert(Curation.dedupCanonical(nans).count() === 1L)
  }

  test("redact: custom tokens with $ or digit runs are escaped or rejected, never corrupting") {
    val df = Seq(Tuple1("mail me x@y.com or call 1234567")).toDF("t")
    // $ in the replacement position is a Matcher group reference unescaped
    val got = Redaction.redact(df, "t", emailToken = "<$EMAIL$>", numberToken = "<$N$>")
      .select("redacted").as[String].head()
    assert(got === "mail me <$EMAIL$> or call <$N$>")
    val e = intercept[IllegalArgumentException] {
      Redaction.redact(df, "t", numberToken = "ID1234567")
    }
    assert(e.getMessage.contains("re-mask"))
  }

  test("Bm25: duplicate query terms are set semantics; null-id docs excluded consistently") {
    val docs = Seq(
      (Some(1L), "cat dog cat"), (Some(2L), "cat fish"),
      (None, "cat cat cat") // null id: excluded from scoring AND stats
    ).toDF("doc_id", "text")
    val a = Bm25.score(docs, Seq("cat", "dog")).collect().map(_.toSeq)
    val b = Bm25.score(docs, Seq("cat", "cat", "dog")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 2) // the null-id doc never surfaces
    val e = intercept[IllegalArgumentException] { Bm25.score(docs, Seq("cat", "")) }
    assert(e.getMessage.contains("empty"))
  }

  test("shingle registration follows the input frame's session, not the active one") {
    // temp-function registries are per-session: with ANOTHER session
    // active, an operator over this session's frames must still resolve
    val s2 = spark.newSession()
    org.apache.spark.sql.SparkSession.setActiveSession(s2)
    try {
      val train = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
      val eval = Seq(Tuple1("a b c d")).toDF("text")
      val flagged = Decontamination.decontaminate(train, eval)
        .filter(col("contaminated") === 1L).select("doc_id").as[Long].collect().toSet
      assert(flagged === Set(1L))
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }
}

class LayoutEdgeContractsSpec extends SparkSpec {
  import spark.implicits._

  test("weightedSample: tiny decimal weights cannot overflow the priority divide") {
    // h < 2^60, so any weight < 0.125 can push h div w past Long range —
    // ANSI kills the job, non-ANSI NULL priorities sort FIRST and fill
    // the sample with arbitrary rows; tiny-weight rows take the sentinel
    // worst priority instead and the heavy rows still win
    val docs = ((1L to 50L).map(i => (i, BigDecimal("0.001"))) ++
      (100L to 104L).map(i => (i, BigDecimal("1000.0")))).toDF("doc_id", "w")
    val got = Sampling.weightedSample(docs, "w", "doc_id", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(100L, 101L, 102L, 103L, 104L))
  }

  test("trainValTest: NULL keys get a NULL split, not a polluted test set") {
    val df = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    val got = Sampling.trainValTest(df, "doc_id").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        Option(r.getString(1))).toMap
    assert(got(None) === None)
    assert(got(Some(1L)).isDefined && got(Some(2L)).isDefined)
  }

  test("slidingWindow: NULL text yields one empty chunk with ZERO tokens, not chunkSize phantoms") {
    val docs = Seq((1L, Option.empty[String]), (2L, Some("a b c"))).toDF("doc_id", "text")
    val got = Chunking.slidingWindow(docs, chunkSize = 50, stride = 40)
      .select("doc_id", "chunk_idx", "n_tokens").as[(Long, Long, Long)].collect()
    assert(got.filter(_._1 == 1L).toSeq === Seq((1L, 0L, 0L)))
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 3L)))
  }

  test("concatChunk: empty and padded docs weigh their REAL tokens, keeping offsets honest") {
    val docs = Seq(
      (1L, "s", ""), (2L, "s", " foo bar"), (3L, "s", "x y z")
    ).toDF("doc_id", "source", "text")
    val got = Packing.concatChunk(docs, budget = 4L)
      .select("doc_id", "n_tokens", "start_off").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((0L, 0L)))
    assert(got(2L) === ((2L, 0L)))  // not 3: the leading-space artifact is no token
    assert(got(3L) === ((3L, 2L)))  // offset shifted by REAL tokens only
  }

  test("saltedJoin and topKPerGroup tolerate MAP-typed columns") {
    // xxhash64 rejects MapType at analysis — the salt hash must skip
    // unhashable columns instead of failing operators where the map
    // plays no role in keys, grouping, or ordering
    val large = Seq((1L, "a", Map("k" -> 1L)), (1L, "b", Map("k" -> 2L)),
      (2L, "c", Map.empty[String, Long])).toDF("k", "v", "meta")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    val joined = Skew.saltedJoin(large, small, Seq("k"), salt = 4)
    assert(joined.count() === 3L)
    val top = TopK.topKPerGroup(large, Seq("k"),
      Seq(col("v").asc), k = 1)
    assert(top.select("k", "v").as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "c")))
  }

  test("upsert refuses an existing-but-unreadable table instead of silently rebuilding") {
    // an empty directory at the path is NOT a missing table — treating
    // its AnalysisException as 'create' would discard all history the
    // moment a previous write failed halfway
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_guard")
      .resolve("t").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val updates = Seq((1L, "v")).toDF("id", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      graft.sources.ParquetWarehouse.upsert(updates, dir, Seq("id"))
    }
    // a genuinely missing path still takes the create branch
    val fresh = dir + "_fresh"
    graft.sources.ParquetWarehouse.upsert(updates, fresh, Seq("id"))
    assert(spark.read.parquet(fresh).count() === 1L)
  }
}
