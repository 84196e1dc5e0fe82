package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{KgramHashes, RollingHash}

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  test("kgram_hashes equals rolling_hash of each k-substring (the O(n·k) spelling)") {
    val k = 7
    val docs = Seq(
      (1L, "key agg row scan slow fast table value part hash"),
      (2L, "short"), // shorter than k → empty array
      (3L, "aaaaaaaaaaaaaaaaaaaaa"), // degenerate repeats
      (4L, "tab\tand\nnewline mixed in the middle somewhere here"))
      .toDF("doc_id", "text")
    val fast = docs
      .select(col("doc_id"), posexplode(KgramHashes.kgramHashes(spark, col("text"), k))
        .as(Seq("idx", "h")))
      .as[(Long, Int, Long)].collect().toSet
    val slow = docs
      .select(col("doc_id"), col("text"),
        // guard: Spark's sequence(1, 0) counts DOWN ([1, 0]), it is not empty
        posexplode(expr(s"case when length(text) >= $k " +
          s"then transform(sequence(1, length(text) - $k + 1), i -> substring(text, i, $k)) " +
          s"else cast(array() as array<string>) end")).as(Seq("idx", "sub")))
      .select(col("doc_id"), col("idx"),
        RollingHash.rollingHash(spark, col("sub")).as("h"))
      .as[(Long, Int, Long)].collect().toSet
    assert(fast === slow)
    assert(fast.count(_._1 == 2L) === 0, "doc shorter than k yields no windows")
  }

  test("substringDedup flags planted cross-doc and within-doc duplicate spans") {
    val boiler = "0 SHARED BOILERPLATE SPAN abcdefghijklmnopqrstuvwxyz 9"
    val docs = Seq(
      (1L, s"unique lead-in text one $boiler trailing tail one"),
      (2L, s"other document preamble $boiler different ending two"),
      (3L, s"$boiler mid filler words $boiler"), // repeats itself
      (4L, "entirely novel content with no repeated spans at all xyzw"))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, k = 20, modSelect = 4)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size === 4, "one row per document, even dup-free ones")
    // the shared span is long enough that some mod-4 fingerprint lands in it
    assert(out(2L)._4 > 0, "doc 2 must show cross-doc duplicate spans")
    assert(out(3L)._4 > 0, "doc 3 repeats itself; second occurrence is non-canonical")
    assert(out(4L)._4 === 0L, "novel doc has no duplicate fingerprints")
    // canonical-first rule: the earliest (doc, pos) occurrence is never a dup,
    // so the total dup count is strictly less than total fingerprints
    val (fpSum, dupSum) = (out.values.map(_._3).sum, out.values.map(_._4).sum)
    assert(dupSum < fpSum)
    out.values.foreach { r =>
      assert(r._5 === (if (r._3 > 0) r._4.toDouble / r._3 else 0.0))
    }
  }

  test("substringDedup with a NULL doc_id counts its rows (null-safe is_dup)") {
    // round-10 advice: `=!=` made is_dup NULL for a null doc_id, so such
    // rows were silently dropped by the dup filter AND the sum. The
    // null-safe spelling must classify them like any other doc: the null
    // doc shares a span with doc 1, and the min-struct canonical (nulls
    // order first) makes the NULL doc's occurrence the canonical one.
    val boiler = "0 SHARED BOILERPLATE SPAN abcdefghijklmnopqrstuvwxyz 9"
    val docs = Seq(
      (Some(1L), s"unique lead-in text one $boiler trailing tail one"),
      (Option.empty[Long], s"null-id document preamble $boiler other tail"))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, k = 20, modSelect = 4).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set(Some(1L), None), "the null-id doc must not vanish")
    val (nullFp, nullDup) = out(None)
    val (d1Fp, d1Dup) = out(Some(1L))
    assert(nullFp > 0 && d1Fp > 0, "both docs sample fingerprints from the shared span")
    // nulls sort first in the min-struct agg → the null doc owns the
    // canonical occurrences; doc 1's shared-span fingerprints are the dups
    assert(nullDup === 0L, "canonical (null-first) occurrences are not dups")
    assert(d1Dup > 0L, "doc 1's shared span must count as duplicate")
  }

  test("substringRemoveDups operates on a NULL-id doc instead of skipping it") {
    // the surgery's span→bytes joins are null-safe: an internally
    // repeating null-id doc owns non-canonical occurrences (same null
    // key, later pos), so its own text must get cut — a null-unsafe
    // join silently returned it untouched
    val boiler = "0 SHARED BOILERPLATE SPAN abcdefghijklmnopqrstuvwxyz 9"
    val docs = Seq(
      (Option.empty[Long], s"$boiler mid filler words $boiler"),
      (Some(1L), "entirely novel content with no repeated spans at all"))
      .toDF("doc_id", "text")
    val out = Dedup.substringRemoveDups(docs, k = 20, modSelect = 1).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r).toMap
    assert(out.keySet === Set(None, Some(1L)))
    val nullRow = out(None)
    assert(nullRow.getAs[Long]("n_cut_spans") > 0L,
      "null-id doc's internal repeat must produce cut spans")
    assert(nullRow.getAs[Long]("removed_chars") > 0L)
    assert(nullRow.getAs[Long]("kept_chars") <
      nullRow.getAs[Long]("removed_chars") + nullRow.getAs[Long]("kept_chars"))
    val clean = out(Some(1L))
    assert(clean.getAs[Long]("n_cut_spans") === 0L)
  }

  test("substringRemoveDups cuts non-canonical spans and preserves canonical text") {
    val boiler = "0 SHARED BOILERPLATE SPAN abcdefghijklmnopqrstuvwxyz 9"
    val docs = Seq(
      (1L, s"unique lead-in text one $boiler trailing tail one"),
      (2L, s"other document preamble $boiler different ending two"),
      (3L, "entirely novel content with no repeated spans at all xyzw"))
      .toDF("doc_id", "text")
    val texts = docs.as[(Long, String)].collect().toMap
    val out = Dedup.substringRemoveDups(docs, k = 20, modSelect = 4)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size === 3)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1 holds every canonical occurrence → untouched, hash = original
    assert(out(1L)._2 === 0L)
    assert(out(1L)._5 === md5hex(texts(1L)))
    // doc 3 has no duplicates at all
    assert(out(3L)._2 === 0L && out(3L)._4 === texts(3L).length.toLong)
    // doc 2 lost its copy of the boilerplate: spans cut, accounting adds up
    val (_, spans2, removed2, kept2, md52) = out(2L)
    assert(spans2 > 0 && removed2 > 0)
    assert(kept2 === texts(2L).length.toLong - removed2)
    assert(md52 !== md5hex(texts(2L)), "cleaned text must differ from the original")
    // the cleaned text is the original minus sampled duplicate windows, so
    // the doc-unique prefix must survive the cut: rebuild it by replaying
    // the operator's own segments is overkill here — instead check the cut
    // stayed inside the shared region (the unique preamble is untouched)
    assert(kept2 >= "other document preamble ".length.toLong)
  }

  test("substringRemoveDups cuts at BYTE offsets: multi-byte prefixes don't shift the cut") {
    // doc 1 is exactly the boilerplate (canonical); doc 2 prepends a
    // multi-byte prefix, so every boiler window in doc 2 is a duplicate
    // and with modSelect=1 the merged cut covers the boiler bytes exactly
    val boiler = "0 SHARED BOILERPLATE SPAN abcdefghijklmnopqrstuvwxyz 9"
    val prefix = "café déjà-vu prefix — " // 22 chars, 26 UTF-8 bytes
    val docs = Seq((1L, boiler), (2L, s"$prefix$boiler")).toDF("doc_id", "text")
    val out = Dedup.substringRemoveDups(docs, k = 20, modSelect = 1)
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    val prefixBytes = prefix.getBytes("UTF-8")
    val boilerBytes = boiler.getBytes("UTF-8")
    // doc 1 holds the canonical copies → untouched
    assert(out(1L)._2 === 0L)
    assert(out(1L)._5 === md5hex(boilerBytes))
    // doc 2: the whole boiler region (and ONLY it) is cut, in byte space
    val (_, spans2, removed2, kept2, md52) = out(2L)
    assert(spans2 === 1L)
    assert(removed2 === boilerBytes.length.toLong)
    assert(kept2 === prefixBytes.length.toLong)
    assert(md52 === md5hex(prefixBytes),
      "cleaned doc 2 must be exactly the multi-byte prefix, byte-for-byte")
  }

  test("cut spans covering an ENTIRE multi-byte doc stitch to the empty binary") {
    // all-distinct letters → no within-doc duplicate window can perturb the
    // test; multi-byte throughout so the empty-stitch path runs in byte space
    val text = "àbçdéfghîjklmnöpqrstüvwxyz"
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = Dedup.substringRemoveDups(docs, k = 4, modSelect = 1)
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    val bytes = text.getBytes("UTF-8")
    // doc 1 is canonical for every window → untouched
    assert(out(1L)._2 === 0L && out(1L)._3 === 0L)
    assert(out(1L)._4 === bytes.length.toLong)
    assert(out(1L)._5 === md5hex(bytes))
    // doc 2: every window is a dup → one merged span covers ALL bytes →
    // the clean text is the EMPTY binary (not null, not the original)
    val (_, spans2, removed2, kept2, md52) = out(2L)
    assert(spans2 === 1L)
    assert(removed2 === bytes.length.toLong)
    assert(kept2 === 0L)
    assert(md52 === md5hex(Array.emptyByteArray),
      "full-cover spans must hash the empty binary, not null/original")
  }

  test("degenerate hot-hash corpus: one fingerprint owning ~all windows stays exact") {
    // 200 copies of a single-character run: with modSelect=1 and k=4 every
    // window of every doc hashes to the SAME value — the exact shape the
    // min-struct canonical was built for (one hot hash would previously
    // sort inside a single window partition). Canonical is (doc 1, pos 1);
    // every other occurrence corpus-wide is a duplicate.
    val run = "a" * 100 // 97 windows per doc at k=4
    val docs = (1L to 200L).map(i => (i, run)).toDF("doc_id", "text")
    val out = Dedup.substringDedup(docs, k = 4, modSelect = 1)
      .select(col("doc_id"), col("n_fp"), col("n_dup"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size === 200)
    assert(out.values.forall(_._1 === 97L), "every doc samples all 97 windows")
    assert(out(1L)._2 === 96L, "doc 1 keeps only its first window as canonical")
    (2L to 200L).foreach(d => assert(out(d)._2 === 97L, s"doc $d must be all-dup"))
  }

  test("substring dedup plans NO Window operator (skew-safe min-struct shape)") {
    // the r10 rewrite replaced row_number over Window.partitionBy(h) with
    // a partial-aggregable min-struct + equi-join; a Window reappearing
    // here would silently reintroduce the one-task hot-hash sort
    val docs = Seq((1L, "abcdefghij"), (2L, "abcdefghij")).toDF("doc_id", "text")
    val plan = Dedup.substringDedup(docs, k = 4, modSelect = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"hot-hash window must not return:\n$plan")
    val rplan = Dedup.substringRemoveDups(docs, k = 4, modSelect = 1)
      .queryExecution.executedPlan.toString
    // the REMOVAL pipeline keeps its per-doc interval-merge windows (tiny,
    // doc_id-keyed) but must not hash-partition a window by `h`
    assert(!rplan.contains("windowspecdefinition(h"),
      s"per-hash window must not return:\n$rplan")
  }

  test("documents corpus is ASCII, so the oracle's ord(substr) = UTF-8 byte") {
    val nonAscii = Tables.documents(spark, TinySf)
      .filter(not(col("text").rlike("^[\\x00-\\x7F]*$")))
      .count()
    assert(nonAscii === 0L)
  }
}
