package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** Differential tests for the scale-shaped join rewrites: the union-and-carry
  * as-of join and the bucket-tiled range join must agree row-for-row with the
  * naive theta-join semantics they rewrite.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join = naive max-prior theta join (randomized)") {
    val rng = new Random(7)
    val left = (1 to 300).map(i =>
      (i.toLong, rng.nextInt(10).toLong, rng.nextInt(1000).toLong))
      .toDF("lid", "k", "t")
    val right = (1 to 400).map(i =>
      (rng.nextInt(10).toLong, rng.nextInt(1000).toLong, i.toLong * 10))
      .toDF("k", "t", "v")

    val got = AsofJoin.backward(left, right, key = "k", time = "t", payload = Seq("v"))
      .select("lid", "asof_t", "asof_v", "n_prior")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toMap3

    val naive = left.as("l")
      .join(right.as("r"), $"l.k" === $"r.k" && $"r.t" <= $"l.t", "left")
      .groupBy($"lid")
      .agg(
        max(struct($"r.t", $"r.v")).as("m"),
        count($"r.t").as("n"))
      .select($"lid", $"m.t", $"m.v", $"n")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toMap3

    assert(got.size === 300)
    assert(got === naive)
  }

  test("as-of inclusivity: equal timestamps match; ties pick the largest payload") {
    val left = Seq((1L, 1L, 100L)).toDF("lid", "k", "t")
    val right = Seq((1L, 100L, 5L), (1L, 100L, 9L), (1L, 101L, 7L))
      .toDF("k", "t", "v")
    val row = AsofJoin.backward(left, right, "k", "t", Seq("v"))
      .select("asof_t", "asof_v", "n_prior")
      .as[(Long, Long, Long)].collect().head
    assert(row === ((100L, 9L, 2L))) // t=101 excluded; tie at t=100 → max v
  }

  test("forward as-of join = naive min-after theta join (randomized)") {
    val rng = new Random(11)
    val left = (1 to 300).map(i =>
      (i.toLong, rng.nextInt(10).toLong, rng.nextInt(1000).toLong))
      .toDF("lid", "k", "t")
    val right = (1 to 400).map(i =>
      (rng.nextInt(10).toLong, rng.nextInt(1000).toLong, i.toLong * 10))
      .toDF("k", "t", "v")

    val got = AsofJoin.forward(left, right, key = "k", time = "t", payload = Seq("v"))
      .select("lid", "asof_t", "asof_v", "n_next")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toMap3

    val naive = left.as("l")
      .join(right.as("r"), $"l.k" === $"r.k" && $"r.t" >= $"l.t", "left")
      .groupBy($"lid")
      .agg(
        min(struct($"r.t", $"r.v")).as("m"),
        count($"r.t").as("n"))
      .select($"lid", $"m.t", $"m.v", $"n")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toMap3

    assert(got.size === 300)
    assert(got === naive)
  }

  test("tolerance as-of join = naive bounded theta join (randomized)") {
    val rng = new Random(13)
    val tol = 50L
    val left = (1 to 300).map(i =>
      (i.toLong, rng.nextInt(10).toLong, rng.nextInt(1000).toLong))
      .toDF("lid", "k", "us")
      .select($"lid", $"k", timestamp_micros($"us").as("t"))
    val right = (1 to 400).map(i =>
      (rng.nextInt(10).toLong, rng.nextInt(1000).toLong, i.toLong * 10))
      .toDF("k", "us", "v")
      .select($"k", timestamp_micros($"us").as("t"), $"v")

    val got = AsofJoin.backwardWithin(
      left, right, key = "k", time = "t", payload = Seq("v"), toleranceUs = tol)
      .select($"lid", unix_micros($"asof_t"), $"asof_v", $"n_prior")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toMap3

    val naive = left.select($"lid", $"k", unix_micros($"t").as("lus")).as("l")
      .join(
        right.select($"k".as("rk"), unix_micros($"t").as("rus"), $"v"),
        $"l.k" === $"rk" && $"rus" <= $"lus" && $"rus" >= $"lus" - tol, "left")
      .groupBy($"lid")
      .agg(
        max(struct($"rus", $"v")).as("m"),
        count($"rus").as("n"))
      .select($"lid", $"m.rus", $"m.v", $"n")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toMap3

    assert(got.size === 300)
    assert(got === naive)
  }

  test("tolerance boundaries: exactly-at-tolerance matches, one-past is stale") {
    val left = Seq((1L, 1L, 200L), (2L, 1L, 300L)).toDF("lid", "k", "us")
      .select($"lid", $"k", timestamp_micros($"us").as("t"))
    // lid 1: click at 150 is 50 us old → inside tol=50 (inclusive);
    // lid 2: same click is 150 us old → stale, carry nulled, count 0
    val right = Seq((1L, 150L, 7L)).toDF("k", "us", "v")
      .select($"k", timestamp_micros($"us").as("t"), $"v")
    val rows = AsofJoin.backwardWithin(left, right, "k", "t", Seq("v"), toleranceUs = 50L)
      .select($"lid", unix_micros($"asof_t"), $"asof_v", $"n_prior")
      .as[(Long, Option[Long], Option[Long], Long)].collect().toMap3
    assert(rows(1L) === ((Some(150L), Some(7L), 1L)))
    assert(rows(2L) === ((None, None, 0L)))
  }

  test("forward inclusivity: equal timestamps match; ties pick the smallest payload") {
    val left = Seq((1L, 1L, 100L)).toDF("lid", "k", "t")
    val right = Seq((1L, 100L, 5L), (1L, 100L, 9L), (1L, 99L, 7L))
      .toDF("k", "t", "v")
    val row = AsofJoin.forward(left, right, "k", "t", Seq("v"))
      .select("asof_t", "asof_v", "n_next")
      .as[(Long, Long, Long)].collect().head
    assert(row === ((100L, 5L, 2L))) // t=99 excluded; tie at t=100 → min v
  }

  implicit class Map3[A, B, C, D](rows: Array[(A, B, C, D)]) {
    def toMap3: Map[A, (B, C, D)] =
      rows.map { case (a, b, c, d) => a -> ((b, c, d)) }.toMap
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val W = 100L // µs window for the synthetic fixtures

  test("bucketized range join = naive theta join (randomized)") {
    val rng = new Random(11)
    val anchors = (1 to 200).map(i =>
      (i.toLong, rng.nextInt(8).toLong, rng.nextInt(2000).toLong))
      .toDF("aid", "k", "us")
      .select($"aid", $"k", timestamp_micros($"us").as("ts"))
    val followers = (1 to 600).map(_ =>
      (rng.nextInt(8).toLong, rng.nextInt(2000).toLong, rng.nextInt(100) / 4.0))
      .toDF("k", "us", "value")
      .select($"k", timestamp_micros($"us").as("ts"), $"value")

    val got = RangeJoin.followWithin(
      anchors, followers, key = "k", anchorId = "aid",
      time = "ts", valueCol = "value", windowUs = W)
      .select("anchor_id", "n_follow", "sum_value")
      .as[(Long, Long, Double)].collect()
      .map { case (a, n, sv) => a -> ((n, sv)) }.toMap

    val naive = anchors.select($"aid", $"k", unix_micros($"ts").as("a_us")).as("a")
      .join(followers.select($"k".as("fk"), unix_micros($"ts").as("f_us"), $"value"),
        $"a.k" === $"fk" && $"f_us" > $"a_us" && $"f_us" <= $"a_us" + W, "left")
      .groupBy($"aid")
      .agg(
        count($"f_us").as("n"),
        coalesce(
          sum($"value".cast(DecimalType(28, 12)))
            .cast(DecimalType(28, 6)).cast("double"),
          lit(0.0)).as("s"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, n, sv) => a -> ((n, sv)) }.toMap

    assert(got.size === 200)
    assert(got === naive)
  }

  test("window boundaries: strictly-after start, inclusive end, exactly-one bucket match") {
    // anchor at t=100, W=100: follower at 100 excluded, 101 and 200 included
    // (200 sits in the NEXT tile — covered by the anchor's second copy), 201 excluded
    val anchors = Seq((1L, 1L, 100L)).toDF("aid", "k", "us")
      .select($"aid", $"k", timestamp_micros($"us").as("ts"))
    val followers = Seq((1L, 100L, 1.0), (1L, 101L, 2.0), (1L, 200L, 4.0), (1L, 201L, 8.0))
      .toDF("k", "us", "value")
      .select($"k", timestamp_micros($"us").as("ts"), $"value")
    val row = RangeJoin.followWithin(anchors, followers, "k", "aid", "ts", "value", W)
      .select("n_follow", "sum_value").as[(Long, Double)].collect().head
    assert(row === ((2L, 6.0)))
  }

  test("anchors with no followers survive with zero counts") {
    val anchors = Seq((1L, 1L, 100L), (2L, 2L, 500L)).toDF("aid", "k", "us")
      .select($"aid", $"k", timestamp_micros($"us").as("ts"))
    val followers = Seq((1L, 150L, 3.0)).toDF("k", "us", "value")
      .select($"k", timestamp_micros($"us").as("ts"), $"value")
    val rows = RangeJoin.followWithin(anchors, followers, "k", "aid", "ts", "value", W)
      .select("anchor_id", "n_follow", "sum_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(rows === Set((1L, 1L, 3.0), (2L, 0L, 0.0)))
  }
}

class VocabularySpec extends SparkSpec {
  import spark.implicits._

  test("vocabulary: tf counts occurrences, df counts distinct docs, top-N cut is by df") {
    val docs = Seq(
      (1L, "a b b c"),
      (2L, "a  c"), // double space → empty token, must be dropped
      (3L, "a d")).toDF("doc_id", "text")
    val rows = TextOps.vocabulary(docs, topN = 3)
      .as[(String, Long, Long)].collect().toList
    // df: a=3, c=2, b=1(tf2), d=1(tf1) → top3 = a, c, b
    assert(rows === List(("a", 3L, 3L), ("c", 2L, 2L), ("b", 2L, 1L)))
  }
}
