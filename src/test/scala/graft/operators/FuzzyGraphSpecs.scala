package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential tests for the FastSS fuzzy join and the integer PageRank:
  * the blocking/iterative rewrites must reproduce their naive specs
  * exactly — same pairs, same integer rank values.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletion-neighborhood blocking = naive cross-join levenshtein (randomized)") {
    val rng = new Random(19)
    val alpha = "abc"
    // short strings over a 3-letter alphabet: dense collisions, all edit
    // kinds (equal, substitute, insert, delete) and length-0/1 edges
    val rows = (1L to 200L).map { i =>
      val len = rng.nextInt(7)
      (i, (1 to len).map(_ => alpha(rng.nextInt(alpha.length))).mkString)
    }
    val df = rows.toDF("id", "s")

    val got = FuzzyJoin.selfMatch1(df, "id", "s")
      .select("a_key", "b_key", "dist")
      .as[(Long, Long, Long)].collect().toSet

    val naive = df.as("a").crossJoin(df.as("b"))
      .filter($"a.id" < $"b.id" && levenshtein($"a.s", $"b.s") <= 1)
      .select($"a.id", $"b.id", levenshtein($"a.s", $"b.s").cast("long"))
      .as[(Long, Long, Long)].collect().toSet

    assert(got === naive)
    assert(naive.nonEmpty, "fixture should produce matches")
  }

  test("shared-variant distance-2 pairs are rejected by the verify step") {
    // "ab" and "ba" share deletion variants "a" and "b" but are distance 2
    val df = Seq((1L, "ab"), (2L, "ba"), (3L, "ab")).toDF("id", "s")
    val got = FuzzyJoin.selfMatch1(df, "id", "s")
      .select("a_key", "b_key", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 0L))) // only the exact duplicate survives
  }
}

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala replica of the exact integer iteration. */
  private def reference(
      edges: Seq[(String, String)], iterations: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toLong
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (15L * PageRank.Scale) / (100L * n)
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iterations) {
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / out(u) }.sum).toMap
      r = nodes.map(v => v -> (base + (85L * inflow.getOrElse(v, 0L)) / 100L)).toMap
    }
    r
  }

  test("integer damped flow = plain-Scala replica on a random graph, 0..4 iterations") {
    val rng = new Random(23)
    val edges = (1 to 120).map(_ => (s"n${rng.nextInt(15)}", s"n${rng.nextInt(15)}"))
    val df = edges.toDF("src", "dst")
    for (iters <- Seq(0, 1, 4)) {
      val got = PageRank.run(df, "src", "dst", iterations = iters)
        .as[(String, Long)].collect().toMap
      assert(got === reference(edges, iters), s"iterations = $iters")
    }
  }

  test("hand graph: sinks keep base rank, hubs accumulate, mass never grows") {
    // a -> b, a -> c, b -> c ; c is a sink (dangling mass dropped)
    val df = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val r = PageRank.run(df, "src", "dst", iterations = 2)
      .as[(String, Long)].collect().toMap
    val S = PageRank.Scale
    val base = (15L * S) / (100L * 3)
    // iter1: a = base; b = base + 85%*(S/3 / 2); c = base + 85%*(S/3/2 + S/3)
    val b1 = base + (85L * (S / 3 / 2)) / 100
    val c1 = base + (85L * (S / 3 / 2 + S / 3)) / 100
    assert(r("a") === base) // nothing points at a after round 1
    assert(r("b") === base + (85L * (base / 2)) / 100)
    assert(r("c") === base + (85L * (base / 2 + b1)) / 100)
    assert(r.values.sum <= S, "dropped dangling mass can only shrink the total")
    assert(c1 > b1, "sanity: the hub ranks above the middle node after round 1")
  }
}
