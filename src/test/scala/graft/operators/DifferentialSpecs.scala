package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Randomized differentials: each operator vs an obviously-correct scala
  * reference on seeded random inputs — the cross-check for operators whose
  * main gate is the DuckDB oracle on fixed testdata. */
class QuantilesDifferentialSpec extends SparkSpec {
  import spark.implicits._

  test("discrete quantiles equal the scala nearest-rank reference on random groups") {
    val rnd = new Random(42)
    val rows = for {
      g <- 'a' to 'e'
      i <- 1 to (1 + rnd.nextInt(40))
    } yield (g.toString, rnd.nextInt(1000).toLong, (g - 'a') * 1000L + i)
    val df = rows.toDF("g", "v", "id")
    val got = Quantiles.discrete(df, "g", "v", "id")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3)).map(_._2)
      def nr(p: Double) = sorted(math.ceil(p * sorted.length).toInt - 1)
      val (_, p25, p50, p75, p90, n) = got(g)
      assert((p25, p50, p75, p90, n) ===
        ((nr(0.25), nr(0.50), nr(0.75), nr(0.90), sorted.length.toLong)), s"group $g")
    }
  }
}

class ChunkingDifferentialSpec extends SparkSpec {
  import spark.implicits._

  test("sliding windows equal the scala reference on random word counts") {
    val rnd = new Random(7)
    val docs = (1L to 50L).map { id =>
      val words = (1 to (1 + rnd.nextInt(60))).map(i => s"w${id}_$i")
      (id, words.mkString(" "))
    }
    val got = Chunking.slidingWindow(docs.toDF("doc_id", "text"), chunkSize = 12, stride = 8)
      .as[(Long, Long, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    docs.foreach { case (id, text) =>
      val w = text.split(" ", -1)
      val expect = Iterator.from(0, 8).takeWhile(_ < w.length).zipWithIndex.map {
        case (start, idx) =>
          val slice = w.slice(start, start + 12)
          (id, idx.toLong, slice.mkString(" "), slice.length.toLong, start.toLong)
      }.toSeq
      assert(got(id) === expect, s"doc $id")
    }
  }
}
