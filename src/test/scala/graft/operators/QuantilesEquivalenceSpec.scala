package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins `percentileRankBucketed` ≡ `percentileRank` (round-10 advice #5):
  * the bucketed plan is the low-group-cardinality scale path, and the
  * switch is only sound if both spell the IDENTICAL output — ranks, n,
  * and the tails especially (pct_rank exactly 0.0 and 1.0 at the group
  * min/max, where an off-by-one in the offset arithmetic would land). */
class QuantilesEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def collectNorm(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Option[Double], Long, Long, Double)] =
    df.select(col("g"), col("id"), col("v"), col("rank"), col("n_rows"), col("pct_rank"))
      .collect().map(r => (
        r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet

  private def corpus = {
    // ties (same v, different id), a null value, a constant group, a
    // singleton group, and a heavy-skewed group (most mass in one bucket)
    val rows =
      (1L to 500L).map(i => ("skew", i, Some(if (i <= 450) 1.0 + i * 1e-9 else i.toDouble))) ++
      (1L to 100L).map(i => ("ties", i, Some((i % 7).toDouble))) ++
      (1L to 50L).map(i => ("const", i, Some(42.0))) ++
      Seq(("one", 1L, Some(3.0)), ("nulls", 1L, None), ("nulls", 2L, Some(5.0)),
          ("nulls", 3L, None), ("neg", 1L, Some(-10.0)), ("neg", 2L, Some(10.0)))
    // plus a NULL group key — the window path ranks it as its own group,
    // so the bucketed path's joins must be null-safe to match
    rows.toDF("g", "id", "v").unionByName(
      Seq((Option.empty[String], 1L, Some(2.0)), (Option.empty[String], 2L, Some(1.0)))
        .toDF("g", "id", "v"))
  }

  test("bucketed percentile rank ≡ window percentile rank (ties/nulls/const/singleton/skew)") {
    val base = corpus
    val window = Quantiles.percentileRank(base, "g", "v", "id")
    for (buckets <- Seq(1, 4, 256)) {
      val bucketed = Quantiles.percentileRankBucketed(base, "g", "v", "id", buckets)
      // names + types must match exactly; nullability legitimately differs
      // (the bucketed path's rank flows through a join)
      assert(bucketed.schema.map(f => (f.name, f.dataType)) ===
        window.schema.map(f => (f.name, f.dataType)), s"schema drift at buckets=$buckets")
      assert(collectNorm(bucketed) === collectNorm(window), s"mismatch at buckets=$buckets")
    }
  }

  test("bucketed tails: pct_rank is exactly 0.0 at the min and 1.0 at the max") {
    val out = Quantiles.percentileRankBucketed(corpus, "g", "v", "id", 16)
    val skew = out.filter(col("g") === "skew")
    assert(skew.agg(min(col("pct_rank"))).head().getDouble(0) === 0.0)
    assert(skew.agg(max(col("pct_rank"))).head().getDouble(0) === 1.0)
    // singleton group pins to 0.0 (the n=1 guard, not 0/0)
    assert(out.filter(col("g") === "one").head().getAs[Double]("pct_rank") === 0.0)
  }

  test("randomized differential: bucketed ≡ window on seeded random corpora") {
    // stresses the bucket-index float arithmetic (uniform cuts, clamping,
    // values landing exactly on bucket edges) beyond the hand corpus:
    // heavy duplicate mass, negative ranges, tiny ranges near double
    // precision, and varying bucket counts
    for (seed <- Seq(7L, 42L, 2026L)) {
      val rng = new scala.util.Random(seed)
      val rows = (1L to 2000L).map { i =>
        val g = s"g${rng.nextInt(4)}"
        val v = rng.nextInt(6) match {
          case 0 => Some(rng.nextInt(10).toDouble)         // heavy ties
          case 1 => Some(-100.0 + rng.nextDouble() * 200)  // spans zero
          case 2 => Some(1.0 + rng.nextDouble() * 1e-12)   // sub-ulp-ish range
          case 3 => Some(rng.nextDouble() * 1e15)          // huge range
          case 4 => None                                   // nulls
          case _ => Some(rng.nextGaussian())
        }
        (g, i, v)
      }
      val df = rows.toDF("g", "id", "v")
      val expected = collectNorm(Quantiles.percentileRank(df, "g", "v", "id"))
      for (buckets <- Seq(3, 17, 256))
        assert(collectNorm(Quantiles.percentileRankBucketed(df, "g", "v", "id", buckets))
          === expected, s"seed=$seed buckets=$buckets")
    }
  }

  test("NaN and ±Infinity values: bucketed ≡ window (NaN must sort last)") {
    // Spark orders NaN greater than every double and max() returns NaN
    // when the group holds one; NaN is now excluded from the min/max stats
    // (a NaN width collapses the group into one bucket — order-correct by
    // accident, but the serial sort this path exists to avoid) and NaN
    // rows get their own top bucket. ±Inf degrades the uniform cut (width
    // = Inf → one populated bucket) but must stay order-correct.
    val rows = Seq(
      ("f", 1L, Some(Double.NaN)), ("f", 2L, Some(1.0)), ("f", 3L, Some(2.0)),
      ("f", 4L, Some(Double.NaN)), ("f", 5L, Some(-1.0)),
      ("inf", 1L, Some(Double.NegativeInfinity)), ("inf", 2L, Some(0.0)),
      ("inf", 3L, Some(Double.PositiveInfinity)), ("inf", 4L, Some(5.0)),
      ("mix", 1L, Some(Double.NaN)), ("mix", 2L, None),
      ("mix", 3L, Some(Double.PositiveInfinity)), ("mix", 4L, Some(3.0)),
      ("allnan", 1L, Some(Double.NaN)), ("allnan", 2L, Some(Double.NaN))
    ).toDF("g", "id", "v")
    // NaN-safe normalization: Scala's Double == is false for NaN == NaN,
    // so compare raw bit patterns instead of values
    def norm(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long, Long, Long, Double)] =
      df.select(col("g"), col("id"), col("v"), col("rank"), col("n_rows"), col("pct_rank"))
        .collect().map(r => (
          r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else java.lang.Double.doubleToLongBits(r.getDouble(2)),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val expected = norm(Quantiles.percentileRank(rows, "g", "v", "id"))
    for (buckets <- Seq(1, 4, 256))
      assert(norm(Quantiles.percentileRankBucketed(rows, "g", "v", "id", buckets))
        === expected, s"mismatch at buckets=$buckets")
  }

  test("subnormal value ranges: bucketed ≡ window when the bucket width underflows to 0.0") {
    // mn=0.0, mx=4.9e-324 (minimum positive subnormal): width (mx-mn)/256
    // rounds to 0.0, so the quotient is +Inf/NaN. floor(+Inf) saturates
    // to Long.MaxValue — an int cast would WRAP it to a negative bucket
    // and invert the rank order; the long-space clamp must degrade to the
    // top bucket instead (one bucket, order-correct)
    val rows = Seq(
      ("sub", 1L, Some(0.0)), ("sub", 2L, Some(Double.MinPositiveValue)),
      ("sub", 3L, Some(0.0)), ("sub", 4L, Some(Double.MinPositiveValue)),
      // three DISTINCT subnormals (multiples of 4.9e-324): the width
      // underflows but the values still must come back in order
      ("tiny", 1L, Some(java.lang.Double.longBitsToDouble(1L))),
      ("tiny", 2L, Some(java.lang.Double.longBitsToDouble(3L))),
      ("tiny", 3L, Some(java.lang.Double.longBitsToDouble(5L)))
    ).toDF("g", "id", "v")
    val expected = collectNorm(Quantiles.percentileRank(rows, "g", "v", "id"))
    for (buckets <- Seq(4, 256))
      assert(collectNorm(Quantiles.percentileRankBucketed(rows, "g", "v", "id", buckets))
        === expected, s"mismatch at buckets=$buckets")
  }

  test("non-numeric value columns: bucketed refuses, auto routes to the window plan") {
    // the bucket index lives in double space — a string column sorts
    // "10" < "9" while its cast buckets 9.0 before 10.0, so the bucketed
    // plan cannot spell the window plan's order for it
    val strings = Seq(("g", 1L, "9"), ("g", 2L, "10"), ("g", 3L, "banana"))
      .toDF("g", "id", "v")
    val e = intercept[IllegalArgumentException] {
      Quantiles.percentileRankBucketed(strings, "g", "v", "id")
    }
    assert(e.getMessage.contains("numeric"))
    // auto with hints that WOULD pick the bucketed plan for a numeric
    // column must fall back to the (always-correct) window plan here
    val auto = Quantiles.percentileRankAuto(strings, "g", "v", "id",
      groupCountHint = Some(1L),
      rowCountHint = Some(Quantiles.RowsPerGroupThreshold * 2))
    assert(!auto.queryExecution.executedPlan.toString.contains("__b"))
    // lexicographic order: "10" < "9" < "banana"
    assert(auto.orderBy(col("rank")).collect().map(_.getAs[String]("v")).toSeq
      === Seq("10", "9", "banana"))
  }

  test("order-compatible non-numeric types: timestamp and boolean take the bucketed plan correctly") {
    // timestamps cast to fractional epoch seconds and booleans to 0/1 —
    // both strictly monotone in the column's native order, so the bucketed
    // plan must both ACCEPT them and spell the window order exactly
    // results are compared with v cast to double AFTER ranking (the rank
    // columns are what's under test; collectNorm expects a double v)
    def norm(df: org.apache.spark.sql.DataFrame) =
      collectNorm(df.withColumn("v", col("v").cast("double")))
    val ts = Seq(
      ("a", 1L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00.000001")),
      ("a", 2L, java.sql.Timestamp.valueOf("2024-01-01 12:34:56.789012")),
      ("a", 3L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00")),
      ("b", 4L, java.sql.Timestamp.valueOf("1969-12-31 23:59:59")) // pre-epoch: negative seconds
    ).toDF("g", "id", "v")
    assert(norm(Quantiles.percentileRankBucketed(ts, "g", "v", "id", 4))
      === norm(Quantiles.percentileRank(ts, "g", "v", "id")))
    val bool = Seq(("a", 1L, true), ("a", 2L, false), ("a", 3L, true), ("a", 4L, false))
      .toDF("g", "id", "v")
    assert(norm(Quantiles.percentileRankBucketed(bool, "g", "v", "id", 4))
      === norm(Quantiles.percentileRank(bool, "g", "v", "id")))
    // TimestampNTZ does NOT qualify — Spark refuses ntz→double outright
    // (DATATYPE_MISMATCH), so bucketed must refuse it up front and auto
    // must route it to the window plan instead of failing at analysis
    val ntz = Seq(
      ("a", 1L, java.time.LocalDateTime.parse("2024-01-03T00:00:00.000001")),
      ("a", 2L, java.time.LocalDateTime.parse("2024-01-01T12:34:56.789012")),
      ("a", 3L, java.time.LocalDateTime.parse("2024-01-03T00:00:00"))
    ).toDF("g", "id", "v")
    assert(ntz.schema("v").dataType === org.apache.spark.sql.types.TimestampNTZType)
    intercept[IllegalArgumentException] {
      Quantiles.percentileRankBucketed(ntz, "g", "v", "id", 4)
    }
    assert(Quantiles.percentileRankAuto(ntz, "g", "v", "id",
      groupCountHint = Some(1L), rowCountHint = Some(Quantiles.RowsPerGroupThreshold * 2))
      .orderBy(col("rank")).collect().map(_.getAs[Long]("id")).toSeq === Seq(2L, 3L, 1L))
  }

  test("case-mismatched value column resolves like the analyzer (case-insensitive), not a crash") {
    // spark.sql.caseSensitive defaults to false, so col("V") resolves a
    // field named "v" — the schema-driven type routing must match that
    // instead of throwing on the exact-name lookup
    val rows = Seq(("g", 1L, 3.0), ("g", 2L, 1.0), ("g", 3L, 2.0)).toDF("g", "id", "v")
    val expected = collectNorm(Quantiles.percentileRank(rows, "g", "v", "id"))
    assert(collectNorm(Quantiles.percentileRankBucketed(rows, "g", "V", "id", 4)) === expected)
    assert(collectNorm(Quantiles.percentileRankAuto(rows, "g", "V", "id",
      groupCountHint = Some(1L), rowCountHint = Some(Quantiles.RowsPerGroupThreshold * 2))) === expected)
  }

  test("auto switch: few+heavy groups take the bucketed plan, others the window plan") {
    val base = corpus
    val heavy = Quantiles.RowsPerGroupThreshold * 6
    val low = Quantiles.percentileRankAuto(base, "g", "v", "id",
      groupCountHint = Some(6L), rowCountHint = Some(heavy))
    val manyGroups = Quantiles.percentileRankAuto(base, "g", "v", "id",
      groupCountHint = Some(Quantiles.LowCardinalityThreshold.toLong),
      rowCountHint = Some(heavy))
    val lightGroups = Quantiles.percentileRankAuto(base, "g", "v", "id",
      groupCountHint = Some(6L), rowCountHint = Some(6L)) // 1 row/group
    // the bucketed physical plan carries the __b bucket column; the
    // window plan never materializes it
    assert(low.queryExecution.executedPlan.toString.contains("__b"))
    assert(!manyGroups.queryExecution.executedPlan.toString.contains("__b"))
    assert(!lightGroups.queryExecution.executedPlan.toString.contains("__b"))
    assert(collectNorm(low) === collectNorm(manyGroups))
    assert(collectNorm(low) === collectNorm(lightGroups))
    // unhinted auto still picks a working plan (planning scan path)
    assert(collectNorm(Quantiles.percentileRankAuto(base, "g", "v", "id")) === collectNorm(low))
  }
}
