package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Approximate analytics — the sketch aggregates a 100 TB engine leans on
  * when exact answers would shuffle the world: HyperLogLog++ distinct
  * counts and GK-sketch quantiles. Both are partial-aggregable (constant
  * sketch bytes per partition cross the exchange, not rows), and both are
  * NON-deterministic across engines by design, so they live under spec
  * error bounds rather than the bit-exact DuckDB oracle gate.
  */
class ApproxStatsSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within its rsd bound of the exact distinct count") {
    val ev = Tables.events(spark, TinySf)
    val exact = ev.select(countDistinct(col("user_id"))).as[Long].head()
    // rsd 0.02 → HLL++ is within a few σ of 2%; assert a generous 3σ
    val approx = ev.select(approx_count_distinct(col("user_id"), rsd = 0.02)).as[Long].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.06, s"HLL relative error $relErr (exact=$exact approx=$approx)")
  }

  test("percentile_approx with high accuracy brackets the exact percentiles") {
    val ev = Tables.events(spark, TinySf).select(col("value")).cache()
    val exact = ev.stat.approxQuantile("value", Array(0.5, 0.9), 0.0) // relErr 0 = exact
    val approx = ev.agg(
      percentile_approx(col("value"), lit(0.5), lit(10000)),
      percentile_approx(col("value"), lit(0.9), lit(10000)))
      .as[(Double, Double)].head()
    val n = ev.count().toDouble
    // GK sketch at accuracy 10000 → rank error ≤ n/10000; check the VALUE
    // lands between the exact quantiles one rank-epsilon either side
    val eps = math.max(1.0 / 10000, 1.0 / n)
    val loHi = ev.stat.approxQuantile("value",
      Array(math.max(0.0, 0.5 - eps), math.min(1.0, 0.5 + eps),
        math.max(0.0, 0.9 - eps), math.min(1.0, 0.9 + eps)), 0.0)
    assert(approx._1 >= loHi(0) && approx._1 <= loHi(1),
      s"p50 ${approx._1} outside [${loHi(0)}, ${loHi(1)}] (exact ${exact(0)})")
    assert(approx._2 >= loHi(2) && approx._2 <= loHi(3),
      s"p90 ${approx._2} outside [${loHi(2)}, ${loHi(3)}] (exact ${exact(1)})")
    ev.unpersist()
  }
}
