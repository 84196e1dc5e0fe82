package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable frequency/membership sketches — the
  * mergeable-summary layer of a large-scale pipeline (pre-aggregation,
  * join pruning, hot-key detection). Unlike `approx_count_distinct`'s
  * HLL (engine-internal hashes, gated by spec only), these use the repo's
  * portable md5-derived hash family (Sampling.hashKey), so a DuckDB
  * oracle rebuilds the exact same counters bit-for-bit — approximation
  * with DETERMINISTIC error, testable end to end (q92/q93).
  *
  * Scale shape: a count-min build is ONE partial-aggregated groupBy whose
  * exchange carries at most depth×width rows (the sketch, not the data) —
  * the canonical mergeable sketch; counters then BROADCAST to probes.
  * A bloom build is the distinct bit-position set (≤ k·|build| rows,
  * usually ≪), broadcast into a probe-side membership join — the manual
  * spelling of the runtime bloom-pruned join Spark applies to shuffles.
  */
object Sketches {

  /** Row-`row` bucket of `key` in [0, width): the 60-bit salted md5 hash
    * reduced mod width. Independent rows come from independent salts. */
  def bucket(key: Column, salt: String, row: Int, width: Int): Column =
    pmod(Sampling.hashKey(key, s"$salt$row"), lit(width.toLong))

  /** The ONE hash fan-out every build/probe path shares: each input row
    * carries all `rounds` buckets, exploded into one row per round (plus
    * the key and/or round index when the caller aggregates by them).
    * Build and probe MUST hash identically or the sketch contract
    * silently breaks — a single construction makes that drift impossible.
    *
    * Shape: a single scan + Generate — the row multiset is identical to
    * the previous `rounds`-way union of projections, but the input is
    * read ONCE instead of `rounds` times (guide §2.3/§6: at corpus scale
    * the union spelled k full scans of the probe/build side per sketch).
    * `posexplode`'s position IS the round index, so `sk_row` needs no
    * separate literal. */
  private def fanout(
      df: DataFrame,
      keyCol: String,
      rounds: Int,
      salt: String,
      width: Int,
      withKey: Boolean,
      withRow: Boolean,
      bucketName: String): DataFrame = {
    val buckets = array((0 until rounds).map(r => bucket(col(keyCol), salt, r, width)): _*)
    val keyCols = if (withKey) Seq(col(keyCol)) else Nil
    if (withRow)
      df.select(keyCols :+ posexplode(buckets).as(Seq("sk_row", bucketName)): _*)
    else
      df.select(keyCols :+ explode(buckets).as(bucketName): _*)
  }

  /** Count-min sketch build: depth×width counters as a DataFrame
    * (`sk_row`, `sk_bucket`, `sk_count`). Mergeable: union + re-sum. */
  def countMinBuild(
      df: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 64,
      salt: String = "cms"): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape: $depth x $width")
    fanout(df, keyCol, depth, salt, width, withKey = false, withRow = true, "sk_bucket")
      .groupBy(col("sk_row"), col("sk_bucket"))
      .agg(count(lit(1)).as("sk_count"))
  }

  /** Point-query the sketch for every row of `keys`: the estimate is the
    * MIN over the depth rows of the key's bucket counters — ≥ the true
    * count always (count-min never undercounts), with overcounting only
    * from bucket collisions. An empty bucket is a ZERO counter, not a
    * missing row, so the sketch is left-joined and absent counters
    * coalesce to 0 — a key the build never saw estimates 0 (unless every
    * one of its buckets collides), and no probe key ever drops from the
    * output. The sketch side is broadcast. */
  def countMinEstimate(
      sketch: DataFrame,
      keys: DataFrame,
      keyCol: String,
      depth: Int = 4,
      width: Int = 64,
      salt: String = "cms"): DataFrame = {
    val probes =
      fanout(keys, keyCol, depth, salt, width, withKey = true, withRow = true, "sk_bucket")
    probes
      .join(broadcast(sketch), Seq("sk_row", "sk_bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("sk_count"), lit(0L))).as("cms_estimate"))
  }

  /** Bloom-filter build: the DISTINCT set of bit positions the build keys
    * light up (k positions per key in [0, bits)). A position table, not a
    * packed bitmap — semantically identical, mergeable by union, and the
    * whole filter is ≤ min(bits, k·|build|) rows, made to broadcast. */
  def bloomBuild(
      df: DataFrame,
      keyCol: String,
      k: Int = 3,
      bits: Int = 256,
      salt: String = "bloom"): DataFrame = {
    require(k > 0 && bits > 0, s"bad bloom shape: k=$k bits=$bits")
    fanout(df, keyCol, k, salt, bits, withKey = false, withRow = false, "bloom_bit")
      .distinct()
  }

  /** Probe: adds `might_contain` — 1 iff ALL of the key's (distinct)
    * positions are set (the bloom contract: no false negatives,
    * deterministic false positives). A key's k hashes can collide with
    * each other, so the test is min-over-DISTINCT-positions, never a
    * hit-count compared to k. The bit set is broadcast. A NULL probe key
    * gets might_contain = 0, not NULL: its hash is NULL, so it lights no
    * bit at build time and can never have been inserted — and the final
    * join is null-SAFE so the row is annotated instead of silently
    * carrying a NULL that both `=== 1` and `=== 0` filters would drop. */
  def bloomMightContain(
      bloom: DataFrame,
      probe: DataFrame,
      keyCol: String,
      k: Int = 3,
      bits: Int = 256,
      salt: String = "bloom"): DataFrame = {
    val positions =
      fanout(probe, keyCol, k, salt, bits, withKey = true, withRow = false, "bloom_bit")
        .distinct()
    val flags = positions
      .join(broadcast(bloom.withColumn("__set", lit(1L))), Seq("bloom_bit"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("__set"), lit(0L))).as("might_contain"))
      .withColumnRenamed(keyCol, "__probe_key")
    probe
      .join(flags, probe(keyCol) <=> col("__probe_key"), "left")
      .drop("__probe_key")
      .withColumn("might_contain", coalesce(col("might_contain"), lit(0L)))
  }
}
