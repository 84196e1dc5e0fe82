package graft

/** Guards the driver contract itself: the flagship entry must return rows
  * on the t1 smoke dir, and every query must have its oracle twin (a
  * queries/oracleSql key mismatch silently downgrades the driver's gate
  * for that query to rows-only). */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on the sf0.001 smoke dir") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle twin and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique, ordered, and within the bench-line budget") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size === names.size)
    // Bench prints medians under SHORT keys (the qNN number); two names
    // collapsing to one short key would silently merge their medians
    val shorts = names.map(Bench.shortKey)
    assert(shorts.distinct.size === shorts.size,
      s"short-key collision: ${shorts.diff(shorts.distinct).distinct}")
    // the driver's bench artifact keeps a ~2 KB output tail; the medians
    // line must stay under it (see Bench.scala) — fail HERE, at authoring
    // time, rather than silently truncating the round's bench artifact.
    // Per query: 2 quotes + colon + comma + key + value (≤7 chars covers
    // "99.999" at 3 decimals and the "-1.0" sentinel); +130 wrapper.
    val lineBytes = shorts.map(_.length + 11).sum + 130
    assert(lineBytes < 1990, s"bench medians line ≈ $lineBytes B — shorten before adding queries")
  }

  test("state-store partition dial derives from source volume") {
    val mb = 1L << 20
    // bench scale (KB–MB staged sources) reproduces the measured optimum 4
    assert(SparkEntry.stateStorePartitions(0L) === 4)
    assert(SparkEntry.stateStorePartitions(2 * mb) === 4)
    assert(SparkEntry.stateStorePartitions(256 * mb) === 4)
    // past the floor the count scales linearly at ~64 MB of source/store
    assert(SparkEntry.stateStorePartitions(1024 * mb) === 16)
    assert(SparkEntry.stateStorePartitions(100L * 1024 * mb) === 1600)
    // ceiling: per-store overhead dominates past 8192 stores
    assert(SparkEntry.stateStorePartitions(Long.MaxValue / 2) === 8192)
    // monotone across the whole range (no cliff between the regimes)
    val probes = Seq(0L, mb, 64 * mb, 65 * mb, 1024 * mb, 1L << 40, 1L << 50)
    val vals = probes.map(SparkEntry.stateStorePartitions)
    assert(vals === vals.sorted, s"non-monotone: ${probes.zip(vals)}")
  }
}
