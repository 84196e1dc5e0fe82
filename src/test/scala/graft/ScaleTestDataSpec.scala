package graft

import org.apache.spark.sql.functions._

/** The sf-scaling generator behind the r18 scaling-slope bench
  * (bench/medians_sf1_run1.json): the slope evidence is only as good as
  * the scaled corpus, so the scaler's three contracts are pinned here at
  * mult=2 over sf0.001 — exact multiplication of every fact table,
  * referential integrity (joins produce exactly mult x the matches, no
  * dangling keys, never mult^2), and de-twinned payload columns (a
  * replica is NOT a byte-copy, or every dedup/similarity operator would
  * measure an artificial all-duplicates corpus). */
class ScaleTestDataSpec extends SparkSpec {

  private lazy val dst: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_scaletd").toString
    // main() builds its own session; with a session already up in this
    // JVM getOrCreate reuses it, so this is cheap and side-effect-free
    ScaleTestData.main(Array(TinySf, d, "2"))
    d
  }
  private def t(name: String) = spark.read.parquet(s"$dst/$name.parquet")
  private def orig(name: String) = spark.read.parquet(s"$TinySf/$name.parquet")

  test("every fact table is exactly mult x rows; fixed dims stay fixed") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings"))
      assert(t(n).count() === 2 * orig(n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(n).count() === orig(n).count(), n)
  }

  test("referential integrity: joins yield exactly mult x the matches, no dangling keys") {
    val joined = t("lineitem").join(t("orders"), col("l_orderkey") === col("o_orderkey"))
    val joined0 = orig("lineitem").join(orig("orders"), col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() === 2 * joined0.count(),
      "orders ⋈ lineitem must scale by mult, not mult² and not drop rows")
    // no dangling FKs anywhere the offsets touch
    assert(t("lineitem").join(t("part"), col("l_partkey") === col("p_partkey"), "left_anti")
      .count() === 0L)
    assert(t("orders").join(t("customer"), col("o_custkey") === col("c_custkey"), "left_anti")
      .count() === 0L)
    // keys are globally unique after offsetting (no replica collision)
    assert(t("orders").select("o_orderkey").distinct().count() === t("orders").count())
    assert(t("documents").select("doc_id").distinct().count() === t("documents").count())
    // key-embedded names are regenerated from the SHIFTED key — replica
    // byte-twin names turned q88's fuzzy join into an artificial
    // 10-twins-per-name corpus (100x pair fan-out) before this rule
    assert(t("customer").select("c_name").distinct().count() === t("customer").count())
    assert(t("customer")
      .filter(col("c_name") =!= format_string("Customer#%09d", col("c_custkey")))
      .count() === 0L, "c_name must be the generator's own function of the shifted key")
    assert(t("supplier").select("s_name").distinct().count() === t("supplier").count())
  }

  test("replica payloads are de-twinned: texts cipher-rotated, embeddings permuted, stats preserved") {
    // texts: replica 0 is the original corpus verbatim; replica 1 shares
    // ZERO exact texts with it (Caesar rotation) but the same length
    // distribution (a permutation of letters preserves length)
    val texts = t("documents").select(col("doc_id"), col("text"), length(col("text")).as("len"))
    assert(texts.select("text").distinct().count() ===
      2 * orig("documents").select("text").distinct().count(),
      "each replica contributes its own distinct texts — zero cross-replica byte-twins")
    val twinGroups = t("documents").groupBy("text").count().filter(col("count") > 1).count()
    val twinGroups0 = orig("documents").groupBy("text").count().filter(col("count") > 1).count()
    assert(twinGroups === 2 * twinGroups0,
      "cross-replica exact twins would turn the dedup benches into an all-duplicates corpus")
    val lens = texts.groupBy("len").count()
    val lens0 = orig("documents").select(length(col("text")).as("len")).groupBy("len").count()
    assert(lens.join(lens0, "len").filter(lens("count") =!= lens0("count") * 2).count() === 0L,
      "per-length histogram must scale exactly (rotation preserves lengths)")
    // embeddings: rotation preserves the norm (permutation of coordinates)
    val norms = t("embeddings").select(col("vec_id"),
      round(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("n2"))
    val base = orig("embeddings").select(col("vec_id").as("vid0"),
      round(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")), 6).as("n2_0"))
    val vecS = orig("embeddings").agg(max(col("vec_id"))).head().getLong(0) + 1L
    assert(norms.withColumn("vid0", pmod(col("vec_id"), lit(vecS)))
      .join(base, "vid0").filter(col("n2") =!= col("n2_0")).count() === 0L,
      "cyclic rotation must preserve every vector's norm")
  }

  test("out-of-range mult fails loudly instead of silently re-twinning replicas (r18 ADVICE)") {
    // The de-twinning devices DEGENERATE past their moduli: the Caesar
    // rotation is rep % 26 (replica 26 = byte-twins of replica 0) and the
    // embedding rotation is the identity whenever rep % dim == 0 — both
    // would silently recreate the artificial all-duplicates corpus the
    // scaler exists to prevent. The guards must refuse, not degrade.
    val d = java.nio.file.Files.createTempDirectory("graft_scaletd_oob").toString
    val e1 = intercept[IllegalArgumentException] {
      ScaleTestData.main(Array(TinySf, d, "27"))
    }
    assert(e1.getMessage.contains("26"), s"the refusal names the Caesar modulus: ${e1.getMessage}")
    // the embedding-dim guard binds before the Caesar cap only when
    // dim < 26 — the real fixture is dim 64, so build a copy with a
    // TINY dim and check the guard refuses mult > dim, and does so
    // UP FRONT (before any table is written, not at the embeddings step)
    val srcSmall = java.nio.file.Files.createTempDirectory("graft_scaletd_dim").toString
    for (n <- Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents"))
      spark.read.parquet(s"$TinySf/$n.parquet").write.parquet(s"$srcSmall/$n.parquet")
    spark.read.parquet(s"$TinySf/embeddings.parquet")
      .withColumn("embedding", slice(col("embedding"), 1, 3))
      .write.parquet(s"$srcSmall/embeddings.parquet")
    val d2 = java.nio.file.Files.createTempDirectory("graft_scaletd_oob2").toString
    val e2 = intercept[IllegalArgumentException] {
      ScaleTestData.main(Array(srcSmall, d2, "4"))
    }
    assert(e2.getMessage.contains("dimension 3"),
      s"the refusal names the embedding dim: ${e2.getMessage}")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$d2/region.parquet")),
      "the dim guard fires before ANY table is written — no partial scaled corpus")
    // mult=0 / negative are refused too — a zero-replica "scale-up" is a
    // data-destroying overwrite, not a scale
    intercept[IllegalArgumentException] { ScaleTestData.main(Array(TinySf, d, "0")) }
  }
}
