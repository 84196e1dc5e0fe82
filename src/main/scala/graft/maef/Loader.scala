package graft.maef

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Attribution-result loading (src/etl/load.py:16-147):
  * envelope dispatch/flatten (P8/L1) → validate/cast (P9) → first-wins
  * dedup (L2) → Σihc gate (A4).
  *
  * The reference walks the envelope array in Python; here each step is a
  * DataFrame transform: the dispatch is a `coalesce` over the three
  * possible payload fields gated on statusCode, the flatten an `explode`,
  * the dedup a `row_number` window over explicit file order. File order is
  * captured at read via the envelope index so "first wins" is
  * deterministic (SURVEY §7.4.4) — the reference's in-file iteration order,
  * which its later `INSERT OR REPLACE` (last-wins) never actually
  * contradicts because duplicates are already dropped here.
  */
object Loader {

  /** L1/P8: one row per attribution record, in envelope order.
    * statusCode==200 envelopes contribute `value`; others fall back to
    * `data` then `results` (load.py:36-53). */
  def flattenEnvelopes(envelopes: DataFrame): DataFrame = {
    val payload = when(col("statusCode") === 200, col("value"))
      .otherwise(coalesce(col("data"), col("results")))
    envelopes
      .withColumn("envelope_idx", monotonically_increasing_id())
      .select(col("envelope_idx"), posexplode_outer(payload).as(Seq("record_idx", "r")))
      .filter(col("r").isNotNull)
      .select(col("envelope_idx"), col("record_idx"), col("r.*"))
  }

  /** A7: per-envelope error histogram (load.py:30-67's defaultdict). A
    * NULL statusCode is classified like structureSamples classifies it —
    * both `=== 200` and `=!= 200` are SQL-NULL for it, so without the
    * explicit branch the otherwise("ok") would swallow exactly the
    * envelopes the diagnostic histogram exists to surface. The structure
    * test for the null/non-200 path deliberately consults ONLY
    * `data`/`results`, NOT `value`: [[flattenEnvelopes]]'s dispatcher
    * (mirroring load.py's `if status == 200` branch) never reads `value`
    * on the fallback path, so a value-bearing null-status envelope yields
    * ZERO records — `invalid_structure` reports what the flatten actually
    * extracts; classing it "ok" would claim records that are never
    * emitted. */
  def errorHistogram(envelopes: DataFrame): DataFrame =
    envelopes.select(
      when(col("statusCode") === 200 && col("value").isNull, lit("missing_value"))
        .when((col("statusCode").isNull || col("statusCode") =!= 200) &&
            col("data").isNull && col("results").isNull,
          lit("invalid_structure"))
        .otherwise(lit("ok")).as("error_class"))
      .groupBy(col("error_class")).agg(count(lit(1)).as("n"))

  /** P9 + L2 + A4: validate, cast, dedup first-wins, gate on Σihc > 0.
    * Output matches attribution_customer_journey. */
  def validateAndDedup(records: DataFrame): DataFrame = {
    val typed = records
      .filter(
        col("conversion_id").isNotNull && col("session_id").isNotNull &&
          col("ihc").isNotNull)
      .select(
        col("conversion_id").cast("string").as("conv_id"),
        col("session_id").cast("string").as("session_id"),
        coalesce(col("ihc").cast("double"), lit(0.0)).as("ihc"),
        col("envelope_idx"), col("record_idx"))
      .filter(col("conv_id") =!= "" && col("session_id") =!= "")
    val w = Window.partitionBy(col("conv_id"), col("session_id"))
      .orderBy(col("envelope_idx"), col("record_idx"))
    typed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "envelope_idx", "record_idx")
  }

  /** O2: up to `n` sample rows of malformed envelopes for diagnostics
    * (load.py:48-67 keeps ≤3). */
  def structureSamples(envelopes: DataFrame, n: Int = 3): DataFrame =
    envelopes
      .filter(
        (col("statusCode") === 200 && col("value").isNull) ||
          (col("statusCode").isNull || col("statusCode") =!= 200) &&
            col("data").isNull && col("results").isNull)
      .limit(n)

  /** A6: the reference's post-load verification — COUNT(*) WHERE ihc > 0
    * must be ≥ 1 (load.py:149-169). */
  def verifyLoaded(acj: DataFrame): Long = {
    val n = acj.filter(col("ihc") > 0).count()
    require(n >= 1, "post-load verification failed: no rows with ihc > 0")
    n
  }

  /** Full load from a JSON-array response file, with the reference's
    * Σihc > 0 gate (load.py:120-123). */
  def load(spark: SparkSession, path: String): DataFrame = {
    val envelopes = JsonArrayIO.readJsonArray(spark, path, MaefModel.ResponseEnvelope)
    // Persist BEFORE the Σihc gate: the gate's full-table aggregate would
    // otherwise execute the whole flatten+dedup lineage once, and every
    // downstream consumer would recompute it from scratch.
    val out = validateAndDedup(flattenEnvelopes(envelopes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totalIhc = out.agg(coalesce(sum(col("ihc")), lit(0.0))).first().getDouble(0)
    require(totalIhc > 0, s"Attribution data contains no valid IHC values (total=$totalIhc)")
    out
  }
}
