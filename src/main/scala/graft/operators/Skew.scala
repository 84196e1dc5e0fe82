package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys. AQE's skew-join handles most cases
  * at runtime (enabled in the bench/verify sessions); explicit salting is
  * for the pathological producer — e.g. one user owning 1% of all events —
  * where even one AQE-split partition is dominated by a single key.
  *
  * `saltedJoin` spreads each large-side key over `salt` sub-keys and
  * replicates the small side once per sub-key, turning one hot partition
  * into `salt` even ones at the cost of a `salt`× small-side blow-up.
  */
object Skew {

  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // Replication preserves inner/left_semi/left_anti/left-outer semantics
    // exactly (each large row carries ONE salt, so it meets each small key
    // once). It does NOT preserve right/full outer: a small-side row that
    // matches nothing surfaces once per salt replica as `salt` null-padded
    // duplicates. Refuse rather than silently over-count.
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched small-side rows " +
        "(one per salt replica); only inner/left joins are salt-safe — " +
        "for right/full outer, salt the other side or rely on AQE skew handling")
    // deterministic row-spread: hash the large side's HASHABLE columns
    // (not just the key — same-key rows must scatter). Map-typed columns
    // are excluded: Spark's hash expressions reject MapType anywhere in
    // the type (map entry order is undefined), and the salt only needs
    // deterministic spread, not full-row coverage.
    val salted = large.withColumn(
      "__salt", pmod(Skew.rowSpreadHash(large), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(salt - 1))))
    salted
      .join(replicated, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Deterministic per-row hash over every HASHABLE column — xxhash64
    * rejects MapType anywhere in a type (map entry order is undefined),
    * so map-bearing columns are dropped from the hash input rather than
    * failing the whole operator at analysis. An (improbable) all-map
    * frame degrades to a constant. Shared with TopK's salted pre-rank. */
  private[operators] def rowSpreadHash(df: DataFrame): org.apache.spark.sql.Column = {
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val cols = df.schema.fields.filterNot(f => hasMap(f.dataType)).map(f => col(f.name))
    if (cols.isEmpty) lit(0L) else xxhash64(cols.toIndexedSeq: _*)
  }
}
