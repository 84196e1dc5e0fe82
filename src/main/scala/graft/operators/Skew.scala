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
    // deterministic row-spread: hash all large-side columns (not just the
    // key — same-key rows must scatter)
    val salted = large.withColumn(
      "__salt", pmod(xxhash64(large.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(salt - 1))))
    salted
      .join(replicated, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
