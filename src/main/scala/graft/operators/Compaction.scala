package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record-per-key compaction — the "current snapshot" view over an
  * append-only event/CDC log (reference analogue: the upsert sink keeps
  * one row per key, src/database/db_utils.py's INSERT OR REPLACE; this is
  * the same semantics expressed as a query over the raw log).
  *
  * `(timeCol desc, tieCol desc)` must be a total order per key so the
  * survivor is deterministic. Plan shape: one hash shuffle on the key
  * columns, per-partition sort, `row_number`-filter — the standard
  * window-dedup. At 100 TB the same result is obtainable with a
  * partial-aggregable `max_by(struct(*), struct(time, tie))` groupBy
  * (map-side combine, no sort); the window form is kept because its
  * output order is engine-portable and Catalyst rewrites rn=1 windows
  * to a TopK-per-partition (WindowGroupLimit) anyway — no full sort of
  * each group materializes.
  */
object Compaction {

  def latestByKey(
      df: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tieCol: String): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).desc, col(tieCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
