package graft.maef

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** L3: the greedy dual-cap journey chunker (src/api/ihc_api.py:25-52) —
  * fold journeys *in order* into chunks holding at most `maxJourneys`
  * journeys AND `maxSessions` sessions; an oversized single journey still
  * gets its own chunk.
  *
  * The fold is inherently sequential (each assignment depends on the
  * running totals), and it runs at the API boundary where the data is
  * already tiny (one row per journey — 1,940 rows for the reference's
  * default window). So: aggregate per-journey counts distributedly, then
  * fold the counts on a single partition. The heavy per-session data never
  * leaves its executors — only (journey, count) pairs move.
  *
  * CEILING: the `orderBy(..).coalesce(1)` funnel sorts and folds all
  * (journey, count) pairs in ONE task — that is the reference's semantic
  * (its API client builds chunks from one in-order Python list,
  * ihc_api.py:25-52), not an accident. At ~16 bytes/pair the single task
  * holds ~10^8 journeys per GiB of executor memory; beyond that the
  * greedy running totals would have to become a scan-order prefix fold
  * (partition-wise fold + carry merge), which changes no chunk contents
  * but is pointless until an API boundary actually sees 10^8 journeys
  * per window.
  */
object Chunker {

  val MaxJourneys = 85  // ihc_api.py:14
  val MaxSessions = 2750 // ihc_api.py:15

  case class JourneySize(conversion_id: String, order_key: String, n_sessions: Long)
  case class JourneyChunk(conversion_id: String, chunk_id: Int)

  /** Assign each journey a chunk id. `journeys` is session-grain
    * (conversion_id + orderCol); journey order is (min(orderCol),
    * conversion_id) — the deterministic stand-in for the reference's
    * insertion order. */
  def assign(
      journeys: DataFrame,
      orderCol: String = "timestamp",
      maxJourneys: Int = MaxJourneys,
      maxSessions: Int = MaxSessions): Dataset[JourneyChunk] = {
    val spark = journeys.sparkSession
    import spark.implicits._
    val sizes = journeys
      .groupBy(col("conversion_id").cast("string").as("conversion_id"))
      .agg(
        min(col(orderCol)).cast("string").as("order_key"),
        count(lit(1)).as("n_sessions"))
      .as[JourneySize]
      .orderBy(col("order_key"), col("conversion_id"))
      .coalesce(1)
    sizes.mapPartitions { it =>
      var chunk = 0
      var nJourneys = 0
      var nSessions = 0L
      it.map { j =>
        val wouldOverflow =
          nJourneys + 1 > maxJourneys || nSessions + j.n_sessions > maxSessions
        if (nJourneys > 0 && wouldOverflow) { chunk += 1; nJourneys = 0; nSessions = 0L }
        nJourneys += 1
        nSessions += j.n_sessions
        JourneyChunk(j.conversion_id, chunk)
      }
    }
  }

  /** Journeys with their chunk assignment joined back at session grain —
    * the exact payload shape each API request would carry. */
  def chunked(
      journeys: DataFrame,
      orderCol: String = "timestamp",
      maxJourneys: Int = MaxJourneys,
      maxSessions: Int = MaxSessions): DataFrame =
    journeys.join(
      assign(journeys, orderCol, maxJourneys, maxSessions).toDF(),
      Seq("conversion_id"))
}
