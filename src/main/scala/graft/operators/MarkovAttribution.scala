package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Markov-chain (removal-effect) attribution — the data-driven model that
  * supersedes heuristic splits like the reference's IHC (reference:
  * src/api/ihc_api.py fixes 30/40/30 weights a priori; the Markov model
  * derives channel value from observed path structure): journeys become
  * walks START → channel → … → CONV, transition probabilities are counted
  * from the data, and a channel's value is its REMOVAL EFFECT — how much
  * conversion reach disappears when every walk through that channel is
  * cut (Anderl et al. 2014, "Mapping the customer journey").
  *
  * Exactness: probabilities are integer-scaled to 1e6 with floor
  * divisions — `p6 = (n·1e6) div Σn`, each step's edge term is
  * `(mass·p6) div 1e6` — so the whole chain is replayable bit-for-bit by
  * an external engine (the q95 oracle unrolls the steps as CTEs).
  * Reach is measured after a fixed `steps` horizon (finite k-step
  * approximation of the absorbing chain — exact absorption needs a
  * linear solve no SQL engine replays deterministically); removal does
  * NOT renormalize, mass routed into the cut channel is lost (the NULL
  * state), which is the standard removal-effect definition.
  *
  * Scale boundary, explicitly: counting transitions is the distributed
  * pass (one window shuffle over journeys + one groupBy — the same cost
  * as attribution itself). The chain solve then runs on the COLLECTED
  * transition matrix — at most (|channels|+2)² integer entries, a
  * channel-vocabulary-sized object like Sampling.mixture's rate map, not
  * data-sized — iterated in exact driver-side longs. 100 TB of journeys
  * still collapses to the same tiny matrix.
  */
object MarkovAttribution {

  val Scale = 1000000L // 1e6 fixed-point probability units

  /** @param journeys  (conversion_id, session_id, session_ts, `channelCol`)
    * @param steps     k-step reach horizon (≥ 1)
    * @return one row per channel:
    *         (channel, reach_base, reach_removed, removal_effect) — all
    *         1e6-scaled conversion mass reached from START within `steps`
    */
  def removalEffects(
      spark: SparkSession,
      journeys: DataFrame,
      channelCol: String = "channel_label",
      steps: Int = 4): DataFrame = {
    require(steps >= 1, s"steps must be >= 1: $steps")
    val w = Window.partitionBy("conversion_id").orderBy(col("session_ts"), col("session_id"))
    // real channels ride internally as "c:<label>" so a channel literally
    // named "START" or "CONV" can never be conflated with the synthetic
    // absorbing states (unprefixed, un-spoofable by construction); the
    // prefix is stripped before the output rows
    val chan = concat(lit("c:"), col(channelCol))
    val seq = journeys
      .withColumn("__pos", row_number().over(w))
      .withColumn("__nxt", lead(chan, 1).over(w))
    // r21: one conditional explode instead of a two-branch union — the
    // union's second branch re-evaluated the whole window chain (only the
    // exchange is reused across identical subtrees, not the Window
    // nodes). Each row emits its own transition, and the journey's first
    // row additionally emits the START edge; the pair multiset is
    // identical, and everything downstream aggregates.
    val ownEdge = struct(chan.as("src"), coalesce(col("__nxt"), lit("CONV")).as("dst"))
    val startEdge = struct(lit("START").as("src"), chan.as("dst"))
    val pairs = seq
      .select(explode(
        when(col("__pos") === 1, array(ownEdge, startEdge))
          .otherwise(array(ownEdge))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
    val trans = pairs
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      // the numerator widens to DECIMAL before the ×1e6 scale: a hot
      // transition past ~9.2e12 counts would wrap a long NEGATIVE and
      // poison every downstream reach with no error — exactly the
      // journeys-at-scale regime the scaladoc claims is safe
      .withColumn("p6", expr(
        s"cast((cast(n as decimal(38,0)) * ${Scale}L) div sum(n) over (partition by src) as bigint)"))
      .select(col("src"), col("dst"), col("p6"))
      .collect() // |states|² bounded by the channel vocabulary — see scaladoc
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    // exact fixed-point k-step walk; mass·p6 ≤ 1e12 — no overflow
    def reach(excluded: Option[String]): Long = {
      val edges = excluded match {
        case Some(c) => trans.filter(t => t._1 != c && t._2 != c)
        case None    => trans
      }
      var mass = Map("START" -> Scale)
      var conv = 0L
      for (_ <- 1 to steps) {
        val flowed = edges.flatMap { case (src, dst, p6) =>
          mass.get(src).map(m => dst -> (m * p6) / Scale)
        }
        conv += flowed.collect { case ("CONV", m) => m }.sum
        mass = flowed.filter(_._1 != "CONV")
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
      conv
    }

    val base = reach(None)
    val channels = trans.map(_._1).filter(_.startsWith("c:")).distinct.sorted
    val rows = channels.map { c =>
      val removed = reach(Some(c))
      Row(c.stripPrefix("c:"), base, removed, base - removed)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("channel", StringType),
        StructField("reach_base", LongType),
        StructField("reach_removed", LongType),
        StructField("removal_effect", LongType))))
  }
}
