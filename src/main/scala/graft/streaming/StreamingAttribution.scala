package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamingFunnel.Event

/** Streaming end-to-end attribution: the streaming twin of J1 (journey
  * construction) + the native IHC model (operators.Attribution.ihc), as one
  * stateful operator. The reference runs this as a nightly batch
  * (main.py:20-83); at 100 TB/day the same semantics run incrementally:
  *
  *   - per-user state buffers the session history (one small sorted vector
  *     per user — the SAME shuffle key as the batch journey join, so the
  *     plan shape survives the batch→stream port);
  *   - when a conversion event arrives, its journey is the buffered
  *     sessions strictly before it (within the optional lookback), and the
  *     fully-attributed rows are emitted exactly once (Append mode) with
  *     BIT-IDENTICAL weights to the batch operator: initializer/closer =
  *     first/last touch, holder = (1+engagement)/Σ, ihc = 0.3·i+0.4·h+0.3·c
  *     — integer-ratio doubles, same literal order (StreamingSpec asserts
  *     `==` on doubles against Attribution.ihc over the same events);
  *   - state is bounded: with `flushWatermark`, `lookbackUs` prunes
  *     sessions older than (watermark − lookback) — the exact horizon no
  *     future TIMELY conversion's window can reach, so out-of-order
  *     conversions inside the lateness window never lose sessions — and an
  *     event-time timeout (clamped above the current watermark, deadline
  *     rounded UP to ms) removes a user's whole state once the watermark
  *     passes its lookback horizon: idle users cost nothing. Without a
  *     watermark the prune falls back to the newest BUFFERED session's
  *     horizon (best-effort bound — there is no lateness contract to
  *     honor). `maxSessionsPerUser` hard-caps pathological users (oldest
  *     dropped first). `flushWatermark` requires `lookbackUs`: without a
  *     lookback a conversion's journey reaches arbitrarily far back, so no
  *     state could ever be evicted without changing results.
  *
  * Ordering semantics: events WITHIN a micro-batch are sorted by
  * (event time, event_id) before processing, so intra-batch disorder is
  * absorbed. A session arriving in a LATER batch than a conversion it
  * preceded in event time does not retro-attribute (the journey was already
  * emitted — Append mode); the watermark bounds that lateness window
  * exactly as it does for every append-mode streaming aggregation.
  */
object StreamingAttribution {

  /** Matches attribution_customer_journey + component weights
    * (challenge_db_create.sql:34-39) and Attribution.ihc's output. */
  case class AttributedRow(
      conversion_id: Long, session_id: Long, user_id: Long,
      journey_pos: Long, journey_len: Long,
      initializer: Double, holder: Double, closer: Double, ihc: Double)

  case class SessionRec(sessionId: Long, tsUs: Long, holderEngagement: Int)
  case class UserHistory(sessions: Vector[SessionRec])

  class Attributor(
      lookbackUs: Option[Long] = None,
      maxSessionsPerUser: Int = 10000,
      flushWatermark: Option[String] = None) extends Serializable {

    // an event-time timeout is only SOUND with a lookback bound: without
    // one, every buffered session stays reachable by some future
    // conversion forever, so "flush" would silently change results
    require(flushWatermark.isEmpty || lookbackUs.isDefined,
      "flushWatermark requires lookbackUs — without a lookback bound no state is evictable")

    def attribute(events: Dataset[Event]): Dataset[AttributedRow] = {
      val spark = events.sparkSession
      import spark.implicits._
      val (input, timeoutConf) = flushWatermark match {
        case Some(delay) =>
          (events.withWatermark("ts", delay).as[Event], GroupStateTimeout.EventTimeTimeout)
        case None => (events, GroupStateTimeout.NoTimeout)
      }
      input
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(process)
    }

    private def weights(journey: Vector[SessionRec]): Vector[(SessionRec, Int, Double, Double, Double)] = {
      val wsum = journey.iterator.map(1 + _.holderEngagement).sum
      journey.zipWithIndex.map { case (s, i) =>
        val initializer = if (i == 0) 1.0 else 0.0
        val closer = if (i == journey.length - 1) 1.0 else 0.0
        val holder = (1 + s.holderEngagement).toDouble / wsum.toDouble
        (s, i, initializer, holder, closer)
      }
    }

    private def process(
        userId: Long,
        events: Iterator[Event],
        state: GroupState[UserHistory]): Iterator[AttributedRow] = {
      if (state.hasTimedOut) {
        // the timeout fires lookback past the newest buffered session —
        // everything in state is outside any future conversion's window
        state.remove()
        return Iterator.empty
      }
      val sorted = events.toVector.sortBy(e => (StreamingFunnel.micros(e.ts), e.event_id))
      var sessions = state.getOption.map(_.sessions).getOrElse(Vector.empty)
      val out = Vector.newBuilder[AttributedRow]
      sorted.foreach { e =>
        val tsUs = StreamingFunnel.micros(e.ts)
        if (e.event_type == "purchase") {
          val journey = sessions.filter(s =>
            s.tsUs < tsUs && lookbackUs.forall(lb => s.tsUs >= tsUs - lb))
          weights(journey).foreach { case (s, i, init, holder, closer) =>
            out += AttributedRow(
              e.event_id, s.sessionId, userId, (i + 1).toLong, journey.length.toLong,
              init, holder, closer,
              0.3 * init + 0.4 * holder + 0.3 * closer)
          }
        } else {
          val rec = SessionRec(e.event_id, tsUs, if (e.event_type == "view") 1 else 0)
          // keep the buffer sorted by (ts, id) — batch join order semantics.
          // Insertion point by binary search: the Vector splice stays
          // O(n), but the linear indexWhere scan was the constant that
          // bites at the 10k session cap (≈13 probes vs 10k compares per
          // out-of-order arrival; in-order arrivals hit the :+ fast path
          // either way)
          var lo = 0
          var hi = sessions.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            val s = sessions(mid)
            if (s.tsUs < rec.tsUs || (s.tsUs == rec.tsUs && s.sessionId < rec.sessionId)) lo = mid + 1
            else hi = mid
          }
          sessions = if (lo == sessions.length) sessions :+ rec
          else { val (a, b) = sessions.splitAt(lo); (a :+ rec) ++ b }
        }
      }
      // bound the state. With a watermark the SAFE prune horizon is
      // (watermark − lookback): any future timely conversion has
      // tsUs ≥ watermarkUs, so its window starts at ≥ watermarkUs − lb —
      // pruning behind the NEWEST SESSION instead would drop sessions a
      // within-lateness out-of-order conversion still needs. Without a
      // watermark there is no lateness contract, so the newest-session
      // horizon is the documented best-effort bound.
      lookbackUs.foreach { lb =>
        val horizonUs =
          if (flushWatermark.isDefined) state.getCurrentWatermarkMs() * 1000L - lb
          else sessions.lastOption.map(_.tsUs - lb).getOrElse(Long.MinValue)
        sessions = sessions.dropWhile(_.tsUs < horizonUs)
      }
      if (sessions.length > maxSessionsPerUser)
        sessions = sessions.drop(sessions.length - maxSessionsPerUser)
      if (sessions.isEmpty) state.remove()
      else {
        state.update(UserHistory(sessions))
        if (flushWatermark.isDefined) lookbackUs.foreach { lb =>
          // deadline rounded UP to ms (floor could evict ~2 ms early and
          // lose a timely conversion's journey) and clamped strictly above
          // the current watermark — setTimeoutTimestamp THROWS on a stamp
          // at/behind the watermark, which would kill the whole query the
          // first time a purchase-only batch advanced time past an old
          // session's horizon
          val deadlineMs = (sessions.last.tsUs + lb) / 1000L + 1L
          state.setTimeoutTimestamp(math.max(state.getCurrentWatermarkMs() + 1L, deadlineMs))
        }
      }
      out.result().iterator
    }
  }
}
