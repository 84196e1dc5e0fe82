package graft.maef

import org.apache.spark.sql.DataFrame

/** S11: the optional external-attribution-API connector — kept as a
  * drop-in alternative to the native in-engine model (MaefPipeline
  * .nativeAttribution). Reproduces the reference client's delivery policy
  * (src/api/ihc_api.py:95-165): per-chunk POST, ≤3 attempts, exponential
  * backoff 2^attempt seconds, 1 s pacing between successful chunks, and a
  * fail-if-no-responses gate.
  *
  * Transport and clock are injected: this environment has zero egress, and
  * at scale the send loop is a side-effecting boundary whose policy —
  * not its socket — is the part worth testing. The loop runs on the
  * driver over the already-chunked journey payloads (tiny by construction:
  * one request per ≤85 journeys); the heavy journey data is reduced to
  * chunk payloads by Chunker's distributed aggregation first.
  */
object AttributionApiConnector {

  /** One request payload: the journey-entry JSON array for one chunk. */
  final case class ChunkPayload(chunkId: Int, body: String)

  final case class Policy(
      maxAttempts: Int = 3,      // ihc_api.py:101
      backoffBaseSeconds: Int = 2, // ihc_api.py:102
      interChunkDelaySeconds: Int = 1) // ihc_api.py:142

  /** Build one JSON body per chunk from chunk-assigned journey entries
    * (columns: chunk_id + MaefModel.JourneyEntry).
    *
    * Driver memory bound for the `.collect()` below: the API contract caps
    * each chunk at ≤85 journeys AND ≤2,750 sessions (ihc_api.py:14-15, the
    * caps Chunker enforces), so a collected row is at most ~2,750 serialized
    * journey entries (< 1 MB of JSON) — the collect materializes request
    * bodies the driver must hold to POST them anyway, not unbounded data.
    * The total across chunks equals the request traffic itself; a corpus
    * too big to collect here would be too big to send. */
  def chunkPayloads(chunked: DataFrame): Seq[ChunkPayload] = {
    import org.apache.spark.sql.functions._
    // collect_list order is shuffle-arrival order — two runs over the same
    // data could send byte-different bodies. sort_array over a struct
    // keyed (conversion_id, timestamp, session_id) pins each chunk's
    // records to journey order (sessions time-ordered within a journey),
    // which is the order the reference client serializes them in.
    chunked
      .groupBy(col("chunk_id"))
      .agg(sort_array(collect_list(struct(
        col("conversion_id"), col("timestamp"), col("session_id"),
        to_json(struct(
          col("conversion_id"), col("session_id"), col("timestamp"),
          col("channel_label"), col("holder_engagement"), col("closer_engagement"),
          col("conversion"), col("impression_interaction"))).as("j")))).as("records"))
      .orderBy(col("chunk_id"))
      .collect()
      .map(r => ChunkPayload(
        r.getAs[Int]("chunk_id"),
        r.getAs[Seq[org.apache.spark.sql.Row]]("records")
          .map(_.getAs[String]("j")).mkString("[", ",", "]")))
      .toSeq
  }

  /** Deliver all chunks through `transport` under the retry policy.
    * Returns the successful responses in chunk order; chunks that exhaust
    * their attempts are dropped (the reference logs and continues,
    * ihc_api.py:156-160). Throws if NO chunk succeeded (ihc_api.py:164). */
  def deliver(
      payloads: Seq[ChunkPayload],
      transport: ChunkPayload => String,
      policy: Policy = Policy(),
      sleep: Long => Unit = millis => Thread.sleep(millis)): Seq[String] = {
    val responses = Seq.newBuilder[String]
    var nOk = 0
    payloads.zipWithIndex.foreach { case (p, i) =>
      var attempt = 0
      var done = false
      while (attempt < policy.maxAttempts && !done) {
        try {
          val resp = transport(p)
          responses += resp
          nOk += 1
          done = true
          if (i < payloads.size - 1) sleep(policy.interChunkDelaySeconds * 1000L)
        } catch {
          case scala.util.control.NonFatal(_) =>
            attempt += 1
            // the reference backs off even after the final failure
            // (ihc_api.py:150-155: sleep precedes the attempt-cap check)
            sleep(math.pow(policy.backoffBaseSeconds.toDouble, attempt.toDouble).toLong * 1000L)
        }
      }
    }
    val out = responses.result()
    require(out.nonEmpty, "No valid API responses received")
    out
  }
}
