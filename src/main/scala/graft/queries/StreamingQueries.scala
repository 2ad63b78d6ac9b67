package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.{DecontamStream, DedupStream, EventsStream}

/** Structured Streaming entries for the correctness gate: each runs a real
  * incremental query (AvailableNow trigger) over the events files and is
  * compared against a batch DuckDB oracle. */
object StreamingQueries {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_events_hourly" -> ((s, d) =>
      EventsStream.runToBatch(s, s"$d/events.parquet", "v_stream_hourly")),
    "stream_user_sessions" -> ((s, d) =>
      EventsStream.runSessionsToBatch(s, s"$d/events.parquet", "v_stream_sessions")),
    // the same document file staged as TWO micro-batches: batch 2 must be
    // fully suppressed by dedup state from batch 1
    "stream_dedup_docs" -> ((s, d) =>
      DedupStream.runToBatch(s, s"$d/documents.parquet", "v_stream_dedup")),
    // incremental MinHash-LSH near-dup: corpus split into two parity
    // micro-batches; pairs spanning the halves exist only if bucket state
    // survives across batches. Oracle = the batch operator's oracle.
    "stream_neardup_docs" -> ((s, d) =>
      DedupStream.runNearDupToBatch(s, s"$d/documents.parquet", "v_stream_neardup")),
    // stateless ingest-time decontamination: train docs stream through in
    // two micro-batches, the eval set is static; numbers must equal the
    // batch operator's (shared oracle)
    "stream_decontam_docs" -> ((s, d) =>
      DecontamStream.runToBatch(s, s"$d/documents.parquet", "v_stream_decontam")))

  val oracles: Map[String, String] = Map(
    "stream_events_hourly" ->
      """SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS hour_epoch, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // session = gap > 30 min between consecutive events of a user
    "stream_user_sessions" ->
      """WITH g AS (SELECT user_id, value,
        |  epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  count(*) FILTER (gap IS NULL OR gap > 1800) AS n_sessions,
        |  round(sum(value), 2) AS total_value
        |FROM g GROUP BY user_id""".stripMargin,
    "stream_dedup_docs" ->
      "SELECT DISTINCT md5(text) AS fingerprint, n_chars FROM documents",
    "stream_neardup_docs" -> PipelineQueries.oracles("pipe_minhash_pairs"),
    "stream_decontam_docs" -> PipelineQueries.oracles("pipe_decontam"))
}
