package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.stream.StreamPipeline

/** Gated Structured Streaming queries (see [[graft.stream.StreamPipeline]]):
  * each runs a real `readStream` pipeline drained with Trigger.AvailableNow
  * and must hash-match the equivalent batch SQL in DuckDB — streaming and
  * batch semantics coincide on a bounded input, and the gate pins that. */
object StreamQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "streaming_window_agg" -> ((s, dir) =>
      StreamPipeline.windowAgg(s, s"$dir/events.parquet")),
    "streaming_dedup_exact" -> ((s, dir) =>
      StreamPipeline.dedupExact(s, s"$dir/documents.parquet")),
  )

  val oracles: Map[String, String] = Map(
    "streaming_window_agg" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
        |  event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "streaming_dedup_exact" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents)
        |SELECT DISTINCT md5(text) AS text_hash FROM corpus""".stripMargin,
  )
}
