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
    // direct-source shape of the windowed agg (zero staging copy),
    // mirroring streaming_sessionize_direct: same batch-SQL oracle
    "streaming_window_agg_direct" -> ((s, dir) =>
      StreamPipeline.windowAgg(s, s"$dir/events.parquet", direct = true)),
    "streaming_dedup_exact" -> ((s, dir) =>
      StreamPipeline.dedupExact(s, s"$dir/documents.parquet")),
    "streaming_sessionize" -> ((s, dir) =>
      StreamPipeline.sessionize(s, s"$dir/events.parquet")),
    // the DIRECT-source shape (brace-glob union of the source dir in
    // place + sentinel dir, zero staging copy — the path a production
    // feed would use) under the same batch-SQL oracle as the staged shape
    "streaming_sessionize_direct" -> ((s, dir) =>
      StreamPipeline.sessionize(s, s"$dir/events.parquet", direct = true)),
    // the INCREMENTAL backfill route: same semantics, but the watermark
    // advances across 4 time-range micro-batches (maxFilesPerTrigger=1),
    // so open sessions persist in state between batches and finals emit
    // by mid-stream timeout — gated against the same batch SQL
    "streaming_sessionize_incremental" -> ((s, dir) =>
      StreamPipeline.sessionize(s, s"$dir/events.parquet", batches = 4)),
    // BOUNDED-state dedup: dropDuplicatesWithinWatermark over the doubled
    // events stream, 4 time-range micro-batches so the watermark horizon
    // genuinely evicts state mid-backfill; exact-equal to DISTINCT because
    // duplicate pairs share one event time (co-resident in state)
    "streaming_dedup_within_watermark" -> ((s, dir) =>
      StreamPipeline.dedupWithinWatermark(s, s"$dir/events.parquet", batches = 4)),
  )

  /** ONE definition of the gap-sessionization batch SQL — the staged,
    * direct, and incremental streaming shapes are all gated against the
    * same semantics, and a future oracle fix must not diverge them. */
  private val sessionizeOracle: String =
    """WITH e AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
      |    THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM e)
      |SELECT user_id, CAST(sess AS BIGINT) AS session_idx,
      |  epoch_us(min(ts)) AS session_start, epoch_us(max(ts)) AS session_end,
      |  count(*) AS n_events
      |FROM s GROUP BY 1, 2""".stripMargin

  /** ONE definition of the hourly-window batch SQL — staged and direct
    * streaming shapes share it (same discipline as sessionizeOracle). */
  private val windowAggOracle: String =
    """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
      |  event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    "streaming_window_agg" -> windowAggOracle,
    "streaming_window_agg_direct" -> windowAggOracle,
    "streaming_dedup_within_watermark" ->
      "SELECT DISTINCT user_id, epoch_us(ts) AS micros, event_type FROM events",
    "streaming_dedup_exact" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000, text FROM documents)
        |SELECT DISTINCT md5(text) AS text_hash FROM corpus""".stripMargin,
    "streaming_sessionize_incremental" -> sessionizeOracle,
    "streaming_sessionize_direct" -> sessionizeOracle,
    "streaming_sessionize" -> sessionizeOracle,
  )
}
