package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surfaces beyond the foreachBatch sinks
  * (DynamicBatcher, TieredIndex): a watermarked tumbling-window
  * aggregation and a streaming exact-dedup filter, both driven as real
  * `readStream` file-source pipelines drained with `Trigger.AvailableNow`.
  *
  * These are the streaming halves of the engine's training-data pipeline
  * surface — the reference itself is batch-only (its closest notion is
  * the incremental `extend` / tiered_index.hpp delta tier), so the
  * streaming shapes here follow Spark's own canon instead:
  *
  *  - `windowAgg`: file stream → `withWatermark` → tumbling-window
  *    groupBy → APPEND sink. Append mode only emits a window once the
  *    watermark passes its end, which makes output exactly-once and state
  *    eviction automatic — the 100 TB shape (bounded state, no Complete
  *    mode re-emission). A bounded backfill leaves its trailing windows
  *    un-finalized (the watermark only advances on new data), so the
  *    stage step appends one SENTINEL row past the horizon — the standard
  *    end-of-backfill flush pattern — and the sentinel's own rows are
  *    filtered from the result.
  *  - `dedupExact`: file stream → fingerprint → `dropDuplicates` →
  *    append sink. Streaming state = one entry per distinct fingerprint,
  *    i.e. exactly the shuffle footprint of the batch groupBy; at scale
  *    the state store is RocksDB and the horizon is bounded with
  *    `dropDuplicatesWithinWatermark` over the ingest timestamp (the
  *    test tables carry no event time on documents, so the unbounded
  *    variant is the gated one; only the DISTINCT KEY SET is emitted —
  *    first-seen payload columns would be arrival-order-dependent).
  *
  * At 100 TB the file source's directory listing is the practical
  * bottleneck — production feeds this from a notification-based source,
  * and `maxFilesPerTrigger` back-pressures the backfill; neither changes
  * the query shape gated here.
  */
object StreamPipeline {

  /** Copy every data file of a written parquet directory into `destDir`
    * under a distinct `prefix` (flat layout — the file stream source
    * lists non-recursively by default). */
  private def copyParts(spark: SparkSession, srcDir: String, destDir: String,
      prefix: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcDir)
    val dest = new org.apache.hadoop.fs.Path(destDir)
    val fs = src.getFileSystem(conf)
    fs.mkdirs(dest)
    val parts = fs.listStatus(src).filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    parts.zipWithIndex.foreach { case (s, i) =>
      org.apache.hadoop.fs.FileUtil.copy(fs, s.getPath, fs,
        new org.apache.hadoop.fs.Path(dest, f"$prefix-$i%05d.parquet"),
        false, conf)
    }
  }

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_stream_$tag").toString

  private def deleteRecursively(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** Drain `df` (a streaming frame) through an append parquet sink with
    * Trigger.AvailableNow and return the written rows as a batch frame.
    * The checkpoint is transient by design — each invocation is a fresh
    * bounded run (a resumable deployment would pin a durable location). */
  private def drain(df: DataFrame, tag: String): DataFrame = {
    val out = tempDir(s"${tag}_out")
    val ckpt = tempDir(s"${tag}_ckpt")
    val q = df.writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    deleteRecursively(ckpt)
    // `out` must outlive the returned (lazy) frame and is left to the OS
    // temp reaper; the staged inputs are the caller's to delete
    df.sparkSession.read.parquet(out)
  }

  private val SentinelType = "__graft_sentinel__"

  /** Watermarked tumbling-window aggregation over the events stream:
    * (win_start epoch-seconds, event_type, n_events, sum_value) per
    * 1-hour window, append mode, sentinel-flushed. Row-equal to the batch
    * `GROUP BY date_trunc('hour', ts), event_type`. */
  def windowAgg(spark: SparkSession, eventsPath: String,
      delay: String = "30 minutes"): DataFrame = {
    // the driver's parquet carries a no-timezone timestamp (reads as
    // TIMESTAMP_NTZ); cast once here so the staged schema, watermark, and
    // epoch conversion all run on TimestampType under the UTC session TZ
    val batch = spark.read.parquet(eventsPath)
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"), col("value"))
    val stage = tempDir("winagg_stage")
    val dataTmp = tempDir("winagg_data")
    batch.write.mode("overwrite").parquet(dataTmp)
    copyParts(spark, dataTmp, stage, "a-data")
    // sentinel 2h past the max event time: watermark = maxTs + 2h − delay
    // clears every real window end (≤ trunc(maxTs) + 1h), so the final
    // no-data micro-batch finalizes the full window set
    val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
    val sentTmp = tempDir("winagg_sent")
    import spark.implicits._
    Seq((new java.sql.Timestamp(maxTs.getTime + 2L * 3600 * 1000), SentinelType, 0.0))
      .toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(sentTmp)
    copyParts(spark, sentTmp, stage, "z-sentinel")

    val in = spark.readStream.schema(batch.schema).parquet(stage)
    val agg = in
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    val res = drain(agg, "winagg").filter(col("event_type") =!= SentinelType)
    Seq(stage, dataTmp, sentTmp).foreach(deleteRecursively)
    res
  }

  /** Open-session state for [[sessionize]]: timestamps in event-time
    * MICROS (exact — no float rounding against the oracle). Public:
    * encoder codegen must reach the accessors. */
  case class OpenSession(start: Long, last: Long, n: Long, idx: Long)
  case class SessionRow(user_id: Long, session_idx: Long,
      session_start: Long, session_end: Long, n_events: Long)

  /** Gap-based sessionization over the events stream via
    * `flatMapGroupsWithState` + event-time timeout — the custom-state
    * streaming surface: state = the one OPEN session per user, closed
    * sessions emit immediately (append-mode final), and the LAST session
    * of each user emits on timeout once the watermark passes its gap —
    * driven past end-of-input by the same sentinel flush as [[windowAgg]].
    * Output: (user_id, session_idx (1-based), session_start/end in epoch
    * micros, n_events); row-equal to the batch lag/cumsum window SQL.
    *
    * Scale + ordering contract: state is O(users), evicted by timeout;
    * events must arrive event-time-ordered ACROSS micro-batches per user
    * (in-batch order is sorted here; cross-batch reordering is exactly
    * what the watermark bounds — a production feed relies on
    * within-watermark ordering or reorders in a pre-stage). The bounded
    * drain stages a single data file so the backfill is one batch. */
  def sessionize(spark: SparkSession, eventsPath: String,
      gap: String = "30 minutes", delay: String = "30 minutes"): DataFrame = {
    val gapMicros = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
      .microseconds
    val batch = spark.read.parquet(eventsPath)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id").cast("long").as("user_id"))
    val stage = tempDir("sess_stage")
    val dataTmp = tempDir("sess_data")
    batch.coalesce(1).write.mode("overwrite").parquet(dataTmp)
    copyParts(spark, dataTmp, stage, "a-data")
    val maxTs = batch.agg(max(col("ts"))).head().getTimestamp(0)
    val sentTmp = tempDir("sess_sent")
    import spark.implicits._
    // sentinel far enough out that watermark = sentTs − delay clears every
    // real session's timeout (≤ maxTs + gap)
    Seq((new java.sql.Timestamp(maxTs.getTime + gapMicros / 1000 + 7200 * 1000L), -1L))
      .toDF("ts", "user_id").coalesce(1).write.mode("overwrite").parquet(sentTmp)
    copyParts(spark, sentTmp, stage, "z-sentinel")

    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // the watermarked `ts` column must flow INTO the stateful operator
    // (projecting it away strips the event-time tag and fails analysis),
    // so rows carry (user_id, ts, micros) and the logic reads the micros
    def fold(user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
        state: GroupState[OpenSession]): Iterator[SessionRow] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(SessionRow(user, s.idx, s.start, s.last, s.n))
      } else {
        val evs = rows.map(_._3).toArray.sorted
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
        var cur = state.getOption.orNull
        evs.foreach { t =>
          if (cur == null) cur = OpenSession(t, t, 1, 1)
          else if (t - cur.last > gapMicros) {
            out += SessionRow(user, cur.idx, cur.start, cur.last, cur.n)
            cur = OpenSession(t, t, 1, cur.idx + 1)
          } else cur = OpenSession(cur.start, t, cur.n + 1, cur.idx)
        }
        if (cur != null) {
          state.update(cur)
          state.setTimeoutTimestamp(cur.last / 1000 + gapMicros / 1000 + 1)
        }
        out.iterator
      }
    }

    val in = spark.readStream.schema(batch.schema).parquet(stage)
    val sessions = in
      .withWatermark("ts", delay)
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("micros"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
      .toDF()
    val res = drain(sessions, "sess").filter(col("user_id") >= 0)
    Seq(stage, dataTmp, sentTmp).foreach(deleteRecursively)
    res
  }

  /** Streaming exact-dedup filter over a doubled documents corpus: the
    * distinct md5 fingerprint set, emitted by first arrival through
    * `dropDuplicates` state. Collapses the 2n-row corpus to its n
    * distinct texts; only the key column is returned (first-seen payload
    * would be arrival-order-dependent). */
  def dedupExact(spark: SparkSession, documentsPath: String): DataFrame = {
    val docs = spark.read.parquet(documentsPath).select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(
      docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val stage = tempDir("dedup_stage")
    val dataTmp = tempDir("dedup_data")
    corpus.write.mode("overwrite").parquet(dataTmp)
    copyParts(spark, dataTmp, stage, "a-data")

    val in = spark.readStream.schema(corpus.schema).parquet(stage)
    val deduped = in
      .select(md5(col("text")).as("text_hash"))
      .dropDuplicates("text_hash")
    val res = drain(deduped, "dedup")
    Seq(stage, dataTmp).foreach(deleteRecursively)
    res
  }
}
