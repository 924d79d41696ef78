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
