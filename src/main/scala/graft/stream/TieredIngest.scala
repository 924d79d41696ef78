package graft.stream

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.IvfFlatIndex

/** Streaming append INTO a saved tiered layout — the full streaming-ingest
  * story of `cuvs::neighbors::tiered_index` (tiered_index.hpp:59-67:
  * "extend adds to the incremental [brute-force] index"; the ANN tier is
  * only rebuilt by compaction): a `foreachBatch` sink lands each
  * micro-batch in the layout's delta-tier parquet and refreshes the
  * planner sidecars (`tiered_meta.delta_rows` + the combined-population
  * `meta`), so re-registering the layout routes kNN joins over the
  * live-appended rows with zero ANN-tier work.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once redelivery: each
  * micro-batch lands in its own `delta/batch-<batchId>/` directory with
  * OVERWRITE semantics (a replay rewrites the same rows, never duplicates
  * them — partial writes from a crashed attempt are overwritten too), and
  * a committed-batch ledger (`delta_commits`: batch_id, n_rows) records
  * what landed. A replayed batchId found in the ledger skips the data
  * write and only re-derives the sidecars from the ledger — which also
  * covers a crash BETWEEN the ledger write and the sidecar writes
  * (the write order is data → ledger → sidecars, each step idempotent
  * given the previous).
  *
  * AUTO-PROMOTION: after each refresh the delta population is checked
  * against the layout's `min_ann_rows` and, once crossed, the delta is
  * folded into the ANN tier in place (`TieredIndex.compactInPlace`) — the
  * reference's `create_ann_index_on_extend` contract (tiered_index.hpp:
  * 59-67, 105, 136). Without it a long-running ingest grows the
  * exact-scan delta without bound. Opt out per session with
  * `spark.graft.tiered.autoCompact.enabled=false`.
  *
  * 100 TB posture: each append is one partitioned parquet write of the
  * micro-batch plus three one-row sidecar rewrites — no shuffle, no index
  * rebuild, no read of the base tier, and the delta-population refresh is
  * INCREMENTAL (previous ledger sum + this batch's count), never a
  * re-count of the whole delta directory — O(batch) per batch, not
  * O(total-appended). Compaction bounds the delta's exact-scan cost.
  */
object TieredIngest {

  /** Per-layout locks: two concurrent ingests into ONE layout must not
    * interleave the ledger/sidecar read-modify-write; ingests into
    * UNRELATED layouts share nothing and proceed in parallel. The lock is
    * per-JVM — concurrent ingest into one layout from DIFFERENT processes
    * is unsupported (as is any multi-writer parquet sidecar rewrite). */
  private val locks = new ConcurrentHashMap[String, Object]()
  private def lockFor(indexPath: String): Object =
    locks.computeIfAbsent(normalize(indexPath), _ => new Object)
  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  /** Ledger key for the rows that were in the delta BEFORE the first
    * ledger-tracked batch (the save-time delta + any legacy direct
    * appends) — kept as a pseudo-batch so delta_rows is always the plain
    * sum of the ledger column. */
  private val BaseEntry = -1L

  private def ledgerPath(indexPath: String) = s"$indexPath/delta_commits"

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** The committed-batch ledger; initialized from the CURRENT
    * `tiered_meta.delta_rows` (authoritative as of the save / the last
    * legacy append) when no ledger exists yet. */
  private def readLedger(spark: SparkSession, indexPath: String): Map[Long, Long] =
    if (!exists(spark, ledgerPath(indexPath)))
      Map(BaseEntry -> metaDeltaRows(spark, indexPath))
    else spark.read.parquet(ledgerPath(indexPath))
      .select(col("batch_id").cast("long"), col("n_rows").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def writeLedger(spark: SparkSession, indexPath: String,
      ledger: Map[Long, Long]): Unit = {
    import spark.implicits._
    ledger.toSeq.toDF("batch_id", "n_rows")
      .coalesce(1).write.mode("overwrite").parquet(ledgerPath(indexPath))
  }

  private def metaDeltaRows(spark: SparkSession, indexPath: String): Long = {
    val meta = spark.read.parquet(s"$indexPath/tiered_meta").head()
    if (meta.schema.fieldNames.contains("delta_rows"))
      meta.getAs[Long]("delta_rows")
    else TieredIndex.readDelta(spark, indexPath).count()
  }

  /** Append one micro-batch of (idCol, vecCol) rows + refresh the
    * sidecars. `batchId >= 0` (the streaming sink always passes one)
    * engages the idempotent per-batch-directory protocol above;
    * `batchId < 0` is the direct-call path for ad-hoc appends, which has
    * no replay to defend against and keeps the plain `mode("append")`
    * write + full recount. */
  def append(batch: DataFrame, indexPath: String,
      idCol: String = "id", vecCol: String = "vec",
      batchId: Long = -1L): Unit = lockFor(indexPath).synchronized {
    val spark = batch.sparkSession
    val shaped = batch
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    if (batchId >= 0) {
      val ledger = readLedger(spark, indexPath)
      if (ledger.contains(batchId)) {
        // at-least-once redelivery of an already-committed batch: the
        // data and ledger landed last time — only the sidecars might be
        // stale (crash between ledger and sidecar writes), so re-derive
        // them and return without touching the data
        writeSidecars(spark, indexPath, ledger.values.sum)
      } else {
        // overwrite = idempotent under replay AND under a crashed
        // partial write of this very directory
        shaped.write.mode("overwrite")
          .parquet(s"$indexPath/delta/batch-$batchId")
        val n = spark.read
          .parquet(s"$indexPath/delta/batch-$batchId").count()
        val grown = ledger + (batchId -> n)
        writeLedger(spark, indexPath, grown)
        writeSidecars(spark, indexPath, grown.values.sum)
      }
    } else {
      shaped.write.mode("append").parquet(s"$indexPath/delta")
      refreshSidecars(spark, indexPath)
    }
    maybeCompact(spark, indexPath)
  }

  /** Rewrite `tiered_meta` (delta population) and the top-level
    * combined-population `meta` — the two numbers the kNN-join planner
    * reads at rewrite time. */
  private def writeSidecars(spark: SparkSession, indexPath: String,
      deltaRows: Long): Unit = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$indexPath/tiered_meta").head()
    Seq((meta.getAs[Long]("min_ann_rows"), meta.getAs[String]("metric"), deltaRows))
      .toDF("min_ann_rows", "metric", "delta_rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/tiered_meta")
    val baseRows = IvfFlatIndex.loadMeta(spark, s"$indexPath/tiered_base").getOrElse(0L)
    IvfFlatIndex.saveMeta(spark, indexPath, baseRows + deltaRows)
  }

  /** Full-recount sidecar refresh — the legacy/direct-append path and the
    * repair tool for a layout whose delta was modified out of band. Also
    * re-bases the ledger so later streaming batches stay incremental. */
  def refreshSidecars(spark: SparkSession, indexPath: String): Unit = {
    val deltaRows = TieredIndex.readDelta(spark, indexPath).count()
    writeSidecars(spark, indexPath, deltaRows)
    if (exists(spark, ledgerPath(indexPath))) {
      val batches = readLedger(spark, indexPath) - BaseEntry
      writeLedger(spark, indexPath,
        batches + (BaseEntry -> (deltaRows - batches.values.sum)))
    }
  }

  /** The reference's `create_ann_index_on_extend` trigger: once the delta
    * crosses `min_ann_rows`, fold it into the ANN tier in place (the
    * compacted save re-measures the recall curve and resets delta_rows to
    * 0). The committed batch ids survive compaction as a ZEROED ledger
    * written into the compacted layout BEFORE the directory swap — a
    * post-compaction redelivery of an already-folded batch must still be
    * recognized and skipped, or the replay would duplicate rows the ANN
    * tier now owns. */
  private def maybeCompact(spark: SparkSession, indexPath: String): Unit =
    if (spark.conf.get("spark.graft.tiered.autoCompact.enabled", "true").toBoolean) {
      val meta = spark.read.parquet(s"$indexPath/tiered_meta").head()
      if (meta.schema.fieldNames.contains("delta_rows") &&
          meta.getAs[Long]("delta_rows") >= meta.getAs[Long]("min_ann_rows")) {
        val committed =
          if (exists(spark, ledgerPath(indexPath)))
            readLedger(spark, indexPath).keySet - BaseEntry
          else Set.empty[Long]
        TieredIndex.compactInPlace(spark, indexPath, tmp =>
          if (committed.nonEmpty)
            writeLedger(spark, tmp,
              committed.map(_ -> 0L).toMap + (BaseEntry -> 0L)))
      }
    }

  /** `foreachBatch` sink over an (idCol, vecCol) stream into the saved
    * layout at `indexPath`. The caller drives the stream (addData /
    * processAllAvailable on a test source, or a real file/kafka source)
    * and re-registers the layout when it wants the planner to see the
    * appended rows (register drops the planner's sidecar memos). The
    * engine's batchId keys the idempotence protocol — a restart that
    * redelivers the last uncommitted batch lands it exactly once. */
  def sink(stream: DataFrame, indexPath: String, checkpoint: String,
      idCol: String = "id", vecCol: String = "vec"): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch, indexPath, idCol, vecCol, batchId = batchId)
      }
      .start()
}
