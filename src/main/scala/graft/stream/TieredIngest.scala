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
  * a committed-batch ledger (`delta_commits`: scope, batch_id, n_rows)
  * records what landed. The SCOPE is the stream's checkpoint location:
  * Structured Streaming batchIds are only unique per checkpoint, so a
  * rebuilt checkpoint (or a second pipeline into the same layout) starts a
  * fresh id namespace instead of silently colliding with — and being
  * skipped as replays of — the old one. A replayed (scope, batchId) found
  * in the ledger skips the data write and only re-derives the sidecars
  * from the ledger — which also covers a crash BETWEEN the ledger write
  * and the sidecar writes (the write order is data → ledger → sidecars,
  * each step idempotent given the previous). The one-row sidecar rewrites
  * go through a staged-rename (write aside, swap in) so a crash cannot
  * leave a half-written parquet directory behind; a reader that still
  * catches the swap window treats the ledger as absent and re-derives —
  * the engine only ever redelivers the LAST batch, whose rows are by
  * construction not yet in the pre-crash sidecar value, so the re-derived
  * counts stay exact.
  *
  * AUTO-PROMOTION: after each refresh the delta population is checked
  * against the layout's `min_ann_rows` and, once crossed, the delta is
  * folded into the ANN tier in place (`TieredIndex.compactInPlace`) — the
  * reference's `create_ann_index_on_extend` contract (tiered_index.hpp:
  * 59-67, 105, 136). Without it a long-running ingest grows the
  * exact-scan delta without bound. The committed batch ids survive
  * compaction as a zeroed ledger written into the swapped-in layout, so
  * a post-compaction redelivery is still recognized. NOTE: the in-place
  * swap is two directory renames — queries EXECUTING over the layout in
  * exactly that window can fail and must retry (Spark re-plans on the
  * swapped-in layout); deployments serving queries concurrently with
  * ingest should either tolerate that retry or set
  * `spark.graft.tiered.autoCompact.enabled=false` and compact at quiet
  * points. Opting out never loses data — only the delta grows.
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
    * sum of the ledger's n_rows column. */
  private val BaseKey: (String, Long) = ("", -1L)

  private def ledgerPath(indexPath: String) = s"$indexPath/delta_commits"

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** The committed-batch ledger, keyed by (scope, batch_id); initialized
    * from the CURRENT `tiered_meta.delta_rows` (authoritative as of the
    * save / the last legacy append) when no ledger exists. An unreadable
    * ledger (a crash caught the staged-rename window) is treated the same
    * way — see the class doc for why the re-derived counts stay exact on
    * the engine's only real redelivery (the last batch). */
  private def readLedger(spark: SparkSession,
      indexPath: String): Map[(String, Long), Long] =
    if (!exists(spark, ledgerPath(indexPath)))
      Map(BaseKey -> metaDeltaRows(spark, indexPath))
    else
      try {
        val df = spark.read.parquet(ledgerPath(indexPath))
        val scoped = df.schema.fieldNames.contains("scope")
        df.select(
            (if (scoped) col("scope") else lit("")).cast("string").as("scope"),
            col("batch_id").cast("long"), col("n_rows").cast("long"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"graft TieredIngest: unreadable delta_commits at " +
            s"$indexPath (${e.getClass.getSimpleName}) — re-deriving from tiered_meta")
          Map(BaseKey -> metaDeltaRows(spark, indexPath))
      }

  /** Staged-rename one-row parquet write: never leaves a half-written
    * target directory (the crash windows leave either the old content or
    * no directory — both states readers handle). */
  private def atomicOneRowWrite(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val staged = target + ".staged"
    df.coalesce(1).write.mode("overwrite").parquet(staged)
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(target), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(staged),
        new org.apache.hadoop.fs.Path(target)),
      s"sidecar swap failed at $target")
  }

  private def writeLedger(spark: SparkSession, indexPath: String,
      ledger: Map[(String, Long), Long]): Unit = {
    import spark.implicits._
    atomicOneRowWrite(
      ledger.toSeq.map { case ((sc, id), n) => (sc, id, n) }
        .toDF("scope", "batch_id", "n_rows"),
      ledgerPath(indexPath))
  }

  /** Carry the committed batch keys through an in-place compaction as a
    * zeroed ledger (the rows now live in the ANN tier; a post-compaction
    * redelivery must still be recognized). Written into the compacted
    * layout BEFORE the directory swap (TieredIndex.compactInPlace's
    * beforeSwap hook). */
  private def writeZeroedLedger(spark: SparkSession, intoPath: String,
      committed: Set[(String, Long)]): Unit =
    if (committed.nonEmpty)
      writeLedger(spark, intoPath,
        committed.map(_ -> 0L).toMap + (BaseKey -> 0L))

  /** Current delta population per the sidecar; a legacy layout without
    * the delta_rows column counts the delta's ROOT files only (batch
    * directories are excluded: a crash-orphaned batch dir must not be
    * folded into the base entry AND re-added when its batch replays). */
  private def metaDeltaRows(spark: SparkSession, indexPath: String): Long = {
    val meta = spark.read.parquet(s"$indexPath/tiered_meta").head()
    if (meta.schema.fieldNames.contains("delta_rows"))
      meta.getAs[Long]("delta_rows")
    else {
      val total = TieredIndex.readDelta(spark, indexPath).count()
      total - batchDirRows(spark, indexPath)
    }
  }

  private def batchDirRows(spark: SparkSession, indexPath: String): Long = {
    val delta = new org.apache.hadoop.fs.Path(s"$indexPath/delta")
    val fs = delta.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(delta)) 0L
    else {
      val dirs = fs.listStatus(delta)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch-"))
        .map(_.getPath.toString)
      if (dirs.isEmpty) 0L
      else spark.read.parquet(dirs.toIndexedSeq: _*).count()
    }
  }

  /** Append one micro-batch of (idCol, vecCol) rows + refresh the
    * sidecars. `batchId >= 0` (the streaming sink always passes one)
    * engages the idempotent per-batch-directory protocol above, with
    * `scope` naming the batchId's namespace (the sink passes its
    * checkpoint location; direct callers managing their own ids may leave
    * it empty). `batchId < 0` is the direct-call path for ad-hoc appends,
    * which has no replay to defend against and keeps the plain
    * `mode("append")` write + full recount. */
  def append(batch: DataFrame, indexPath: String,
      idCol: String = "id", vecCol: String = "vec",
      batchId: Long = -1L, scope: String = ""): Unit =
    lockFor(indexPath).synchronized {
      val spark = batch.sparkSession
      val shaped = batch
        .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      val key = (normalize(scope), batchId)
      val stats: (Long, Long) =
        if (batchId >= 0) {
          val ledger = readLedger(spark, indexPath)
          if (ledger.contains(key)) {
            // at-least-once redelivery of an already-committed batch: the
            // data and ledger landed last time — only the sidecars might
            // be stale (crash between ledger and sidecar writes), so
            // re-derive them and land nothing
            writeSidecars(spark, indexPath, ledger.values.sum)
          } else {
            // overwrite = idempotent under replay AND under a crashed
            // partial write of this very directory
            shaped.write.mode("overwrite")
              .parquet(s"$indexPath/delta/batch-$batchId")
            val n = spark.read
              .parquet(s"$indexPath/delta/batch-$batchId").count()
            val grown = ledger + (key -> n)
            writeLedger(spark, indexPath, grown)
            writeSidecars(spark, indexPath, grown.values.sum)
          }
        } else {
          shaped.write.mode("append").parquet(s"$indexPath/delta")
          refreshSidecars(spark, indexPath)
        }
      maybeCompact(spark, indexPath, stats._1, stats._2)
    }

  /** Rewrite `tiered_meta` (delta population) and the top-level
    * combined-population `meta` — the two numbers the kNN-join planner
    * reads at rewrite time. Returns (deltaRows, minAnnRows) so the
    * compaction trigger needs no extra sidecar read. */
  private def writeSidecars(spark: SparkSession, indexPath: String,
      deltaRows: Long): (Long, Long) = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$indexPath/tiered_meta").head()
    val minAnnRows = meta.getAs[Long]("min_ann_rows")
    atomicOneRowWrite(
      Seq((minAnnRows, meta.getAs[String]("metric"), deltaRows))
        .toDF("min_ann_rows", "metric", "delta_rows"),
      s"$indexPath/tiered_meta")
    val baseRows = IvfFlatIndex.loadMeta(spark, s"$indexPath/tiered_base").getOrElse(0L)
    IvfFlatIndex.saveMeta(spark, indexPath, baseRows + deltaRows)
    (deltaRows, minAnnRows)
  }

  /** Full-recount sidecar refresh — the legacy/direct-append path and the
    * repair tool for a layout whose delta was modified out of band. Also
    * re-bases the ledger so later streaming batches stay incremental. */
  def refreshSidecars(spark: SparkSession, indexPath: String): (Long, Long) = {
    val deltaRows = TieredIndex.readDelta(spark, indexPath).count()
    val stats = writeSidecars(spark, indexPath, deltaRows)
    if (exists(spark, ledgerPath(indexPath))) {
      val batches = readLedger(spark, indexPath) - BaseKey
      writeLedger(spark, indexPath,
        batches + (BaseKey -> (deltaRows - batches.values.sum)))
    }
    stats
  }

  /** The reference's `create_ann_index_on_extend` trigger: once the delta
    * crosses `min_ann_rows`, fold it into the ANN tier in place (the
    * compacted save re-measures the recall curve and resets delta_rows to
    * 0). The committed batch keys survive compaction as a ZEROED ledger
    * written into the compacted layout BEFORE the directory swap — a
    * post-compaction redelivery of an already-folded batch must still be
    * recognized and skipped, or the replay would duplicate rows the ANN
    * tier now owns. */
  private def maybeCompact(spark: SparkSession, indexPath: String,
      deltaRows: Long, minAnnRows: Long): Unit =
    if (deltaRows >= minAnnRows &&
        spark.conf.get("spark.graft.tiered.autoCompact.enabled", "true").toBoolean) {
      val committed =
        if (exists(spark, ledgerPath(indexPath)))
          readLedger(spark, indexPath).keySet - BaseKey
        else Set.empty[(String, Long)]
      TieredIndex.compactInPlace(spark, indexPath,
        tmp => writeZeroedLedger(spark, tmp, committed))
      // the layout changed UNDER any live registration: drop the
      // planner's memoized sidecar statistics so routed queries read
      // the compacted population/curve, not the pre-swap values
      graft.plans.GraftIndexCatalog.invalidateStats()
    }

  /** `foreachBatch` sink over an (idCol, vecCol) stream into the saved
    * layout at `indexPath`. The caller drives the stream (addData /
    * processAllAvailable on a test source, or a real file/kafka source)
    * and re-registers the layout when it wants the planner to see the
    * appended rows (register drops the planner's sidecar memos). The
    * engine's (checkpoint, batchId) pair keys the idempotence protocol —
    * a restart on the SAME checkpoint that redelivers the last
    * uncommitted batch lands it exactly once, and a rebuilt checkpoint
    * starts a fresh id namespace instead of colliding with the old. */
  def sink(stream: DataFrame, indexPath: String, checkpoint: String,
      idCol: String = "id", vecCol: String = "vec"): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch, indexPath, idCol, vecCol, batchId = batchId,
          scope = checkpoint)
      }
      .start()
}
