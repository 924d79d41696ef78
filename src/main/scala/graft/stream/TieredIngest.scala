package graft.stream

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
  * live-appended rows with zero ANN-tier work. The base tier, its
  * centroids, and its measured recall curve are untouched — the delta is
  * scanned EXACTLY regardless of probes, so the layout's probe/recall
  * contract still holds at any delta size; `TieredIndex.load(...).
  * maybeCompact()` folds a grown delta into the cells when it crosses the
  * threshold (the `tiered_compact_search` lifecycle).
  *
  * 100 TB posture: each append is one partitioned parquet write of the
  * micro-batch plus two one-row sidecar rewrites — no shuffle, no index
  * rebuild, no read of the base tier. The delta-population count reads
  * only the delta directory (the freshly-appended tier, small by the
  * compaction contract).
  */
object TieredIngest {

  /** Append one batch of (idCol, vecCol) rows + refresh the sidecars.
    * Micro-batches of one streaming query arrive serially; the lock only
    * guards against two concurrent ingests into one layout interleaving
    * the sidecar rewrite. */
  def append(batch: DataFrame, indexPath: String,
      idCol: String = "id", vecCol: String = "vec"): Unit = synchronized {
    batch.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .write.mode("append").parquet(s"$indexPath/delta")
    refreshSidecars(batch.sparkSession, indexPath)
  }

  /** Rewrite `tiered_meta` (new delta population) and the top-level
    * combined-population `meta` from the on-disk tiers — the two numbers
    * the kNN-join planner reads at rewrite time. */
  def refreshSidecars(spark: SparkSession, indexPath: String): Unit = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$indexPath/tiered_meta").head()
    val deltaRows = spark.read.parquet(s"$indexPath/delta").count()
    Seq((meta.getAs[Long]("min_ann_rows"), meta.getAs[String]("metric"), deltaRows))
      .toDF("min_ann_rows", "metric", "delta_rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/tiered_meta")
    val baseRows = IvfFlatIndex.loadMeta(spark, s"$indexPath/tiered_base").getOrElse(0L)
    IvfFlatIndex.saveMeta(spark, indexPath, baseRows + deltaRows)
  }

  /** `foreachBatch` sink over an (idCol, vecCol) stream into the saved
    * layout at `indexPath`. The caller drives the stream (addData /
    * processAllAvailable on a test source, or a real file/kafka source)
    * and re-registers the layout when it wants the planner to see the
    * appended rows (register drops the planner's sidecar memos). */
  def sink(stream: DataFrame, indexPath: String, checkpoint: String,
      idCol: String = "id", vecCol: String = "vec"): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        append(batch, indexPath, idCol, vecCol)
      }
      .start()
}
