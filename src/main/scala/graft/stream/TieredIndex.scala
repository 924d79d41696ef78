package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.index.IvfFlatIndex
import graft.ops.{BruteForceKnn, Refine}

/** Tiered index — `cuvs::neighbors::tiered_index` (tiered_index.hpp:59-136):
  * an ANN tier (IVF-Flat) plus an append-only brute-force delta tier;
  * `extend` lands new vectors in the delta, search unions the pruned ANN
  * search with an exact scan of the (small) delta, and `compact` folds the
  * delta into the ANN tier once it crosses `minAnnRows`.
  *
  * This is the Delta-table pattern of SURVEY.md §1.1/§2.7: base = the big
  * immutable partitioned table, delta = the streaming append target
  * (Structured Streaming foreachBatch calls `extend` per micro-batch —
  * the `dynamic_batching` amortization analog, dynamic_batching.hpp:79).
  */
class TieredIndex private (
    val base: IvfFlatIndex,
    val delta: DataFrame, // (id long, vec array<float>)
    val minAnnRows: Long,
    val metric: Metric,
    // delta population when KNOWN WITHOUT A JOB (a freshly-loaded saved
    // layout reads it from the meta sidecar) — the kNN-join planner
    // constructs the search at REWRITE time, and delta.isEmpty there
    // would run a Spark job inside the optimizer per re-optimization;
    // None (live extend() chains) falls back to the isEmpty probe
    private val knownDeltaRows: Option[Long] = None) extends Serializable {

  /** Union of ANN-tier search (nProbes pruning) and exact delta scan,
    * re-merged per query — knn_merge_parts across tiers. */
  def search(queries: DataFrame, k: Int, nProbes: Int,
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val fromBase = base.search(queries, k, nProbes, qidCol, qvecCol)
    if (knownDeltaRows.map(_ == 0L).getOrElse(delta.isEmpty)) fromBase
    else {
      val fromDelta = BruteForceKnn.knnJoin(delta, queries, k, metric,
        "id", "vec", qidCol, qvecCol)
      Refine.mergeParts(k, metric, fromBase, fromDelta)
    }
  }

  /** Append new vectors to the delta tier (no retraining). */
  def extend(newData: DataFrame, idCol: String = "id", vecCol: String = "vec"): TieredIndex =
    new TieredIndex(base,
      delta.unionByName(newData.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("vec"))),
      minAnnRows, metric)

  def deltaRows: Long = delta.count()

  /** Fold the delta into the ANN tier: assign delta rows to the existing
    * cells (centers fixed — the reference's extend-into-lists semantics);
    * returns an empty-delta index. */
  def compact(): TieredIndex =
    new TieredIndex(base.extend(delta, "id", "vec"),
      delta.filter(lit(false)), minAnnRows, metric)

  /** Compact automatically once the delta tier crosses minAnnRows. */
  def maybeCompact(): TieredIndex =
    if (deltaRows >= minAnnRows) compact() else this

  /** Persist as a layout the kNN-join planner can route
    * (tiered_index.hpp:59-136 as a directory): the ANN tier is a full
    * IVF-Flat layout under `tiered_base/` (own sidecars), the delta an
    * (id, vec) parquet, plus the planner sidecars at top level — the
    * TOTAL population (base + delta) and the base tier's measured recall
    * curve (the ANN tier governs the probe/recall relation; the delta is
    * scanned exactly regardless of probes). */
  def save(path: String): Unit = {
    val spark = delta.sparkSession
    base.save(s"$path/tiered_base")
    delta.select(col("id").cast("long"), col("vec"))
      .write.mode("overwrite").parquet(s"$path/delta")
    import spark.implicits._
    val deltaRows = delta.count()
    Seq((minAnnRows, metric.name, deltaRows))
      .toDF("min_ann_rows", "metric", "delta_rows")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/tiered_meta")
    val baseRows = IvfFlatIndex.loadMeta(spark, s"$path/tiered_base").getOrElse(0L)
    IvfFlatIndex.saveMeta(spark, path, baseRows + deltaRows)
    // copy the base tier's curve sidecar verbatim (all columns — the
    // n_queries/k sample size feeds the planner's Wilson-bound inversion)
    val baseCurve = new org.apache.hadoop.fs.Path(s"$path/tiered_base", "recall_curve")
    if (baseCurve.getFileSystem(spark.sessionState.newHadoopConf()).exists(baseCurve))
      spark.read.parquet(baseCurve.toString)
        .coalesce(1).write.mode("overwrite").parquet(s"$path/recall_curve")
  }
}

object TieredIndex {
  def build(dataset: DataFrame, params: IvfFlatIndex.Params, minAnnRows: Long = 100000L,
      idCol: String = "id", vecCol: String = "vec"): TieredIndex = {
    val base = IvfFlatIndex.build(dataset, params, idCol, vecCol)
    val emptyDelta = dataset
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .filter(lit(false))
    new TieredIndex(base, emptyDelta, minAnnRows, params.metric)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): TieredIndex = {
    recoverSwap(spark, path)
    val meta = TieredIngest.readOneRowSidecar(spark, s"$path/tiered_meta")
    val base = IvfFlatIndex.load(spark, s"$path/tiered_base")
    // legacy saves predate the delta_rows column — fall back to the probe
    val deltaRows =
      if (meta.schema.fieldNames.contains("delta_rows"))
        Some(meta.getAs[Long]("delta_rows"))
      else None
    new TieredIndex(base, readDelta(spark, path),
      meta.getAs[Long]("min_ann_rows"), Metric.fromName(meta.getAs[String]("metric")),
      deltaRows)
  }

  /** The delta tier as a frame. Streaming ingest lands each micro-batch
    * in its own `delta/batch-<id>/` subdirectory (the idempotent-replay
    * protocol, TieredIngest doc) alongside whatever flat files the save /
    * direct appends wrote at the delta root, so the read must recurse —
    * `recursiveFileLookup` picks up both shapes in one listing. */
  private[stream] def readDelta(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(s"$path/delta")
      .select(col("id").cast("long").as("id"), col("vec"))

  /** Fold the delta into the ANN tier IN PLACE — the auto-promotion step
    * of the reference's tiered lifecycle (tiered_index.hpp:59-67
    * `create_ann_index_on_extend`, :105, :136). The compacted layout is
    * SAVED to a sibling temp directory first (its inputs still read from
    * the live one — never an overwrite of a path being read), including
    * the re-measured recall curve, then swapped in with two renames; the
    * old layout survives as `<path>.compact_old` only inside the swap
    * window. `beforeSwap` runs against the fully-saved temp directory so
    * callers can add sidecars (TieredIngest carries its zeroed commit
    * ledger through) that become visible ATOMICALLY with the compaction. */
  def compactInPlace(spark: org.apache.spark.sql.SparkSession, path: String,
      beforeSwap: String => Unit = _ => ()): Unit = {
    // clear a stale tmp from a compaction attempt that crashed before its
    // swap (done here, not in recoverSwap — a concurrent reader must never
    // delete the tmp of an IN-FLIGHT compaction)
    {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(path + ".compact_tmp"), true)
    }
    load(spark, path).compact().save(path + ".compact_tmp")
    beforeSwap(path + ".compact_tmp")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val real = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".compact_old")
    fs.delete(old, true)
    require(fs.rename(real, old),
      s"compactInPlace: could not move the live layout aside at $path")
    if (!fs.rename(tmp, real)) {
      // second rename failed after the first succeeded: put the
      // pre-compaction layout back so the path never stays empty
      val rolledBack = fs.rename(old, real)
      throw new IllegalStateException(
        s"compactInPlace: directory swap failed at $path" +
          (if (rolledBack) " (pre-compaction layout rolled back)"
           else s" AND rollback failed — restore manually from $path.compact_old"))
    }
    fs.delete(old, true)
  }

  /** Crash recovery for the compactInPlace swap window: a crash between
    * the two renames leaves NO layout at `path` but an intact one at
    * `<path>.compact_old` — restore it (losing only the compaction, never
    * data: the delta rows are still in the restored delta tier). The
    * restore is strictly NON-DESTRUCTIVE: it never deletes anything, and
    * it only attempts the rename while `path` is absent — so a reader
    * racing an IN-FLIGHT swap (which shows the same transient state) can
    * at worst lose the rename race to the swap's own second rename and
    * then observe the freshly-compacted layout; it can never remove one.
    * A stale `.compact_tmp` is cleaned by the next compaction attempt
    * itself, for the same reason. Called on every load and every ingest
    * append. */
  private[stream] def recoverSwap(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def healthy(p: org.apache.hadoop.fs.Path): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(p, "tiered_meta"))
    val real = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + ".compact_old")
    if (healthy(real) || !fs.exists(old) || !healthy(old)) return
    // grace recheck: an in-flight swap usually finishes within the sleep,
    // in which case there is nothing to do
    Thread.sleep(200)
    if (healthy(real)) return
    if (!fs.exists(real) && fs.exists(old) && healthy(old) &&
        fs.rename(old, real)) {
      System.err.println(s"graft TieredIndex: restored $path from an " +
        "interrupted compaction swap (the compaction will re-run at the " +
        "next threshold crossing)")
      return
    }
    // the rename lost a race to the swap completing (or the state moved
    // under us) — only an unhealthy final state is an error
    require(healthy(real),
      s"compactInPlace recovery: no layout at $path and could not restore " +
        s"from $path.compact_old")
  }
}
