package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CAGRA graph optimization — the detour-counting prune + reverse-edge
  * augmentation of `cagra::optimize` (graph_core.cuh:206 kern_fused_prune,
  * detour counting :259-306; cagra.hpp:149-224: intermediate degree 128 ->
  * graph_degree 64).
  *
  * An edge (s,d) is "detourable" when a 2-hop path s->v->d exists whose
  * BOTH hops rank better (smaller dist) than (s,d) itself — such edges are
  * redundant for greedy search. Keep the `degree` least-detourable edges
  * per node, then add reverse edges to rebalance in-degree, capped at
  * `degree` per node again.
  *
  * Relational shape: one triangle join (edges x edges on the shared middle
  * node, joined back to the pruned edge) + two per-node top-k windows.
  */
object CagraOptimize {

  /** graph: (src, dst, dist); returns (src, dst, dist, rank) with
    * <= degree edges per src. */
  def optimize(graph: DataFrame, degree: Int): DataFrame = {
    val e = graph.select(col("src"), col("dst"), col("dist"))
    // detours: s->v (d1) and v->d (d2), both shorter than s->d
    val detours = e.as("sd")
      .join(e.as("sv"), col("sd.src") === col("sv.src"))
      .join(e.as("vd"), col("sv.dst") === col("vd.src") && col("vd.dst") === col("sd.dst"))
      .filter(col("sv.dist") < col("sd.dist") && col("vd.dist") < col("sd.dist"))
      .groupBy(col("sd.src").as("src"), col("sd.dst").as("dst"))
      .agg(count(lit(1)).as("detours"))
    val scored = e.join(detours, Seq("src", "dst"), "left")
      .withColumn("detours", coalesce(col("detours"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(col("detours").asc, col("dist").asc, col("dst").asc)
    val pruned = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= degree)
      .select(col("src"), col("dst"), col("dist"))
    // reverse-edge augmentation, then cap per-node degree again
    val augmented = pruned
      .unionByName(pruned.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
      .groupBy(col("src"), col("dst")).agg(min(col("dist")).as("dist"))
    val w2 = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(col("dist").asc, col("dst").asc)
    augmented.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= degree)
  }

  /** `optimize` with the connectivity guarantee (cagra.hpp:369-380,
    * `guarantee_connectivity` — "MST optimization ensures all vertices
    * stay reachable"): after the detour prune, any input-graph components
    * the prune split apart are re-bridged with MST edges of the ORIGINAL
    * graph (Borůvka, §2.4 machinery), so the result is exactly as
    * connected as the input. Bridge edges are appended in both directions
    * and may exceed `degree` for their endpoints — connectivity trumps the
    * cap, as in the reference. Consequently the returned `rank` column is
    * UNCAPPED (unlike `optimize`, whose output is filtered to
    * rank <= degree): it is the per-src ordering only, and bridge
    * endpoints can carry rank > degree. Labels stay DISTRIBUTED — bridge
    * candidates are selected by joining the edge list against the
    * component labels, and the only driver state is the O(#components)
    * union-find of the contracted Borůvka (at 1B nodes a per-vertex label
    * collect would OOM the driver; #components is tiny).
    */
  def optimizeConnected(graph: DataFrame, degree: Int): DataFrame = {
    val pruned = optimize(graph, degree).select(col("src"), col("dst"), col("dist"))
      .localCheckpoint()
    val verts = graph.select(col("src").as("id"))
      .unionByName(graph.select(col("dst").as("id"))).distinct()
    val labels = Components.connectedComponents(verts, pruned).localCheckpoint()
    val nComp = labels.select(col("component")).distinct().count()
    val bridges: Seq[(Long, Long, Double)] =
      if (nComp <= 1) Seq.empty
      else {
        // contract the pruned components: only the original graph's
        // cross-component edges are bridge candidates, tagged with their
        // endpoint labels via two distributed joins
        val cross = graph.select(col("src"), col("dst"), col("dist"))
          .join(labels.select(col("id").as("src"), col("component").as("csrc")), "src")
          .join(labels.select(col("id").as("dst"), col("component").as("cdst")), "dst")
          .filter(col("csrc") =!= col("cdst"))
        Components.boruvkaMstContracted(cross)
      }
    val spark = graph.sparkSession
    // dedup in BOTH branches so the two paths return the same shape even
    // if an upstream ever feeds duplicate (src, dst) rows
    val all = {
      val base =
        if (bridges.isEmpty) pruned
        else {
          import spark.implicits._
          val b = bridges.toDF("src", "dst", "dist")
          pruned.unionByName(b)
            .unionByName(b.select(col("dst").as("src"), col("src").as("dst"), col("dist")))
        }
      base.groupBy(col("src"), col("dst")).agg(min(col("dist")).as("dist"))
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      .orderBy(col("dist").asc, col("dst").asc)
    all.withColumn("rank", row_number().over(w))
  }

  /** ACE (Augmented Core Extraction) partitioned/disk CAGRA build — the
    * reference's out-of-core build mode (cagra.hpp:40-100 `ace_params`:
    * npartitions / ef_construction / build_dir / use_disk;
    * cagra_build.cuh:100-193: balanced k-means over a sample, then each
    * vector labeled with its closest [core] and second-closest
    * [augmented] partition; :1123 `build_ace`).
    *
    * Spark-first mapping: the label/gather/sub-build machinery IS
    * AllNeighbors with overlapFactor = 2 and the balanced coarse trainer
    * — partitions are shuffle partitions, oversized partitions tile into
    * bounded block-pair tasks, and "fits in memory" is delegated to
    * Spark's native spill instead of hand-managed host/GPU buffers.
    * Where the reference keeps only the core rows of every sub-build
    * (ace_adjust_sub_graph_ids), the relational merge keeps each row's
    * top-k over BOTH its cells — the candidates are already materialized,
    * and the result dominates core-only extraction at equal degree. The
    * intermediate kNN graph and the final detour-pruned graph are
    * persisted under `buildDir` as parquet (the build_dir/use_disk
    * artifacts); the returned frame reads the on-disk graph, so the
    * build never re-runs downstream and the artifacts outlive the
    * session, as on the reference's disk path.
    *
    * `intermediateDegree` (0 = 2·degree) is the per-partition build
    * width — the knob ef_construction turns on the reference's
    * incremental sub-builds. */
  def buildAce(df: DataFrame, npartitions: Int, buildDir: String,
      degree: Int = 32, intermediateDegree: Int = 0,
      metric: graft.core.Metric = graft.core.Metric.L2,
      idCol: String = "id", vecCol: String = "vec",
      partitionRowBudget: Int = 25000): DataFrame = {
    require(npartitions >= 2, s"ACE needs >= 2 partitions, got $npartitions")
    require(partitionRowBudget > 0,
      s"partitionRowBudget must be positive, got $partitionRowBudget")
    val spark = df.sparkSession
    val kBuild = if (intermediateDegree > 0) intermediateDegree else 2 * degree
    // The reference sizes ACE partitions by a MEMORY budget, not a fixed
    // count (cagra.hpp:47-66: npartitions chosen so each partition fits
    // device memory) — per-partition build work stays bounded and the
    // total grows linearly with n. Mirror that: the caller's npartitions
    // is a floor, and the effective count rises so no cell exceeds
    // `partitionRowBudget` rows (the per-cell pair scan is quadratic in
    // cell size — ScaleSmoke measured 160 s at 200k/8 parts but 1076 s at
    // 500k/8 parts before this cap, ~400 s after). The input is
    // materialized first so the sizing count() doesn't evaluate an
    // expensive upstream pipeline a second time — this path exists for
    // exactly the out-of-core inputs where that matters.
    val input = graft.core.Frames.materialize(df)
    val effParts = math.max(npartitions,
      ((input.count() + partitionRowBudget - 1) / partitionRowBudget).toInt)
    val knn = AllNeighbors.build(input,
      AllNeighbors.Params(k = kBuild, nClusters = effParts,
        overlapFactor = 2, metric = metric, balanced = true),
      idCol, vecCol)
    val knnPath = s"$buildDir/knn_graph.parquet"
    knn.write.mode("overwrite").parquet(knnPath)
    graft.core.Frames.release(input)
    val opt = optimize(
      spark.read.parquet(knnPath).select(col("src"), col("dst"), col("dist")),
      degree)
    val optPath = s"$buildDir/optimized_graph.parquet"
    opt.write.mode("overwrite").parquet(optPath)
    spark.read.parquet(optPath)
  }
}
