package graft.graphops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components + single-linkage clustering over edge lists —
  * the flat-cluster side of `cuvs::cluster::agglomerative`
  * (agglomerative.hpp:107 single_linkage, :191-222 build_linkage; the
  * reference also builds the dendrogram "on the host", :251 — validating
  * the driver-side union-find here).
  */
object Components {

  /** Min-label propagation connected components: (id, component) where
    * component = smallest reachable id. Iterative join with
    * localCheckpoint per round (SURVEY.md §7.4 hard part 1); rounds =
    * O(graph diameter) — for near-dup clusters (tiny components) this is
    * 2-3 rounds regardless of data size. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      idCol: String = "id", srcCol: String = "src", dstCol: String = "dst",
      maxIterations: Int = 20): DataFrame = {
    val und = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionByName(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .distinct().localCheckpoint()
    var labels = vertices.select(col(idCol).cast("long").as("id"))
      .withColumn("component", col("id")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIterations) {
      val nbrMin = und.join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id")).agg(min(col("component")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
        .localCheckpoint()
      changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.component") =!= col("o.component")).count()
      labels = next
      it += 1
    }
    labels
  }

  /** Distributed Borůvka MST: every component proposes its minimum
    * outgoing edge per round; proposals (≤ #components, shrinking
    * geometrically) collect to the driver where union-find merges them —
    * the reference's host-side dendrogram build, distributed edge scan.
    * Returns MST edges (src, dst, dist). */
  def boruvkaMst(vertices: DataFrame, edges: DataFrame,
      idCol: String = "id", maxRounds: Int = 20): Seq[(Long, Long, Double)] = {
    val vs = vertices.select(col(idCol).cast("long").as("id")).collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(vs.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"), col("dist"))
      .localCheckpoint()
    val mst = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var rounds = 0
    var merged = 1
    while (merged > 0 && rounds < maxRounds) {
      val comp = parent.keys.map(v => v -> find(v)).toMap
      val compDf = e.sparkSession.createDataFrame(comp.toSeq).toDF("id", "comp")
      val prop = e
        .join(compDf.select(col("id").as("src"), col("comp").as("csrc")), "src")
        .join(compDf.select(col("id").as("dst"), col("comp").as("cdst")), "dst")
        .filter(col("csrc") =!= col("cdst"))
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("csrc"))
          .orderBy(col("dist").asc, col("src").asc, col("dst").asc)))
        .filter(col("rk") === 1)
        .select(col("src"), col("dst"), col("dist")).collect()
      merged = 0
      prop.sortBy(r => (r.getDouble(2), r.getLong(0), r.getLong(1))).foreach { r =>
        val (s, d) = (find(r.getLong(0)), find(r.getLong(1)))
        if (s != d) {
          parent(math.max(s, d)) = math.min(s, d)
          mst += ((r.getLong(0), r.getLong(1), r.getDouble(2)))
          merged += 1
        }
      }
      rounds += 1
    }
    mst.toSeq
  }

  /** Single-linkage flat labels at `nClusters`: cut the MST at its
    * nClusters-1 largest edges (single_linkage semantics). Returns
    * (id, cluster) with clusters = smallest member id. */
  def singleLinkageLabels(vertices: DataFrame, edges: DataFrame, nClusters: Int,
      idCol: String = "id"): DataFrame = {
    val mst = boruvkaMst(vertices, edges, idCol)
    val keep = mst.sortBy(_._3).dropRight(math.min(nClusters - 1, mst.size))
    labelsFromKeptEdges(vertices, keep, idCol)
  }

  /** Single-linkage flat labels at a distance `threshold`: keep MST edges
    * with dist < threshold. By the MST cut property this equals connected
    * components of the input graph restricted to edges < threshold — which
    * makes it exactly oracle-able in SQL (and a genuine correctness check
    * of the distributed Borůvka MST itself). */
  def singleLinkageCut(vertices: DataFrame, edges: DataFrame, threshold: Double,
      idCol: String = "id"): DataFrame = {
    val mst = boruvkaMst(vertices, edges, idCol)
    labelsFromKeptEdges(vertices, mst.filter(_._3 < threshold), idCol)
  }

  private def labelsFromKeptEdges(vertices: DataFrame, keep: Seq[(Long, Long, Double)],
      idCol: String): DataFrame = {
    val spark = vertices.sparkSession
    val keepDf =
      if (keep.isEmpty)
        spark.createDataFrame(Seq.empty[(Long, Long, Double)]).toDF("src", "dst", "dist")
      else spark.createDataFrame(keep).toDF("src", "dst", "dist")
    connectedComponents(vertices, keepDf, idCol)
      .withColumnRenamed("component", "cluster")
  }
}
