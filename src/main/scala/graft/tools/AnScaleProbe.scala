package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.core.Metric
import graft.cluster.KMeans

/** Scratch: step timings for the DISTRIBUTED all_neighbors route at
  * ScaleSmoke scale (LocalKernel off), isolating kmeans fit, assignment
  * shuffle, the tiled per-cell local kNN, distinct, and the top-k merge.
  *
  * NOTE: the inlined kernel below is a SNAPSHOT of the round-4 tiled loop
  * kept for step-level A/B against the production path; it predates the
  * min-shared-cell dedup and the early-exit bound. The
  * `build_total_nopersist` step at the end times the REAL
  * AllNeighbors.build — trust that one for absolute numbers.
  */
object AnScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "200000").toLong
    val dim = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIM", "64").toInt
    val nClusters = sys.env.getOrElse("SPARK_GRAFT_SCALE_CELLS", "64").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.graft.localKernel.enabled", "false")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val data = spark.range(0, n, 1, 64)
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)), j =>
          (pmod(xxhash64(col("id") % 32, j), lit(1000)).cast("double") / 100.0 +
            pmod(xxhash64(col("id"), j), lit(97)).cast("double") / 97.0)
            .cast("float")).as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("generate")(data.count())

    val model = time("kmeans_fit_5it") {
      KMeans.fit(data, KMeans.Params(nClusters, 5), "id", "vec")
    }
    val assigned = data.select(col("id"), col("vec"),
      explode(KMeans.nearestCol(model.centroids, col("vec"), 2)
        .getField("list_id")).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("assign+persist")(assigned.count())

    import spark.implicits._
    val blockRows = 4096
    val nBlocksOf: Map[Int, Int] = time("cell_histogram") {
      assigned.groupBy("cell").count().collect()
        .map(r => r.getInt(0) ->
          math.max(1, ((r.getLong(1) + blockRows - 1) / blockRows).toInt)).toMap
    }
    println(s"  nBlocks dist: ${nBlocksOf.values.groupBy(identity).view.mapValues(_.size).toMap}")
    val nBlocksB = spark.sparkContext.broadcast(nBlocksOf)
    val distFn = graft.core.Distance.fn(Metric.L2)
    val minClose = true
    val k = 10
    val replicated = assigned
      .select(col("cell"), col("id"), col("vec"))
      .as[(Int, Long, Array[Float])]
      .flatMap { case (cell, id, vec) =>
        val nb = nBlocksB.value.getOrElse(cell, 1)
        if (nb == 1) Iterator(((cell, 0, 0), id, vec))
        else {
          val b = (java.lang.Long.hashCode(id * 0x9E3779B97F4A7C15L + cell)
            & Int.MaxValue) % nb
          (0 until nb).iterator.map { o =>
            ((cell, math.min(b, o), math.max(b, o)), id, vec)
          }
        }
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("replicate")(println(s"  replicated rows = ${replicated.count()}"))
    val localKnn = replicated
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val (cell, pa, pb) = key
        val nb = nBlocksB.value.getOrElse(cell, 1)
        val all = it.toArray
        def blockOf(id: Long): Int =
          if (nb == 1) 0
          else (java.lang.Long.hashCode(id * 0x9E3779B97F4A7C15L + cell)
            & Int.MaxValue) % nb
        def newBufs(m: Int) = Array.fill(m)(graft.core.TopKBuf(k, minClose,
          new Array[Double](k), new Array[Long](k), 0))
        if (pa == pb) {
          val rows = all
          val m = rows.length
          val bufs = newBufs(m)
          var i = 0
          while (i < m) {
            val vi = rows(i)._3
            var j = i + 1
            while (j < m) {
              val d = distFn(vi, rows(j)._3)
              bufs(i).insert(d, rows(j)._2)
              bufs(j).insert(d, rows(i)._2)
              j += 1
            }
            i += 1
          }
          bufs.iterator.zipWithIndex.flatMap { case (buf, i) =>
            (0 until buf.size).iterator.map(j => (rows(i)._2, buf.ids(j), buf.dists(j)))
          }
        } else {
          val left = all.filter(r => blockOf(r._2) == pa)
          val right = all.filter(r => blockOf(r._2) == pb)
          val lb = newBufs(left.length)
          val rb = newBufs(right.length)
          var i = 0
          while (i < left.length) {
            val vi = left(i)._3
            var j = 0
            while (j < right.length) {
              val d = distFn(vi, right(j)._3)
              lb(i).insert(d, right(j)._2)
              rb(j).insert(d, left(i)._2)
              j += 1
            }
            i += 1
          }
          (lb.iterator.zipWithIndex.flatMap { case (buf, i) =>
            (0 until buf.size).iterator.map(j => (left(i)._2, buf.ids(j), buf.dists(j)))
          }) ++ (rb.iterator.zipWithIndex.flatMap { case (buf, j) =>
            (0 until buf.size).iterator.map(i => (right(j)._2, buf.ids(i), buf.dists(i)))
          })
        }
      }
      .toDF("qid", "_nid", "dist")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("local_knn_tiled")(println(s"  localKnn rows = ${localKnn.count()}"))
    val dd = localKnn.distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("distinct")(dd.count())
    println("  fallbackThreshold = " + spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"))
    time("topk_merge_default") {
      graft.ops.BruteForceKnn.topKPerQuery(dd, k, Metric.L2).count()
    }
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "100000000")
    time("topk_merge_nofallback") {
      graft.ops.BruteForceKnn.topKPerQuery(dd, k, Metric.L2).count()
    }
    time("topk_merge_window") {
      import org.apache.spark.sql.expressions.Window
      dd.withColumn("rank", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dist"), col("_nid"))))
        .filter(col("rank") <= k).count()
    }
    replicated.unpersist(); localKnn.unpersist(); dd.unpersist(); assigned.unpersist()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = ()
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val secs = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (secs > 1.0)
          println(f"  STAGE ${si.stageId}%4d ${si.name.take(60)}%-60s tasks=${si.numTasks}%5d $secs%7.2f s")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    time("build_total_nopersist") {
      graft.graphops.AllNeighbors.build(data,
        graft.graphops.AllNeighbors.Params(k = 10, nClusters = nClusters,
          overlapFactor = 2, kmeansIters = 5), "id", "vec").count()
    }
    spark.stop()
  }
}
