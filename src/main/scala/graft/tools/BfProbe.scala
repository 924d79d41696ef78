package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Metric, TopKBuf}
import graft.ops.BruteForceKnn

/** Scratch: isolate the brute-force fused-route regression (VERDICT r3 #5). */
object BfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count()
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // warm
    BruteForceKnn.knnJoin(emb, q, 10, Metric.L2, idCol = "vec_id", vecCol = "embedding").count()

    println("scan partitions: " + emb.rdd.getNumPartitions)

    time("knnJoin_l1_current") {
      BruteForceKnn.knnJoin(emb, q, 10, Metric.L1, idCol = "vec_id", vecCol = "embedding").count()
    }
    time("knnJoin_l2_current") {
      BruteForceKnn.knnJoin(emb, q, 10, Metric.L2, idCol = "vec_id", vecCol = "embedding").count()
    }
    time("rdd_getNumPartitions_only") {
      emb.select(col("vec_id").cast("long"), col("embedding")).rdd.getNumPartitions
    }
    // no-repartition variant of the fused kernel, inline
    val d = emb.select(col("vec_id").cast("long").as("_nid"),
      col("embedding").cast("array<float>").as("_nvec"))
    val qArr = q.select(col("qid").cast("long"), col("qvec").cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    val bcQ = spark.sparkContext.broadcast(qArr)
    def fused(dIn: org.apache.spark.sql.DataFrame, name: String): Unit = time(name) {
      val distFn = graft.core.Distance.fn(Metric.L1)
      val pairs = dIn.as[(Long, Array[Float])].mapPartitions { rows =>
        val qs = bcQ.value
        val bufs = qs.map(_ => TopKBuf(10, true, new Array[Double](10), new Array[Long](10), 0))
        rows.foreach { case (nid, nvec) =>
          var i = 0
          while (i < qs.length) { bufs(i).insert(distFn(qs(i)._2, nvec), nid); i += 1 }
        }
        bufs.iterator.zipWithIndex.flatMap { case (buf, i) =>
          (0 until buf.size).iterator.map(j => (qs(i)._1, buf.ids(j), buf.dists(j)))
        }
      }.toDF("qid", "_nid", "dist")
      pairs.groupBy("qid").agg(count(lit(1))).count()
    }
    fused(d, "fused_no_repartition")
    fused(d.repartition(32), "fused_repartition32")

    println("emb rows: " + emb.count() + "  q rows: " + q.count())
    spark.conf.set("spark.graft.localKernel.enabled", "false")
    time("knnJoin_l1_crossjoin_route") {
      BruteForceKnn.knnJoin(emb, q, 10, Metric.L1, idCol = "vec_id", vecCol = "embedding").count()
    }
    time("knnJoin_l1_crossjoin_route2") {
      BruteForceKnn.knnJoin(emb, q, 10, Metric.L1, idCol = "vec_id", vecCol = "embedding").count()
    }
    spark.conf.set("spark.graft.localKernel.enabled", "true")
    time("knnJoin_l1_current2") {
      BruteForceKnn.knnJoin(emb, q, 10, Metric.L1, idCol = "vec_id", vecCol = "embedding").count()
    }
  }
}
