package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch: step timings for the distributed MinHash LSH dedup route at
  * ScaleSmoke scale (LocalKernel off). */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "200000").toLong
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
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val secs = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (secs > 3.0)
          println(f"  STAGE ${si.stageId}%5d ${si.name.take(56)}%-56s tasks=${si.numTasks}%5d $secs%7.2f s")
      }
    })
    val docs = spark.range(0, n / 4, 1, 64)
      .select(col("id"),
        concat_ws(" ", (0 until 24).map(j =>
          when(col("id") % 10 === 0 && j >= 22, lit("copysuffix"))
            .otherwise(pmod(xxhash64(when(col("id") % 10 === 0, col("id") - 1)
              .otherwise(col("id")), lit(j)), lit(5000)).cast("string"))): _*).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docs_materialize")(docs.count())

    time("full_route_cold") {
      graft.text.Dedup.minhashLshPairs(docs, "id", "text").count()
    }

    val sigs = graft.text.Dedup.minhashSignatures(docs, "id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("signatures")(sigs.count())

    val nBands = 4; val bandRows = 4
    val keyCols = (0 until nBands).map { b =>
      concat_ws("_", (0 until bandRows).map(r => col(s"mh${b * bandRows + r}")): _*)
    }
    val bands = sigs
      .select(col("id"), posexplode(array(keyCols: _*)).as(Seq("band", "bkey")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("bands")(bands.count())
    time("hot_histogram") {
      bands.groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("_bc"))
        .filter(col("_bc") > 100000L).count()
    }
    val cands = bands.as("x").join(bands.as("y"), Seq("band", "bkey"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("cands_join_distinct")(println(s"  cands = ${cands.count()}"))

    val sh = graft.text.Dedup.shingleDf(docs, "id", "text", 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingles")(println(s"  shingle rows = ${sh.count()}"))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    time("verify_join") {
      val res = cands
        .join(sh.select(col("id").as("a"), col("shingle")), "a")
        .join(sh.select(col("id").as("b"), col("shingle")), Seq("b", "shingle"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
        .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
        .select(col("a"), col("b"),
          (col("inter").cast("double") /
            (col("sza") + col("szb") - col("inter")).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
      println(s"  verified pairs = ${res.count()}")
    }
    spark.stop()
  }
}
