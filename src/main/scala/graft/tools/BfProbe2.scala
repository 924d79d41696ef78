package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: int8/merge bench queries under each brute-force route. */
object BfProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STEP $name%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    spark.read.parquet(s"$dir/embeddings.parquet").count()
    def run(q: String): Unit = graft.SparkEntry.queries(q)(spark, dir).count()
    run("knn_bruteforce_l2") // warm
    for (pass <- 1 to 2) {
      time(s"int8_default_$pass") { run("knn_bruteforce_int8") }
      time(s"merge_default_$pass") { run("knn_merge_parts") }
    }
    spark.conf.set("spark.graft.bruteforce.fusedMinPairs", "0")
    for (pass <- 1 to 2) {
      time(s"int8_fused_$pass") { run("knn_bruteforce_int8") }
      time(s"merge_fused_$pass") { run("knn_merge_parts") }
    }
    spark.conf.unset("spark.graft.bruteforce.fusedMinPairs")
  }
}
