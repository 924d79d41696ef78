package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: compare kernel vs distributed route for a driver query. */
object RouteCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = if (args.length > 1) args(1) else "ivf_rabitq_search_refine"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    spark.conf.set("spark.graft.localKernel.enabled", "true")
    val local = fn(spark, dir).collect().map(_.toString).sorted
    spark.conf.set("spark.graft.localKernel.enabled", "false")
    val dist = fn(spark, dir).collect().map(_.toString).sorted
    println(s"ROUTECHECK local=${local.length} dist=${dist.length} " +
      s"equal=${local.sameElements(dist)}")
    if (!local.sameElements(dist)) {
      local.diff(dist).take(5).foreach(r => println(s"  only-local: $r"))
      dist.diff(local).take(5).foreach(r => println(s"  only-dist:  $r"))
    }
    spark.stop()
  }
}
