package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: list every Spark job fired by one warm run of a query, with
  * its call site — attribution for the fixed-overhead job count that
  * JobCount measures. Usage: runMain graft.tools.JobSites <query> */
object JobSites {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val name = args.head
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val on = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (on.get()) {
          val cs = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          val deep = j.stageInfos.lastOption.map(_.details.linesIterator
            .filter(l => l.contains("graft.") && !l.contains("JobSites"))
            .take(2).mkString(" <- ").trim).getOrElse("")
          sites.add(s"$cs | ${deep.take(160)}")
        }
    })
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count() // warm: artifacts + memos
    fn(spark, dir).count() // warm 2: steady state
    on.set(true)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    on.set(false)
    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    val counts = sites.asScala.toSeq.groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy(-_._2)
    println(f"== $name: ${sites.size} jobs in $wall%.2f s")
    counts.foreach { case (s, n) => println(f"$n%4d  $s") }
    spark.stop()
  }
}
