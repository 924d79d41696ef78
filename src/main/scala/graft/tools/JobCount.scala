package graft.tools

import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch: per-query job/stage/task accounting — run each named query
  * once warm and report how many Spark jobs, stages and task-seconds it
  * costs vs wall time. At the bench fixture's scale the batch family is
  * fixed-overhead-bound, so jobs × (plan+schedule) is the number to
  * shrink (guide §1.2: algorithm shape first).
  *
  * Usage: runMain graft.tools.JobCount q1,q2,... [repeats]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val repeats = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskNanos = new AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
    })
    val byName = graft.SparkEntry.queries
    // warm pass builds all memoized artifacts
    names.foreach(n => byName.get(n).foreach(fn =>
      try fn(spark, dir).count() catch { case _: Throwable => () }))
    println(f"${"query"}%-36s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"task_s"}%7s")
    names.foreach { n =>
      byName.get(n).foreach { fn =>
        var best = Double.MaxValue
        var bj = 0; var bs = 0; var bt = 0; var bts = 0.0
        (1 to repeats).foreach { _ =>
          jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
          val t0 = System.nanoTime()
          try fn(spark, dir).count() catch { case e: Throwable =>
            println(s"$n ERR ${e.getMessage}") }
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200) // let listener events drain
          if (wall < best) {
            best = wall; bj = jobs.get(); bs = stages.get(); bt = tasks.get()
            bts = taskNanos.get() / 1e9
          }
        }
        println(f"$n%-36s $best%7.2f $bj%5d $bs%7d $bt%6d $bts%7.1f")
      }
    }
    spark.stop()
  }
}
