package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: dump `.explain("formatted")` for named SparkEntry queries to
  * files (the r17 optimization round's plans/r17/<query>_{before,after}.txt
  * evidence). Bench-identical session shape: local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> q1,q2,... [k=v;k=v]
  * Writes <outDir>/<query>_<suffix>.txt. The frame is built once per query
  * (same code path the bench times) and explained WITHOUT executing. The
  * optional 5th arg sets session confs first (e.g.
  * spark.graft.localKernel.enabled=false for a "before" dump).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 4) args(4).split(";").map(_.trim).filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    new java.io.File(outDir).mkdirs()
    val byName = graft.SparkEntry.queries
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      byName.get(name) match {
        case None => System.err.println(s"[plandump] no such query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            // queryExecution.explainString = what .explain("formatted") prints
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
              txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            println(s"[plandump] wrote $name ($suffix)")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
