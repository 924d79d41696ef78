package graft.tools

import org.apache.spark.sql.SparkSession

/** Consolidated dev probes (one main, subcommands) — the general-purpose
  * survivors of the round-1..5 scratch probes:
  *
  *   runMain graft.tools.Probes query <sfDir> <name>[,<name>...]
  *     run driver queries and print their first rows (ex-QProbe)
  *   runMain graft.tools.Probes route <sfDir> <name>
  *     compare the LocalKernel route against the distributed route for a
  *     driver query — row sets must be identical (ex-RouteCheck)
  *   runMain graft.tools.Probes time <sfDir> <name>[,<name>...]
  *     per-query wall time with warm session (ad-hoc slice of Bench)
  *
  * One-off parameter sweeps that informed shipped constants (filtered-search
  * iteration counts, RaBitQ refine margins, ScaNN build/search splits, LSH
  * band caps) lived in per-topic scratch mains; their conclusions are
  * recorded at the constants they tuned, and the sweeps are reproducible
  * with `time`/`query` plus a local edit.
  */
object Probes {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Probes <query|route|time> <sfDir> [names]")
    val mode = args(0)
    val dir = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "query" =>
        args(2).split(",").foreach { n =>
          val rows = graft.SparkEntry.queries(n)(spark, dir).collect()
          println(s"QUERY $n rows=${rows.length} -> ${rows.take(5).mkString(" | ")}")
        }
      case "route" =>
        val name = args(2)
        val fn = graft.SparkEntry.queries(name)
        spark.conf.set("spark.graft.localKernel.enabled", "true")
        val local = fn(spark, dir).collect().map(_.toString).sorted
        spark.conf.set("spark.graft.localKernel.enabled", "false")
        val dist = fn(spark, dir).collect().map(_.toString).sorted
        spark.conf.set("spark.graft.localKernel.enabled", "true")
        println(s"ROUTE $name local=${local.length} dist=${dist.length} " +
          s"equal=${local.sameElements(dist)}")
      case "time" =>
        args(2).split(",").foreach { n =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, dir).count()
          println(f"TIME $n%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      case other => sys.error(s"unknown probe mode: $other")
    }
    spark.stop()
  }
}
