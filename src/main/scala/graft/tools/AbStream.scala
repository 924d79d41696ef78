package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: same-session A/B of the streaming family — NEW drain defaults
  * (transient-checkpoint checksum off + size-derived state partitions) vs
  * OLD behavior (conf-pinned back to Spark defaults / session partitions).
  * Alternating runs inside one JVM cancel the host's session band, the
  * same discipline the r16 builder used for its streaming A/B.
  *
  * Usage: runMain graft.tools.AbStream [runsPerSide]
  */
object AbStream {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.StreamQueries.queries.toSeq.sortBy(_._1)
    // warm both shapes once (codegen, file listing)
    qs.foreach { case (_, fn) => fn(spark, dir).count() }

    def oldConfs(): Unit = {
      spark.conf.set("spark.graft.stream.transientCheckpoint", "false")
      spark.conf.set("spark.graft.stream.statePartitions", cpus)
    }
    def newConfs(): Unit = {
      spark.conf.unset("spark.graft.stream.transientCheckpoint")
      spark.conf.unset("spark.graft.stream.statePartitions")
    }
    val res = scala.collection.mutable.Map.empty[(String, String), List[Double]]
    (1 to runs).foreach { _ =>
      Seq(("old", () => oldConfs()), ("new", () => newConfs())).foreach {
        case (side, setup) =>
          setup()
          qs.foreach { case (name, fn) =>
            val t0 = System.nanoTime()
            fn(spark, dir).count()
            val sec = (System.nanoTime() - t0) / 1e9
            res((name, side)) = sec :: res.getOrElse((name, side), Nil)
          }
      }
    }
    newConfs()
    println(f"${"query"}%-36s ${"old_med"}%8s ${"new_med"}%8s ratio")
    qs.foreach { case (name, _) =>
      def med(side: String) = {
        val xs = res((name, side)).sorted
        xs((xs.length - 1) / 2)
      }
      val o = med("old"); val n = med("new")
      println(f"$name%-36s $o%8.2f $n%8.2f ${n / o}%5.2f")
    }
    spark.stop()
  }
}
