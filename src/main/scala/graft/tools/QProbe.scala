package graft.tools
import org.apache.spark.sql.SparkSession
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val rows = graft.SparkEntry.queries(n)(spark, dir).collect()
      println(s"QPROBE $n -> ${rows.take(5).mkString(" | ")}")
    }
    spark.stop()
  }
}
