package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.expr.{BinaryQuantize, BitThresholds, HammingPacked}
import graft.ops.BruteForceKnn
import org.apache.spark.sql.graft.{bridge => B}

/** 1-bit/dim quantization — `cuvs::preprocessing::quantize::binary`
  * (binary.hpp:31-56): threshold ∈ {zero, mean, sampling_median}; codes are
  * bit-packed (here 32 dims per BIGINT word, LSB-first) and searched with
  * popcount-Hamming (BitwiseHamming, distance.hpp:61-62).
  *
  * train = one aggregation (per-dim mean or exact median over posexploded
  * dims); transform = map-side codegen expression; hamming kNN over codes
  * reuses the top-k machinery with the packed-popcount expression.
  */
object BinaryQuantizer {

  sealed trait Threshold
  case object Zero extends Threshold
  case object Mean extends Threshold
  case object Median extends Threshold

  def train(df: DataFrame, vecCol: String = "vec", threshold: Threshold = Mean): BitThresholds = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    threshold match {
      case Zero => BitThresholds(new Array[Double](dim))
      case agg =>
        val ex = df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
        val fn = if (agg == Mean) avg(col("x").cast("double"))
                 else percentile(col("x").cast("double"), lit(0.5))
        val rows = ex.groupBy(col("pos")).agg(fn.as("t")).collect()
        val t = new Array[Double](dim)
        rows.foreach(r => t(r.getInt(0)) = r.getDouble(1))
        BitThresholds(t)
    }
  }

  def transformCol(vec: Column, t: BitThresholds): Column =
    B.column(BinaryQuantize(B.expression(vec), t))

  def transform(df: DataFrame, t: BitThresholds, vecCol: String = "vec",
      outCol: String = "code"): DataFrame =
    df.withColumn(outCol, transformCol(col(vecCol), t))

  def hammingCol(a: Column, b: Column): Column =
    B.column(HammingPacked(B.expression(a), B.expression(b)))

  /** Exact kNN in Hamming space over packed codes (the binary search path
    * of brute force, brute_force.hpp uint8/BitwiseHamming overloads). */
  def hammingKnn(dataset: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "id", codeCol: String = "code",
      qidCol: String = "qid", qcodeCol: String = "qcode"): DataFrame = {
    val d = dataset.select(col(idCol).cast("long").as("_nid"), col(codeCol).as("_ncode"))
    val q = queries.select(col(qidCol).cast("long").as("qid"), col(qcodeCol).as("_qcode"))
    val pairs = d.crossJoin(broadcast(q))
      .select(col("qid"), col("_nid"),
        hammingCol(col("_qcode"), col("_ncode")).cast("double").as("dist"))
    BruteForceKnn.topKPerQuery(pairs, k, Metric.Hamming)
  }
}
