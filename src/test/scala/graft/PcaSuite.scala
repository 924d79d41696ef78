package graft

import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.prep.PCA

class PcaSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")

  test("components are orthonormal, variances sorted desc") {
    val m = PCA.fit(emb, 8, "embedding")
    for (i <- 0 until 8; j <- i until 8) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      if (i == j) assert(math.abs(dot - 1.0) < 1e-8)
      else assert(math.abs(dot) < 1e-8, s"components $i,$j not orthogonal: $dot")
    }
    assert(m.explainedVariance.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(m.explainedVarianceRatio.sum <= 1.0 + 1e-9)
    assert(m.noiseVariance >= 0)
  }

  test("variance of projected coords equals eigenvalues") {
    val (m, proj) = PCA.fitTransform(emb, 4, "embedding")
    val sds = proj.select(posexplode(col("pc")).as(Seq("c", "v")))
      .groupBy(col("c")).agg(variance(col("v")).as("var"))
      .orderBy(col("c")).collect().map(_.getDouble(1))
    sds.zip(m.explainedVariance).foreach { case (got, ev) =>
      assert(math.abs(got - ev) / ev < 0.02, s"$got vs $ev")
    }
  }

  test("full-rank transform + inverse reconstructs the input") {
    val m = PCA.fit(emb, 64, "embedding")
    val rt = PCA.inverseTransform(PCA.transform(emb, m, "embedding"), m)
    val err = rt.select(graft.functions.vector_distance(Metric.L2Sqrt,
        col("embedding"), col("vec_hat")).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(err < 1e-3, s"reconstruction err $err")
  }

  test("whitened projection has unit variance per component") {
    val (m, proj) = PCA.fitTransform(emb, 4, "embedding", whiten = true)
    val vars = proj.select(posexplode(col("pc")).as(Seq("c", "v")))
      .groupBy(col("c")).agg(variance(col("v")).as("var"))
      .collect().map(_.getDouble(1))
    vars.foreach(v => assert(math.abs(v - 1.0) < 0.05, s"var $v"))
  }
}
