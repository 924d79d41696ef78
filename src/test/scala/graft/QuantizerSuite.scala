package graft

import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.prep.{BinaryQuantizer, ProductQuantizer, ScalarQuantizer}

class QuantizerSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")

  test("scalar quantize: codes in range, roundtrip error bounded by bucket width") {
    val m = ScalarQuantizer.train(emb, "embedding")
    assert(m.lo < m.hi)
    val bucket = (m.hi - m.lo) / 255.0
    val rt = ScalarQuantizer.inverseTransform(
      ScalarQuantizer.transform(emb, m, "embedding"), m)
    val bad = rt.select(posexplode(col("codes")).as(Seq("p", "q")))
      .filter(col("q") < -128 || col("q") > 127).count()
    assert(bad == 0)
    // in-range (unclipped) elements reconstruct within half a bucket
    val err = rt.select(explode(arrays_zip(col("embedding"), col("vec_hat"))).as("z"))
      .select(col("z.embedding").cast("double").as("x"), col("z.vec_hat").cast("double").as("xh"))
      .filter(col("x") > m.lo && col("x") < m.hi)
      .agg(max(abs(col("x") - col("xh")))).head().getDouble(0)
    assert(err <= bucket / 2 + 1e-9, s"err $err bucket $bucket")
  }

  test("binary quantize + packed hamming match a naive driver-side check") {
    val t = BinaryQuantizer.train(emb, "embedding", BinaryQuantizer.Mean)
    val codes = BinaryQuantizer.transform(emb, t, "embedding")
      .select(col("vec_id"), col("embedding"), col("code"))
      .limit(50).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getSeq[Long](2).toArray))
    // naive: bit i set iff x_i > threshold_i
    codes.foreach { case (_, v, code) =>
      v.indices.foreach { i =>
        val bit = (code(i / 32) >> (i % 32)) & 1L
        assert(bit == (if (v(i).toDouble > t.thresholds(i)) 1L else 0L), s"dim $i")
      }
    }
    // pairwise popcount vs naive sign-hamming
    for (i <- 0 until 10; j <- 0 until 10) {
      val naive = codes(i)._2.indices.count { d =>
        (codes(i)._2(d).toDouble > t.thresholds(d)) != (codes(j)._2(d).toDouble > t.thresholds(d))
      }
      val packed = codes(i)._3.zip(codes(j)._3)
        .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum
      assert(naive == packed)
    }
  }

  test("hammingKnn: self at distance 0 rank 1, monotone ranks") {
    val t = BinaryQuantizer.train(emb, "embedding", BinaryQuantizer.Mean)
    val codes = BinaryQuantizer.transform(emb, t, "embedding").select(col("vec_id"), col("code"))
    val q = codes.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("code").as("qcode"))
    val res = BinaryQuantizer.hammingKnn(codes, q, 5, "vec_id", "code", "qid", "qcode")
    val r1 = res.filter(col("rank") === 1).collect()
    assert(r1.forall(_.getAs[Double]("dist") == 0.0))
  }

  test("pq: roundtrip beats the zero-codebook baseline and uses many codes") {
    val cb = ProductQuantizer.train(emb,
      ProductQuantizer.Params(pqDim = 8, pqBits = 4, kmeansIters = 5), "vec_id", "embedding")
    val mse = ProductQuantizer.reconstructionError(emb, cb, "embedding")
    // baseline: squared distance to the zero vector = mean squared norm
    val base = emb.select(graft.functions.vector_distance(Metric.L2,
        col("embedding"), array_repeat(lit(0.0f), 64)).as("n2"))
      .agg(avg(col("n2"))).head().getDouble(0)
    assert(mse < base * 0.7, s"mse $mse vs norm baseline $base")
    val used = ProductQuantizer.transform(emb, cb, "embedding")
      .select(posexplode(col("pq_codes")).as(Seq("s", "c")))
      .agg(countDistinct(col("s"), col("c"))).head().getLong(0)
    assert(used > 8, s"codes used $used")
  }

  test("pq: more bits -> lower reconstruction error") {
    val cb4 = ProductQuantizer.train(emb,
      ProductQuantizer.Params(pqDim = 4, pqBits = 3, kmeansIters = 5), "vec_id", "embedding")
    val cb6 = ProductQuantizer.train(emb,
      ProductQuantizer.Params(pqDim = 4, pqBits = 6, kmeansIters = 5), "vec_id", "embedding")
    val e4 = ProductQuantizer.reconstructionError(emb, cb4, "embedding")
    val e6 = ProductQuantizer.reconstructionError(emb, cb6, "embedding")
    assert(e6 < e4, s"$e6 !< $e4")
  }

  test("pq use_vq: coarse VQ + residual PQ reconstructs at least as well as plain PQ") {
    val params = ProductQuantizer.Params(pqDim = 8, pqBits = 4, kmeansIters = 5)
    val m = ProductQuantizer.trainVq(emb, params, vqCenters = 8, "vec_id", "embedding")
    val coded = ProductQuantizer.transformVq(emb, m, "embedding")
    assert(coded.filter(col("vq_code") < 0 || col("vq_code") >= 8).count() == 0)
    val rec = ProductQuantizer.inverseTransformVq(coded, m)
    val errVq = rec.select(graft.functions.vector_distance(Metric.L2,
        col("embedding"), col("vec_hat")).as("e"))
      .agg(avg(col("e"))).head().getDouble(0)
    val plain = ProductQuantizer.train(emb, params, "vec_id", "embedding")
    val errPq = ProductQuantizer.reconstructionError(emb, plain, "embedding")
    // the coarse stage absorbs the between-cluster variance; allow fp slack
    assert(errVq <= errPq * 1.05, s"vq+pq $errVq vs pq $errPq")
  }
}
