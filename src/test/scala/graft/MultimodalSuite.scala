package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.multimodal.Multimodal

/** The codec swap-point CONTRACT, executable (Multimodal.Codec): a real
  * image/audio decoder replaces `fakeCodec` by satisfying exactly these
  * properties — fixed output dim for every payload (including empty),
  * row-local (payload never crosses a shuffle), and downstream-opaque
  * (swapping the codec changes values, never schema or plan shape). */
class MultimodalSuite extends SparkFunSuite {
  import Multimodal._

  private def media = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, ""), // empty payload: still a fixed-dim vector
      (4L, "a"),
      (5L, "the quick brown fox jumps over the lazy dog!")
    ).toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
  }

  // a structurally DIFFERENT stand-in decoder: byte-histogram moments
  private val altCodec: Codec = { bytes =>
    val n = math.max(bytes.length, 1)
    val mean = bytes.map(_.toInt & 0xff).sum.toFloat / n
    Array.tabulate(16)(i => (mean * (i + 1) % 251) / 251.0f)
  }

  test("codec contract: fixed dim for every payload, empty included") {
    for (codec <- Seq(fakeCodec(16), altCodec)) {
      assert(codec(Array.emptyByteArray).length == 16)
      assert(codec("x".getBytes).length == 16)
      assert(codec(("y" * 10000).getBytes).length == 16)
    }
  }

  test("embedWith: array<float> schema, one vector per row, deterministic") {
    val out = media.select(col("media_id"), embedWith(fakeCodec(16))(col("payload")).as("vec"))
    assert(out.schema("vec").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    val rows = out.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getSeq[Float](1).length == 16))
    assert(out.collect().sortBy(_.getLong(0)).sameElements(rows.sortBy(_.getLong(0))))
  }

  test("swap point: a different codec runs the same pipeline unchanged") {
    def pipeline(codec: Codec) = {
      val m = media.select(col("media_id"), embedWith(codec)(col("payload")).as("vec"))
      val q = m.filter(col("media_id") % 2 === 1)
        .select(col("media_id").as("qid"), col("vec").as("qvec"))
      graft.ops.BruteForceKnn.knnJoin(m, q, 3, graft.core.Metric.Cosine, "media_id", "vec")
    }
    val a = pipeline(fakeCodec(16))
    val b = pipeline(altCodec)
    // schema and shape identical; only the values differ
    assert(a.schema == b.schema)
    assert(a.count() == b.count())
    assert(a.groupBy("qid").count().collect().forall(_.getLong(1) == 3))
    assert(b.groupBy("qid").count().collect().forall(_.getLong(1) == 3))
  }

  test("payload never crosses a shuffle: embed projects it away pre-exchange") {
    val m = media.select(col("media_id"), embedWith(fakeCodec(16))(col("payload")).as("vec"))
    val q = m.filter(col("media_id") % 2 === 1)
      .select(col("media_id").as("qid"), col("vec").as("qvec"))
    val got = graft.ops.BruteForceKnn.knnJoin(m, q, 3, graft.core.Metric.L2, "media_id", "vec")
    got.collect()
    val plan = got.queryExecution.executedPlan
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(allNodes)) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case _ => Nil
      })
    val exchanges = allNodes(plan).collect { case e: ShuffleExchangeExec => e }
    exchanges.foreach { e =>
      assert(!e.output.exists(_.name.toLowerCase.contains("payload")),
        s"payload bytes crossed a shuffle: ${e.output.map(_.name)}")
    }
  }

  // ===== the REAL codec (ImageCodec): same contract, actual pixels ======

  private def testImage(w: Int, h: Int, seed: Int): graft.multimodal.ImageCodec.Image =
    graft.multimodal.ImageCodec.Image(w, h,
      Array.tabulate(w * h * 3)(i => ((i * 31 + seed * 17) % 256).toByte))

  test("ImageCodec: PPM and BMP encode/decode round-trip pixel-exact") {
    import graft.multimodal.ImageCodec._
    for (img <- Seq(testImage(5, 3, 1), testImage(7, 7, 2), testImage(1, 1, 3))) {
      val viaPpm = decode(encodePpm(img)).get
      assert(viaPpm.width == img.width && viaPpm.height == img.height)
      assert(viaPpm.rgb.sameElements(img.rgb), "PPM roundtrip lost pixels")
      // width 5 and 7 exercise BMP's 4-byte row stride padding
      val viaBmp = decode(encodeBmp(img)).get
      assert(viaBmp.width == img.width && viaBmp.height == img.height)
      assert(viaBmp.rgb.sameElements(img.rgb), "BMP roundtrip lost pixels")
    }
    // a PPM header comment must be skipped
    val commented = ("P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](12)(7))
    assert(decode(commented).exists(i => i.width == 2 && i.height == 2))
  }

  test("ImageCodec.grayEmbedding satisfies the codec contract") {
    import graft.multimodal.ImageCodec._
    val codec = grayEmbedding(4)
    // fixed dim for every payload: real images, empty, garbage, truncated
    assert(codec(encodePpm(testImage(8, 8, 4))).length == 16)
    assert(codec(encodeBmp(testImage(3, 5, 5))).length == 16)
    assert(codec(Array.emptyByteArray).length == 16)
    assert(codec("not an image".getBytes).length == 16)
    assert(codec(encodePpm(testImage(8, 8, 4)).take(10)).length == 16)
    // undecodable -> zero vector (deterministic, not an exception)
    assert(codec("junk".getBytes).forall(_ == 0.0f))
    // crafted headers whose size math would overflow Int must map to the
    // zero vector, not throw inside the UDF (size checks are Long)
    assert(codec("P6\n100000 100000\n255\n".getBytes ++ Array.fill[Byte](64)(1))
      .forall(_ == 0.0f))
    val hugeBmp = {
      val b = encodeBmp(testImage(2, 2, 7))
      // overwrite width with 0x40000000: stride*h and w*h*3 overflow Int
      b(18) = 0; b(19) = 0; b(20) = 0; b(21) = 0x40.toByte
      b
    }
    assert(codec(hugeBmp).forall(_ == 0.0f))
    // same pixels through either container -> same embedding
    val img = testImage(6, 4, 6)
    assert(codec(encodePpm(img)).sameElements(codec(encodeBmp(img))))
    // values are normalized luma
    assert(codec(encodePpm(img)).forall(v => v >= 0.0f && v <= 1.0f))
  }

  test("swap point: the REAL image codec runs the same pipeline unchanged") {
    import graft.multimodal.ImageCodec._
    val s = spark
    import s.implicits._
    // five 8x8 images, two of them near-duplicates (seeds 1 and 1)
    val imgs = Seq(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 3, 5 -> 4).map { case (id, seed) =>
      (id.toLong, encodePpm(testImage(8, 8, seed)))
    }.toDF("media_id", "payload")
    val m = imgs.select(col("media_id"),
      embedWith(grayEmbedding(4))(col("payload")).as("vec"))
    val q = m.filter(col("media_id") % 2 === 1)
      .select(col("media_id").as("qid"), col("vec").as("qvec"))
    val got = graft.ops.BruteForceKnn.knnJoin(m, q, 2, graft.core.Metric.L2,
      "media_id", "vec")
    assert(got.groupBy("qid").count().collect().forall(_.getLong(1) == 2))
    // identical pixels -> distance 0 at rank 2 (rank 1 is self)
    val nn1 = got.filter(col("qid") === 1 && col("rank") === 2).head()
    assert(nn1.getAs[Long]("nbr_id") == 2L && nn1.getAs[Double]("dist") == 0.0)
  }

  test("mediaSchema round-trip: full typed table drives the embed column") {
    val s = spark
    val rows = media.select(col("media_id"), lit("text").as("modality"), col("payload"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("n_channels")).as("meta"))
    assert(rows.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      mediaSchema.fields.map(f => (f.name, f.dataType.typeName)).toSeq)
    val out = rows.select(col("media_id"), embedWith(fakeCodec(8))(col("payload")).as("vec"))
    assert(out.collect().forall(_.getSeq[Float](1).length == 8))
  }
}
