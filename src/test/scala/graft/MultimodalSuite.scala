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
