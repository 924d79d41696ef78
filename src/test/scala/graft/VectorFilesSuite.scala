package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.VectorFiles

class VectorFilesSuite extends SparkFunSuite {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_vf_$name"

  test("fbin roundtrip preserves every float bit-for-bit") {
    import spark.implicits._
    val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    val path = tmp("rt.fbin")
    VectorFiles.write(emb, path, "vec_id", "embedding")
    val back = VectorFiles.read(spark, path, numPartitions = 3)
    assert(back.count() == emb.count())
    val orig = emb.orderBy("vec_id").select("embedding").as[Array[Float]].collect()
    val got = back.orderBy("id").select("vec").as[Array[Float]].collect()
    orig.zip(got).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("u8bin roundtrip widens to float [0,255]") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(0f, 1f, 127f, 255f)),
      (1L, Array(254f, 3f, 0f, 128f)),
      (2L, Array(9f, 8f, 7f, 6f))).toDF("id", "vec")
    val path = tmp("rt.u8bin")
    VectorFiles.write(df, path, "id", "vec")
    val back = VectorFiles.read(spark, path).orderBy("id")
      .select("vec").as[Array[Float]].collect()
    assert(back(0).sameElements(Array(0f, 1f, 127f, 255f)))
    assert(back(1).sameElements(Array(254f, 3f, 0f, 128f)))
    assert(back(2).sameElements(Array(9f, 8f, 7f, 6f)))
  }

  test("ibin reads int32 rows (ground-truth id lists)") {
    import spark.implicits._
    // hand-write a 3x4 ibin file
    val path = tmp("gt.ibin")
    val bb = ByteBuffer.allocate(8 + 3 * 4 * 4).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(3).putInt(4)
    (0 until 12).foreach(i => bb.putInt(i * 11 - 5))
    Files.write(Paths.get(path), bb.array())
    val back = VectorFiles.read(spark, path).orderBy("id")
      .select("ids").as[Array[Int]].collect()
    assert(back.length == 3)
    assert(back(0).sameElements(Array(-5, 6, 17, 28)))
    assert(back(2).sameElements(Array(83, 94, 105, 116)))
  }

  test("header mismatch on ragged rows is rejected at write") {
    import spark.implicits._
    val df = Seq((0L, Array(1f, 2f)), (1L, Array(1f))).toDF("id", "vec")
    intercept[Exception] {
      VectorFiles.write(df, tmp("bad.fbin"), "id", "vec")
    }
  }
}
