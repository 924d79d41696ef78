package graft

import org.apache.spark.sql.functions._
import graft.sources.Hdf5

/** Roundtrip coverage for the minimal HDF5 reader/writer
  * ([[graft.sources.Hdf5]]) — the ann-benchmarks container format the
  * reference's bench tooling consumes (train/test/neighbors/distances root
  * datasets + a `distance` string attribute). */
class Hdf5Suite extends SparkFunSuite {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_h5_$name"

  test("ann-benchmarks-shaped file roundtrips: f32 train/test + i32 neighbors + attr") {
    import spark.implicits._
    val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    val train = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val test_ = train.filter(col("id") % 10 === 0)
    val nbrs = test_.select(col("id"),
      array((0 until 5).map(i => (col("id") * 5 + i).cast("int")): _*).as("ids"))

    val path = tmp("ann.hdf5")
    Hdf5.write(spark, path, Seq(
      Hdf5.Spec("train", train, "id", "vec"),
      Hdf5.Spec("test", test_, "id", "vec"),
      Hdf5.Spec("neighbors", nbrs, "id", "ids", Hdf5.I32)),
      attrs = Map("distance" -> "euclidean"))

    val info = Hdf5.info(spark, path)
    assert(info.attrs.get("distance").contains("euclidean"))
    assert(info.datasets.keySet == Set("train", "test", "neighbors"))
    assert(info.datasets("train").dtype == Hdf5.F32)
    assert(info.datasets("neighbors").dtype == Hdf5.I32)
    assert(info.datasets("train").nRows == train.count())

    val backTrain = Hdf5.read(spark, path, "train", numPartitions = 3)
    assert(backTrain.count() == train.count())
    val orig = train.orderBy("id").select("vec").as[Array[Float]].collect()
    val got = backTrain.orderBy("id").select("vec").as[Array[Float]].collect()
    orig.zip(got).foreach { case (a, b) => assert(a.sameElements(b)) }

    val backN = Hdf5.read(spark, path, "neighbors").orderBy("id")
      .select("ids").as[Array[Int]].collect()
    val origN = nbrs.orderBy("id").select("ids").as[Array[Int]].collect()
    origN.zip(backN).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("f64 dataset reads back as float32 values") {
    import spark.implicits._
    val df = Seq((0L, Array(1.5f, -2.25f)), (1L, Array(0.125f, 4096f)))
      .toDF("id", "vec")
    val path = tmp("dbl.hdf5")
    Hdf5.write(spark, path, Seq(Hdf5.Spec("train", df, "id", "vec", Hdf5.F64)))
    assert(Hdf5.info(spark, path).datasets("train").dtype == Hdf5.F64)
    val back = Hdf5.read(spark, path, "train").orderBy("id")
      .select("vec").as[Array[Float]].collect()
    assert(back(0).sameElements(Array(1.5f, -2.25f)))
    assert(back(1).sameElements(Array(0.125f, 4096f)))
  }

  test("u8 dataset widens to float [0,255]") {
    import spark.implicits._
    val df = Seq((0L, Array(0f, 255f, 128f)), (1L, Array(7f, 1f, 254f)))
      .toDF("id", "vec")
    val path = tmp("u8.hdf5")
    Hdf5.write(spark, path, Seq(Hdf5.Spec("train", df, "id", "vec", Hdf5.U8)))
    val back = Hdf5.read(spark, path, "train").orderBy("id")
      .select("vec").as[Array[Float]].collect()
    assert(back(0).sameElements(Array(0f, 255f, 128f)))
    assert(back(1).sameElements(Array(7f, 1f, 254f)))
  }

  test("missing dataset and non-HDF5 file raise clear errors") {
    import spark.implicits._
    val df = Seq((0L, Array(1f, 2f))).toDF("id", "vec")
    val path = tmp("one.hdf5")
    Hdf5.write(spark, path, Seq(Hdf5.Spec("train", df, "id", "vec")))
    val e = intercept[IllegalArgumentException] {
      Hdf5.read(spark, path, "nope")
    }
    assert(e.getMessage.contains("no dataset"))
    val fbin = tmp("not_h5.fbin")
    graft.sources.VectorFiles.write(df, fbin, "id", "vec")
    val e2 = intercept[IllegalArgumentException] { Hdf5.info(spark, fbin) }
    assert(e2.getMessage.toLowerCase.contains("signature"))
  }

  test("variable-length string attribute (h5py class 9) reads via the global heap") {
    import java.nio.{ByteBuffer, ByteOrder}
    import java.nio.file.{Files, Paths}
    // craft a GCOL collection holding "euclidean" as object #1, preceded
    // by junk padding so the address is non-trivial
    val value = "euclidean".getBytes("UTF-8")
    val pad = 32
    val objData = 16 + (value.length + 7) / 8 * 8
    val collSize = 16 + objData + 16 // header + object + free-space object
    val bb = ByteBuffer.allocate(pad + collSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(pad)
    bb.put("GCOL".getBytes("US-ASCII")).put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.putLong(collSize.toLong)
    bb.putShort(1).putShort(1).putInt(0).putLong(value.length.toLong) // object 1
    bb.put(value)
    bb.position(pad + 16 + objData)
    bb.putShort(0).putShort(0).putInt(0).putLong(16L) // free-space terminator
    val gfile = tmp("gcol.bin")
    Files.write(Paths.get(gfile), bb.array())

    // attribute message body: name "distance", class-9 vlen datatype,
    // scalar dataspace, 16-byte (len, heap addr, index) descriptor
    def pad8(n: Int) = (n + 7) / 8 * 8
    val name = "distance".getBytes("UTF-8")
    val ab = ByteBuffer.allocate(8 + pad8(name.length + 1) + 8 + 8 + 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    ab.put(1.toByte).put(0.toByte)
    ab.putShort((name.length + 1).toShort).putShort(8.toShort).putShort(8.toShort)
    ab.put(name).put(0.toByte)
    ab.position(8 + pad8(name.length + 1))
    ab.put(0x19.toByte).put(1.toByte).put(0.toByte).put(0.toByte).putInt(16) // v1 class 9, vlen string
    ab.put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(0) // scalar dataspace v1
    ab.putInt(value.length).putLong(pad.toLong).putInt(1) // vlen descriptor

    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(gfile))
    try {
      val parsed = Hdf5.parseAttribute(
        ByteBuffer.wrap(ab.array()).order(ByteOrder.LITTLE_ENDIAN), in)
      assert(parsed.contains("distance" -> "euclidean"))
    } finally in.close()
  }

  test("ragged rows are rejected at write") {
    import spark.implicits._
    val df = Seq((0L, Array(1f, 2f)), (1L, Array(1f))).toDF("id", "vec")
    intercept[Exception] {
      Hdf5.write(spark, tmp("bad.hdf5"), Seq(Hdf5.Spec("train", df, "id", "vec")))
    }
  }
}
