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

  test("ragged rows are rejected at write") {
    import spark.implicits._
    val df = Seq((0L, Array(1f, 2f)), (1L, Array(1f))).toDF("id", "vec")
    intercept[Exception] {
      Hdf5.write(spark, tmp("bad.hdf5"), Seq(Hdf5.Spec("train", df, "id", "vec")))
    }
  }
}
