package graft.sources

import java.io.DataOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Flat binary vector files — the ann-benchmarks dataset format the
  * reference's bench harness reads (`cpp/bench/ann/src/common/dataset.hpp`:
  * `.fbin` float32 / `.u8bin` uint8 / `.ibin` int32; an 8-byte header of
  * two little-endian int32s `[n_rows, dim]` followed by row-major data).
  *
  * Read is a parallel byte-range scan: the driver reads only the 8-byte
  * header, then each task seeks to its own row range and streams it —
  * no single-reader bottleneck, any number of partitions, works on any
  * Hadoop filesystem. Row ids are the file row positions (the format
  * carries no ids). Write streams row-major bytes through one output
  * stream (the format is a single sequential file, like the reference's
  * serialize); use Parquet for anything that needs parallel writes.
  */
object VectorFiles {

  sealed abstract class Dtype(val elemBytes: Int)
  case object Float32 extends Dtype(4) // .fbin
  case object Uint8 extends Dtype(1)   // .u8bin
  case object Int32 extends Dtype(4)   // .ibin

  def dtypeFor(path: String): Dtype =
    if (path.endsWith(".fbin")) Float32
    else if (path.endsWith(".u8bin")) Uint8
    else if (path.endsWith(".ibin")) Int32
    else throw new IllegalArgumentException(s"expected .fbin/.u8bin/.ibin, got $path")

  /** (id long, vec array<float>) for fbin/u8bin (uint8 widened to float,
    * SURVEY.md §1.2), (id long, ids array<int>) for ibin. */
  def read(spark: SparkSession, path: String, numPartitions: Int = 0): DataFrame = {
    val dtype = dtypeFor(path)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val (nRows, dim) = {
      val fs = FileSystem.get(new java.net.URI(path), conf.value)
      val in = fs.open(new Path(path))
      try {
        val hdr = new Array[Byte](8)
        in.readFully(0L, hdr)
        val bb = ByteBuffer.wrap(hdr).order(ByteOrder.LITTLE_ENDIAN)
        (bb.getInt(), bb.getInt())
      } finally in.close()
    }
    require(nRows >= 0 && dim > 0, s"bad header in $path: n_rows=$nRows dim=$dim")
    val parts = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val rowBytes = dim.toLong * dtype.elemBytes
    import spark.implicits._
    val rows = spark.range(0, nRows, 1, math.max(1, math.min(parts, nRows)))
      .mapPartitions { it =>
        val idsInPart = it.map(Long2long).toArray
        if (idsInPart.isEmpty) Iterator.empty
        else {
          // contiguous range per partition (spark.range guarantees it):
          // one seek, then a sequential stream
          val fs = FileSystem.get(new java.net.URI(path), conf.value)
          val in = fs.open(new Path(path))
          in.seek(8L + idsInPart.head * rowBytes)
          val buf = new Array[Byte](rowBytes.toInt)
          val out = idsInPart.iterator.map { id =>
            in.readFully(buf, 0, buf.length)
            val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
            val arr = new Array[Float](dim)
            var i = 0
            dtype match {
              case Float32 => while (i < dim) { arr(i) = bb.getFloat(i * 4); i += 1 }
              case Uint8 => while (i < dim) { arr(i) = (buf(i) & 0xff).toFloat; i += 1 }
              case Int32 => while (i < dim) { arr(i) = Float.NaN; i += 1 } // unused branch
            }
            val ints: Array[Int] =
              if (dtype == Int32) Array.tabulate(dim)(j => bb.getInt(j * 4)) else null
            (id, arr, ints)
          }
          new Iterator[(Long, Array[Float], Array[Int])] {
            def hasNext: Boolean = { val h = out.hasNext; if (!h) in.close(); h }
            def next(): (Long, Array[Float], Array[Int]) = out.next()
          }
        }
      }
    if (dtype == Int32)
      rows.map(r => (r._1, r._3)).toDF("id", "ids")
    else
      rows.map(r => (r._1, r._2)).toDF("id", "vec")
  }

  /** Write (vec array<float>) rows in `orderCol` order as a flat binary
    * file. Single sequential stream by format necessity — an export
    * utility, not the at-scale sink (that is Parquet). */
  def write(df: DataFrame, path: String, orderCol: String, vecCol: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val dtype = dtypeFor(path)
    require(dtype != Int32, "write supports .fbin/.u8bin")
    val sorted = df.select(org.apache.spark.sql.functions.col(orderCol),
        org.apache.spark.sql.functions.col(vecCol))
      .orderBy(orderCol)
    val it = sorted.select(vecCol).as[Array[Float]].toLocalIterator()
    val dim = df.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col(vecCol))).head().getInt(0)
    val nRows = df.count().toInt
    val fs = FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new Path(path), true), 1 << 20))
    try {
      val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putInt(nRows).putInt(dim)
      out.write(hdr.array())
      val rowBuf = ByteBuffer.allocate(dim * dtype.elemBytes).order(ByteOrder.LITTLE_ENDIAN)
      while (it.hasNext) {
        val v = it.next()
        require(v.length == dim, s"ragged row: ${v.length} != $dim")
        rowBuf.clear()
        dtype match {
          case Float32 => v.foreach(rowBuf.putFloat)
          case Uint8 => v.foreach(x => rowBuf.put(x.toInt.toByte))
          case Int32 => ()
        }
        out.write(rowBuf.array(), 0, rowBuf.capacity())
      }
    } finally out.close()
  }
}
