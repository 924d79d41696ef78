package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.index.Hnsw

/** Binary interop emitters — the two deploy formats of the reference that
  * the Parquet index tables don't cover:
  *
  *  - hnswlib: `cuvs::neighbors::hnsw::serialize`
  *    (detail/hnsw.hpp:460-585 header + level-0 block layout, :626-654
  *    upper linklists) so a CPU serving stack can `loadIndex` the graph.
  *  - DiskANN in-memory graph: `cuvs::neighbors::vamana::serialize`
  *    (detail/vamana/vamana_serialize.cuh:316-360 MSFT DiskANN OSS layout,
  *    :31-48 `.data` sidecar).
  *
  * Both formats are inherently single sequential files, so the emitters
  * stream on the driver (sorted `toLocalIterator` — one partition in
  * memory at a time, plus an id -> internal-id map, the same O(n) host
  * budget the reference's serializers use). They are deploy-time
  * converters, not query-path operators.
  *
  * All integers little-endian, matching both C++ consumers on x86/arm.
  */
object InteropExport {

  private class LEWriter(path: String) {
    private val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 20)
    private val b8 = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    var position: Long = 0L
    def i32(v: Int): Unit = { b8.clear(); b8.putInt(v); out.write(b8.array(), 0, 4); position += 4 }
    def i64(v: Long): Unit = { b8.clear(); b8.putLong(v); out.write(b8.array(), 0, 8); position += 8 }
    def f64(v: Double): Unit = { b8.clear(); b8.putDouble(v); out.write(b8.array(), 0, 8); position += 8 }
    def f32s(vs: Seq[Float]): Unit = {
      val bb = ByteBuffer.allocate(vs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putFloat)
      out.write(bb.array()); position += vs.length * 4
    }
    def close(): Unit = out.close()
  }

  /** Ascending-id -> internal 0..n-1 mapping (hnswlib/DiskANN address nodes
    * by dense position; original ids ride along as labels). */
  private def internalIds(ids: Array[Long]): java.util.HashMap[Long, Int] = {
    val m = new java.util.HashMap[Long, Int](ids.length * 2)
    var i = 0
    while (i < ids.length) { m.put(ids(i), i); i += 1 }
    m
  }

  /** Map an external id to its dense internal id, failing with a clear
    * message (not an unboxing NPE mid-file) when the graph references a
    * node absent from the data table. */
  private def internalOf(m: java.util.HashMap[Long, Int], id: Long, what: String): Int = {
    // containsKey, not a null check: get() on a HashMap[Long, Int] unboxes a
    // missing key straight to 0, which would silently alias absent nodes to
    // internal node 0 instead of failing
    require(m.containsKey(id), s"$what references id $id, which is not in the data table")
    m.get(id)
  }

  /** Write `idx` + its vectors as an hnswlib binary (`loadIndex`-able).
    *
    * Layout (detail/hnsw.hpp:483-509): 5x size_t header fields, maxlevel
    * (int), enterpoint (int), maxM/maxM0/M (size_t), mult (double),
    * ef_construction (size_t); then per node the level-0 block
    * [int degree][maxM0 x uint32 links, zero-padded][dim x float]
    * [size_t label]; then per node [uint linkListSize bytes] +
    * per level 1..L [int count][maxM x uint32 links, zero-padded].
    * The degree header writes a full little-endian int — hnswlib reads its
    * low 16 bits (setListCount), identical for any real degree. */
  def hnswlibExport(idx: Hnsw.Index, data: DataFrame, path: String,
      efConstruction: Int = 200, idCol: String = "id", vecCol: String = "vec"): Unit = {
    val spark = data.sparkSession
    import spark.implicits._
    val d = data.select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<float>").as("vec"))
    val ids = d.select(col("id")).orderBy(col("id")).as[Long].collect()
    val n = ids.length
    require(n > 0, "cannot export an empty index")
    val dim = d.select(size(col("vec"))).head().getInt(0)
    val internal = internalIds(ids)
    val m = idx.params.m

    // layer-0 adjacency, rank order; cap maxM0 at the observed max degree
    val edges0 = idx.edges.filter(col("level") === 0)
      .groupBy(col("src").as("id"))
      .agg(sort_array(collect_list(struct(col("rank"), col("dst")))).as("nbrs"))
    val maxM0 = math.max(
      edges0.select(coalesce(max(size(col("nbrs"))), lit(0))).head().getInt(0), 1)
    // upper layers shrink at 1/M per level -> collected to the driver map
    val upper = idx.edges.filter(col("level") >= 1)
      .select(col("level"), col("src"), col("dst"), col("rank"))
      .orderBy(col("src"), col("level"), col("rank"))
      .collect()
      .groupBy(r => (r.getAs[Long]("src"), r.getAs[Int]("level")))
      .map { case (k, rows) => k -> rows.map(_.getAs[Long]("dst")) }
    val levelOf = idx.levels.select(col("id"), col("level")).as[(Long, Int)]
      .collect().toMap

    val sizeLinks0 = 4 + maxM0 * 4
    val sizeDataPerElement = sizeLinks0 + dim * 4 + 8
    val w = new LEWriter(path)
    try {
      w.i64(0L) // offsetLevel0
      w.i64(n.toLong) // max_elements
      w.i64(n.toLong) // cur_element_count
      w.i64(sizeDataPerElement.toLong)
      w.i64((sizeLinks0 + dim * 4).toLong) // label_offset
      w.i64(sizeLinks0.toLong) // offsetData
      w.i32(idx.maxLevel)
      w.i32(internalOf(internal, idx.entryPoint, "entry point"))
      w.i64(m.toLong) // maxM
      w.i64(maxM0.toLong)
      w.i64(m.toLong) // M
      w.f64(1.0 / math.log(m.toDouble)) // mult
      w.i64(efConstruction.toLong)

      // level-0 blocks, streamed in internal-id order
      val body = d.join(edges0, Seq("id"), "left").orderBy(col("id"))
      body.toLocalIterator().forEachRemaining { (r: Row) =>
        val id = r.getAs[Long]("id")
        val vec = r.getSeq[Float](r.fieldIndex("vec"))
        val nbrs =
          if (r.isNullAt(r.fieldIndex("nbrs"))) Seq.empty[Long]
          else r.getSeq[Row](r.fieldIndex("nbrs")).map(_.getAs[Long]("dst"))
        w.i32(nbrs.length)
        nbrs.foreach(dst => w.i32(internalOf(internal, dst, "an edge")))
        (nbrs.length until maxM0).foreach(_ => w.i32(0))
        w.f32s(vec)
        w.i64(id) // label = original id
      }

      // upper-level linklists, internal-id order
      val sizeLinksPerLevel = 4 + m * 4
      ids.foreach { id =>
        val lvl = levelOf.getOrElse(id, 0)
        w.i32(if (lvl > 0) sizeLinksPerLevel * lvl else 0)
        (1 to lvl).foreach { l =>
          val nbrs = upper.getOrElse((id, l), Array.empty[Long])
          w.i32(nbrs.length)
          nbrs.foreach(dst => w.i32(internalOf(internal, dst, "an edge")))
          (nbrs.length until m).foreach(_ => w.i32(0))
        }
      }
    } finally w.close()
  }

  /** Write a Vamana graph as the MSFT DiskANN OSS in-memory index file
    * (vamana_serialize.cuh:316-360): header [uint64 index_size]
    * [uint32 max_degree][uint32 start(medoid)][uint64 num_frozen=0], then
    * per node [uint32 degree][degree x uint32 neighbors]; the header is
    * rewritten with the final size and max degree, exactly as the
    * reference does. With `includeDataset`, also writes the `.data`
    * sidecar [int32 n][int32 dim][row-major float32] (:31-48).
    *
    * `graph` is a (src, dst, dist, rank) edge list (Vamana.build output);
    * the medoid is the node nearest the dataset mean. */
  def diskannExport(graph: DataFrame, data: DataFrame, path: String,
      includeDataset: Boolean = true,
      idCol: String = "id", vecCol: String = "vec"): Unit = {
    val spark = data.sparkSession
    import spark.implicits._
    val d = data.select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<float>").as("vec"))
    val ids = d.select(col("id")).orderBy(col("id")).as[Long].collect()
    val n = ids.length
    require(n > 0, "cannot export an empty graph")
    val dim = d.select(size(col("vec"))).head().getInt(0)
    val internal = internalIds(ids)

    // medoid: the node nearest the dataset mean (reference index_.medoid())
    val mean = d.select(posexplode(col("vec")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(avg(col("v")).as("m"))
      .orderBy(col("pos")).as[(Int, Double)].collect().map(_._2.toFloat)
    val meanDf = Seq((0L, mean)).toDF("qid", "qvec")
    val medoidId = graft.ops.BruteForceKnn
      .knnJoin(d, meanDf, 1, graft.core.Metric.L2, "id", "vec")
      .select(col("nbr_id")).head().getLong(0)

    val adj = graph
      .groupBy(col("src").as("id"))
      .agg(sort_array(collect_list(struct(col("rank"), col("dst")))).as("nbrs"))
    val maxDegree = adj.select(coalesce(max(size(col("nbrs"))), lit(0))).head().getInt(0)

    val w = new LEWriter(path)
    try {
      w.i64(0L) // index_size, rewritten below
      w.i32(0) // max_observed_degree, rewritten below
      w.i32(internalOf(internal, medoidId, "the medoid")) // start
      w.i64(0L) // num_frozen_points
      var indexSize = 24L
      val body = d.select(col("id")).join(adj, Seq("id"), "left").orderBy(col("id"))
      body.toLocalIterator().forEachRemaining { (r: Row) =>
        val nbrs =
          if (r.isNullAt(r.fieldIndex("nbrs"))) Seq.empty[Long]
          else r.getSeq[Row](r.fieldIndex("nbrs")).map(_.getAs[Long]("dst"))
        w.i32(nbrs.length)
        nbrs.foreach(dst => w.i32(internalOf(internal, dst, "an edge")))
        indexSize += 4L * (nbrs.length + 1)
      }
      w.close()
      // header rewrite (seekp in the reference)
      val raf = new java.io.RandomAccessFile(path, "rw")
      val hdr = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putLong(indexSize).putInt(maxDegree)
      raf.seek(0); raf.write(hdr.array()); raf.close()
    } finally w.close()

    if (includeDataset) {
      val dw = new LEWriter(s"$path.data")
      try {
        dw.i32(n)
        dw.i32(dim)
        d.orderBy(col("id")).toLocalIterator().forEachRemaining { (r: Row) =>
          dw.f32s(r.getSeq[Float](r.fieldIndex("vec")))
        }
      } finally dw.close()
    }
  }
}
