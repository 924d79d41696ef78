package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.graphops.{AllNeighbors, Vamana}
import graft.index.Hnsw
import graft.sources.InteropExport

/** Parse the emitted binaries back with an independent little-endian
  * reader and check them field-for-field against the source tables. */
class InteropExportSuite extends SparkFunSuite {

  private lazy val emb = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    .filter(col("vec_id") % 5 === 0)
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def le(path: String): ByteBuffer =
    ByteBuffer.wrap(Files.readAllBytes(Paths.get(path))).order(ByteOrder.LITTLE_ENDIAN)

  test("hnswlib export round-trips header, links, vectors and labels") {
    val base = AllNeighbors.exact(emb, 8, Metric.L2Sqrt, "id", "vec").localCheckpoint()
    val idx = Hnsw.fromGraph(base, emb, Hnsw.Params(m = 8), "id", "vec")
    val path = Files.createTempDirectory("hnswlib").toString + "/index.bin"
    InteropExport.hnswlibExport(idx, emb, path)

    val ids = emb.select(col("id")).orderBy(col("id")).collect().map(_.getLong(0))
    val n = ids.length
    val dim = emb.select(size(col("vec"))).head().getInt(0)
    val edges0 = idx.edges.filter(col("level") === 0)
      .select(col("src"), col("dst"), col("rank")).collect()
      .groupBy(_.getLong(0))
    val levelOf = idx.levels.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    val b = le(path)
    assert(b.getLong() == 0L) // offsetLevel0
    assert(b.getLong() == n) // max_elements
    assert(b.getLong() == n) // cur_element_count
    val sizeDataPerElement = b.getLong()
    val labelOffset = b.getLong()
    val offsetData = b.getLong()
    val maxLevel = b.getInt()
    val enterpoint = b.getInt()
    val maxM = b.getLong()
    val maxM0 = b.getLong()
    val mVal = b.getLong()
    val mult = b.getDouble()
    b.getLong() // ef_construction
    assert(maxLevel == idx.maxLevel)
    assert(ids(enterpoint) == idx.entryPoint)
    assert(maxM == 8 && mVal == 8)
    assert(offsetData == 4 + maxM0 * 4)
    assert(labelOffset == offsetData + dim * 4)
    assert(sizeDataPerElement == labelOffset + 8)
    assert(math.abs(mult - 1.0 / math.log(8.0)) < 1e-12)

    val vecs = emb.orderBy(col("id")).collect()
      .map(r => r.getSeq[Float](r.fieldIndex("vec")).toArray)
    for (i <- 0 until n) {
      val deg = b.getInt()
      val expected = edges0.getOrElse(ids(i), Array.empty)
        .sortBy(_.getInt(2)).map(_.getLong(1))
      assert(deg == expected.length, s"node $i degree")
      val links = (0 until deg).map(_ => b.getInt())
      assert(links.map(ids(_)).toSeq == expected.toSeq, s"node $i links")
      (deg until maxM0.toInt).foreach(_ => assert(b.getInt() == 0))
      val v = (0 until dim).map(_ => b.getFloat())
      assert(v.toArray.sameElements(vecs(i)), s"node $i vector")
      assert(b.getLong() == ids(i), s"node $i label")
    }
    // upper linklists: sized (4 + M*4) * level, counts within [0, M]
    for (i <- 0 until n) {
      val lls = b.getInt()
      val lvl = levelOf.getOrElse(ids(i), 0)
      assert(lls == (if (lvl > 0) (4 + 8 * 4) * lvl else 0), s"node $i linkListSize")
      (1 to lvl).foreach { _ =>
        val cnt = b.getInt()
        assert(cnt >= 0 && cnt <= 8)
        val links = (0 until 8).map(_ => b.getInt())
        links.take(cnt).foreach(l => assert(l >= 0 && l < n))
      }
    }
    assert(!b.hasRemaining, "trailing bytes in hnswlib file")
  }

  test("diskann export round-trips the graph and the .data sidecar") {
    val g = Vamana.build(emb, Vamana.Params(graphDegree = 8, visitedSize = 16), "id", "vec")
      .localCheckpoint()
    val path = Files.createTempDirectory("diskann").toString + "/index"
    InteropExport.diskannExport(g, emb, path)

    val ids = emb.select(col("id")).orderBy(col("id")).collect().map(_.getLong(0))
    val n = ids.length
    val dim = emb.select(size(col("vec"))).head().getInt(0)
    val adj = g.select(col("src"), col("dst"), col("rank")).collect()
      .groupBy(_.getLong(0))

    val b = le(path)
    val indexSize = b.getLong()
    val maxDegree = b.getInt()
    val start = b.getInt()
    assert(b.getLong() == 0L) // num_frozen_points
    assert(indexSize == Files.size(Paths.get(path)), "header size == file size")
    assert(start >= 0 && start < n)
    var seenMax = 0
    for (i <- 0 until n) {
      val deg = b.getInt()
      val expected = adj.getOrElse(ids(i), Array.empty)
        .sortBy(_.getInt(2)).map(_.getLong(1))
      assert(deg == expected.length, s"node $i degree")
      val links = (0 until deg).map(_ => b.getInt())
      assert(links.map(ids(_)).toSeq == expected.toSeq, s"node $i links")
      seenMax = math.max(seenMax, deg)
    }
    assert(maxDegree == seenMax)
    assert(!b.hasRemaining)

    val db = le(s"$path.data")
    assert(db.getInt() == n)
    assert(db.getInt() == dim)
    val first = emb.orderBy(col("id")).head().getSeq[Float](1).toArray
    val got = (0 until dim).map(_ => db.getFloat()).toArray
    assert(got.sameElements(first))
    assert(db.remaining() == (n - 1) * dim * 4)
  }
}
