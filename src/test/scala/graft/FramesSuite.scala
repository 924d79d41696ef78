package graft

import org.apache.spark.sql.functions._
import graft.core.Frames

/** graft.core.Frames — the stale-partitioning-metadata guard. */
class FramesSuite extends SparkFunSuite {

  test("staleMetadata detects a checkpointed cast-alias over spark.range") {
    val base = spark.range(0, 100, 1, 4)
      .select(col("id"), (col("id") * 2).cast("float").as("v"))
    // cast-alias drops the range id attr from the output while the stored
    // plan metadata still refers to it
    val ck = base.select(col("id").cast("long").as("id"), col("v")).localCheckpoint()
    val derived = ck.select(col("id"), col("v"))
    // parquet-style healthy frames report no stale refs
    val healthy = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"))
    assert(!Frames.staleMetadata(healthy))
    // materialize must survive cache reuse either way (the bare persist
    // route used to throw NoSuchElementException in
    // InMemoryRelation.withOutput on the derived frame)
    val m = Frames.materialize(derived)
    assert(m.join(m.select(col("id")), "id").count() == 100)
    Frames.release(m)
  }

  test("materialize keeps plain persist semantics for healthy frames") {
    val df = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"))
    val m = Frames.materialize(df)
    assert(m.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "healthy frame should take the persist route (lineage kept)")
    assert(m.count() > 0)
    Frames.release(m)
  }
}
