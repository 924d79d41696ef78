package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** DRIVER-SIDE reads of the engine's tiny parquet sidecars (meta,
  * recall_curve, depth_meta, ef_curve, hnsw_meta, tiered_meta, one-row
  * stats of centroids/codebooks/rotation).
  *
  * Why not `spark.read.parquet(...).head()`: every such call is a full
  * Spark JOB — plan + schedule + one task + result fetch, ~50-100 ms of
  * pure fixed cost — to read a row the driver could read in ~1 ms. The
  * kNN-join resolver consults up to a dozen sidecars per planning pass
  * (population, curves, depth hints, cost-model stats), so on the r17
  * job-count profile the cost-choice gates ran 58-86 one-task jobs each,
  * nearly all sidecar reads. Plan-time metadata must not cost cluster
  * jobs — the reference's plan factory reads index headers in-process
  * for the same reason (search_plan.cuh). parquet-mr's Group reader
  * (shipped with Spark) reads the files in-process with zero Spark
  * involvement.
  *
  * Scope guard: sidecars only. `readRows` hard-caps rows read and is for
  * directories KNOWN small (row counts bounded by probe-curve points /
  * one-row metas); data-bearing directories keep the distributed path. */
object SidecarIO {

  private def dataFiles(spark: SparkSession, dir: String): Option[Seq[Path]] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else if (fs.getFileStatus(p).isFile) Some(Seq(p))
    else Some(fs.listStatus(p).iterator
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".") && s.getLen > 0)
      .map(_.getPath).toSeq.sortBy(_.getName))
  }

  /** Footer-only total row count — reads parquet metadata, zero data
    * pages, zero jobs. None when the path is missing. */
  def rowCount(spark: SparkSession, dir: String): Option[Long] =
    dataFiles(spark, dir).map { files =>
      val conf = spark.sessionState.newHadoopConf()
      files.iterator.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
    }

  /** Read up to `maxRows` rows of a small parquet directory in-process.
    * Each row is fieldName -> value for the TOP-LEVEL PRIMITIVE fields
    * (Int/Long/Float/Double/Boolean/String); nested groups (lists,
    * structs) are skipped — no plan-time sidecar needs them. A NULL field
    * is absent from its row's map. Throws if the directory holds more
    * than `maxRows` rows — that is a misuse (a data directory), not a
    * bigger sidecar. None when the path is missing. */
  def readRows(spark: SparkSession, dir: String,
      maxRows: Int = 65536): Option[Seq[Map[String, Any]]] =
    dataFiles(spark, dir).map { files =>
      val conf = spark.sessionState.newHadoopConf()
      val out = Vector.newBuilder[Map[String, Any]]
      var n = 0
      files.foreach { f =>
        val reader = org.apache.parquet.hadoop.ParquetReader
          .builder(new GroupReadSupport(), f).withConf(conf).build()
        try {
          var g = reader.read()
          while (g != null) {
            if (n >= maxRows)
              throw new IllegalStateException(
                s"SidecarIO.readRows($dir): more than $maxRows rows — " +
                  "this is a data directory, not a sidecar")
            out += groupToMap(g)
            n += 1
            g = reader.read()
          }
        } finally reader.close()
      }
      out.result()
    }

  /** First row of a sidecar (files in name order) — the `head()` analog.
    * Stops after one row; later files are never opened. */
  def readHead(spark: SparkSession, dir: String): Option[Map[String, Any]] =
    dataFiles(spark, dir).flatMap { files =>
      val conf = spark.sessionState.newHadoopConf()
      files.iterator.flatMap { f =>
        val reader = org.apache.parquet.hadoop.ParquetReader
          .builder(new GroupReadSupport(), f).withConf(conf).build()
        try Option(reader.read()).map(groupToMap)
        finally reader.close()
      }.nextOption()
    }

  private def primValue(g: org.apache.parquet.example.data.Group, i: Int,
      j: Int): Any = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    g.getType.getType(i).asPrimitiveType().getPrimitiveTypeName match {
      case INT32 => g.getInteger(i, j)
      case INT64 => g.getLong(i, j)
      case FLOAT => g.getFloat(i, j)
      case DOUBLE => g.getDouble(i, j)
      case BOOLEAN => g.getBoolean(i, j)
      case BINARY | FIXED_LEN_BYTE_ARRAY => g.getString(i, j)
      case _ => null
    }
  }

  /** A LIST-annotated field as a Seq of primitives (Spark's 3-level list
    * encoding `group (LIST) { repeated group list { element } }`, with the
    * 2-level legacy shape handled too); None when the field is not a
    * list-of-primitive. */
  private def listValues(g: org.apache.parquet.example.data.Group,
      i: Int): Option[Seq[Any]] = {
    val f = g.getType.getType(i)
    if (f.isPrimitive || g.getFieldRepetitionCount(i) == 0) return None
    Option(f.getLogicalTypeAnnotation) match {
      case Some(_: org.apache.parquet.schema.LogicalTypeAnnotation
          .ListLogicalTypeAnnotation) =>
        val lg = g.getGroup(i, 0)
        val n = lg.getFieldRepetitionCount(0)
        val out = Vector.newBuilder[Any]
        val innerPrimitive = lg.getType.getType(0).isPrimitive
        var j = 0
        while (j < n) {
          if (innerPrimitive) out += primValue(lg, 0, j) // 2-level legacy
          else {
            val e = lg.getGroup(0, j) // 3-level: group "list" { element }
            out += (if (e.getFieldRepetitionCount(0) > 0) primValue(e, 0, 0)
            else null)
          }
          j += 1
        }
        Some(out.result())
      case _ => None
    }
  }

  private def groupToMap(g: org.apache.parquet.example.data.Group): Map[String, Any] = {
    val schema = g.getType
    val b = Map.newBuilder[String, Any]
    var i = 0
    while (i < schema.getFieldCount) {
      val f = schema.getType(i)
      if (f.isPrimitive && !f.isRepetition(org.apache.parquet.schema.Type.Repetition.REPEATED)
          && g.getFieldRepetitionCount(i) > 0) {
        val v = primValue(g, i, 0)
        if (v != null) b += schema.getFieldName(i) -> v
      } else if (!f.isPrimitive) {
        listValues(g, i).foreach(v => b += schema.getFieldName(i) -> v)
      }
      i += 1
    }
    b.result()
  }

  /** A list field coerced to Array[Float] (loader convenience). */
  def asFloats(v: Any): Array[Float] =
    v.asInstanceOf[Seq[Any]].iterator.map(_.asInstanceOf[Number].floatValue).toArray

  /** A list field coerced to Array[Double] (loader convenience). */
  def asDoubles(v: Any): Array[Double] =
    v.asInstanceOf[Seq[Any]].iterator.map(_.asInstanceOf[Number].doubleValue).toArray

  /** Numeric coercions for loader convenience (parquet writers may have
    * stored an int as int32 or int64 depending on the frame that wrote
    * it). */
  def asLong(v: Any): Long = v.asInstanceOf[Number].longValue
  def asInt(v: Any): Int = v.asInstanceOf[Number].intValue
  def asDouble(v: Any): Double = v.asInstanceOf[Number].doubleValue
}
