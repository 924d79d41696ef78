package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal HDF5 reader/writer for ann-benchmarks-style dataset files —
  * the container the reference's bench tooling downloads and converts
  * (`python/cuvs_bench/cuvs_bench/get_dataset/__main__.py`: h5py files with
  * root datasets `train`/`test`/`neighbors`/`distances` and a `distance`
  * string attribute).
  *
  * Implements the subset of the public HDF5 File Format Specification
  * (Version 0 superblock, version-1 object headers, old-style symbol-table
  * groups, contiguous data layout, IEEE-float / fixed-point / fixed-string
  * datatypes) that h5py emits by default — i.e. exactly what an
  * ann-benchmarks `.hdf5` file contains. Chunked/filtered layouts and
  * version-2 ("latest" libver) metadata raise a clear error instead of
  * misreading.
  *
  * The read path is driver-parsed metadata (a few KB of seeks) + the same
  * parallel byte-range scan as [[VectorFiles.read]]: each task seeks into
  * the contiguous data block for its own row range, so the scan
  * parallelizes across any number of executors with no single-reader
  * bottleneck.
  */
object Hdf5 {

  private val UNDEF = -1L // 0xFFFFFFFFFFFFFFFF — HDF5 "undefined address"
  private val SIG = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')

  sealed trait Dtype { def elemBytes: Int }
  case object F32 extends Dtype { val elemBytes = 4 }
  case object F64 extends Dtype { val elemBytes = 8 }
  case object I32 extends Dtype { val elemBytes = 4 }
  case object U8 extends Dtype { val elemBytes = 1 }

  /** One dataset's parsed metadata: shape, element type, absolute file
    * offset of its contiguous data block. */
  case class DatasetInfo(name: String, dtype: Dtype, dims: Seq[Long], dataAddress: Long) {
    def nRows: Long = if (dims.isEmpty) 1L else dims.head
    def rowElems: Int = if (dims.size <= 1) 1 else dims.drop(1).product.toInt
  }
  case class FileInfo(datasets: Map[String, DatasetInfo], attrs: Map[String, String])

  // =========================== reader ===================================

  /** Parse file metadata on the driver: dataset names/shapes/offsets and
    * root-group string attributes. */
  def info(spark: SparkSession, path: String): FileInfo = {
    val fs = FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(path))
    try parseFile(in) finally in.close()
  }

  /** Read one dataset as a DataFrame: `(id long, vec array<float>)` for
    * float data (uint8 widened, SURVEY.md §1.2), `(id long, ids
    * array<int>)` for int32 data. Row ids are row positions, as in
    * [[VectorFiles.read]] (the format carries no ids). */
  def read(spark: SparkSession, path: String, dataset: String,
           numPartitions: Int = 0): DataFrame = {
    val ds = info(spark, path).datasets.getOrElse(dataset,
      throw new IllegalArgumentException(s"no dataset '$dataset' in $path"))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val nRows = ds.nRows
    val dim = ds.rowElems
    val dtype = ds.dtype
    val dataAddr = ds.dataAddress
    require(dataAddr != UNDEF, s"dataset '$dataset' has no allocated storage")
    val rowBytes = dim.toLong * dtype.elemBytes
    val parts = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    import spark.implicits._
    val rows = spark.range(0, nRows, 1, math.max(1, math.min(parts, math.max(1L, nRows)).toInt))
      .mapPartitions { it =>
        val ids = it.map(Long2long).toArray
        if (ids.isEmpty) Iterator.empty
        else {
          // contiguous id range per partition: one seek + sequential stream
          val fs = FileSystem.get(new java.net.URI(path), conf.value)
          val in = fs.open(new Path(path))
          // close on task completion, not iterator exhaustion — an early
          // stop (limit/head) would otherwise leak the handle
          org.apache.spark.TaskContext.get() match {
            case null => ()
            case tc => tc.addTaskCompletionListener[Unit](_ => in.close())
          }
          in.seek(dataAddr + ids.head * rowBytes)
          val buf = new Array[Byte](rowBytes.toInt)
          ids.iterator.map { id =>
            in.readFully(buf, 0, buf.length)
            val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
            dtype match {
              case I32 =>
                (id, null: Array[Float], Array.tabulate(dim)(j => bb.getInt(j * 4)))
              case F32 =>
                (id, Array.tabulate(dim)(j => bb.getFloat(j * 4)), null: Array[Int])
              case F64 =>
                (id, Array.tabulate(dim)(j => bb.getDouble(j * 8).toFloat), null: Array[Int])
              case U8 =>
                (id, Array.tabulate(dim)(j => (buf(j) & 0xff).toFloat), null: Array[Int])
            }
          }
        }
      }
    if (dtype == I32) rows.map(r => (r._1, r._3)).toDF("id", "ids")
    else rows.map(r => (r._1, r._2)).toDF("id", "vec")
  }

  // ---- metadata parsing -------------------------------------------------

  private def readBytes(in: FSDataInputStream, at: Long, n: Int): ByteBuffer = {
    val a = new Array[Byte](n)
    in.readFully(at, a)
    ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
  }

  private def parseFile(in: FSDataInputStream): FileInfo = {
    val head = readBytes(in, 0L, 8)
    require((0 until 8).forall(i => head.get(i) == SIG(i)),
      "not an HDF5 file (bad signature)")
    val sbVer = readBytes(in, 8L, 1).get(0) & 0xff
    val rootHeaderAddr = sbVer match {
      case 0 | 1 =>
        val sb = readBytes(in, 8L, 88)
        val offSize = sb.get(5) & 0xff
        val lenSize = sb.get(6) & 0xff
        require(offSize == 8 && lenSize == 8,
          s"unsupported offset/length size $offSize/$lenSize (only 8 supported)")
        // root group symbol table entry starts at byte 56 (v0) / 56+4 (v1)
        val entryOff = if (sbVer == 0) 56L else 60L
        readBytes(in, entryOff + 8, 8).getLong // object header address
      case 2 | 3 =>
        // v2/v3: sig(8) ver(1) offSize(1) lenSize(1) flags(1) base(8) ext(8) eof(8) root(8)
        val sb = readBytes(in, 8L, 40)
        require((sb.get(1) & 0xff) == 8 && (sb.get(2) & 0xff) == 8,
          "unsupported offset/length size (only 8 supported)")
        sb.getLong(4 + 24)
      case v => throw new IllegalArgumentException(s"unsupported superblock version $v")
    }
    val (rootMsgs, rootAttrs) = parseObjectHeader(in, rootHeaderAddr)
    val stab = rootMsgs.collectFirst { case SymbolTableMsg(btree, heap) => (btree, heap) }
      .getOrElse(throw new IllegalArgumentException(
        "root group has no symbol table (new-style/v2 groups unsupported — " +
          "write with h5py default libver)"))
    val links = readSymbolTable(in, stab._1, stab._2)
    val datasets = links.flatMap { case (name, addr) =>
      val (msgs, _) = parseObjectHeader(in, addr)
      val space = msgs.collectFirst { case d: DataspaceMsg => d }
      val dt = msgs.collectFirst { case d: DatatypeMsg => d }
      val layout = msgs.collectFirst { case l: LayoutMsg => l }
      (space, dt, layout) match {
        case (Some(s), Some(t), Some(l)) =>
          Some(name -> DatasetInfo(name, t.dtype, s.dims, l.dataAddress))
        case _ => None // a sub-group or unsupported object: skip, don't fail
      }
    }
    FileInfo(datasets.toMap, rootAttrs)
  }

  private sealed trait Msg
  private case class SymbolTableMsg(btreeAddr: Long, heapAddr: Long) extends Msg
  private case class DataspaceMsg(dims: Seq[Long]) extends Msg
  private case class DatatypeMsg(dtype: Dtype) extends Msg
  private case class LayoutMsg(dataAddress: Long) extends Msg

  /** Parse a version-1 object header (incl. continuation blocks); returns
    * recognized messages + string attributes. */
  private def parseObjectHeader(in: FSDataInputStream, addr: Long): (Seq[Msg], Map[String, String]) = {
    val pre = readBytes(in, addr, 16)
    val ver = pre.get(0) & 0xff
    require(ver == 1,
      s"unsupported object header version $ver (v2/'latest' libver unsupported)")
    val nMsgs = pre.getShort(2) & 0xffff
    val headerSize = pre.getInt(8)
    val msgs = scala.collection.mutable.ArrayBuffer.empty[Msg]
    val attrs = scala.collection.mutable.Map.empty[String, String]
    // block queue: (address, size); the first messages block starts at addr+16
    var blocks = List((addr + 16, headerSize))
    var seen = 0
    while (blocks.nonEmpty && seen < nMsgs) {
      val (bAddr, bSize) = blocks.head
      blocks = blocks.tail
      val bb = readBytes(in, bAddr, bSize)
      while (bb.remaining() >= 8 && seen < nMsgs) {
        val mType = bb.getShort() & 0xffff
        val mSize = bb.getShort() & 0xffff
        bb.get(); bb.get(); bb.get(); bb.get() // flags + reserved
        val body = new Array[Byte](mSize)
        if (bb.remaining() < mSize) { bb.position(bb.limit()) }
        else {
          bb.get(body)
          val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
          mType match {
            case 0x0011 => msgs += SymbolTableMsg(b.getLong, b.getLong)
            case 0x0001 => parseDataspace(b).foreach(msgs += DataspaceMsg(_))
            case 0x0003 => parseDatatype(b).foreach(msgs += DatatypeMsg(_))
            case 0x0008 =>
              val v = b.get() & 0xff
              require(v == 3, s"unsupported data layout version $v")
              val cls = b.get() & 0xff
              require(cls == 1,
                s"unsupported layout class $cls (only contiguous; chunked/compact " +
                  "datasets need h5py defaults — no chunks/compression)")
              msgs += LayoutMsg(b.getLong)
            case 0x000C => parseAttribute(b, in).foreach { case (k, v) => attrs(k) = v }
            case 0x0010 => blocks = (b.getLong, b.getLong.toInt) :: blocks
            case _ => () // NIL, fill value, mod time, …: skip
          }
          seen += 1
        }
      }
    }
    (msgs.toSeq, attrs.toMap)
  }

  private def parseDataspace(b: ByteBuffer): Option[Seq[Long]] = {
    val ver = b.get() & 0xff
    val rank = b.get() & 0xff
    val flags = b.get() & 0xff
    if (ver == 1) { b.get(); b.getInt() } // reserved(5)
    else b.get() // v2: type byte
    Some((0 until rank).map(_ => b.getLong))
  }

  private def parseDatatype(b: ByteBuffer): Option[Dtype] = {
    val classAndVer = b.get() & 0xff
    val cls = classAndVer & 0x0f
    val bits0 = b.get() & 0xff
    b.get(); b.get() // bit field bytes 1-2
    val size = b.getInt()
    cls match {
      case 0 => // fixed-point
        val signed = (bits0 & 0x08) != 0
        (size, signed) match {
          case (4, true) => Some(I32)
          case (1, false) => Some(U8)
          case _ => None
        }
      case 1 => // floating-point
        size match { case 4 => Some(F32); case 8 => Some(F64); case _ => None }
      case _ => None // strings etc. — not a vector dataset
    }
  }

  /** Attribute message v1: returns (name, value) for scalar string
    * attributes — fixed-length (class 3, what [[write]] emits) and
    * variable-length (class 9, what h5py emits for `f.attrs["distance"]`;
    * the value lives in a global heap collection). Others → None. */
  private[graft] def parseAttribute(b: ByteBuffer, in: FSDataInputStream): Option[(String, String)] = {
    val ver = b.get() & 0xff
    if (ver != 1) return None
    b.get() // reserved
    val nameSize = b.getShort() & 0xffff
    val dtSize = b.getShort() & 0xffff
    val dsSize = b.getShort() & 0xffff
    def pad8(n: Int) = (n + 7) / 8 * 8
    val name = new Array[Byte](pad8(nameSize))
    b.get(name)
    val nm = new String(name.takeWhile(_ != 0), StandardCharsets.UTF_8)
    val dt = new Array[Byte](pad8(dtSize)); b.get(dt)
    val dtb = ByteBuffer.wrap(dt).order(ByteOrder.LITTLE_ENDIAN)
    val cls = dtb.get() & 0x0f
    dtb.get(); dtb.get(); dtb.get()
    val elemSize = dtb.getInt()
    val ds = new Array[Byte](pad8(dsSize)); b.get(ds)
    cls match {
      case 3 =>
        val v = new Array[Byte](math.min(elemSize, b.remaining()))
        b.get(v)
        Some(nm -> new String(v.takeWhile(_ != 0), StandardCharsets.UTF_8))
      case 9 if b.remaining() >= 16 =>
        // vlen descriptor: u32 length, u64 global-heap addr, u32 object idx
        val len = b.getInt()
        val heapAddr = b.getLong()
        val objIdx = b.getInt()
        readGlobalHeapObject(in, heapAddr, objIdx).map { bytes =>
          nm -> new String(bytes, 0, math.min(len, bytes.length), StandardCharsets.UTF_8)
        }
      case _ => None
    }
  }

  /** Fetch one object from a global heap collection (GCOL — the storage
    * h5py uses for variable-length string attribute values). */
  private[graft] def readGlobalHeapObject(in: FSDataInputStream, addr: Long,
      objIdx: Int): Option[Array[Byte]] = {
    if (addr == UNDEF || addr < 0) return None
    val hdr = readBytes(in, addr, 16)
    if (hdr.getInt(0) != leSig("GCOL")) return None
    val collSize = hdr.getLong(8)
    val body = readBytes(in, addr + 16, (collSize - 16).toInt)
    while (body.remaining() >= 16) {
      val idx = body.getShort() & 0xffff
      body.getShort(); body.getInt() // refcount + reserved
      val size = body.getLong()
      if (idx == 0) return None // free-space object terminates the walk
      val data = new Array[Byte](size.toInt)
      if (body.remaining() < data.length) return None
      body.get(data)
      if (idx == objIdx) return Some(data)
      body.position(body.position() + ((8 - size % 8) % 8).toInt) // pad to 8
    }
    None
  }

  /** Walk a group's v1 B-tree → SNOD symbol nodes → (name, header addr). */
  private def readSymbolTable(in: FSDataInputStream, btreeAddr: Long,
                              heapAddr: Long): Seq[(String, Long)] = {
    val hh = readBytes(in, heapAddr, 32)
    require(hh.getInt(0) == leSig("HEAP"), "bad local heap signature")
    val heapDataAddr = hh.getLong(24)
    val heapDataSize = hh.getLong(8).toInt
    val heapData = readBytes(in, heapDataAddr, heapDataSize)
    def nameAt(off: Long): String = {
      val sb = new StringBuilder
      var i = off.toInt
      while (i < heapDataSize && heapData.get(i) != 0) { sb.append(heapData.get(i).toChar); i += 1 }
      sb.toString
    }
    def walk(addr: Long): Seq[Long] = { // returns SNOD addresses
      val hdr = readBytes(in, addr, 24)
      require(hdr.getInt(0) == leSig("TREE"), "bad B-tree signature")
      val level = hdr.get(5) & 0xff
      val used = hdr.getShort(6) & 0xffff
      // children at offset 24 + key(8), alternating key/child
      val body = readBytes(in, addr + 24, (2 * used + 1) * 8)
      val children = (0 until used).map(i => body.getLong(8 + i * 16))
      if (level == 0) children else children.flatMap(walk)
    }
    walk(btreeAddr).flatMap { snodAddr =>
      val sh = readBytes(in, snodAddr, 8)
      require(sh.getInt(0) == leSig("SNOD"), "bad symbol node signature")
      val n = sh.getShort(6) & 0xffff
      val entries = readBytes(in, snodAddr + 8, n * 40)
      (0 until n).map { i =>
        val nameOff = entries.getLong(i * 40)
        val objAddr = entries.getLong(i * 40 + 8)
        (nameAt(nameOff), objAddr)
      }
    }
  }

  private def leSig(s: String): Int =
    ByteBuffer.wrap(s.getBytes(StandardCharsets.US_ASCII))
      .order(ByteOrder.LITTLE_ENDIAN).getInt

  // =========================== writer ===================================

  /** A dataset to write: 2-D row-major data pulled from `df` in `orderCol`
    * order. `vecCol` must be `array<float>` for [[F32]] / `array<int>` for
    * [[I32]]. */
  case class Spec(name: String, df: DataFrame, orderCol: String, vecCol: String,
                  dtype: Dtype = F32)

  /** Write an h5py-layout-compatible HDF5 file: version-0 superblock,
    * old-style root group (B-tree + local heap + SNOD), version-1 object
    * headers, contiguous data. Metadata is laid out first, then each
    * dataset's rows stream through one output (the format is a single
    * file — an export utility, like [[VectorFiles.write]]; Parquet is the
    * at-scale sink). */
  def write(spark: SparkSession, path: String, specs: Seq[Spec],
            attrs: Map[String, String] = Map.empty): Unit = {
    require(specs.nonEmpty, "need at least one dataset")
    import org.apache.spark.sql.functions.{col, size => asize}
    // measure shapes up front (driver-side aggregates; data streams later)
    val shaped = specs.map { s =>
      val n = s.df.count()
      val dim = s.df.select(asize(col(s.vecCol))).head().getInt(0)
      (s, n, dim)
    }.sortBy(_._1.name) // symbol tables are name-sorted
    val names = shaped.map(_._1.name)
    require(names.distinct.size == names.size, "duplicate dataset names")

    // ---- address layout (all metadata sizes are closed-form) ----
    val sbSize = 96L
    // root header: prelude(16) + stab msg(8+16) + attr msgs
    val attrBodies = attrs.toSeq.sortBy(_._1).map { case (k, v) => attrBody(k, v) }
    val rootHeaderSize = 16L + 24L + attrBodies.map(b => 8L + b.length).sum
    val rootHeaderAddr = sbSize
    val btreeAddr = rootHeaderAddr + rootHeaderSize
    val btreeSize = 24L + (2 * 4) * 16L + 8L // k=4 leaf: 8 key/child pairs + final key
    val heapHeaderAddr = btreeAddr + btreeSize
    val heapHeaderSize = 32L
    // heap data: 8 reserved bytes then each name null-terminated padded to 8
    val nameOffsets = scala.collection.mutable.Map.empty[String, Long]
    var heapCursor = 8L
    names.foreach { nm =>
      nameOffsets(nm) = heapCursor
      heapCursor += (nm.length + 1 + 7) / 8 * 8
    }
    val heapDataAddr = heapHeaderAddr + heapHeaderSize
    val heapDataSize = heapCursor
    val snodAddr = heapDataAddr + heapDataSize
    val snodSize = 8L + 40L * names.size
    // per-dataset object headers: prelude(16) + dataspace(8+body) +
    // datatype(8+body) + layout(8+24)
    var cursor = snodAddr + snodSize
    val dsHeader = shaped.map { case (s, n, dim) =>
      val spaceBody = 8 + 2 * 2 * 8 // v1, rank2, dims+maxdims
      // v1 object-header message bodies must be 8-byte multiples
      // (libhdf5 H5O_ALIGN); float body is 20 -> 24, fixed-point 12 -> 16
      val dtBody = s.dtype match {
        case F32 | F64 => 24
        case I32 | U8 => 16
      }
      val hSize = 16L + (8 + spaceBody) + (8 + dtBody) + (8 + 24)
      val a = cursor
      cursor += hSize
      (s.name, a, hSize)
    }
    val dataAddrs = scala.collection.mutable.Map.empty[String, Long]
    shaped.foreach { case (s, n, dim) =>
      dataAddrs(s.name) = cursor
      cursor += n * dim.toLong * s.dtype.elemBytes
    }
    val eof = cursor

    val fs = FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      fs.create(new Path(path), true), 1 << 20))
    def bb(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    try {
      // superblock v0
      val sb = bb(96)
      sb.put(SIG)
      sb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // versions+reserved
      sb.put(0.toByte).put(8.toByte).put(8.toByte).put(0.toByte) // shm ver, offsets, lengths
      // leaf k sized so the single SNOD's entry count stays within the
      // conforming-reader cap of 2k entries per symbol node
      sb.putShort(math.max(4, (names.size + 1) / 2).toShort).putShort(16)
      sb.putInt(0) // consistency flags
      sb.putLong(0L).putLong(UNDEF).putLong(eof).putLong(UNDEF)
      // root symbol table entry: name off 0, header addr, cache type 1 + scratch
      sb.putLong(0L).putLong(rootHeaderAddr).putInt(1).putInt(0)
      sb.putLong(btreeAddr).putLong(heapHeaderAddr)
      out.write(sb.array())
      // root object header: symbol table msg + attributes
      val rh = bb(rootHeaderSize.toInt)
      rh.put(1.toByte).put(0.toByte).putShort((1 + attrBodies.size).toShort)
      rh.putInt(1).putInt((rootHeaderSize - 16).toInt).putInt(0)
      rh.putShort(0x0011).putShort(16).putInt(0)
      rh.putLong(btreeAddr).putLong(heapHeaderAddr)
      attrBodies.foreach { body =>
        rh.putShort(0x000C).putShort(body.length.toShort).putInt(0)
        rh.put(body)
      }
      out.write(rh.array())
      // B-tree v1: one leaf, one SNOD child; keys are heap name offsets
      val bt = bb(btreeSize.toInt)
      bt.putInt(leSig("TREE")).put(0.toByte).put(0.toByte).putShort(1)
      bt.putLong(UNDEF).putLong(UNDEF)
      bt.putLong(0L) // key0: empty string at heap offset 0
      bt.putLong(snodAddr)
      bt.putLong(nameOffsets(names.last)) // key1: largest name
      out.write(bt.array()) // rest zero-padded
      // local heap header + data
      val hh = bb(32)
      hh.putInt(leSig("HEAP")).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      hh.putLong(heapDataSize).putLong(1L /* no free list */).putLong(heapDataAddr)
      out.write(hh.array())
      val hd = bb(heapDataSize.toInt)
      names.foreach { nm =>
        hd.position(nameOffsets(nm).toInt)
        hd.put(nm.getBytes(StandardCharsets.US_ASCII)).put(0.toByte)
      }
      out.write(hd.array())
      // SNOD (entries name-sorted, matching `names`)
      val sn = bb(snodSize.toInt)
      sn.putInt(leSig("SNOD")).put(1.toByte).put(0.toByte).putShort(names.size.toShort)
      shaped.zip(dsHeader).foreach { case ((s, _, _), (_, hAddr, _)) =>
        sn.putLong(nameOffsets(s.name)).putLong(hAddr).putInt(0).putInt(0)
        sn.putLong(0L).putLong(0L)
      }
      out.write(sn.array())
      // dataset object headers
      shaped.zip(dsHeader).foreach { case ((s, n, dim), (_, _, hSize)) =>
        val h = bb(hSize.toInt)
        h.put(1.toByte).put(0.toByte).putShort(3)
        h.putInt(1).putInt((hSize - 16).toInt).putInt(0)
        // dataspace v1: rank 2, flags=1 (max dims present)
        h.putShort(0x0001).putShort((8 + 32).toShort).putInt(0)
        h.put(1.toByte).put(2.toByte).put(1.toByte).put(0.toByte).putInt(0)
        h.putLong(n).putLong(dim.toLong).putLong(n).putLong(dim.toLong)
        // datatype v1 (bodies padded to the 8-byte message alignment)
        s.dtype match {
          case F32 =>
            h.putShort(0x0003).putShort(24).putInt(0)
            h.put(0x11.toByte) // v1, class 1 float
            h.put(0x20.toByte).put(0x1f.toByte).put(0.toByte) // LE, norm=implied, sign bit 31
            h.putInt(4)
            h.putShort(0).putShort(32) // bit offset, precision
            h.put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte) // exp loc/sz, man loc/sz
            h.putInt(127) // exponent bias
            h.putInt(0) // alignment pad
          case F64 =>
            h.putShort(0x0003).putShort(24).putInt(0)
            h.put(0x11.toByte)
            h.put(0x20.toByte).put(63.toByte).put(0.toByte)
            h.putInt(8)
            h.putShort(0).putShort(64)
            h.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte)
            h.putInt(1023)
            h.putInt(0) // alignment pad
          case I32 =>
            h.putShort(0x0003).putShort(16).putInt(0)
            h.put(0x10.toByte) // v1, class 0 fixed-point
            h.put(0x08.toByte).put(0.toByte).put(0.toByte) // LE, signed
            h.putInt(4)
            h.putShort(0).putShort(32)
            h.putInt(0) // alignment pad
          case U8 =>
            h.putShort(0x0003).putShort(16).putInt(0)
            h.put(0x10.toByte)
            h.put(0x00.toByte).put(0.toByte).put(0.toByte) // LE, unsigned
            h.putInt(1)
            h.putShort(0).putShort(8)
            h.putInt(0) // alignment pad
        }
        // layout v3 contiguous
        h.putShort(0x0008).putShort(24).putInt(0)
        h.put(3.toByte).put(1.toByte)
        h.putLong(dataAddrs(s.name)).putLong(n * dim.toLong * s.dtype.elemBytes)
        out.write(h.array())
      }
      // data blocks, row-major, in spec order (== name order)
      shaped.foreach { case (s, n, dim) =>
        val sorted = s.df
          .select(org.apache.spark.sql.functions.col(s.orderCol),
            org.apache.spark.sql.functions.col(s.vecCol))
          .orderBy(s.orderCol)
        val rowBuf = bb(dim * s.dtype.elemBytes)
        if (s.dtype == I32) {
          import spark.implicits._
          val it = sorted.select(s.vecCol).as[Array[Int]].toLocalIterator()
          var rows = 0L
          while (it.hasNext) {
            val v = it.next(); require(v.length == dim, s"ragged row in ${s.name}")
            rowBuf.clear(); v.foreach(rowBuf.putInt)
            out.write(rowBuf.array()); rows += 1
          }
          require(rows == n, s"row count changed during write of ${s.name}")
        } else {
          import spark.implicits._
          val it = sorted.select(s.vecCol).as[Array[Float]].toLocalIterator()
          var rows = 0L
          while (it.hasNext) {
            val v = it.next(); require(v.length == dim, s"ragged row in ${s.name}")
            rowBuf.clear()
            s.dtype match {
              case F32 => v.foreach(rowBuf.putFloat)
              case F64 => v.foreach(x => rowBuf.putDouble(x.toDouble))
              case U8 => v.foreach(x => rowBuf.put(x.toInt.toByte))
              case I32 => ()
            }
            out.write(rowBuf.array()); rows += 1
          }
          require(rows == n, s"row count changed during write of ${s.name}")
        }
      }
    } finally out.close()
  }

  /** Attribute message v1 body for a scalar fixed-length-string attribute
    * (the shape h5py writes for `f.attrs["distance"] = "euclidean"`). */
  private def attrBody(name: String, value: String): Array[Byte] = {
    def pad8(n: Int) = (n + 7) / 8 * 8
    val nameB = name.getBytes(StandardCharsets.UTF_8)
    val valB = value.getBytes(StandardCharsets.UTF_8)
    val nameSize = nameB.length + 1
    val dtSize = 8 + 0 // class 3 string: just the 8-byte datatype header
    val dsSize = 8 // v1 scalar: rank 0
    val total = 8 + pad8(nameSize) + pad8(dtSize) + pad8(dsSize) + valB.length
    val b = ByteBuffer.allocate(pad8(total)).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(0.toByte)
    b.putShort(nameSize.toShort).putShort(dtSize.toShort).putShort(dsSize.toShort)
    b.put(nameB).put(0.toByte)
    b.position(8 + pad8(nameSize))
    // datatype: v1 class 3 (string), null-terminated ASCII, size = len+1? h5py
    // uses exact-size null-padded; we store size = value length
    b.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(valB.length)
    b.position(8 + pad8(nameSize) + pad8(dtSize))
    // dataspace v1 scalar: rank 0, flags 0, reserved(5)
    b.put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(0)
    b.position(8 + pad8(nameSize) + pad8(dtSize) + pad8(dsSize))
    b.put(valB)
    b.array()
  }
}
