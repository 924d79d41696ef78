package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the LLM-pipeline surface (builder north
  * star): media ride as opaque `binary` payloads with typed metadata, and
  * the per-item transforms (decode, feature-extract, resize, frame-sample)
  * are column operators over those bytes.
  *
  * REAL here: the schema, partitioning posture, batch shapes, and every
  * byte-level operator (stats, entropy, frame slicing, chunk features).
  * STUBBED here: the actual codec. This container has no image/audio
  * libraries, so `fakeEmbedding` is a clearly-marked deterministic
  * stand-in for "decode + model forward": it hashes fixed-size byte chunks
  * into a float vector. Swapping it for a real decoder changes ONE
  * expression; every downstream operator (kNN, dedup, IVF) is already
  * exercised against the fake features.
  *
  * 100 TB posture: payloads are the wide column — always project them away
  * before shuffles (operators here emit compact features, never the
  * bytes), and size `maxPartitionBytes` so a partition of payloads fits in
  * memory.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video|text
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_channels", IntegerType))))))

  /** Byte length of the payload. */
  def payloadBytes(payload: Column): Column = length(payload)

  /** Shannon entropy (nats) of the payload's byte distribution — a cheap
    * corruption / compressibility signal. Row-local kernel: a payload's
    * histogram needs only its own row, so exploding every byte into the
    * shuffle (the groupBy(id, byte) shape) is pure overhead at any scale.
    * Char semantics match `ascii(substr(payload::string, i, 1))` — the
    * payload is decoded as UTF-8 and counted per character — so the DuckDB
    * oracle replays identically. Accumulation runs in ascending char order
    * (deterministic; differences vs any other order are below the 4dp
    * rounding every consumer applies). */
  def byteEntropy(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
        if (s.isEmpty) None // empty payloads had no histogram rows before
        else {
          val counts = new java.util.TreeMap[Int, Int]()
          var i = 0
          while (i < s.length) { counts.merge(s.charAt(i).toInt, 1, (a, b) => a + b); i += 1 }
          val n = s.length.toDouble
          var ent = 0.0
          counts.forEach { (_, c) => val p = c / n; ent -= p * math.log(p) }
          Some((id, ent))
        }
      }
      .toDF(idCol, "entropy")
  }

  /** Evenly-strided fixed-size frame samples of the payload — the
    * frame-sample operator (video/audio windowing): n frames of
    * `frameBytes` bytes each, evenly spaced. */
  def frameSample(payload: Column, nFrames: Int, frameBytes: Int): Column =
    transform(sequence(lit(0), lit(nFrames - 1)), f =>
      payload.cast("string").substr(
        (f * greatest(floor((length(payload) - frameBytes) /
          lit(math.max(nFrames - 1, 1))).cast("int"), lit(1))) + 1,
        lit(frameBytes)))

  /** "Resize": truncate-or-cycle the payload to exactly `outBytes` — the
    * shape-normalization stub standing in for a pixel resample. */
  def resizeBytes(payload: Column, outBytes: Int): Column =
    substring(concat(payload.cast("string"), payload.cast("string")), 1, outBytes)

  /** THE CODEC SWAP POINT. A codec is any row-local, deterministic,
    * serializable `Array[Byte] => Array[Float]` returning a fixed-length
    * vector for every input (including empty payloads). That one contract
    * is the entire integration surface for a real decoder: swap the
    * function, everything downstream (kNN, dedup, IVF, the oracle-gated
    * queries) consumes the resulting embedding column unchanged.
    * `MultimodalSuite` is the contract's executable form — it runs the
    * embed→kNN pipeline against a second, structurally different codec
    * and asserts identical schema, plan shape, and payload pruning. */
  type Codec = Array[Byte] => Array[Float]

  /** Lift a codec into a column operator over the payload bytes. A JVM
    * function rather than a SQL expression tree: the real decoder slot is
    * exactly this shape (bytes in, floats out, row-local). */
  def embedWith(codec: Codec)(payload: Column): Column =
    udf(codec).apply(payload.cast("binary"))

  /** DETERMINISTIC FAKE of decode + feature extraction: split the payload
    * into `dim` contiguous chunks and map each chunk's char-code sum into
    * [0, 1). Stands in for a real image/audio model embedding (see class
    * doc). Chunk arithmetic (chunkLen = max(len/dim, 1), chunk c = chars
    * [c·chunkLen, c·chunkLen + chunkLen), sum % 1000 / 1000) runs over
    * the UTF-8-decoded chars, so the DuckDB oracle replays it. */
  def fakeCodec(dim: Int): Codec = { bytes: Array[Byte] =>
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val n = s.length
    val chunkLen = math.max(n / dim, 1)
    Array.tabulate(dim) { c =>
      var sum = 0L
      var i = c * chunkLen
      val end = math.min(i + chunkLen, n)
      while (i < end) { sum += s.charAt(i).toInt; i += 1 }
      ((sum % 1000).toDouble / 1000.0).toFloat
    }
  }

  /** The stubbed decode+embed column (see fakeCodec / embedWith). */
  def fakeEmbedding(payload: Column, dim: Int = 16): Column =
    embedWith(fakeCodec(dim))(payload)
}
