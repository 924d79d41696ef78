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
    * corruption / compressibility signal. Pure SQL: explode byte positions
    * via sequence, count frequencies with aggregate-free groupBy upstream
    * is avoided by the closed form over the 256-bin histogram. */
  def byteEntropy(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val bytes = df.select(col(idCol), explode(
        transform(sequence(lit(1), length(col(payloadCol))),
          i => substring_pos(col(payloadCol), i))).as("b"))
    val freq = bytes.groupBy(col(idCol), col("b")).count()
    val tot = freq.groupBy(col(idCol)).agg(sum(col("count")).as("n"))
    freq.join(tot, idCol)
      .select(col(idCol),
        (col("count") / col("n")).as("p"))
      .groupBy(col(idCol))
      .agg((-sum(col("p") * log(col("p")))).as("entropy"))
  }

  private def substring_pos(payload: Column, i: Column): Column =
    ascii(payload.cast("string").substr(i, lit(1)))

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

  /** DETERMINISTIC FAKE of decode + feature extraction: split the payload
    * into `dim` contiguous chunks and map each chunk's byte-code sum into
    * [0, 1). Stands in for a real image/audio model embedding (see class
    * doc); everything downstream treats it as a real embedding column. */
  def fakeEmbedding(payload: Column, dim: Int = 16): Column = {
    val s = payload.cast("string")
    // one pass over the bytes, then O(1) slices per chunk
    val codes = transform(split(s, ""), ch => coalesce(ascii(ch).cast("long"), lit(0L)))
    transform(sequence(lit(0), lit(dim - 1)), c => {
      val chunkLen = greatest(floor(length(s) / dim).cast("int"), lit(1))
      val chunk = slice(codes, c * chunkLen + 1, chunkLen)
      ((aggregate(chunk, lit(0L), (acc, x) => acc + x) % 1000)
        .cast("double") / 1000.0).cast("float")
    })
  }
}
