package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators of the LLM-pipeline extension (SURVEY.md §2.9):
  * exact (hash-group), n-gram Jaccard, MinHash+LSH, SimHash, embedding
  * cosine near-dup. All pure DataFrame ops over codegen'd primitives with
  * portable integer hashes, so every stage has an exact DuckDB oracle.
  *
  * 100 TB posture: the only quadratic step (candidate verification) is
  * reached through an inverted-index equi-join (shingle -> doc) or an LSH
  * band-bucket join — never a cross join. High-frequency shingles are the
  * skew/explosion risk; `maxDfFrac` drops them (the standard df cut), and
  * the band join shuffles only (band_key, doc) pairs.
  */
object Dedup {

  /** (id, shingle) exploded inverted index, distinct per doc (substr with a
    * column start position needs the SQL-expression form). */
  def shingleDf(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        explode(array_distinct(expr(
          s"transform(sequence(1, greatest(length($textCol) - ${n - 1}, 0)), " +
          s"i -> substr($textCol, i, $n))"))).as("shingle"))

  /** Exact duplicate groups by content hash: (text_hash, n, keeper). */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String,
      onlyDups: Boolean = false): DataFrame = {
    val g = df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n"), min(col(idCol).cast("long")).as("keeper"))
    if (onlyDups) g.filter(col("n") > 1) else g
  }

  /** Portable 3..8-char shingle hash: base-31 polynomial over ascii codes
    * (fixed length -> closed form, exactly replicable in SQL). */
  def shingleHash(sh: Column, n: Int): Column =
    (0 until n).map(k =>
      ascii(substring(sh, k + 1, 1)).cast("long") * math.pow(31, n - 1 - k).toLong)
      .reduce(_ + _)

  /** All pairs (a < b) with n-gram Jaccard >= minJaccard, via the
    * inverted-index join (never a cross product). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minJaccard: Double = 0.5, maxDfFrac: Double = 1.0): DataFrame = {
    val nDocs = df.count()
    val sh = shingleDf(df, idCol, textCol, n)
    val filtered =
      if (maxDfFrac >= 1.0) sh
      else {
        val keep = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= (maxDfFrac * nDocs))
        sh.join(keep.select("shingle"), "shingle")
      }
    val sizes = filtered.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = filtered.as("x").join(filtered.as("y"), "shingle")
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Distinct-shingle base-31 hashes of one document, computed row-local —
    * identical to shingleDf + shingleHash (distinct is over the SHINGLE
    * strings; two distinct shingles colliding to one hash value stay two
    * entries, exactly as the exploded form). Empty when the text is
    * shorter than n (such docs have no signature rows in either form). */
  private def localShingleHashes(text: String, n: Int): Array[Long] = {
    val seen = new java.util.HashSet[String]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var i = 0
    while (i + n <= text.length) {
      val sh = text.substring(i, i + n)
      if (seen.add(sh)) {
        var h = 0L
        var k = 0
        while (k < n) { h = h * 31 + sh.charAt(k).toInt; k += 1 }
        out += h
      }
      i += 1
    }
    out.toArray
  }

  /** MinHash signatures: mh_j = min over shingles of (A_j*h + B_j) mod P,
    * A_j = 2j+1, B_j = j^2+7 (deterministic affine family), P = 2^31-1.
    * Row-local kernel: a doc's shingle set needs only its own row, so the
    * explode + 16-way min aggregate — a full shuffle of the shingle
    * stream — is pure overhead at any scale. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, numHashes: Int = 16): DataFrame = {
    val P = 2147483647L
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val hs = localShingleHashes(text, n)
        if (hs.isEmpty) None
        else Some((id, Array.tabulate(numHashes) { j =>
          var mn = Long.MaxValue
          hs.foreach { h =>
            val v = (h * (2 * j + 1) + (j.toLong * j + 7)) % P
            if (v < mn) mn = v
          }
          mn
        }))
      }
      .toDF("id", "sig")
      .select(col("id") +:
        (0 until numHashes).map(j => element_at(col("sig"), j + 1).as(s"mh$j")): _*)
  }

  /** LSH band-bucket candidates + exact Jaccard verify: banding the
    * signature (numHashes/bandRows bands), pairs colliding in >= 1 band,
    * then verified against minJaccard. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, numHashes: Int = 16, bandRows: Int = 4,
      minJaccard: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, n, numHashes)
    val nBands = numHashes / bandRows
    val bands = (0 until nBands).map { b =>
      val key = concat_ws("_",
        (0 until bandRows).map(r => col(s"mh${b * bandRows + r}")): _*)
      sigs.select(col("id"), lit(b).as("band"), key.as("bkey"))
    }.reduce(_ unionByName _)
    val cands = bands.as("x").join(bands.as("y"), Seq("band", "bkey"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    // verify candidates with exact shingle Jaccard
    val sh = shingleDf(df, idCol, textCol, n)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    cands
      .join(sh.select(col("id").as("a"), col("shingle")), "a")
      .join(sh.select(col("id").as("b"), col("shingle")), Seq("b", "shingle"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** 32-bit SimHash over distinct shingles: rehash h2 = (1000003*h + 12345)
    * mod 2^31-1; bit b of the sketch = sign of sum over shingles of
    * (bit b of h2 ? +1 : -1). Row-local kernel like minhashSignatures —
    * the bit-sum needs only the doc's own shingle set. */
  def simhash(df: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val P = 2147483647L
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).cast("string").as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val hs = localShingleHashes(text, n)
        if (hs.isEmpty) None
        else {
          val bitSums = new Array[Int](32)
          hs.foreach { h =>
            val h2 = (h * 1000003L + 12345L) % P
            var b = 0
            while (b < 32) {
              bitSums(b) += (if (((h2 >> b) & 1L) == 1L) 1 else -1)
              b += 1
            }
          }
          var sk = 0L
          var b = 0
          while (b < 32) { if (bitSums(b) > 0) sk |= (1L << b); b += 1 }
          Some((id, sk))
        }
      }
      .toDF("id", "simhash")
  }

  /** SimHash near-dup pairs: hamming(simhash) <= maxHamming, a < b. */
  def simhashPairs(sketches: DataFrame, maxHamming: Int): DataFrame =
    sketches.as("x").select(col("id").as("a"), col("simhash").as("ha"))
      .crossJoin(sketches.as("y").select(col("id").as("b"), col("simhash").as("hb")))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)

  /** Embedding-space near-duplicates: cosine distance < eps, a < b —
    * the eps range join specialized to dedup. */
  def embeddingNearDup(df: DataFrame, eps: Double,
      idCol: String = "id", vecCol: String = "vec"): DataFrame =
    graft.ops.PairwiseDistance.epsNeighborhood(
        df, df, eps, graft.core.Metric.Cosine, idCol, vecCol, idCol, vecCol)
      .filter(col("aid") < col("bid"))
}
