package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.multimodal.Multimodal
import graft.ops.SparseKnn

/** Driver queries + oracles for sparse search, the tiered index, and the
  * multimodal byte-column surface. */
object MiscQueries {

  // ===== sparse kNN over TF vectors from documents ======================

  /** Portable token hash -> dimension in [0, 256): base-31 over the first
    * 3 chars plus length*7 (identical integer form in the SQL oracle). */
  private val tokenDimSql =
    "CAST((ascii(substr(t, 1, 1)) * 961 + ascii(substr(t, 2, 1)) * 31 + ascii(substr(t, 3, 1)) + len(t) * 7) % 256 AS INT)"

  /** TF vectors per document, computed row-local (no shuffle): a doc's
    * tokens live in its own row, so the explode + groupBy(id, dim) +
    * collect_list shape — two full shuffles of the token stream — is pure
    * overhead at any scale. Hash formula identical to `tokenDimSql`. */
  private def sparseVecs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    SparkEntry.table(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val counts = new java.util.TreeMap[Int, Int]()
        text.toLowerCase(java.util.Locale.ROOT).split(' ').foreach { t =>
          if (t.nonEmpty) {
            val c1 = t.charAt(0).toInt
            val c2 = if (t.length > 1) t.charAt(1).toInt else 0
            val c3 = if (t.length > 2) t.charAt(2).toInt else 0
            val dim = (c1 * 961 + c2 * 31 + c3 + t.length * 7) % 256
            counts.merge(dim, 1, (a, b) => a + b)
          }
        }
        val idx = new Array[Int](counts.size)
        val vs = new Array[Float](counts.size)
        var i = 0
        counts.forEach { (d, c) => idx(i) = d; vs(i) = c.toFloat; i += 1 }
        (id, idx, vs)
      }
      .toDF("id", "indices", "values")
  }

  private def sparseKnnQuery(spark: SparkSession, dir: String): DataFrame = {
    // materialize the TF derivation once — both the dataset side and the
    // filtered query side read it (otherwise the explode + two groupBys
    // run twice)
    val vecs = sparseVecs(spark, dir).localCheckpoint()
    val q = vecs.filter(col("id") % 20 === 0)
      .select(col("id").as("qid"), col("indices").as("qindices"), col("values").as("qvalues"))
    SparseKnn.knnJoin(vecs, q, 10, Metric.Cosine)
      .select(col("qid"), col("nbr_id"), col("rank"), round(col("dist"), 4).as("dist"))
  }

  private val sparseKnnOracle: String =
    s"""WITH toks AS (SELECT doc_id AS id, unnest(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS t
       |  FROM documents),
       |nz AS (SELECT id, $tokenDimSql AS dim, CAST(CAST(count(*) AS FLOAT) AS DOUBLE) AS v
       |  FROM toks GROUP BY 1, 2),
       |nrm AS (SELECT id, sum(v * v) AS norm2 FROM nz GROUP BY 1),
       |q AS (SELECT id AS qid FROM nrm WHERE id % 20 = 0),
       |dots AS (SELECT a.id AS qid, b.id AS id, sum(a.v * b.v) AS dot
       |  FROM nz a JOIN nz b ON a.dim = b.dim WHERE a.id % 20 = 0 GROUP BY 1, 2),
       |pairs AS (SELECT q.qid, n.id, coalesce(d.dot, 0.0) AS dot, qn.norm2 AS qnorm2, n.norm2
       |  FROM q CROSS JOIN nrm n
       |  JOIN nrm qn ON qn.id = q.qid
       |  LEFT JOIN dots d ON d.qid = q.qid AND d.id = n.id),
       |dist AS (SELECT qid, id,
       |  CASE WHEN qnorm2 = 0 OR norm2 = 0 THEN 1.0
       |       ELSE 1.0 - dot / sqrt(qnorm2 * norm2) END AS dist FROM pairs),
       |r AS (SELECT qid, id, dist,
       |  row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS rank FROM dist)
       |SELECT qid, id AS nbr_id, rank, round(dist, 4) AS dist FROM r WHERE rank <= 10""".stripMargin

  /** Sparse pairwise distances (CSR x CSR, distance.hpp:468 region) over
    * the overlapping document pairs — the inverted-index join route whose
    * kNN epilogue is sparse_knn_cosine; here the full distance output is
    * the query. Squared-L2 expanded form on TF counts is integer-exact. */
  private def sparsePairwiseQuery(spark: SparkSession, dir: String): DataFrame = {
    val vecs = sparseVecs(spark, dir).filter(col("id") % 10 === 0).localCheckpoint()
    SparseKnn.pairwiseOverlap(vecs, vecs, Metric.L2)
      .select(col("aid"), col("bid"), col("dist"))
  }

  private val sparsePairwiseOracle: String =
    s"""WITH toks AS (SELECT doc_id AS id, unnest(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS t
       |  FROM documents WHERE doc_id % 10 = 0),
       |nz AS (SELECT id, $tokenDimSql AS dim, CAST(CAST(count(*) AS FLOAT) AS DOUBLE) AS v
       |  FROM toks GROUP BY 1, 2),
       |nrm AS (SELECT id, sum(v * v) AS norm2 FROM nz GROUP BY 1),
       |dots AS (SELECT a.id AS aid, b.id AS bid, sum(a.v * b.v) AS dot
       |  FROM nz a JOIN nz b ON a.dim = b.dim GROUP BY 1, 2)
       |SELECT d.aid, d.bid, na.norm2 + nb.norm2 - 2 * d.dot AS dist
       |FROM dots d JOIN nrm na ON na.id = d.aid JOIN nrm nb ON nb.id = d.bid""".stripMargin

  // ===== tiered index (exact when the ANN tier probes all lists) ========

  private def tieredQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = SparkEntry.table(spark, dir, "embeddings")
    val base = e.filter(col("vec_id") % 5 =!= 0)
    val delta = e.filter(col("vec_id") % 5 === 0)
    val idx = graft.stream.TieredIndex.build(base,
        graft.index.IvfFlatIndex.Params(nLists = 8, nIters = 10), idCol = "vec_id",
        vecCol = "embedding")
      .extend(delta, "vec_id", "embedding")
    val q = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    idx.search(q, 10, nProbes = 8)
      .select(col("qid"), col("nbr_id"), col("rank"), round(col("dist"), 4).as("dist"))
  }

  /** Exact oracle: probing all 8 lists + exact delta == plain exact kNN
    * under squared L2. */
  private val tieredOracle: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 20 = 0),
      |d AS (SELECT q.qid, e.vec_id AS id,
      |      list_sum(list_transform(list_zip(q.qvec, e.embedding), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ^ 2)) AS dist
      |      FROM q CROSS JOIN embeddings e),
      |r AS (SELECT qid, id, dist,
      |      row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS rank FROM d)
      |SELECT qid, id AS nbr_id, rank, round(dist, 4) AS dist FROM r WHERE rank <= 10""".stripMargin

  // ===== multimodal byte-column surface =================================

  private def mediaTable(spark: SparkSession, dir: String): DataFrame =
    SparkEntry.table(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), lit("text").as("modality"),
        col("text").cast("binary").as("payload"),
        struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("n_channels")).as("meta"))

  private def multimodalStatsQuery(spark: SparkSession, dir: String): DataFrame = {
    val m = mediaTable(spark, dir)
    val ent = Multimodal.byteEntropy(m, "media_id", "payload")
    m.select(col("media_id"), Multimodal.payloadBytes(col("payload")).as("n_bytes"))
      .join(ent, "media_id")
      .select(col("media_id"), col("n_bytes"), round(col("entropy"), 4).as("entropy"))
  }

  private val multimodalStatsOracle: String =
    """WITH b AS (SELECT doc_id AS media_id, ascii(substr(text, CAST(i AS INT), 1)) AS byte
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i FROM documents)),
      |freq AS (SELECT media_id, byte, count(*) AS c FROM b GROUP BY 1, 2),
      |tot AS (SELECT media_id, sum(c) AS n FROM freq GROUP BY 1),
      |ent AS (SELECT f.media_id, -sum((c / n) * ln(c / n)) AS entropy
      |  FROM freq f JOIN tot USING (media_id) GROUP BY 1)
      |SELECT media_id, (SELECT length(text) FROM documents WHERE doc_id = media_id) AS n_bytes,
      |  round(entropy, 4) AS entropy
      |FROM ent""".stripMargin

  private def frameSampleQuery(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"),
        posexplode(Multimodal.frameSample(col("payload"), nFrames = 4, frameBytes = 64))
          .as(Seq("frame_idx", "frame")))
      .select(col("media_id"), col("frame_idx"), md5(col("frame").cast("binary")).as("frame_md5"))

  private val frameSampleOracle: String =
    """WITH f AS (SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
      |  substr(text, CAST(i AS INT) * greatest((length(text) - 64) // 3, 1) + 1, 64) AS frame
      |  FROM documents, (SELECT unnest([0, 1, 2, 3]) AS i))
      |SELECT media_id, frame_idx, md5(frame) AS frame_md5 FROM f""".stripMargin

  private def mediaEmbedKnnQuery(spark: SparkSession, dir: String): DataFrame = {
    // materialize the (fake-)decoded features once; both the dataset and
    // the query side read them (real pipelines persist decoded features
    // for the same reason — never re-decode per consumer)
    val m = mediaTable(spark, dir)
      .select(col("media_id"), Multimodal.fakeEmbedding(col("payload"), 16).as("vec"))
      .localCheckpoint()
    val q = m.filter(col("media_id") % 20 === 0)
      .select(col("media_id").as("qid"), col("vec").as("qvec"))
    graft.ops.BruteForceKnn.knnJoin(m, q, 5, Metric.Cosine, "media_id", "vec")
      .select(col("qid"), col("nbr_id"), col("rank"), round(col("dist"), 4).as("dist"))
  }

  private val mediaEmbedKnnOracle: String = {
    val chunkSum = """list_sum(list_transform(generate_series(1, len(chunk)), i -> CAST(ascii(substr(chunk, CAST(i AS INT), 1)) AS BIGINT)))"""
    s"""WITH emb AS (SELECT doc_id AS id,
       |  list_transform(generate_series(0, 15), c -> CAST(CAST(list_sum(list_transform(
       |      generate_series(1, greatest(length(text) // 16, 1)),
       |      i -> CAST(ascii(substr(text, CAST(c AS INT) * greatest(length(text) // 16, 1) + CAST(i AS INT), 1)) AS BIGINT))) % 1000 AS DOUBLE) / 1000.0 AS FLOAT)) AS vec
       |  FROM documents),
       |q AS (SELECT id AS qid, vec AS qvec FROM emb WHERE id % 20 = 0),
       |d AS (SELECT q.qid, e.id,
       |  CASE WHEN list_sum(list_transform(q.qvec, y -> CAST(y AS DOUBLE) ^ 2)) = 0
       |         OR list_sum(list_transform(e.vec, y -> CAST(y AS DOUBLE) ^ 2)) = 0 THEN 1.0
       |  ELSE 1.0 - list_sum(list_transform(list_zip(q.qvec, e.vec), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |    / sqrt(list_sum(list_transform(q.qvec, y -> CAST(y AS DOUBLE) ^ 2)) * list_sum(list_transform(e.vec, y -> CAST(y AS DOUBLE) ^ 2))) END AS dist
       |  FROM q CROSS JOIN emb e),
       |r AS (SELECT qid, id, dist, row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS rank FROM d)
       |SELECT qid, id AS nbr_id, rank, round(dist, 4) AS dist FROM r WHERE rank <= 5""".stripMargin
  }

  /** The REAL image codec end-to-end with an exact oracle: each doc's
    * first 48 bytes pack a 4x4 RGB raster, encoded as an actual binary
    * PPM file (ImageCodec.encodePpm), decoded back through the swap-point
    * codec (grayEmbedding, grid 4 — at grid == raster dims the resample
    * is the identity), emitting per-pixel BT.601 luma. DuckDB replays the
    * arithmetic from the text bytes, so the query proves the byte-level
    * container format (header, raw RGB payload) round-trips exactly;
    * float32 parity via an explicit FLOAT cast on both sides. */
  private def multimodalImageDecodeQuery(spark: SparkSession, dir: String): DataFrame = {
    val enc = udf { (text: String) =>
      val bytes = java.util.Arrays.copyOf(
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8), 48)
      graft.multimodal.ImageCodec.encodePpm(
        graft.multimodal.ImageCodec.Image(4, 4, bytes))
    }
    // printable-ASCII guard: the Spark side packs BYTES (UTF-8) while the
    // oracle reads CHAR code points — identical only for ASCII text, so
    // both sides filter to it explicitly rather than relying on the
    // current fixture happening to be ASCII-clean. \A..\z anchors: Java's
    // `$` also matches just BEFORE a final newline while DuckDB's RE2 `$`
    // matches only at end-of-text, so `$` would admit a trailing-newline
    // doc on the Spark side that the oracle excludes.
    SparkEntry.table(spark, dir, "documents")
      .filter(length(col("text")) >= 48 && col("text").rlike("\\A[ -~]*\\z"))
      .select(col("doc_id").as("media_id"),
        Multimodal.embedWith(graft.multimodal.ImageCodec.grayEmbedding(4))(
          enc(col("text"))).as("vec"))
      .select(col("media_id"), posexplode(col("vec")).as(Seq("pos", "v")))
      .select(col("media_id"), col("pos"), round(col("v").cast("double"), 4).as("luma"))
  }

  private val multimodalImageDecodeOracle: String =
    """SELECT doc_id AS media_id, CAST(s.i - 1 AS INT) AS pos,
      |  round(CAST(CAST((0.299 * ascii(substr(text, 3 * (s.i - 1) + 1, 1))
      |    + 0.587 * ascii(substr(text, 3 * (s.i - 1) + 2, 1))
      |    + 0.114 * ascii(substr(text, 3 * (s.i - 1) + 3, 1))) / 255.0 AS FLOAT) AS DOUBLE), 4) AS luma
      |FROM documents, generate_series(1, 16) s(i)
      |WHERE length(text) >= 48 AND regexp_matches(text, '^[ -~]*$')""".stripMargin

  // ===== event-time windowed aggregation (the batch twin of the
  // Structured Streaming watermark+window path; TieredIndexSuite drives
  // the streaming runtime itself) ========================================

  /** The events fixture has shipped with both TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) `ts` columns across testdata generations — adapt to
    * whichever this fixture carries. NANOS reads as long (nanosAsLong) and
    * is truncated to micros with INTEGER division (exactly what DuckDB's
    * reader does; `/` would go through double, whose 53-bit mantissa
    * cannot hold epoch nanos — ~1.5% of rows land 1us off and can flip a
    * window/session boundary). MICROS reads natively as timestamp on both
    * sides. */
  private def eventsWithTs(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(SparkEntry.table(spark, dir, "events"))
  }

  /** The LongType(nanos) → micros branch of the dispatch above, shared
    * with the streaming pipelines (graft.stream.StreamPipeline) so both
    * read the same `ts` whichever physical type the fixture carries.
    * Caller sets `spark.sql.legacy.parquet.nanosAsLong` before reading. */
  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }

  private def eventsWindowQuery(spark: SparkSession, dir: String): DataFrame = {
    eventsWithTs(spark, dir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("w"), col("event_type"),
        col("n"), col("sum_value"))
  }

  private val eventsWindowOracle: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL 5 MINUTE, ts)) AS BIGINT) AS w, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Gap-based sessionization — Spark's session_window (the dynamic-gap
    * event-time surface Structured Streaming shares) vs the classic
    * gaps-and-islands derivation in SQL. Two events merge iff their gap is
    * strictly under 10 minutes, on both sides. */
  private def sessionizeQuery(spark: SparkSession, dir: String): DataFrame = {
    eventsWithTs(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))
  }

  private val sessionizeOracle: String =
    """WITH d AS (SELECT user_id, ts, value,
      |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 10 MINUTE
      |       THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |s AS (SELECT user_id, ts, value,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM d)
      |SELECT user_id, epoch_us(min(ts)) // 1000000 AS session_start,
      |  count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM s GROUP BY user_id, sid""".stripMargin

  // ===== flat binary vector files (§2.1 bench dataset readers) ==========

  /** Roundtrip embeddings through the reference's .fbin format (write in
    * vec_id order, parallel byte-range read back) — ids are row positions,
    * which equal vec_id on the dense 0..n-1 fixture, so the per-row
    * checksum hash-matches the parquet-based oracle exactly. */
  private def fbinRoundtripQuery(spark: SparkSession, dir: String): DataFrame = {
    val path = SparkEntry.memoize(spark, s"fbin:$dir") {
      // pid in the name: bench and verify JVMs on one host must not race on
      // a shared half-written file
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_rt_${ProcessHandle.current().pid()}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}.fbin"
      graft.sources.VectorFiles.write(
        SparkEntry.table(spark, dir, "embeddings"), p, "vec_id", "embedding")
      p
    }
    graft.sources.VectorFiles.read(spark, path)
      .select(col("id"), size(col("vec")).as("dim"),
        round(aggregate(col("vec"), lit(0.0), (acc, x) => acc + x.cast("double")), 4)
          .as("checksum"))
  }

  /** Roundtrip embeddings through an ann-benchmarks-style HDF5 container
    * (h5py-default layout: v0 superblock, symbol-table root group,
    * contiguous `train` dataset + `distance` attr — the format
    * `get_dataset/__main__.py` downloads). Same checksum contract as
    * `fbin_roundtrip`, so the parquet oracle is identical. */
  private def hdf5RoundtripQuery(spark: SparkSession, dir: String): DataFrame = {
    val path = SparkEntry.memoize(spark, s"hdf5:$dir") {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_rt_${ProcessHandle.current().pid()}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}.hdf5"
      graft.sources.Hdf5.write(spark, p, Seq(
        graft.sources.Hdf5.Spec("train",
          SparkEntry.table(spark, dir, "embeddings"), "vec_id", "embedding")),
        attrs = Map("distance" -> "euclidean"))
      p
    }
    val metric = graft.sources.Hdf5.info(spark, path).attrs("distance")
    graft.sources.Hdf5.read(spark, path, "train")
      .select(col("id"), size(col("vec")).as("dim"),
        round(aggregate(col("vec"), lit(0.0), (acc, x) => acc + x.cast("double")), 4)
          .as("checksum"), lit(metric).as("metric"))
  }

  private val hdf5RoundtripOracle: String =
    """SELECT vec_id AS id, CAST(len(embedding) AS INT) AS dim,
      |round(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE))), 4) AS checksum,
      |'euclidean' AS metric
      |FROM embeddings""".stripMargin

  private val fbinRoundtripOracle: String =
    """SELECT vec_id AS id, CAST(len(embedding) AS INT) AS dim,
      |round(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE))), 4) AS checksum
      |FROM embeddings""".stripMargin

  // ===== dynamic batching (§2.7 dynamic_batching.hpp) ===================

  /** Queries arrive in three waves on a stream; each wave dispatches as
    * one micro-batched exact search (DynamicBatcher). The oracle is the
    * one-shot exact kNN over all queries plus the deterministic
    * query→wave assignment — proving result content is batching-invariant,
    * the reference's correctness contract for dynamic_batching. */
  private def dynamicBatchingQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = SparkEntry.table(spark, dir, "embeddings")
    // client-side query payloads: every 20th vector, split into 3 waves
    val qs = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    val waves = (0 until 3).map(w => qs.filter(_._1 / 20 % 3 == w).toSeq)
    // the oracle equates the dense dispatch index with the wave number,
    // which only holds when no wave is empty — fail loudly, not by hash
    require(waves.forall(_.nonEmpty),
      s"a query wave is empty at $dir; the batch column would diverge from the oracle")
    graft.stream.DynamicBatcher.run(spark, waves, b =>
        graft.ops.BruteForceKnn.knnJoin(emb, b, 10, Metric.L2Sqrt,
          idCol = "vec_id", vecCol = "embedding"))
      .select(col("qid"), col("nbr_id"), col("rank"),
        round(col("dist"), 4).as("dist"), col("batch"))
  }

  private val dynamicBatchingOracle: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 20 = 0),
      |d AS (SELECT q.qid, e.vec_id AS id,
      |      sqrt(list_sum(list_transform(list_zip(q.qvec, e.embedding), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ^ 2))) AS dist
      |      FROM q CROSS JOIN embeddings e),
      |r AS (SELECT qid, id, dist,
      |      row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS rank FROM d)
      |SELECT qid, id AS nbr_id, rank, round(dist, 4) AS dist,
      |CAST(qid // 20 % 3 AS INT) AS batch FROM r WHERE rank <= 10""".stripMargin

  // ===== precomputed-distance kNN (Metric::Precomputed) =================

  /** select_k over a caller-supplied distance table (distance.hpp:64
    * Precomputed): distances land in a plain (qid, id, dist) DataFrame
    * first, then only the top-k runs — identical output to computing the
    * metric inline. */
  private def knnPrecomputedQuery(spark: SparkSession, dir: String): DataFrame = {
    val e = SparkEntry.table(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val dists = e.crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id").as("id"),
        graft.functions.vector_distance(Metric.L2Sqrt, col("qvec"), col("embedding"))
          .as("dist"))
    graft.ops.BruteForceKnn.knnFromDistances(dists, 10)
      .select(col("qid"), col("nbr_id"), col("rank"), round(col("dist"), 4).as("dist"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_window_agg" -> (eventsWindowQuery(_, _)),
    "events_sessionize" -> (sessionizeQuery(_, _)),
    "fbin_roundtrip" -> (fbinRoundtripQuery(_, _)),
    "hdf5_roundtrip" -> (hdf5RoundtripQuery(_, _)),
    "dynamic_batching" -> (dynamicBatchingQuery(_, _)),
    "knn_precomputed" -> (knnPrecomputedQuery(_, _)),
    "sparse_knn_cosine" -> (sparseKnnQuery(_, _)),
    "sparse_pairwise_distance" -> (sparsePairwiseQuery(_, _)),
    "tiered_search" -> (tieredQuery(_, _)),
    "multimodal_stats" -> (multimodalStatsQuery(_, _)),
    "multimodal_frame_sample" -> (frameSampleQuery(_, _)),
    "multimodal_embed_knn" -> (mediaEmbedKnnQuery(_, _)),
    "multimodal_image_decode" -> (multimodalImageDecodeQuery(_, _)),
  )

  private val knnPrecomputedOracle: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 20 = 0),
      |d AS (SELECT q.qid, e.vec_id AS id,
      |      sqrt(list_sum(list_transform(list_zip(q.qvec, e.embedding), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) ^ 2))) AS dist
      |      FROM q CROSS JOIN embeddings e),
      |r AS (SELECT qid, id, dist,
      |      row_number() OVER (PARTITION BY qid ORDER BY dist ASC, id ASC) AS rank FROM d)
      |SELECT qid, id AS nbr_id, rank, round(dist, 4) AS dist FROM r WHERE rank <= 10""".stripMargin

  val oracles: Map[String, String] = Map(
    "events_window_agg" -> eventsWindowOracle,
    "events_sessionize" -> sessionizeOracle,
    "fbin_roundtrip" -> fbinRoundtripOracle,
    "hdf5_roundtrip" -> hdf5RoundtripOracle,
    "dynamic_batching" -> dynamicBatchingOracle,
    "knn_precomputed" -> knnPrecomputedOracle,
    "sparse_knn_cosine" -> sparseKnnOracle,
    "sparse_pairwise_distance" -> sparsePairwiseOracle,
    "tiered_search" -> tieredOracle,
    "multimodal_stats" -> multimodalStatsOracle,
    "multimodal_frame_sample" -> frameSampleOracle,
    "multimodal_embed_knn" -> mediaEmbedKnnOracle,
    "multimodal_image_decode" -> multimodalImageDecodeOracle,
  )
}
