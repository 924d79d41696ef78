package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Three passes so per-query numbers are attributable:
  *
  *  1. PRE-PASS: every query runs once. All `SparkEntry.memoize` artifacts
  *     (indexes, ground truths, graphs) are built here and timed per
  *     artifact by the memoizer itself — a shared build is charged to the
  *     artifact, not to whichever query happened to run it first.
  *  2. TIMED PASS: every query runs again with all artifacts warm; the
  *     per-query time is search/derive work only.
  *  3. MEDIAN PASS: the slowest SPARK_GRAFT_MEDIAN_K queries re-run to
  *     SPARK_GRAFT_MEDIAN_RUNS warm samples each; their per-query MEDIAN
  *     (`BENCHM` lines, `medians` map, `median_total`) carries the
  *     regression signal the host's ~1.26x session band hides from a
  *     single sample. The `value`/`queries` totals keep their single-pass
  *     meaning.
  *
  * TWO fixed-work host-calibration probes run after warm-up and after the
  * median pass (`BENCHC` lines, `calib_start_sec`/`calib_end_sec` and
  * `calib_stream_start_sec`/`calib_stream_end_sec`; `calib` and
  * `calib_stream` pairs on the final line) — constant work whose wall
  * time tracks the host's session band, the instrument for normalizing
  * round-over-round medians. The CPU/shuffle probe normalizes the batch
  * family; the stateful micro-batch probe normalizes the streaming_*
  * family, whose per-batch latency drifts on a different axis than CPU
  * throughput (proved by a same-host A/B — SURVEY §8).
  *
  * Every per-query and per-artifact timing is printed ON ITS OWN LINE
  * (`BENCHQ`/`BENCHA` prefixed JSON) as it completes, so a bounded tail
  * capture of stdout never loses early queries; the final single-line
  * summary JSON (the driver contract) repeats them all, and the complete
  * result is also written to BENCH_LOCAL.json (SPARK_GRAFT_BENCH_OUT) so
  * a bounded capture never truncates the artifact.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (file listing, codegen, shuffle infra, broadcast,
    // the top-k aggregator, and the kernel routes) so the first measured
    // query isn't charged for one-time setup
    // warm-up is best-effort: a missing/broken table must surface as
    // per-query error entries below, not kill the bench before the first
    // BENCHQ line
    try {
      Seq("embeddings", "documents", "lineitem").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
    } catch { case e: Throwable =>
      println(s"BENCHW warm-up failed: ${e.getClass.getSimpleName}")
    }
    try locally {
      import org.apache.spark.sql.functions._
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val wq = e.limit(8).select(col("id").as("qid"), col("vec").as("qvec"))
      graft.ops.BruteForceKnn.knnJoin(e, wq, 5, graft.core.Metric.L2).count()
      e.withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id")).orderBy(col("id"))))
        .join(broadcast(wq), col("id") === col("qid"), "left").count()
    } catch { case _: Throwable => () }
    // Fixed-work host-calibration probe (run after warm-up and again
    // after the median pass): a deterministic single-threaded CPU loop
    // plus one fixed-size shuffle job — CONSTANT work, so its wall time
    // tracks the host's session band (the ~2x intra-day drift SURVEY §8
    // documents), not the engine. Recorded as calib_start_sec /
    // calib_end_sec; round-over-round comparison should read
    // median / mean(calib) as the host-normalized signal instead of
    // attributing host weather to code.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      var acc = 0L; var i = 0L
      while (i < 300000000L) {
        acc = acc * 6364136223846793005L + 1442695040888963407L + i; i += 1
      }
      if (acc == 42L) println("BENCHW calibration sentinel") // defeat DCE
      import org.apache.spark.sql.functions.{col, pmod}
      spark.range(2000000L).toDF("v")
        .repartition(8, pmod(col("v"), org.apache.spark.sql.functions.lit(64)))
        .groupBy(pmod(col("v"), org.apache.spark.sql.functions.lit(97)))
        .count().count()
      (System.nanoTime() - t0) / 1e9
    }
    // Fixed-work STREAMING probe — the stateful micro-batch twin of the
    // CPU probe above. The CPU/shuffle probe provably under-corrects the
    // streaming_* family: those queries are dominated by per-batch
    // latency (offset/commit log writes, state-store passes, checkpoint
    // file churn), which drifts with the host's fsync/scheduling weather
    // on a different axis than raw CPU throughput. Constant work: a
    // MemoryStream drained through a stateful groupBy-count for a fixed
    // number of micro-batches on a throwaway checkpoint. Recorded as
    // calib_stream_start_sec/calib_stream_end_sec; round-over-round
    // comparison of streaming_* medians should normalize by
    // mean(calib_stream), not the CPU pair.
    def calibrateStream(): Double = {
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ck = java.nio.file.Files.createTempDirectory("graft_calib_stream").toString
      val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val t0 = System.nanoTime()
      val q = mem.toDF().toDF("v")
        .groupBy(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.lit(64L))).count()
        .writeStream.outputMode("update").format("noop")
        .option("checkpointLocation", ck).start()
      try {
        var i = 0
        while (i < 6) { mem.addData(0L until 2000L); q.processAllAvailable(); i += 1 }
      } finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      try {
        val root = java.nio.file.Paths.get(ck)
        val it = java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        try it.forEach(f => java.nio.file.Files.deleteIfExists(f)) finally it.close()
      } catch { case _: Throwable => () }
      sec
    }
    calibrate() // discarded warm-up: the probe itself must not be charged
                // one-time JIT/codegen/exchange setup, only host speed
    val calibStart = calibrate()
    println(s"""BENCHC {"calib_start_sec":$calibStart}""")
    try calibrateStream() catch { case _: Throwable => () } // discarded warm-up
    val calibStreamStart = try calibrateStream() catch { case _: Throwable => -1.0 }
    println(s"""BENCHC {"calib_stream_start_sec":$calibStreamStart}""")

    // optional comma-separated subset for local iteration; default = all
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // ---- pass 1: artifact pre-pass (builds all memoized state) ----------
    val buildT0 = System.nanoTime()
    selected.foreach { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    val prepassSec = (System.nanoTime() - buildT0) / 1e9
    val artifacts = {
      import scala.jdk.CollectionConverters._
      SparkEntry.artifactBuildTimes.asScala.toSeq.sortBy(_._1)
    }
    artifacts.foreach { case (k, v) =>
      println(s"""BENCHA {"artifact":"$k","build_sec":$v}""")
    }

    // ---- pass 2: timed pass (artifacts warm; search/derive only) --------
    // A query that throws is recorded as an ERROR entry, never as a (tiny)
    // fake timing — a breaking query must make the bench look sicker, not
    // healthier. Timing and error are mutually exclusive per query.
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val results: Seq[(String, Either[String, Double])] = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val out = try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
      out match {
        case Right(sec) => println(s"""BENCHQ {"query":"$name","search_sec":$sec}""")
        case Left(err) => println(s"""BENCHQ {"query":"$name","err":${jstr(err)}}""")
      }
      name -> out
    }
    def r3(v: Double): String = f"$v%.3f"
    val timed = results.collect { case (k, Right(v)) => k -> v }
    val errs = results.collect { case (k, Left(e)) => k -> e }
    val total = timed.map(_._2).sum

    // ---- pass 3: median-of-N for every non-trivial query -----------------
    // The host's session-to-session band (~1.26x, SURVEY §8) exceeds most
    // real per-query deltas, so the single pass-2 sample can't expose a
    // <1.3x regression. Re-run EVERY query whose pass-2 time is at least
    // SPARK_GRAFT_MEDIAN_MIN_SEC (default 0.5 — engine-wide coverage;
    // sub-threshold queries' noise is bounded by the threshold itself),
    // plus the top SPARK_GRAFT_MEDIAN_K (default 10) slowest as a floor,
    // to SPARK_GRAFT_MEDIAN_RUNS samples (default 3, pass-2's included)
    // and report the per-query MEDIAN alongside — totals keep their
    // single-pass meaning, the medians carry the regression signal.
    // Round-over-round comparison should diff the per-query `medians`
    // MAP (keyed by name): the flagged SET is picked from noisy pass-2
    // samples, so `median_total` can swap a boundary query between
    // rounds — it is a convenience sum, not the comparison unit.
    val medianK = sys.env.getOrElse("SPARK_GRAFT_MEDIAN_K", "10").toInt
    val medianMinSec = sys.env.getOrElse("SPARK_GRAFT_MEDIAN_MIN_SEC", "0.5").toDouble
    val medianRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_MEDIAN_RUNS", "3").toInt)
    val flagged = (timed.sortBy(-_._2).take(math.max(0, medianK)).map(_._1) ++
      timed.collect { case (n, s) if medianK > 0 && s >= medianMinSec => n }).toSet
    val byName = selected.toMap
    val mediansFull: Seq[(String, Double, Int)] = timed.collect {
      case (name, firstSec) if flagged(name) =>
        val extra = (2 to medianRuns).flatMap { _ =>
          val t0 = System.nanoTime()
          try { byName(name)(spark, sfDir).count()
            Some((System.nanoTime() - t0) / 1e9) }
          catch { case _: Throwable => None } // pass-2 already recorded the error shape
        }
        val samples = (firstSec +: extra).sorted
        // LOWER median on an even sample count (a re-run that threw
        // shrinks the set): the upper-middle would bias the flakiest
        // queries high, the opposite of what a regression signal wants
        val med = samples((samples.length - 1) / 2)
        println(s"""BENCHM {"query":"$name","median_sec":$med,"samples":${samples.length}}""")
        (name, med, samples.length)
    }
    val medians: Seq[(String, Double)] = mediansFull.map(t => (t._1, t._2))
    val medianTotal = medians.map(_._2).sum
    val calibEnd = calibrate()
    println(s"""BENCHC {"calib_end_sec":$calibEnd}""")
    val calibStreamEnd = try calibrateStream() catch { case _: Throwable => -1.0 }
    println(s"""BENCHC {"calib_stream_end_sec":$calibStreamEnd}""")
    // the streaming_* group is dominated by fixed micro-batch machinery
    // (checkpoint dirs, staged files, per-batch state-store passes), not
    // plans — reported separately so the BATCH total stays comparable
    // round over round instead of masking plan regressions under ~23%
    // of harness-shaped cost
    val streamingSec = timed.collect { case (k, v) if k.startsWith("streaming_") => v }.sum
    val batchSec = total - streamingSec
    val buildTotal = artifacts.map(_._2).sum
    val full = {
      val q = timed.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
      val e = errs.map { case (k, v) => s"\"" + k + "\":" + jstr(v) }.mkString("{", ",", "}")
      val a = artifacts.map { case (k, v) => s"\"" + k.takeWhile(_ != ':') + "\":" + v }
        .mkString("{", ",", "}")
      val m = medians.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$q,"errors":$e,""" +
        s""""streaming_sec":$streamingSec,"batch_sec":$batchSec,""" +
        s""""medians":$m,"median_total":$medianTotal,"median_runs":$medianRuns,""" +
        s""""calib_start_sec":$calibStart,"calib_end_sec":$calibEnd,""" +
        s""""calib_stream_start_sec":$calibStreamStart,""" +
        s""""calib_stream_end_sec":$calibStreamEnd,""" +
        s""""artifact_build_sec":$a,"build_total":$buildTotal,""" +
        s""""prepass_total":$prepassSec,"cpus":$cpus,"sf":${jstr(sfDir)}}"""
    }
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LOCAL.json")
    // r18: ALSO write a cpus-stamped copy (BENCH_LOCAL.c32.json /
    // BENCH_LOCAL.c8.json). The driver benches the same tree at two core
    // counts back-to-back and the un-stamped detail file is overwritten by
    // the second run — r17's 32-core per-query map was lost exactly this
    // way (PERF_r17 per_query={}). The stamped copies make both runs'
    // full-precision per-query maps durable side by side.
    val stampedPath =
      if (outPath.endsWith(".json")) outPath.stripSuffix(".json") + s".c$cpus.json"
      else s"$outPath.c$cpus"
    Seq(outPath, stampedPath).foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () }
    }
    // r18: re-print every per-query median as one compact block right
    // before the contract line. The BENCHM lines above stream as medians
    // complete, interleaved with minutes of re-run output — a bounded
    // stdout tail keeps only the last few, which left PERF_r17 with an
    // empty per_query/scaling comparison. Rounded to 4 decimals so the
    // whole block fits a small tail; full precision stays in the JSON
    // artifacts.
    mediansFull.foreach { case (k, v, n) =>
      println(f"""BENCHM {"query":"$k","median_sec":$v%.4f,"samples":$n}""")
    }
    // FINAL LINE = the driver contract. The driver keeps only a bounded
    // stdout tail, so this line must stay short (<~300 chars): totals only;
    // the per-query map lives in the BENCHQ lines above and the full-
    // precision JSON artifact written to BENCH_LOCAL.json.
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""streaming_sec":${r3(streamingSec)},"batch_sec":${r3(batchSec)},""" +
      s""""median_total":${r3(medianTotal)},""" +
      s""""calib":[${r3(calibStart)},${r3(calibEnd)}],""" +
      s""""calib_stream":[${r3(calibStreamStart)},${r3(calibStreamEnd)}],""" +
      s""""n_queries":${timed.size},"n_errors":${errs.size},""" +
      s""""build_total":${r3(buildTotal)},"sf":${jstr(sfDir)},"detail":${jstr(outPath)}}""")
    spark.stop()
  }
}
