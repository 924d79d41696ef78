package graft.stream

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.index.IvfFlatIndex

/** Streaming append INTO a saved tiered layout — the full streaming-ingest
  * story of `cuvs::neighbors::tiered_index` (tiered_index.hpp:59-67:
  * "extend adds to the incremental [brute-force] index"; the ANN tier is
  * only rebuilt by compaction): a `foreachBatch` sink lands each
  * micro-batch in the layout's delta-tier parquet and refreshes the
  * planner sidecars (`tiered_meta.delta_rows` + the combined-population
  * `meta`), so re-registering the layout routes kNN joins over the
  * live-appended rows with zero ANN-tier work.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once redelivery: each
  * micro-batch lands in its own `delta/batch-<scopeTag>-<batchId>/`
  * directory with OVERWRITE semantics (a replay rewrites the same rows,
  * never duplicates them — partial writes from a crashed attempt are
  * overwritten too), and a committed-batch ledger (`delta_commits`: one
  * row per SCOPE — max_batch_id, cum_rows) records what landed. The
  * scope is the stream's checkpoint location: Structured Streaming
  * batchIds are only unique per checkpoint, so a rebuilt checkpoint (or
  * a second pipeline into the same layout) starts a fresh id namespace
  * instead of silently colliding with — and being skipped as replays of
  * — the old one; the scope also NAMES the batch directory, so two
  * scopes reusing an id never overwrite each other's rows. Batch ids
  * are monotonic per checkpoint and the engine only ever redelivers the
  * LAST one, so a `batchId <= max_batch_id` test recognizes every
  * possible replay and the ledger stays O(scopes) for the stream's whole
  * life — never one row per batch ever ingested. A recognized replay
  * skips the data write and only re-derives the sidecars from the
  * ledger — which also covers a crash BETWEEN the ledger write and the
  * sidecar writes (the write order is data → ledger → sidecars, each
  * step idempotent given the previous). The one-row sidecar rewrites go
  * through a staged-rename (write aside, rename the old content ASIDE,
  * swap in — a reader finds old or new content except inside a
  * two-metadata-op window, which `readOneRowSidecar`'s bounded retry
  * rides out); a reader that still catches a torn ledger treats it as
  * absent and re-derives — the engine only ever redelivers the LAST
  * batch, whose rows are by construction not yet in the pre-crash
  * sidecar value, so the re-derived counts stay exact.
  *
  * AUTO-PROMOTION: after each refresh the delta population is checked
  * against the layout's `min_ann_rows` and, once crossed, the delta is
  * folded into the ANN tier in place (`TieredIndex.compactInPlace`) — the
  * reference's `create_ann_index_on_extend` contract (tiered_index.hpp:
  * 59-67, 105, 136). Without it a long-running ingest grows the
  * exact-scan delta without bound. The committed batch ids survive
  * compaction as a zeroed ledger written into the new layout version, so
  * a post-compaction redelivery is still recognized. Compaction is
  * READER-SAFE: each one commits a new `v_NNNNNN` version directory with
  * an atomic marker create and the superseded version survives one more
  * compaction interval (TieredIndex version scheme), so queries executing
  * over the layout never lose their files mid-plan and never need a
  * retry. `spark.graft.tiered.autoCompact.enabled=false` still defers
  * compaction to quiet points; opting out never loses data — only the
  * delta grows.
  *
  * SINGLE WRITER: concurrent ingest into one layout from a SECOND
  * process would interleave the ledger/sidecar read-modify-write and
  * corrupt counts silently, so every append holds a best-effort lease
  * file (`.ingest_lease` at the layout root: writer token, heartbeat =
  * the append-rate mtime refresh). A second process finds a live foreign
  * lease and fails LOUDLY instead; a lease whose heartbeat is older than
  * `spark.graft.tiered.lease.staleMs` (default 60000) is a dead writer's
  * and is stolen with a warning. In-JVM concurrency stays on the
  * per-layout lock.
  *
  * 100 TB posture: each append is one partitioned parquet write of the
  * micro-batch plus three one-row sidecar rewrites — no shuffle, no index
  * rebuild, no read of the base tier, and the delta-population refresh is
  * INCREMENTAL (previous ledger sum + this batch's count), never a
  * re-count of the whole delta directory. The ledger itself holds one
  * row per SCOPE (not per batch), so a year-long one-batch-per-10s
  * ingest still reads and rewrites a handful of rows per micro-batch —
  * O(scopes), not O(batches-ever). Compaction bounds the delta's
  * exact-scan cost.
  */
object TieredIngest {

  /** Per-layout locks: two concurrent ingests into ONE layout must not
    * interleave the ledger/sidecar read-modify-write; ingests into
    * UNRELATED layouts share nothing and proceed in parallel. The lock is
    * per-JVM — concurrent ingest into one layout from DIFFERENT processes
    * is unsupported (as is any multi-writer parquet sidecar rewrite). */
  private val locks = new ConcurrentHashMap[String, Object]()
  private def lockFor(indexPath: String): Object =
    locks.computeIfAbsent(normalize(indexPath), _ => new Object)
  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  /** This JVM's writer identity for the cross-process ingest lease — one
    * token per process: two streams in one JVM already serialize on the
    * per-layout lock, so they legitimately share the lease. */
  private val leaseToken = java.util.UUID.randomUUID().toString

  /** Acquire (or heartbeat) the single-writer lease at the layout root.
    * Create-if-absent with the writer token; every append rewrites it, so
    * the file's mtime IS the heartbeat. A FOREIGN token younger than the
    * staleness horizon is a live concurrent writer — fail loudly (the
    * silent alternative is interleaved ledger read-modify-writes and
    * permanently wrong counts). A foreign token older than the horizon is
    * a dead writer's leftover and is stolen with a warning. Best-effort
    * by design (a racing create can still slip through on a filesystem
    * without atomic creates), which converts the UNDETECTABLE corruption
    * into a detectable, loud failure in every realistic interleaving. */
  private def acquireLease(spark: SparkSession, root: String): Unit = {
    if (!spark.conf.get("spark.graft.tiered.lease.enabled", "true").toBoolean) return
    val staleMs = spark.conf.get("spark.graft.tiered.lease.staleMs", "60000").toLong
    val p = new org.apache.hadoop.fs.Path(root, ".ingest_lease")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val held: Option[(String, Long)] =
      try {
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          val content =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          Some((content, fs.getFileStatus(p).getModificationTime))
        }
      } catch {
        // an unreadable lease (torn write, vanished mid-read) is treated
        // as absent — the rewrite below re-establishes it
        case scala.util.control.NonFatal(_) => None
      }
    held.foreach { case (tok, mtime) =>
      if (tok.nonEmpty && tok != leaseToken) {
        val age = System.currentTimeMillis() - mtime
        if (age < staleMs)
          throw new IllegalStateException(
            s"TieredIngest: another process holds the ingest lease on $root " +
              s"(token $tok, heartbeat ${age}ms ago < staleMs=$staleMs). " +
              "Concurrent multi-process ingest into one layout is unsupported — " +
              "stop the other writer, or raise spark.graft.tiered.lease.staleMs " +
              "only if it is known dead.")
        System.err.println(s"graft TieredIngest: stealing stale ingest lease on " +
          s"$root (token $tok, heartbeat ${age}ms ago >= staleMs=$staleMs)")
      }
    }
    val out = fs.create(p, true)
    try out.write(leaseToken.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Scope of the rows that were in the delta BEFORE the first
    * ledger-tracked batch (the save-time delta + any legacy direct
    * appends) — kept as a pseudo-scope so delta_rows is always the plain
    * sum of the ledger's cum_rows column. Direct callers passing
    * `batchId >= 0` with an empty scope share this namespace (their ids
    * are their own to keep monotonic). */
  private val BaseScope: String = ""

  /** Per-scope ledger state: highest committed batch id (ids are
    * monotonic per scope, so `batchId <= maxBatchId` IS the replay test)
    * and the cumulative rows this scope has landed in the delta. */
  private[stream] case class ScopeState(maxBatchId: Long, cumRows: Long)

  private def ledgerPath(indexPath: String) = s"$indexPath/delta_commits"

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** The committed-batch ledger, one entry per scope; initialized from
    * the CURRENT `tiered_meta.delta_rows` (authoritative as of the save /
    * the last legacy append) when no ledger exists. A pre-r16 ledger
    * (one row per batch) folds into the per-scope form on read — its
    * per-batch ids collapse to the max, its counts to the sum. An
    * unreadable ledger (a crash caught the staged-rename window) is
    * treated as absent — see the class doc for why the re-derived counts
    * stay exact on the engine's only real redelivery (the last batch). */
  private def readLedger(spark: SparkSession,
      indexPath: String): Map[String, ScopeState] =
    if (!exists(spark, ledgerPath(indexPath)))
      Map(BaseScope -> ScopeState(-1L, metaDeltaRows(spark, indexPath)))
    else
      try {
        // driver-side read (r17, SidecarIO doc): the ledger is O(scopes)
        // rows and was read as a Spark job PER MICRO-BATCH; the pre-r16
        // per-batch fold happens in plain Scala on the same rows
        import graft.sources.SidecarIO
        val raw = SidecarIO.readRows(spark, ledgerPath(indexPath))
          .getOrElse(throw new java.io.FileNotFoundException(ledgerPath(indexPath)))
        if (raw.headOption.exists(_.contains("max_batch_id")))
          raw.map(r => r("scope").asInstanceOf[String] ->
            ScopeState(SidecarIO.asLong(r("max_batch_id")),
              SidecarIO.asLong(r("cum_rows")))).toMap
        else // pre-r16 per-batch rows: fold to per-scope max/sum
          raw.groupBy(r => r.get("scope").map(_.asInstanceOf[String]).getOrElse(""))
            .map { case (scope, rs) =>
              scope -> ScopeState(rs.map(r => SidecarIO.asLong(r("batch_id"))).max,
                rs.map(r => SidecarIO.asLong(r("n_rows"))).sum)
            }
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"graft TieredIngest: unreadable delta_commits at " +
            s"$indexPath (${e.getClass.getSimpleName}) — re-deriving from tiered_meta")
          Map(BaseScope -> ScopeState(-1L, metaDeltaRows(spark, indexPath)))
      }

  /** Staged-rename one-row parquet write: the staged content is fully
    * written first, then the OLD content is renamed aside and the staged
    * directory renamed in — a crash leaves old content, new content, or
    * (inside the two-rename window) the `.old` directory that
    * `readOneRowSidecar` restores; never a half-written target. */
  private def atomicOneRowWrite(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val targetP = new org.apache.hadoop.fs.Path(target)
    val stagedP = new org.apache.hadoop.fs.Path(target + ".staged")
    val oldP = new org.apache.hadoop.fs.Path(target + ".old")
    df.coalesce(1).write.mode("overwrite").parquet(stagedP.toString)
    fs.delete(oldP, true)
    if (fs.exists(targetP))
      require(fs.rename(targetP, oldP), s"sidecar swap failed at $target")
    if (!fs.rename(stagedP, targetP)) {
      // put the previous content back so readers never see an absent
      // sidecar because of a failed swap
      if (fs.exists(oldP)) fs.rename(oldP, targetP)
      throw new IllegalStateException(s"sidecar swap failed at $target")
    }
    fs.delete(oldP, true)
  }

  /** One-row sidecar read that survives the swap window: a read landing
    * between atomicOneRowWrite's two renames RETRIES first (a live writer
    * finishes in milliseconds — restoring eagerly would steal the `.old`
    * directory out from under its in-flight swap and fail the ingest
    * batch), and only after the retries are exhausted treats a
    * still-absent target with `.old` present as a crashed writer's
    * leftover and renames it back for one final read. */
  private[stream] def readOneRowSidecar(spark: SparkSession,
      target: String): Map[String, Any] = {
    // driver-side read (r17, SidecarIO doc): sidecar reads ran one Spark
    // job each, paid per micro-batch on the ingest path; the retry ladder
    // and crash-restore semantics below are unchanged
    def readHead(): Map[String, Any] =
      graft.sources.SidecarIO.readHead(spark, target)
        .getOrElse(throw new java.io.FileNotFoundException(target))
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val targetP = new org.apache.hadoop.fs.Path(target)
    val oldP = new org.apache.hadoop.fs.Path(target + ".old")
    var attempt = 0
    while (attempt < 4) {
      try return readHead()
      catch {
        case scala.util.control.NonFatal(e) =>
          // a genuinely-missing sidecar (no target, no in-flight swap's
          // `.old` sibling) can't appear by waiting — fail fast with the
          // real error instead of riding the whole retry ladder. The two
          // exists() reads are not atomic against a live writer's
          // rename dance (target absent at the first check, the swap
          // completing and deleting `.old` before the second), so the
          // verdict is confirmed once after a beat before throwing.
          def genuinelyMissing = !fs.exists(targetP) && !fs.exists(oldP)
          if (genuinelyMissing) {
            Thread.sleep(25)
            if (genuinelyMissing) throw e
          }
          Thread.sleep(50L << attempt)
          attempt += 1
      }
    }
    try readHead()
    catch {
      case scala.util.control.NonFatal(e) =>
        if (!fs.exists(targetP) && fs.exists(oldP) && !fs.rename(oldP, targetP))
          throw new IllegalStateException(
            s"sidecar at $target is absent and restoring $target.old failed", e)
        readHead() // throws if genuinely unreadable
    }
  }

  private def writeLedger(spark: SparkSession, indexPath: String,
      ledger: Map[String, ScopeState]): Unit = {
    import spark.implicits._
    atomicOneRowWrite(
      ledger.toSeq.map { case (sc, st) => (sc, st.maxBatchId, st.cumRows) }
        .toDF("scope", "max_batch_id", "cum_rows"),
      ledgerPath(indexPath))
  }

  /** Carry the committed batch ids through an in-place compaction as a
    * zeroed ledger (the rows now live in the ANN tier; a post-compaction
    * redelivery must still be recognized). Written into the compacted
    * layout BEFORE the directory swap (TieredIndex.compactInPlace's
    * beforeSwap hook). */
  private def writeZeroedLedger(spark: SparkSession, intoPath: String,
      committed: Map[String, ScopeState]): Unit =
    if (committed.nonEmpty)
      writeLedger(spark, intoPath,
        committed.map { case (sc, st) => sc -> ScopeState(st.maxBatchId, 0L) })

  /** Current delta population per the sidecar; a legacy layout without
    * the delta_rows column counts the delta's ROOT files only (batch
    * directories are excluded: a crash-orphaned batch dir must not be
    * folded into the base entry AND re-added when its batch replays). */
  private def metaDeltaRows(spark: SparkSession, indexPath: String): Long = {
    val meta = readOneRowSidecar(spark, s"$indexPath/tiered_meta")
    if (meta.contains("delta_rows"))
      graft.sources.SidecarIO.asLong(meta("delta_rows"))
    else {
      val total = TieredIndex.readDelta(spark, indexPath).count()
      total - batchDirRows(spark, indexPath)
    }
  }

  private def batchDirRows(spark: SparkSession, indexPath: String): Long = {
    val delta = new org.apache.hadoop.fs.Path(s"$indexPath/delta")
    val fs = delta.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(delta)) 0L
    else {
      val dirs = fs.listStatus(delta)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch-"))
        .map(_.getPath.toString)
      if (dirs.isEmpty) 0L
      else spark.read.parquet(dirs.toIndexedSeq: _*).count()
    }
  }

  /** Batch data directory, namespaced by BOTH the scope and the batch id
    * to match the ledger key: two checkpoint scopes reusing an id (the
    * rebuilt-checkpoint / second-pipeline case the scope exists for) must
    * land in different directories, or the second scope's overwrite would
    * destroy the first's committed rows while the ledger still counted
    * them. The scope is folded to a fixed-width SHA-1 tag (paths make bad
    * directory names, and the tag must be stable across JVMs); the empty
    * scope keeps the bare pre-r16 name so existing layouts stay readable. */
  private def batchDir(indexPath: String, scope: String, batchId: Long): String =
    if (scope.isEmpty) s"$indexPath/delta/batch-$batchId"
    else {
      val sha = java.security.MessageDigest.getInstance("SHA-1")
        .digest(scope.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val tag = sha.take(8).map(b => f"$b%02x").mkString
      s"$indexPath/delta/batch-$tag-$batchId"
    }

  /** Append one micro-batch of (idCol, vecCol) rows + refresh the
    * sidecars. `batchId >= 0` (the streaming sink always passes one)
    * engages the idempotent per-batch-directory protocol above, with
    * `scope` naming the batchId's namespace (the sink passes its
    * checkpoint location; direct callers managing their own ids may leave
    * it empty). `batchId < 0` is the direct-call path for ad-hoc appends,
    * which has no replay to defend against and keeps the plain
    * `mode("append")` write + full recount. */
  def append(batch: DataFrame, indexPath: String,
      idCol: String = "id", vecCol: String = "vec",
      batchId: Long = -1L, scope: String = ""): Unit =
    lockFor(indexPath).synchronized {
      val spark = batch.sparkSession
      val root = normalize(indexPath)
      TieredIndex.recoverSwap(spark, root)
      acquireLease(spark, root)
      // all data/ledger/sidecar writes target the layout's LIVE version
      // directory (the root itself until the first in-place compaction);
      // resolved once per append, under the lock
      val live = TieredIndex.resolveLive(spark, root)
      val shaped = batch
        .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      val sc = normalize(scope)
      val stats: (Long, Long) =
        if (batchId >= 0) {
          val ledger = readLedger(spark, live)
          val state = ledger.getOrElse(sc, ScopeState(-1L, 0L))
          if (batchId <= state.maxBatchId) {
            // at-least-once redelivery of an already-committed batch
            // (ids are monotonic per scope, so <= max means committed):
            // the data and ledger landed last time — only the sidecars
            // might be stale (crash between ledger and sidecar writes),
            // so re-derive them and land nothing. Structured Streaming
            // only ever redelivers the LAST batch (== max); a direct
            // caller submitting a NEW id below its scope's max violates
            // the monotonic-id contract and gets skipped as a replay —
            // loudly, so the drop is never silent.
            if (batchId < state.maxBatchId)
              System.err.println(s"graft TieredIngest: batch $batchId in scope " +
                s"'$sc' is below the scope's max committed id ${state.maxBatchId} " +
                "— treated as an already-committed replay and SKIPPED (per-scope " +
                "batch ids must be monotonic; use a fresh scope to restart an " +
                "id sequence)")
            writeSidecars(spark, live, ledger.values.map(_.cumRows).sum)
          } else {
            // pre-r16 upgrade hazard: a pre-r16 batch under this scope
            // wrote its data to the UNSCOPED delta/batch-<id> dir and
            // crashed before its ledger row, so this redelivery would land
            // the same rows AGAIN under the scope-tagged name while the
            // orphan still sits in the recursive delta listing. Remove the
            // orphan first — but only when the empty scope's own ledger
            // does not claim the id (a direct empty-scope caller that
            // legitimately committed batch-<id> owns that directory).
            if (sc.nonEmpty &&
                ledger.get(BaseScope).forall(_.maxBatchId < batchId)) {
              val legacy = new org.apache.hadoop.fs.Path(
                s"$live/delta/batch-$batchId")
              val lfs = legacy.getFileSystem(spark.sessionState.newHadoopConf())
              if (lfs.exists(legacy)) {
                System.err.println(s"graft TieredIngest: removing orphaned " +
                  s"pre-upgrade batch directory $legacy before re-landing batch " +
                  s"$batchId under scope '$sc' (crashed pre-r16 write, never " +
                  "committed to the ledger)")
                lfs.delete(legacy, true)
              }
            }
            // overwrite = idempotent under replay AND under a crashed
            // partial write of this very directory
            val dir = batchDir(live, sc, batchId)
            shaped.write.mode("overwrite").parquet(dir)
            val n = spark.read.parquet(dir).count()
            val grown = ledger + (sc -> ScopeState(batchId, state.cumRows + n))
            writeLedger(spark, live, grown)
            writeSidecars(spark, live, grown.values.map(_.cumRows).sum)
          }
        } else {
          shaped.write.mode("append").parquet(s"$live/delta")
          refreshSidecars(spark, live)
        }
      maybeCompact(spark, root, live, stats._1, stats._2)
    }

  /** Rewrite `tiered_meta` (delta population) and the top-level
    * combined-population `meta` — the two numbers the kNN-join planner
    * reads at rewrite time. Returns (deltaRows, minAnnRows) so the
    * compaction trigger needs no extra sidecar read. */
  private def writeSidecars(spark: SparkSession, indexPath: String,
      deltaRows: Long): (Long, Long) = {
    import spark.implicits._
    val meta = readOneRowSidecar(spark, s"$indexPath/tiered_meta")
    val minAnnRows = graft.sources.SidecarIO.asLong(meta("min_ann_rows"))
    atomicOneRowWrite(
      Seq((minAnnRows, meta("metric").asInstanceOf[String], deltaRows))
        .toDF("min_ann_rows", "metric", "delta_rows"),
      s"$indexPath/tiered_meta")
    val baseRows = IvfFlatIndex.loadMeta(spark, s"$indexPath/tiered_base").getOrElse(0L)
    IvfFlatIndex.saveMeta(spark, indexPath, baseRows + deltaRows)
    (deltaRows, minAnnRows)
  }

  /** Full-recount sidecar refresh — the legacy/direct-append path and the
    * repair tool for a layout whose delta was modified out of band. Also
    * re-bases the ledger so later streaming batches stay incremental. */
  def refreshSidecars(spark: SparkSession, indexPath: String): (Long, Long) = {
    // callers may pass the layout ROOT — operate on the live version
    val live = TieredIndex.resolveLive(spark, normalize(indexPath))
    val deltaRows = TieredIndex.readDelta(spark, live).count()
    val stats = writeSidecars(spark, live, deltaRows)
    if (exists(spark, ledgerPath(live))) {
      // re-base: the streaming scopes keep their committed counts, the
      // base pseudo-scope absorbs whatever the recount says the
      // out-of-band rows add up to
      val ledger = readLedger(spark, live)
      val scoped = ledger - BaseScope
      val baseMax = ledger.get(BaseScope).map(_.maxBatchId).getOrElse(-1L)
      writeLedger(spark, live, scoped +
        (BaseScope -> ScopeState(baseMax,
          deltaRows - scoped.values.map(_.cumRows).sum)))
    }
    stats
  }

  /** The reference's `create_ann_index_on_extend` trigger: once the delta
    * crosses `min_ann_rows`, fold it into the ANN tier in place (the
    * compacted save re-measures the recall curve and resets delta_rows to
    * 0). The committed batch keys survive compaction as a ZEROED ledger
    * written into the new version directory BEFORE its commit marker — a
    * post-compaction redelivery of an already-folded batch must still be
    * recognized and skipped, or the replay would duplicate rows the ANN
    * tier now owns. */
  private def maybeCompact(spark: SparkSession, root: String, live: String,
      deltaRows: Long, minAnnRows: Long): Unit =
    if (deltaRows >= minAnnRows &&
        spark.conf.get("spark.graft.tiered.autoCompact.enabled", "true").toBoolean) {
      val committed =
        if (exists(spark, ledgerPath(live)))
          readLedger(spark, live)
        else Map.empty[String, ScopeState]
      TieredIndex.compactInPlace(spark, root,
        tmp => writeZeroedLedger(spark, tmp, committed))
      // the layout changed UNDER any live registration: drop the
      // planner's memoized sidecar statistics (and its live-version
      // resolution) so routed queries read the compacted population/
      // curve, not the pre-compaction values
      graft.plans.GraftIndexCatalog.invalidateStats()
    }

  /** `foreachBatch` sink over an (idCol, vecCol) stream into the saved
    * layout at `indexPath`. The caller drives the stream (addData /
    * processAllAvailable on a test source, or a real file/kafka source)
    * and re-registers the layout when it wants the planner to see the
    * appended rows (register drops the planner's sidecar memos). The
    * engine's (checkpoint, batchId) pair keys the idempotence protocol —
    * a restart on the SAME checkpoint that redelivers the last
    * uncommitted batch lands it exactly once, and a rebuilt checkpoint
    * starts a fresh id namespace instead of colliding with the old. */
  def sink(stream: DataFrame, indexPath: String, checkpoint: String,
      idCol: String = "id", vecCol: String = "vec"): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch, indexPath, idCol, vecCol, batchId = batchId,
          scope = checkpoint)
      }
      .start()
}
