package graft.streaming

import graft.ext.Changelog
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous CDC merge: apply a CHANGE STREAM to a persisted
  * snapshot store — the deployment shape of [[Changelog.applyLog]]
  * (which merges one batch log into one snapshot) for an
  * incrementally-maintained corpus. The reference's own execution
  * model is continuous re-execution to convergence
  * (/root/reference/src/mr/coordinator.go:114-138 — re-run until the
  * output settles); this is that model's mutable-state analogue on
  * Structured Streaming: every microbatch folds into the store, and
  * the settled store equals the one-shot batch merge of the whole
  * log (gated: `ext_stream_merge` hash-matches `ext_pipeline_merge`'s
  * oracle).
  *
  * Store layout: `storeDir/v<batchId>/` parquet versions, one per
  * applied microbatch, each holding the full changelog-shaped store
  * (key, payload, op, seq — latest entry per key, tombstones
  * retained; see [[Changelog.mergeBatch]] for why tombstones make
  * the fold order-independent and idempotent). The COMMIT MARKER is
  * Spark's own `_SUCCESS` file: a version exists iff its write
  * committed, so there is no separate pointer file whose loss could
  * orphan the store — [[latestVersion]] derives the current version
  * from a listing, the same self-describing-directory discipline as
  * the parquet sink's manifest.
  *
  * Exactly-once under crash/restart, case by case (the window the
  * gated recovery spec kills into):
  *  - crash mid-`v<id>` write → no `_SUCCESS`, version invisible;
  *    the replayed batch recomputes from `v<latest>` and OVERWRITES
  *    the partial dir;
  *  - crash after the version committed but before the streaming
  *    offset log did → the replayed batch sees `latestVersion >= id`
  *    and SKIPS (already applied);
  *  - and independently of both, [[Changelog.mergeBatch]] itself is
  *    idempotent (re-offered entries lose the max_by at equal seq),
  *    so even a skip-logic bug degrades to a no-op re-merge, not a
  *    double-apply.
  *
  * Scale shape: per batch, ONE map-side latest-per-key collapse of
  * the microbatch, one broadcast anti/semi join against the store
  * (the 100 TB store never shuffles), and a store rewrite. The full
  * rewrite per batch is the parquet-files trade-off — a table format
  * with row-level deletes (Delta/Iceberg) would turn it into an
  * append + compaction, which is exactly what [[graft.ext.Layout
  * .compact]] models; `retain` bounds the version history the same
  * way their VACUUM does.
  */
object StreamMerge {

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def versionDir(storeDir: String, id: Long) = s"$storeDir/v$id"

  private val VersionName = "^v(-?\\d+)$".r

  /** Committed version ids under `storeDir` (a version counts iff its
    * `_SUCCESS` marker exists), ascending. Driver-side metadata
    * listing, O(retained versions).
    */
  def versions(spark: SparkSession, storeDir: String): Seq[Long] = {
    val (fs, p) = fsOf(spark, storeDir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionName(id)
          if fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")) =>
            Some(id.toLong)
        case _ => None
      }).sorted
  }

  /** Latest committed version id, or None for an empty store. */
  def latestVersion(spark: SparkSession, storeDir: String): Option[Long] =
    versions(spark, storeDir).lastOption

  /** Read the current store (full changelog shape, tombstones
    * included); empty-store reads are the caller's branch — the
    * streaming apply uses the batch's own schema for that case.
    *
    * Version-level snapshot isolation falls out of the layout: a
    * reader only ever binds to a COMMITTED version directory (the
    * `_SUCCESS` filter), never to the one mid-write, so concurrent
    * serving reads see a consistent store while the merge runs —
    * with `retain` sized above the longest reader (a version a
    * long query is still scanning must not be vacuumed under it).
    * ONE writer per storeDir is an (unchecked) caller obligation, as
    * with any directory-pointer scheme: Structured Streaming's query
    * lock is per-CHECKPOINT, so two queries with different
    * checkpoints pointed at one storeDir would interleave version
    * writes and vacuums — keep the storeDir↔checkpoint mapping 1:1
    * (the batch-id-reset guard in [[applyBatch]] catches the common
    * slip of re-pointing a FRESH checkpoint at an old store).
    */
  def readStore(spark: SparkSession, storeDir: String): Option[DataFrame] =
    latestVersion(spark, storeDir)
      .map(v => spark.read.parquet(versionDir(storeDir, v)))

  /** Serving snapshot: current store with tombstones elided and the
    * changelog bookkeeping columns dropped — [[Changelog.applyLog]]'s
    * output shape. One map-side filter over the latest version.
    */
  def snapshot(spark: SparkSession, storeDir: String, opCol: String,
               seqCols: Seq[String], deleteOp: String = "D"): DataFrame = {
    val store = readStore(spark, storeDir).getOrElse(
      throw new IllegalStateException(s"no committed store version under $storeDir"))
    store.where(col(opCol) =!= deleteOp).drop((opCol +: seqCols): _*)
  }

  /** Seed the store with an initial snapshot BEFORE streaming begins —
    * the "existing 100 TB corpus, now switch to incremental" entry
    * point. `snapshot` must already carry `opCol` (any non-delete
    * value) and `seqCols` BELOW any future log entry's seq, so every
    * streamed change outranks its seed row. Written as version -1
    * (batch ids start at 0). Refuses a store that already has
    * committed versions: version -1 would sort below them, never be
    * read, and be vacuumed on the next batch — a silent no-op where
    * the caller intended a reset (delete the storeDir first for
    * that).
    */
  def seed(snapshot: DataFrame, storeDir: String): Unit = {
    // a seed-ONLY store may be re-seeded: the bootstrap "seed; start"
    // script must be rerunnable after a crash between the seed commit
    // and the first batch commit (nothing has consumed the store
    // yet). Post-ingest versions make the guard fire — there the
    // seed WOULD be invisible.
    val existing = versions(snapshot.sparkSession, storeDir).filter(_ != -1L)
    require(existing.isEmpty,
      s"seed: store $storeDir already has committed ingest versions " +
        s"(${existing.mkString(", ")}) — the seed would be invisible; " +
        "delete the store first to reset it")
    snapshot.write.mode("overwrite").parquet(versionDir(storeDir, -1L))
  }

  /** Shared exactly-once bookkeeping for versioned-store foreachBatch
    * sinks ([[applyBatch]], [[StreamIngest.applyBatch]]): returns
    * true if the batch must be SKIPPED (exact replay of the last
    * committed version — crash between the version commit and the
    * offset-log commit), throws on a batch-id reset (a fresh
    * checkpoint pointed at an old store: ids restart at 0, and
    * silently skipping until the stream caught up would drop real
    * changes with healthy-looking progress).
    */
  private[streaming] def replaySkip(spark: SparkSession, storeDir: String,
                                    id: Long): Boolean = {
    val latest = latestVersion(spark, storeDir)
    if (latest.exists(_ > id))
      throw new IllegalStateException(
        s"store $storeDir is at version ${latest.get} but batch $id arrived — " +
          "a new checkpoint was pointed at an existing store (batch ids " +
          "restart at 0). Keep the storeDir<->checkpoint mapping 1:1, or " +
          "reset the store alongside the checkpoint.")
    latest.contains(id)
  }

  /** Drop store versions beyond the newest `retain` (the docs dirs of
    * [[StreamIngest]] are never touched — they are the corpus).
    */
  private[streaming] def vacuum(spark: SparkSession, storeDir: String,
                                retain: Int): Unit = {
    val (fs, _) = fsOf(spark, storeDir)
    versions(spark, storeDir).dropRight(retain).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(versionDir(storeDir, v)), true)
    }
  }

  /** Apply one changelog microbatch to the store — the foreachBatch
    * body, public for reuse and for direct testing. Skips batches at
    * or below the committed version (restart replay); vacuums
    * versions older than the newest `retain`.
    */
  def applyBatch(batch: DataFrame, id: Long, storeDir: String,
                 keyCol: String, opCol: String, seqCols: Seq[String],
                 retain: Int = 2): Unit = {
    require(retain >= 1,
      s"retain=$retain: the vacuum must keep at least the version just written")
    val spark = batch.sparkSession
    if (replaySkip(spark, storeDir, id)) return // already applied before the crash
    val cur = latestVersion(spark, storeDir)
      .map(v => spark.read.parquet(versionDir(storeDir, v)))
      .getOrElse(batch.limit(0)) // first batch of an unseeded store
    // the microbatch feeds three consumers inside mergeBatch (latest,
    // anti, semi) — pin it for the one action instead of re-running
    // the source slice thrice
    batch.persist()
    try Changelog.mergeBatch(cur, batch, keyCol, opCol, seqCols)
      .write.mode("overwrite").parquet(versionDir(storeDir, id))
    finally batch.unpersist(false)
    vacuum(spark, storeDir, retain)
  }

  /** Start the continuous merge of a streaming `changelog` into
    * `storeDir`. `Trigger.AvailableNow()` (the default) replays the
    * available log and settles — the gated-replay shape; a production
    * tail passes a processing-time trigger.
    */
  def start(changelog: DataFrame, storeDir: String, checkpointDir: String,
            keyCol: String, opCol: String, seqCols: Seq[String],
            retain: Int = 2,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(retain >= 1,
      s"retain=$retain: the vacuum must keep at least the version just written")
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        applyBatch(b, id, storeDir, keyCol, opCol, seqCols, retain)
      }
      .start()
  }
}
