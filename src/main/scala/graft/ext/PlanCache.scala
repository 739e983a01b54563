package graft.ext

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle manager for the library's persisted intermediate
  * relations.
  *
  * Several operators fan one expensive subtree into a diamond
  * (capped shingle hashes, LSH buckets, unit vectors) and persist it
  * so the subtree executes once. Left unmanaged, every call persists
  * a fresh copy of an identical plan: Spark's CacheManager warns
  * "Asked to cache already cached data" on each repeat, and the
  * relations accumulate in session storage until the session dies —
  * a real leak on a long-lived pipeline that builds these queries
  * many times.
  *
  * `cached` memoizes ONE persisted DataFrame per (tag, canonicalized
  * input plan): repeated calls with a semantically-equal input reuse
  * the already-persisted relation (no warning, no duplicate storage,
  * no recompute), while different inputs (another sf dir, another
  * table) get their own entry. `clear()` unpersists everything — the
  * bracket for pipelines that want deterministic release.
  *
  * The tag must encode every build parameter that changes the result
  * (e.g. `"cappedShingles/doc_id/text/100"`) — the cache trusts it.
  */
object PlanCache {
  private val cache = TrieMap.empty[
    (String, org.apache.spark.sql.SparkSession,
      Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]), DataFrame]

  /** Build-or-reuse a persisted relation derived from `input`. */
  def cached(tag: String, input: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    // key on the canonicalized plan OBJECT (structural equality — the
    // same rule CacheManager's sameResult uses): plan TEXT truncates
    // LocalRelation data, so two in-memory inputs with equal schemas
    // would collide, and an Int semanticHash collision would silently
    // serve the wrong relation. The owning session is part of the key
    // (reference equality): after a session restart the same scan plan
    // would otherwise hit and serve a DataFrame bound to the STOPPED
    // session, failing every downstream action.
    val key = (tag, input.sparkSession,
      Seq(input.queryExecution.analyzed.canonicalized))
    cache.getOrElseUpdate(key,
      build(input).persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Like [[cached]], but the memoized relation is a lazy
    * `localCheckpoint` instead of a persist: the result's logical plan
    * is truncated to a `LogicalRDD`, so a SMALL derived relation that
    * later composes into larger plans contributes ~nothing to their
    * plan size. Use for compact pipeline artifacts (drop-lists,
    * candidate sets) whose full lineage would otherwise be inlined
    * into every consumer — a multi-join subtree repeated across a
    * composed plan was measured to blow analysis/caching work up to
    * 10-45 s per query once a session held several cached relations.
    *
    * Trade-off vs [[cached]]: the checkpoint is NOT lineage-recoverable
    * (executor loss loses the partitions — Spark's documented
    * localCheckpoint semantics). That is the right trade only for
    * small relations; a production pipeline would write such artifacts
    * to reliable storage at exactly this boundary, which cuts lineage
    * identically.
    */
  def checkpointed(tag: String, input: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    val key = (tag, input.sparkSession,
      Seq(input.queryExecution.analyzed.canonicalized))
    cache.getOrElseUpdate(key, build(input).localCheckpoint(eager = false))
  }

  /** [[checkpointed]] for an artifact derived from TWO relations (a
    * contamination drop-list is a function of train AND eval; keying
    * on either alone would silently serve a stale artifact when only
    * the other changed). The key folds both canonicalized plans; the
    * session is taken from `a` (cross-session joins don't exist).
    */
  def checkpointed2(tag: String, a: DataFrame, b: DataFrame)(
      build: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val key = (tag, a.sparkSession,
      Seq(a.queryExecution.analyzed.canonicalized,
        b.queryExecution.analyzed.canonicalized))
    cache.getOrElseUpdate(key, build(a, b).localCheckpoint(eager = false))
  }

  private val artifacts = TrieMap.empty[
    (String, org.apache.spark.sql.SparkSession,
      Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]), Any]

  /** Memoize a BOUNDED driver-side artifact derived from `input` —
    * collected index bytes (a Bloom filter), sampled centroids, probe
    * panels — keyed exactly like [[cached]] (tag must encode every
    * build parameter). Rationale: such artifacts are built by their
    * own Spark job ending in a driver collect, so even when the
    * relations underneath are PlanCache'd, every re-execution of the
    * query re-runs the build job; the artifact is the "build once per
    * corpus, probe many times" half of an index operator and at
    * production scale would be written to reliable storage exactly
    * once (the IvfIndex parquet artifact is the same discipline).
    * Only for artifacts that are deterministic functions of (input
    * plan, tag) and small enough to live on the driver.
    */
  def artifact[T](tag: String, input: DataFrame)(build: DataFrame => T): T = {
    val key = (tag, input.sparkSession,
      Seq(input.queryExecution.analyzed.canonicalized))
    artifacts.getOrElseUpdate(key, build(input)).asInstanceOf[T]
  }

  /** Unpersist and drop every cached relation (blocking=false: lazy
    * executor-side release). Checkpointed entries release their RDD
    * storage via the ContextCleaner once unreferenced.
    */
  def clear(): Unit = {
    cache.values.foreach(_.unpersist(false))
    cache.clear()
    artifacts.clear()
  }

  /** Number of live cached relations (for specs/diagnostics). */
  def size: Int = cache.size
}
