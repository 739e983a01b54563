package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a 100 TB
  * pretraining-data pipeline actually runs, built entirely from this
  * library's operators —
  *
  *   1. language gate      ([[TextStats.withLangId]], fused codegen
  *                          scoring — pure map-side filter);
  *   2. quality gate       ([[TextStats.withQualityFeatures]] — also
  *                          map-side, no join-back);
  *   3. exact dedup        ([[Dedup.exactByFingerprint]] — 16-byte
  *                          (fp, id) shuffle, text never on the wire);
  *   4. near-dedup         (MinHash-LSH candidates capped at
  *                          `maxBucket`, exact n-gram-Jaccard
  *                          verification on candidates only, PLUS
  *                          cluster dedup of the over-cap buckets —
  *                          every bucket is handled exactly once,
  *                          pairwise where cheap, representative-only
  *                          where degenerate).
  *
  * Stage ORDER is the scale story: the two map-side gates run first so
  * every shuffle-bearing stage sees only survivors; nothing in the
  * pipeline is ever pairwise in the corpus; the drop policy ("drop the
  * larger id of a verified pair; keep the min-id representative of a
  * degenerate cluster") is one anti-join, not a transitive closure —
  * deterministic, single-pass, and expressible as plain SQL for the
  * oracle.
  *
  * Materialization discipline: exactly three small relations persist
  * (via [[PlanCache]], releasable with `PlanCache.clear()`) — the
  * survivor corpus and the two drop-lists. Each is fanned into ≥2
  * consumers (survivors feed the minhash branch, both shingle-join
  * sides, and the final anti-join; the drop-lists feed the audit
  * counts and the anti-join), and without the persists the whole
  * near-dup subtree re-executes per consumer — measured 3× the
  * runtime at sf0.1. Per-stage audit counts cost ONE extra scan total:
  * [[Curated.gateStats]] folds the input/language/quality counts into
  * a single conditional aggregate over one pass of the gate
  * projection.
  */
object Curation {

  /** The frames of one curation run. `finalDocs` is the curated
    * corpus (id, text, n_tokens); `gateStats` is a one-row audit frame
    * (n_input, n_lang, n_quality) computed in a single pass; the
    * intermediates are exposed so callers (and the oracle query) can
    * audit per-stage attrition.
    */
  final case class Curated(
    input: DataFrame,
    langKept: DataFrame,
    qualityKept: DataFrame,
    exactKept: DataFrame,
    nearDupPairs: DataFrame,
    finalDocs: DataFrame,
    gateStats: DataFrame)

  /** Run the pipeline over `docs`. Near-dup threshold is the rational
    * jaccardNum/jaccardDen (integer cross-multiplication — no float
    * compare anywhere).
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             keepLang: String = "en",
             minTokens: Int = 30, minTtrDecile: Int = 3,
             jaccardNum: Int = 4, jaccardDen: Int = 5,
             k: Int = 16, rowsPerBand: Int = 4,
             maxBucket: Int = 64, dfCap: Int = 100): Curated = {
    val input = docs.select(col(idCol), col(textCol))
    // one gate projection carrying pass/fail flags instead of filtering
    // immediately: the audit counts then need no extra passes, and the
    // kept-frames below are cheap filters over the same projection
    val gated = TextStats.withQualityFeatures(
        TextStats.withLangId(input, textCol, "__predicted"), textCol)
      .withColumn("__lang_ok", col("__predicted") === keepLang)
      .withColumn("__qual_ok",
        col("__lang_ok") && col("n_tokens") >= minTokens &&
          col("ttr_decile") >= minTtrDecile)
    val gateStats = gated.agg(
      count(lit(1)).as("n_input"),
      sum(when(col("__lang_ok"), 1L).otherwise(0L)).as("n_lang"),
      sum(when(col("__qual_ok"), 1L).otherwise(0L)).as("n_quality"))
    val langKept = gated.where(col("__lang_ok"))
      .select(col(idCol), col(textCol))
    val qualityKept = gated.where(col("__qual_ok"))
      .select(col(idCol), col(textCol), col("n_tokens"))
    val gateTag = s"$idCol/$textCol/$keepLang/$minTokens/$minTtrDecile"
    val surv = PlanCache.cached(s"curation/surv/$gateTag",
      Dedup.exactByFingerprint(qualityKept, idCol, textCol))(identity)

    val bands = Dedup.lshBands(
      Dedup.minhashSignatures(Dedup.tokenHashes(surv, idCol, textCol), k),
      k, rowsPerBand)
    val verified = PlanCache.cached(
      s"curation/pairs/$gateTag/$jaccardNum/$jaccardDen/$k/$rowsPerBand/$maxBucket/$dfCap",
      Dedup.ngramJaccardOnCandidates(surv, idCol, textCol,
          Dedup.lshCandidatePairs(bands, maxBucket), dfCap)
        .where(col("inter") * jaccardDen >= col("uni") * jaccardNum))(identity)
    // members of degenerate buckets, minus each bucket's representative
    val clusterDrops = PlanCache.cached(
      s"curation/clusters/$gateTag/$k/$rowsPerBand/$maxBucket",
      bands
        .join(Dedup.lshDegenerateClusters(bands, maxBucket), Seq("band", "sig"))
        .where(col("doc_id") =!= col("rep_doc"))
        .select("doc_id"))(identity)
    val drops = verified.select(col("doc_b").as("doc_id"))
      .union(clusterDrops).distinct()
      .withColumnRenamed("doc_id", "__drop_id")
    val finalDocs = surv
      .join(drops, col(idCol) === col("__drop_id"), "left_anti")
    Curated(input, langKept, qualityKept, surv, verified, finalDocs, gateStats)
  }
}
