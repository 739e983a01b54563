package graft.queries

import graft.Tables
import graft.ext.Sampling
import org.apache.spark.sql.functions._

/** Sampling family: deterministic splits, stratified keeps, reservoir
  * sampling, token budgets, tempered mixtures (share + mass), epoch
  * replay factors, curriculum staging — every row salted-hash
  * deterministic with integer-exact shares so the oracle reproduces
  * exact memberships, not proportions.
  *
  * Split out of [[ExtPipelineQueries]] (round 13, mechanical — blocks
  * moved verbatim, same discipline as the round-10 family split and
  * the round-12 [[ExtVersionQueries]] move). Names keep the
  * `ext_pipeline_` prefix: the registry key is the public contract,
  * the file is not.
  */
object ExtSamplingQueries {

  val all: Seq[Declared] = Seq(

    // Deterministic fixed-size per-stratum sample
    // ([[Sampling.reservoirPerStratum]]): exactly k min-salted-hash
    // rows per language; id checksums pin the exact membership, which
    // the oracle reproduces from the same md5 rank.
    Declared(
      "ext_pipeline_reservoir",
      (s, d) =>
        Sampling.reservoirPerStratum(Tables.documents(s, d), Seq("lang"),
            col("doc_id"), k = 20)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_checksum"))
          .orderBy("lang"),
      Some("""WITH rk AS (
                SELECT lang, doc_id,
                       ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
                         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'resv'), 1, 8) AS BIGINT),
                         doc_id) AS rk
                FROM documents)
              SELECT lang, COUNT(*) AS n_kept,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum
              FROM rk WHERE rk <= 20
              GROUP BY lang ORDER BY lang""")),

    // Deterministic WEIGHTED reservoir
    // ([[Sampling.weightedReservoirPerStratum]]): k docs per language
    // selected by smallest hash-div-weight priority, weight = doc
    // length — longer documents proportionally likelier, membership
    // still a pure function of (id, salt, weight), integer-exact on
    // both engines (the float pow/log of textbook A-ES cannot be).
    // Zero-length docs are excluded on BOTH sides: a zero weight
    // divides to null, and the engines disagree on null sort order.
    Declared(
      "ext_pipeline_reservoir_weighted",
      (s, d) =>
        Sampling.weightedReservoirPerStratum(
            Tables.documents(s, d).where(col("n_chars") > 0),
            Seq("lang"), col("doc_id"), col("n_chars"), k = 20)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"),
            sum(col("doc_id")).as("id_checksum"),
            sum(col("n_chars")).as("chars_kept"))
          .orderBy("lang"),
      Some("""WITH rk AS (
                SELECT lang, doc_id, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
                         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'wres'), 1, 8) AS BIGINT)
                           // CAST(n_chars AS BIGINT),
                         doc_id) AS rk
                FROM documents WHERE n_chars > 0)
              SELECT lang, COUNT(*) AS n_kept,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                     CAST(SUM(n_chars) AS BIGINT) AS chars_kept
              FROM rk WHERE rk <= 20
              GROUP BY lang ORDER BY lang""")),

    // Deterministic token-budget selection ([[Sampling.tokenBudget]]):
    // keep documents per language, hash order, until ~2000 chars are
    // spent — mixture weights → an actual training set. The id
    // checksum pins exact membership (first doc always kept, overshoot
    // ≤ 1 doc); the oracle replays the identical salted-hash ranking
    // and exclusive prefix sum.
    Declared(
      "ext_pipeline_budget",
      (s, d) =>
        Sampling.tokenBudget(Tables.documents(s, d), Seq("lang"),
            col("doc_id"), col("n_chars"), budget = 2000L)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("chars_kept"),
            sum(col("doc_id")).as("sum_kept_ids"))
          .orderBy("lang"),
      Some("""WITH r AS (
                SELECT lang, doc_id, n_chars,
                       SUM(n_chars) OVER (PARTITION BY lang ORDER BY
                         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'budget'), 1, 8) AS BIGINT),
                         doc_id) - n_chars AS prefix
                FROM documents)
              SELECT lang, COUNT(*) AS n_kept,
                     CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
                     CAST(SUM(doc_id) AS BIGINT) AS sum_kept_ids
              FROM r WHERE prefix < 2000
              GROUP BY lang ORDER BY lang""")),

    // α=0.5 temperature mixture ([[Sampling.temperedTokenBudget]]):
    // the 60k-char budget splits across languages ∝ isqrt(count) —
    // English (~40% of docs) gets ~30% of the budget, each tail
    // language MORE than its natural share — then each language keeps
    // hash-ordered docs until its share is spent. All-integer on both
    // engines (isqrt weight, DECIMAL/HUGEINT share division, exact
    // prefix sums); the id checksum pins exact membership, and
    // target_chars pins the share computation itself.
    Declared(
      "ext_pipeline_mixture",
      (s, d) =>
        Sampling.temperedTokenBudget(Tables.documents(s, d), Seq("lang"),
            col("doc_id"), col("n_chars"), totalBudget = 60000L)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("chars_kept"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("lang"),
      Some("""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
              w AS (SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
              t AS (SELECT lang,
                           CAST(CAST(60000 AS HUGEINT) * w // (SELECT SUM(w) FROM w) AS BIGINT) AS target
                    FROM w),
              r AS (SELECT d.lang, d.doc_id, d.n_chars, t.target,
                           SUM(d.n_chars) OVER (PARTITION BY d.lang ORDER BY
                             CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'mix'), 1, 8) AS BIGINT),
                             d.doc_id) - d.n_chars AS prefix
                    FROM documents d JOIN t USING (lang))
              SELECT lang, COUNT(*) AS n_kept,
                     CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum
              FROM r WHERE prefix < target
              GROUP BY lang ORDER BY lang""")),

    // The mass-weighted mixture convention (weighByTokens = true):
    // tempering weights from isqrt(Σ n_chars) per language instead of
    // isqrt(count) — what multilingual sampling papers actually
    // compute, materially different under skewed document lengths.
    // Same all-integer share/selection machinery as
    // ext_pipeline_mixture; the two rows pin both conventions.
    Declared(
      "ext_pipeline_mixture_mass",
      (s, d) =>
        Sampling.temperedTokenBudget(Tables.documents(s, d), Seq("lang"),
            col("doc_id"), col("n_chars"), totalBudget = 60000L,
            weighByTokens = true)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_kept"),
            sum(col("n_chars")).as("chars_kept"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("lang"),
      Some("""WITH c AS (SELECT lang, SUM(n_chars) AS n FROM documents GROUP BY lang),
              w AS (SELECT lang, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
              t AS (SELECT lang,
                           CAST(CAST(60000 AS HUGEINT) * w // (SELECT SUM(w) FROM w) AS BIGINT) AS target
                    FROM w),
              r AS (SELECT d.lang, d.doc_id, d.n_chars, t.target,
                           SUM(d.n_chars) OVER (PARTITION BY d.lang ORDER BY
                             CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'mix'), 1, 8) AS BIGINT),
                             d.doc_id) - d.n_chars AS prefix
                    FROM documents d JOIN t USING (lang))
              SELECT lang, COUNT(*) AS n_kept,
                     CAST(SUM(n_chars) AS BIGINT) AS chars_kept,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum
              FROM r WHERE prefix < target
              GROUP BY lang ORDER BY lang""")),

    // α=0.5 temperature upsampling ([[Sampling.temperedRepeats]]) —
    // the mixture row's dual: tail languages repeat
    // ceil(temperedShare/naturalShare) times per pass (en stays at 1,
    // every tail language doubles on these fixtures), each repeat
    // tagged with its epoch index. Integer-exact factor arithmetic on
    // both engines; the epoch-weighted id checksum pins both
    // membership and per-row repeat counts.
    Declared(
      "ext_pipeline_epochs",
      (s, d) =>
        Sampling.temperedRepeats(Tables.documents(s, d), Seq("lang"))
          .groupBy("lang")
          .agg(max(col("epoch") + 1).as("factor"),
            count(lit(1)).as("n_rows"),
            sum(col("doc_id") * (col("epoch") + 1)).as("epoch_checksum"))
          .orderBy("lang"),
      Some("""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
              w AS (SELECT lang, n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
              t AS (SELECT SUM(n) AS nn, SUM(w) AS wsum FROM w),
              f AS (SELECT lang,
                           CAST((CAST(w AS HUGEINT) * nn + CAST(wsum AS HUGEINT) * n - 1)
                                // (CAST(wsum AS HUGEINT) * n) AS BIGINT) AS f
                    FROM w, t),
              e AS (SELECT d.lang, d.doc_id, unnest(range(f.f)) AS epoch
                    FROM documents d JOIN f USING (lang))
              SELECT lang, MAX(epoch + 1) AS factor, COUNT(*) AS n_rows,
                     CAST(SUM(doc_id * (epoch + 1)) AS BIGINT) AS epoch_checksum
              FROM e GROUP BY lang ORDER BY lang""")),

    // Curriculum staging ([[Sampling.curriculumBuckets]]): quartile
    // each language by document length (doc_id tie-break makes the
    // order total), train easy→hard. NTILE's leading-bucket remainder
    // rule is identical on both engines; per-stage counts, char sums
    // and id checksums pin every stage boundary.
    Declared(
      "ext_pipeline_curriculum",
      (s, d) =>
        Sampling.curriculumBuckets(Tables.documents(s, d), Seq("lang"),
            Seq(col("n_chars"), col("doc_id")), nBuckets = 4)
          .groupBy("lang", "stage")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("chars"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("lang", "stage"),
      Some("""WITH st AS (
                SELECT lang, doc_id, n_chars,
                       NTILE(4) OVER (PARTITION BY lang
                         ORDER BY n_chars, doc_id) AS stage
                FROM documents)
              SELECT lang, stage, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS chars,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum
              FROM st GROUP BY 1, 2 ORDER BY 1, 2""")),

    Declared(
      "ext_pipeline_split",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sp = Sampling.withSplit(docs, col("doc_id"), valPct = 10, testPct = 10)
        val keep = Sampling.stratifiedKeep(col("doc_id"), col("lang"),
          Seq("en" -> 500, "es" -> 250, "de" -> 250, "fr" -> 250),
          defaultPerMille = 100)
        sp.groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_checksum"),
            sum(when(keep, 1L).otherwise(0L)).as("n_kept"))
          .orderBy("split", "lang")
      },
      Some("""WITH b AS (
                SELECT doc_id, lang,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 8) AS BIGINT) % 100 AS sb,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'strat'), 1, 8) AS BIGINT) % 1000 AS kb
                FROM documents)
              SELECT CASE WHEN sb < 10 THEN 'val'
                          WHEN sb < 20 THEN 'test'
                          ELSE 'train' END AS split,
                     lang, COUNT(*) AS n_docs,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                     CAST(SUM(CASE WHEN kb < (CASE lang WHEN 'en' THEN 500
                                                        WHEN 'es' THEN 250
                                                        WHEN 'de' THEN 250
                                                        WHEN 'fr' THEN 250
                                                        ELSE 100 END)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
              FROM b GROUP BY split, lang ORDER BY split, lang"""))
  )
}
