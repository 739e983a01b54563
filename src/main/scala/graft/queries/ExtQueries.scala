package graft.queries

import graft.Tables
import graft.ext.{Curation, Dedup, Graph, Multimodal, PlanCache, Sampling, Search, Similarity, Skew, Stats, TextStats, TimeJoin}
import org.apache.spark.sql.functions._

/** Declared queries for the LLM-pipeline extension operators
  * (north_star): dedup, text analysis, similarity search, multimodal.
  * EVERY query carries a DuckDB oracle SQL twin with engine-portable
  * arithmetic (integer-only outputs, md5-based hashing — see
  * [[graft.ext.Hashing]]); float-scored top-k machinery is checked
  * through tie-safe integer projections ([[topkChecksum]]) plus the
  * census/margin/recall queries.
  */
object ExtQueries {

  /** Stop-shingle document-frequency cap shared by the Spark queries
    * and their oracles (see [[Dedup.cappedShingleHashes]]).
    */
  private val DfCap = 100

  /** LSH bucket-size cap shared by the Spark queries and their oracles
    * (see [[Dedup.lshCandidatePairs]]): buckets holding more docs are
    * degenerate near-identical clusters, excluded from pairwise
    * verification.
    */
  private val MaxBucket = 64

  /** Shared DuckDB CTE text: distinct (doc_id, token) with 32-bit hash. */
  private val tokCte =
    """tok AS (
         SELECT DISTINCT doc_id, w FROM (
           SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE w <> ''),
       h AS (
         SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS hv FROM tok)"""

  /** Shared DuckDB CTE text: 60-bit SimHash signature per doc — the
    * oracle twin of [[graft.ext.Dedup.simhash]] at bits = 60 (token
    * hashes from the top 15 hex chars of md5, majority vote per bit).
    */
  private val simh60Cte =
    """tok60 AS (
         SELECT DISTINCT doc_id, w FROM (
           SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE w <> ''),
       h60 AS (
         SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS hv FROM tok60),
       sbits AS (
         SELECT doc_id, b,
                SUM(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
         FROM h60, range(60) t(b) GROUP BY doc_id, b),
       simh AS (
         SELECT doc_id,
                SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
         FROM sbits GROUP BY doc_id)"""

  /** Shared DuckDB CTE text: distinct word-trigram shingles per doc.
    * The token position comes from zip-unnesting the split list with
    * `range(len(...))` in the SELECT list (DuckDB runs parallel
    * unnests in lockstep) — `range` as a lateral table function over a
    * column is not supported.
    */
  private val shingleCte =
    """tp AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                unnest(range(len(string_split(text, ' ')))) AS pos
         FROM documents),
       sh0 AS (
         SELECT doc_id,
                w || ' ' || LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                  || ' ' || LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS shingle
         FROM tp),
       sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL)"""

  /** Shared DuckDB CTE text: hashed shingles with the df > DfCap
    * stop-shingles dropped, plus per-doc cardinality — the oracle twin
    * of [[Dedup.cappedShingleHashes]].
    */
  private def cappedShingleCte =
    s"""$shingleCte,
       shh AS (
         SELECT DISTINCT doc_id,
                CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS sh
         FROM sh),
       kept AS (SELECT sh FROM shh GROUP BY sh HAVING COUNT(*) <= $DfCap),
       fsh AS (SELECT doc_id, sh FROM shh JOIN kept USING (sh)),
       card AS (SELECT doc_id, COUNT(*) AS n FROM fsh GROUP BY doc_id)"""

  /** Shared DuckDB CTE text: MinHash band signatures (k=16 minhashes,
    * 4 bands × 4 rows) — twin of [[Dedup.minhashSignatures]] +
    * [[Dedup.lshBands]].
    */
  private val minhashSigCte =
    s"""$tokCte,
       mh AS (
         SELECT doc_id, i,
                MIN(((2*i + 3) * hv + (5*i + 7)) % 2147483647) AS minh
         FROM h, range(16) t(i) GROUP BY doc_id, i),
       sigs AS (
         SELECT doc_id, CAST(i // 4 AS INT) AS band,
                string_agg(CAST(minh AS VARCHAR), ',' ORDER BY i) AS sig
         FROM mh GROUP BY doc_id, band)"""

  /** Shared DuckDB CTE text: sign-random-projection LSH buckets, 4
    * tables × 8 planes over 64-dim embeddings — twin of
    * [[Similarity.lshBuckets]] (global plane i ⇒ table i//8, bit i%8;
    * plane components from the same md5 formula as
    * [[Similarity.planeComponent]]).
    */
  private val lshBuckCte =
    """planes AS (
         SELECT i, j,
                (CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 8) AS BIGINT)
                   % 1001 - 500) / 500.0 AS pc
         FROM range(32) t(i), range(64) u(j)),
       vx AS (
         SELECT vec_id, unnest(embedding::DOUBLE[]) AS x, unnest(range(64)) AS j
         FROM embeddings),
       proj AS (
         SELECT vec_id, i, SUM(x * pc) AS p
         FROM vx JOIN planes USING (j) GROUP BY vec_id, i),
       buck AS (
         SELECT vec_id, i // 8 AS tbl,
                SUM(CASE WHEN p >= 0 THEN (CAST(1 AS BIGINT) << (i % 8)) ELSE 0 END) AS bucket
         FROM proj GROUP BY vec_id, tbl)"""

  val all: Seq[Declared] = Seq(

    // --- Deduplication ------------------------------------------------

    // Exact dedup, both library forms: deterministic min-id winner by
    // 60-bit fingerprint (semi-join, no text bytes shuffled) and the
    // dropDuplicates census. sum_kept_ids pins WHICH rows were kept.
    Declared(
      "ext_dedup_exact_rows",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val kept = Dedup.exactByFingerprint(docs, "doc_id", "text")
          .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_kept_ids"))
        val arb = Dedup.exact(docs, Seq("text")).agg(count(lit(1)).as("n_exact"))
        kept.crossJoin(arb)
      },
      Some("""WITH keep AS (SELECT MIN(doc_id) AS id FROM documents GROUP BY md5(text))
              SELECT COUNT(*) AS n_kept, CAST(SUM(id) AS BIGINT) AS sum_kept_ids,
                     COUNT(*) AS n_exact
              FROM keep""")),

    // Incremental ingest dedup: the batch (doc_id ≡ 0 mod 5) dedups
    // against the fingerprint STORE of the standing corpus (the other
    // 80%) — one 8-byte column anti-join, corpus text never re-read —
    // then min-id within the batch. The id checksum pins exactly which
    // batch rows count as new content.
    Declared(
      "ext_dedup_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val corpus = docs.where(col("doc_id") % 5 =!= 0)
        val batch = docs.where(col("doc_id") % 5 === 0)
        val kept = Dedup.incrementalExact(batch, "doc_id", "text",
          Dedup.fingerprintStore(corpus, "text"))
        batch.agg(count(lit(1)).as("n_batch")).crossJoin(
          kept.agg(count(lit(1)).as("n_new"),
            sum(col("doc_id")).as("id_checksum")))
      },
      Some("""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
              batch AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
              store AS (SELECT DISTINCT md5(text) AS fp FROM corpus),
              fresh AS (SELECT b.* FROM batch b ANTI JOIN store s ON md5(b.text) = s.fp),
              keep AS (SELECT MIN(doc_id) AS doc_id FROM fresh GROUP BY md5(text))
              SELECT (SELECT COUNT(*) FROM batch) AS n_batch,
                     COUNT(*) AS n_new,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum
              FROM keep""")),

    // Incremental NEAR-dedup ([[Dedup.incrementalLshCandidates]]): a
    // 5% ingest batch is LSH-banded and joined against the standing
    // corpus's band store (PlanCache'd — at 100 TB it is a parquet
    // artifact written at corpus-build time, never recomputed), then
    // candidates are exact-verified at Jaccard ≥ 0.8 via the shared
    // shingle-set fingerprints. Only the delta is ever re-hashed; the
    // checksums pin exactly WHICH corpus docs each new doc collides
    // with and which survive verification.
    Declared(
      "ext_dedup_incremental_lsh",
      (s, d) => {
        val docs = Tables.documents(s, d)
        def bandsOf(part: org.apache.spark.sql.DataFrame) =
          Dedup.lshBands(
            Dedup.minhashSignatures(
              Dedup.tokenHashes(part, "doc_id", "text"), 16), 16, 4)
        val storeBands = graft.ext.PlanCache.cached(
          "incLsh/store/16/4", docs)(dd =>
            bandsOf(dd.where(col("doc_id") % 20 =!= 7)))
        // the per-ingest candidate artifact: census and verify both
        // consume it, and a real pipeline writes it once per batch —
        // checkpoint-memoized exactly like lsh_verified's candidates
        val cands = graft.ext.PlanCache.checkpointed(
          s"incLsh/cands/16/4/$MaxBucket", docs) { dd =>
          Dedup.incrementalLshCandidates(
            bandsOf(dd.where(col("doc_id") % 20 === 7)), storeBands,
            maxBucket = MaxBucket)
        }
        val verified = Dedup.ngramJaccardOnCandidates(docs, "doc_id", "text",
            cands.select(col("doc_new").as("doc_a"), col("doc_corpus").as("doc_b")),
            DfCap)
          .where(col("inter") * 5 >= col("uni") * 4)
        cands.agg(count(lit(1)).as("n_cands"),
            coalesce(sum(col("doc_new") + col("doc_corpus")), lit(0L))
              .as("cand_checksum"))
          .crossJoin(verified.agg(count(lit(1)).as("n_dups"),
            coalesce(sum(col("doc_a") + col("doc_b")), lit(0L))
              .as("dup_checksum")))
      },
      Some(s"""WITH $minhashSigCte,
               $cappedShingleCte,
               batch AS (SELECT * FROM sigs WHERE doc_id % 20 = 7),
               store AS (SELECT * FROM sigs WHERE doc_id % 20 <> 7),
               okb AS (SELECT band, sig FROM store
                       GROUP BY band, sig HAVING COUNT(*) <= $MaxBucket),
               s2 AS (SELECT store.* FROM store JOIN okb USING (band, sig)),
               cand AS (
                 SELECT DISTINCT b.doc_id AS doc_a, s2.doc_id AS doc_b
                 FROM batch b JOIN s2
                   ON b.band = s2.band AND b.sig = s2.sig
                  AND b.doc_id <> s2.doc_id),
               inter AS (
                 SELECT doc_a, doc_b, COUNT(*) AS inter
                 FROM cand
                 JOIN fsh fa ON fa.doc_id = doc_a
                 JOIN fsh fb ON fb.doc_id = doc_b AND fa.sh = fb.sh
                 GROUP BY doc_a, doc_b),
               v AS (
                 SELECT i.doc_a, i.doc_b, inter, ca.n + cb.n - inter AS uni
                 FROM inter i
                 JOIN card ca ON i.doc_a = ca.doc_id
                 JOIN card cb ON i.doc_b = cb.doc_id)
               SELECT (SELECT COUNT(*) FROM cand) AS n_cands,
                      CAST((SELECT COALESCE(SUM(doc_a + doc_b), 0) FROM cand)
                        AS BIGINT) AS cand_checksum,
                      (SELECT COUNT(*) FROM v WHERE inter * 5 >= uni * 4)
                        AS n_dups,
                      CAST((SELECT COALESCE(SUM(doc_a + doc_b), 0)
                            FROM v WHERE inter * 5 >= uni * 4) AS BIGINT)
                        AS dup_checksum""")),

    // Incremental SimHash near-dup ([[Dedup.incrementalSimhashCandidates]]):
    // the same 5% ingest batch dedups against the standing corpus's
    // SIGNATURE store (the persisted simhashShared relation — 16
    // bytes/doc, written at corpus-build time), via the pigeonhole
    // segment multi-index joined batch-vs-store. Completes the
    // incremental family: exact fingerprints, MinHash-LSH bands, and
    // SimHash signatures all dedup a delta without re-reading corpus
    // text. The oracle brute-forces batch×store hamming — exact, so
    // the candidate set (not just its size) is hash-pinned.
    Declared(
      "ext_dedup_incremental_simhash",
      (s, d) => {
        val sh = Dedup.simhashShared(Tables.documents(s, d), "doc_id", "text",
          bits = 60)
        Dedup.incrementalSimhashCandidates(
            sh.where(col("doc_id") % 20 === 7),
            sh.where(col("doc_id") % 20 =!= 7),
            bits = 60, maxDist = 3)
          .agg(count(lit(1)).as("n_pairs"),
            coalesce(sum(col("doc_new") + col("doc_corpus")), lit(0L))
              .as("id_checksum"),
            coalesce(sum(col("dist")), lit(0L)).as("sum_dist"))
      },
      Some(s"""WITH $simh60Cte,
               batch AS (SELECT * FROM simh WHERE doc_id % 20 = 7),
               store AS (SELECT * FROM simh WHERE doc_id % 20 <> 7),
               p AS (
                 SELECT b.doc_id AS doc_new, s.doc_id AS doc_corpus,
                        bit_count(xor(b.simhash, s.simhash)) AS dist
                 FROM batch b JOIN store s ON b.doc_id <> s.doc_id)
               SELECT COUNT(*) AS n_pairs,
                      CAST(COALESCE(SUM(doc_new + doc_corpus), 0) AS BIGINT)
                        AS id_checksum,
                      CAST(COALESCE(SUM(dist), 0) AS BIGINT) AS sum_dist
               FROM p WHERE dist <= 3""")),

    Declared(
      "ext_dedup_fingerprint",
      (s, d) => {
        val fp = TextStats.fingerprints(Tables.documents(s, d), "doc_id", "text")
        fp.agg(count(lit(1)).as("docs"),
          countDistinct(col("content_fp")).as("uniq_content"),
          countDistinct(col("winnow_fp")).as("uniq_winnow"))
      },
      Some(s"""WITH $shingleCte,
               winnow AS (
                 SELECT doc_id,
                        MIN(CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT)) AS wfp
                 FROM sh GROUP BY doc_id),
               content AS (
                 SELECT doc_id,
                        CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS cfp
                 FROM documents)
               SELECT COUNT(*) AS docs, COUNT(DISTINCT cfp) AS uniq_content,
                      COUNT(DISTINCT wfp) AS uniq_winnow
               FROM content JOIN winnow USING (doc_id)""")),

    Declared(
      "ext_dedup_minhash",
      (s, d) => Dedup.minhashLshCensus(Tables.documents(s, d), "doc_id", "text"),
      Some(s"""WITH $minhashSigCte,
               buckets AS (
                 SELECT band, sig, COUNT(*) AS cnt FROM sigs GROUP BY band, sig)
               SELECT band,
                      CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_buckets,
                      CAST(SUM((cnt * (cnt - 1)) // 2) AS BIGINT) AS cand_pairs,
                      CAST(SUM(cnt) AS BIGINT) AS n_docs
               FROM buckets GROUP BY band ORDER BY band""")),

    // 60-bit signature bucket census over the PlanCache-shared
    // signature relation ([[Dedup.simhashShared]]) — the same cached
    // (doc_id, simhash) table the near-pair multi-index and component
    // closure consume, so the corpus-scan+tokenize+per-bit aggregation
    // runs once for the whole SimHash family. The oracle recomputes
    // the full 60-bit signature from the md5-based token hashes and
    // buckets on its low 6 bits.
    Declared(
      "ext_dedup_simhash",
      (s, d) =>
        Dedup.simhashShared(Tables.documents(s, d), "doc_id", "text", bits = 60)
          .select((col("simhash") % 64).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket"),
      Some("""WITH tok AS (
                 SELECT DISTINCT doc_id, w FROM (
                   SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
                 WHERE w <> ''),
               h AS (
                 SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS hv FROM tok),
               bits AS (
                 SELECT doc_id, b,
                        SUM(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
                 FROM h, range(60) t(b) GROUP BY doc_id, b),
               simh AS (
                 SELECT doc_id,
                        SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
                 FROM bits GROUP BY doc_id)
               SELECT CAST(simhash % 64 AS BIGINT) AS bucket, COUNT(*) AS n
               FROM simh GROUP BY bucket ORDER BY bucket""")),

    // 60-bit SimHash hamming-≤3 near-dup census: the Spark side uses
    // the multi-index segment bucketing (exact by pigeonhole, never
    // all-pairs — the 100 TB shape); the oracle brute-forces all pairs
    // in SQL, so a hash match also proves the multi-index loses no
    // pair. Aggregated to one row: pair count, id checksum (pins WHICH
    // pairs), summed distance (pins the distances).
    Declared(
      "ext_dedup_simhash_pairs",
      (s, d) =>
        Dedup.simhashNearPairs(Tables.documents(s, d), "doc_id", "text",
          bits = 60, maxDist = 3)
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("doc_a") + col("doc_b")).as("id_checksum"),
            sum(col("dist")).as("sum_dist")),
      Some("""WITH tok AS (
                 SELECT DISTINCT doc_id, w FROM (
                   SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
                 WHERE w <> ''),
               h AS (
                 SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS hv FROM tok),
               bits AS (
                 SELECT doc_id, b,
                        SUM(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
                 FROM h, range(60) t(b) GROUP BY doc_id, b),
               simh AS (
                 SELECT doc_id,
                        SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
                 FROM bits GROUP BY doc_id),
               p AS (
                 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        bit_count(xor(a.simhash, b.simhash)) AS dist
                 FROM simh a JOIN simh b ON a.doc_id < b.doc_id)
               SELECT COUNT(*) AS n_pairs,
                      CAST(SUM(doc_a + doc_b) AS BIGINT) AS id_checksum,
                      CAST(SUM(dist) AS BIGINT) AS sum_dist
               FROM p WHERE dist <= 3""")),

    // Transitive duplicate classes ([[Dedup.connectedComponents]])
    // over the simhash hamming-≤3 pair graph: pairwise output alone
    // under-merges (A~B, B~C must be ONE class even when A~C never
    // surfaced); the component representative (min reachable id) is
    // what a keep-one-per-class dedup policy needs. The oracle
    // computes the same closure with a recursive CTE; the label<node
    // prune is safe for MIN-label reachability (any pruned label
    // routes through a node whose own smaller seed reaches the same
    // places) and is what makes the recursion finite.
    Declared(
      "ext_dedup_components",
      (s, d) => {
        val pairs = Dedup.simhashNearPairs(Tables.documents(s, d), "doc_id", "text",
          bits = 60, maxDist = 3)
        Dedup.connectedComponentsShared(pairs, "doc_a", "doc_b")
          .groupBy("component").agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)).as("n_components"),
            sum(col("sz")).as("n_docs"),
            sum(col("component")).as("rep_checksum"),
            max(col("sz")).as("max_size"))
      },
      Some("""WITH RECURSIVE tok AS (
                 SELECT DISTINCT doc_id, w FROM (
                   SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
                 WHERE w <> ''),
               h AS (
                 SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS hv FROM tok),
               bits AS (
                 SELECT doc_id, b,
                        SUM(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
                 FROM h, range(60) t(b) GROUP BY doc_id, b),
               simh AS (
                 SELECT doc_id,
                        SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
                 FROM bits GROUP BY doc_id),
               p AS (
                 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM simh a JOIN simh b ON a.doc_id < b.doc_id
                 WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
               edges AS (
                 SELECT doc_a AS a, doc_b AS b FROM p
                 UNION SELECT doc_b, doc_a FROM p),
               reach(node, label) AS (
                 SELECT a, a FROM edges
                 UNION
                 SELECT e.b, r.label FROM reach r
                 JOIN edges e ON e.a = r.node WHERE r.label < e.b),
               cc AS (SELECT node, MIN(label) AS comp FROM reach GROUP BY node),
               sizes AS (SELECT comp, COUNT(*) AS sz FROM cc GROUP BY comp)
               SELECT COUNT(*) AS n_components,
                      CAST(SUM(sz) AS BIGINT) AS n_docs,
                      CAST(SUM(comp) AS BIGINT) AS rep_checksum,
                      CAST(MAX(sz) AS BIGINT) AS max_size
               FROM sizes""")),

    // Canonical-survivor selection ([[Dedup.keepCanonical]]) over the
    // same simhash duplicate classes: the step a production dedup
    // actually ships — each class (singletons included) keeps its
    // best-quality doc (max n_chars, ties → min doc_id, a total
    // engine-independent order). All-integer projections so the kept
    // set is hash-pinned, not just counted. The oracle replays the
    // same closure then joins back on per-class max quality.
    Declared(
      "ext_dedup_canonical",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.simhashNearPairs(docs, "doc_id", "text",
          bits = 60, maxDist = 3)
        Dedup.keepCanonical(docs.select("doc_id", "n_chars"),
            "doc_id", "n_chars", pairs, "doc_a", "doc_b",
            components = Some(
              Dedup.connectedComponentsShared(pairs, "doc_a", "doc_b")))
          .agg(count(lit(1)).as("n_kept"),
            sum(col("doc_id")).as("kept_id_checksum"),
            sum(col("n_chars")).as("kept_chars"),
            sum(col("class_size") - 1).as("n_dropped"),
            max(col("class_size")).as("max_class"))
      },
      Some("""WITH RECURSIVE tok AS (
                 SELECT DISTINCT doc_id, w FROM (
                   SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
                 WHERE w <> ''),
               h AS (
                 SELECT doc_id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS hv FROM tok),
               bits AS (
                 SELECT doc_id, b,
                        SUM(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
                 FROM h, range(60) t(b) GROUP BY doc_id, b),
               simh AS (
                 SELECT doc_id,
                        SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
                 FROM bits GROUP BY doc_id),
               p AS (
                 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM simh a JOIN simh b ON a.doc_id < b.doc_id
                 WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
               edges AS (
                 SELECT doc_a AS a, doc_b AS b FROM p
                 UNION SELECT doc_b, doc_a FROM p),
               reach(node, label) AS (
                 SELECT a, a FROM edges
                 UNION
                 SELECT e.b, r.label FROM reach r
                 JOIN edges e ON e.a = r.node WHERE r.label < e.b),
               cc AS (SELECT node, MIN(label) AS comp FROM reach GROUP BY node),
               lab AS (
                 SELECT d.doc_id, d.n_chars, COALESCE(cc.comp, d.doc_id) AS cls
                 FROM documents d LEFT JOIN cc ON d.doc_id = cc.node),
               mx AS (
                 SELECT cls, MAX(n_chars) AS mq, COUNT(*) AS class_size
                 FROM lab GROUP BY cls),
               keep AS (
                 SELECT l.cls, MIN(l.doc_id) AS kid, mx.mq, mx.class_size
                 FROM lab l JOIN mx ON l.cls = mx.cls AND l.n_chars = mx.mq
                 GROUP BY l.cls, mx.mq, mx.class_size)
               SELECT COUNT(*) AS n_kept,
                      CAST(SUM(kid) AS BIGINT) AS kept_id_checksum,
                      CAST(SUM(mq) AS BIGINT) AS kept_chars,
                      CAST(SUM(class_size - 1) AS BIGINT) AS n_dropped,
                      CAST(MAX(class_size) AS BIGINT) AS max_class
               FROM keep""")),

    Declared(
      "ext_dedup_ngram_jaccard",
      (s, d) =>
        Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", DfCap)
          .where(col("inter") >= 2)
          .orderBy(col("inter").desc, col("doc_a"), col("doc_b"))
          .limit(20),
      Some(s"""WITH $cappedShingleCte,
               pairs AS (
                 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                 FROM fsh a JOIN fsh b
                   ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
               SELECT doc_a, doc_b, inter, ca.n + cb.n - inter AS uni
               FROM pairs
               JOIN card ca ON doc_a = ca.doc_id
               JOIN card cb ON doc_b = cb.doc_id
               WHERE inter >= 2
               ORDER BY inter DESC, doc_a, doc_b LIMIT 20""")),

    // Asymmetric containment census ([[Dedup.containmentPairs]]): pairs
    // where ≥80% of the smaller doc's shingles appear in the larger —
    // the quote/subset detector Jaccard misses (a doc swallowed by a
    // much larger one has tiny Jaccard but containment ≈ 1). The 0.8
    // threshold is integer arithmetic on both engines (inter·10 ≥
    // min(n)·8), so membership can never drift on float noise.
    Declared(
      "ext_dedup_containment",
      (s, d) =>
        Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text", DfCap)
          .where(col("inter") * 10 >= least(col("n_a"), col("n_b")) * 8)
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("doc_a") + col("doc_b")).as("id_checksum"),
            sum(col("inter")).as("inter_sum"),
            sum(least(col("n_a"), col("n_b"))).as("min_card_sum")),
      Some(s"""WITH $cappedShingleCte,
               pairs AS (
                 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                 FROM fsh a JOIN fsh b
                   ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
               c AS (
                 SELECT doc_a, doc_b, inter, ca.n AS n_a, cb.n AS n_b
                 FROM pairs
                 JOIN card ca ON doc_a = ca.doc_id
                 JOIN card cb ON doc_b = cb.doc_id)
               SELECT COUNT(*) AS n_pairs,
                      CAST(SUM(doc_a + doc_b) AS BIGINT) AS id_checksum,
                      CAST(SUM(inter) AS BIGINT) AS inter_sum,
                      CAST(SUM(LEAST(n_a, n_b)) AS BIGINT) AS min_card_sum
               FROM c WHERE inter * 10 >= LEAST(n_a, n_b) * 8""")),

    // The buckets the pairwise path SKIPS, handled the cluster way:
    // over-cap LSH buckets reduced to (representative, size). Together
    // with ext_dedup_lsh_verified this covers every bucket exactly
    // once — the complete 100 TB dedup recipe (pairs below the cap,
    // O(cluster) representative-keeps above it).
    Declared(
      "ext_dedup_lsh_clusters",
      (s, d) =>
        Dedup.lshDegenerateClusters(
          Dedup.lshBands(
            Dedup.minhashSignatures(
              Dedup.tokenHashes(Tables.documents(s, d), "doc_id", "text"), 16),
            16, 4),
          maxBucket = MaxBucket)
          .agg(count(lit(1)).as("n_clusters"),
            sum(col("size")).as("sum_sizes"),
            sum(col("rep_doc")).as("rep_checksum")),
      Some(s"""WITH $minhashSigCte,
               big AS (
                 SELECT band, sig, COUNT(*) AS cnt, MIN(doc_id) AS rep
                 FROM sigs GROUP BY band, sig HAVING COUNT(*) > $MaxBucket)
               SELECT COUNT(*) AS n_clusters,
                      CAST(SUM(cnt) AS BIGINT) AS sum_sizes,
                      CAST(SUM(rep) AS BIGINT) AS rep_checksum
               FROM big""")),

    // The full two-stage near-dup pipeline: MinHash-LSH candidate
    // generation (degenerate buckets > MaxBucket docs skipped — their
    // members are cluster-dups, not pairwise work), then exact Jaccard
    // verification restricted to the candidates — the 100 TB shape
    // (verification cost scales with candidates, not corpus²).
    Declared(
      "ext_dedup_lsh_verified",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val cands = Dedup.minhashLshCandidates(docs, "doc_id", "text",
          k = 16, rowsPerBand = 4, maxBucket = MaxBucket)
        Dedup.ngramJaccardOnCandidates(docs, "doc_id", "text", cands, DfCap)
          .where(col("inter") >= 2)
          .orderBy(col("inter").desc, col("doc_a"), col("doc_b"))
          .limit(20)
      },
      Some(s"""WITH $minhashSigCte,
               okb AS (
                 SELECT band, sig FROM sigs
                 GROUP BY band, sig HAVING COUNT(*) <= $MaxBucket),
               sig2 AS (SELECT sigs.* FROM sigs JOIN okb USING (band, sig)),
               cand AS (
                 SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM sig2 a JOIN sig2 b
                   ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
               tp AS (
                 SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                        unnest(range(len(string_split(text, ' ')))) AS pos
                 FROM documents),
               sh0 AS (
                 SELECT doc_id,
                        w || ' ' || LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                          || ' ' || LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS shingle
                 FROM tp),
               sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
               shh AS (
                 SELECT DISTINCT doc_id,
                        CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS sh
                 FROM sh),
               kept AS (SELECT sh FROM shh GROUP BY sh HAVING COUNT(*) <= $DfCap),
               fsh AS (SELECT doc_id, sh FROM shh JOIN kept USING (sh)),
               card AS (SELECT doc_id, COUNT(*) AS n FROM fsh GROUP BY doc_id),
               inter AS (
                 SELECT doc_a, doc_b, COUNT(*) AS inter
                 FROM cand
                 JOIN fsh fa ON fa.doc_id = doc_a
                 JOIN fsh fb ON fb.doc_id = doc_b AND fa.sh = fb.sh
                 GROUP BY doc_a, doc_b)
               SELECT doc_a, doc_b, inter, ca.n + cb.n - inter AS uni
               FROM inter
               JOIN card ca ON doc_a = ca.doc_id
               JOIN card cb ON doc_b = cb.doc_id
               WHERE inter >= 2
               ORDER BY inter DESC, doc_a, doc_b LIMIT 20""")),

    // Embedding near-dup census over banded LSH candidates (4 tables ×
    // 8 planes, OR-construction), double-precision cosine — integer
    // projection, so oracle-checkable end to end.
    Declared(
      "ext_dedup_embedding",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val pairs = Similarity.lshNearPairs(emb, "vec_id", "embedding",
          minCos = 0.3, nTables = 4, planesPerTable = 8)
        val np = pairs.agg(count(lit(1)).as("n_pairs"))
        val nd = pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("dd"))
          .agg(countDistinct(col("dd")).as("n_docs"))
        np.crossJoin(nd)
      },
      Some(s"""WITH $lshBuckCte,
               cand AS (
                 SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
                 FROM buck x JOIN buck y
                   ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
               pr AS (
                 SELECT a, b FROM cand
                 JOIN embeddings ea ON ea.vec_id = a
                 JOIN embeddings eb ON eb.vec_id = b
                 WHERE round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 9) >= 0.3)
               SELECT (SELECT COUNT(*) FROM pr) AS n_pairs,
                      (SELECT COUNT(DISTINCT dd) FROM
                        (SELECT a AS dd FROM pr UNION ALL SELECT b FROM pr)) AS n_docs""")),

    // --- Text analysis ------------------------------------------------
    Declared(
      "ext_text_langid",
      (s, d) =>
        TextStats.withLangId(Tables.documents(s, d).select("lang", "text"), "text")
          .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
          .orderBy("lang", "predicted"),
      Some("""WITH s AS (SELECT lang,
                len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to'))) AS en,
                len(list_filter(string_split(text,' '), x -> x IN ('el','la','de','que','y'))) AS es,
                len(list_filter(string_split(text,' '), x -> x IN ('der','die','und','ist','das'))) AS de,
                len(list_filter(string_split(text,' '), x -> x IN ('le','la','et','les','des'))) AS fr
              FROM documents)
              SELECT lang, CASE
                WHEN en > 0 AND en >= es AND en >= de AND en >= fr THEN 'en'
                WHEN es > 0 AND es > en AND es >= de AND es >= fr THEN 'es'
                WHEN de > 0 AND de > en AND de > es AND de >= fr THEN 'de'
                WHEN fr > 0 AND fr > en AND fr > es AND fr > de THEN 'fr'
                ELSE 'und' END AS predicted, COUNT(*) AS n
              FROM s GROUP BY lang, predicted ORDER BY lang, predicted""")),

    Declared(
      "ext_text_quality",
      (s, d) =>
        TextStats.qualityFeatures(Tables.documents(s, d), "doc_id", "text")
          .groupBy("ttr_decile")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
          .orderBy("ttr_decile"),
      Some("""SELECT (len(list_distinct(string_split(text,' '))) * 10)
                       // len(string_split(text,' ')) AS ttr_decile,
                     COUNT(*) AS n_docs,
                     CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS sum_tokens
              FROM documents GROUP BY ttr_decile ORDER BY ttr_decile""")),

    Declared(
      "ext_text_tokens",
      (s, d) =>
        TextStats.tokenCounts(Tables.documents(s, d), "doc_id", "text")
          .groupBy(expr("n_ws_tokens div 10 * 10").as("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_ws_tokens")).as("ws_tokens"),
            sum(col("n_subword_tokens")).as("subword_tokens"))
          .orderBy("bucket"),
      Some("""SELECT (len(string_split(text,' ')) // 10) * 10 AS bucket,
                     COUNT(*) AS n_docs,
                     CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS ws_tokens,
                     CAST(SUM(list_sum(list_transform(string_split(text,' '),
                       w -> CAST(ceil(len(w) / 4.0) AS INT)))) AS BIGINT) AS subword_tokens
              FROM documents GROUP BY bucket ORDER BY bucket""")),

    // Text normalization ([[TextStats.normalize]]): md5 checksums of
    // the canonical forms pin every output byte, so the oracle proves
    // the two engines' regex/lower/trim pipelines agree exactly.
    Declared(
      "ext_text_normalize",
      (s, d) =>
        Tables.documents(s, d)
          .select(TextStats.normalize(col("text")).as("nt"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("nt"))).as("len_sum"),
            sum(graft.functions.Md5Prefix.md5Prefix(col("nt"), 8))
              .as("md5_checksum")),
      Some("""SELECT COUNT(*) AS n_docs,
                     CAST(SUM(len(nt)) AS BIGINT) AS len_sum,
                     CAST(SUM(CAST('0x' || substr(md5(nt), 1, 8) AS BIGINT)) AS BIGINT)
                       AS md5_checksum
              FROM (SELECT trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS nt
                    FROM documents)""")),

    // PII redaction ([[TextStats.redactStats]]): the corpus is scrubbed
    // word-salad, so both engines synthesize the SAME dirty text per
    // doc (emails / dotted quads / long digit runs, plus boundary
    // torture cases: a leading-digit quad that forces backtracking
    // equivalence, "a@b" with no TLD, an 8-digit run one short of the
    // threshold). Match counts per rule + an md5 checksum of the
    // redacted bytes make the oracle a differential test of every
    // match boundary across Java regex and RE2.
    Declared(
      "ext_text_redact",
      (s, d) => {
        val dirty = concat(
          col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@mail.example.com"),
          when(col("doc_id") % 3 === 0, lit(" cc ADMIN-1@ex.org")).otherwise(lit("")),
          lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
          (col("doc_id") % 100).cast("string"),
          when(col("doc_id") % 2 === 0, lit(" via 1234.5.6.7")).otherwise(lit("")),
          lit(" ref 91"), lpad((col("doc_id") % 10000000).cast("string"), 7, "0"),
          lit(" v1.2.3 a@b x.y@z.co 12345678 123456789 end"))
        TextStats.redactStats(
            Tables.documents(s, d).select(col("doc_id"), dirty.as("text")),
            "doc_id", "text")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_email")).as("sum_emails"),
            sum(col("n_ipv4")).as("sum_ipv4"),
            sum(col("n_number")).as("sum_numbers"),
            sum(length(col("redacted"))).as("len_sum"),
            sum(graft.functions.Md5Prefix.md5Prefix(col("redacted"), 8))
              .as("md5_checksum"))
      },
      Some("""WITH s AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id || '@mail.example.com'
                       || CASE WHEN doc_id % 3 = 0 THEN ' cc ADMIN-1@ex.org' ELSE '' END
                       || ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
                       || CASE WHEN doc_id % 2 = 0 THEN ' via 1234.5.6.7' ELSE '' END
                       || ' ref 91' || lpad(CAST(doc_id % 10000000 AS VARCHAR), 7, '0')
                       || ' v1.2.3 a@b x.y@z.co 12345678 123456789 end' AS t
                FROM documents),
              r1 AS (
                SELECT doc_id,
                       len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                       regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
                FROM s),
              r2 AS (
                SELECT doc_id, n_email,
                       len(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS n_ipv4,
                       regexp_replace(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS t
                FROM r1),
              r3 AS (
                SELECT doc_id, n_email, n_ipv4,
                       len(regexp_extract_all(t, '[0-9]{9,}')) AS n_number,
                       regexp_replace(t, '[0-9]{9,}', '<NUM>', 'g') AS t
                FROM r2)
              SELECT COUNT(*) AS n_docs,
                     CAST(SUM(n_email) AS BIGINT) AS sum_emails,
                     CAST(SUM(n_ipv4) AS BIGINT) AS sum_ipv4,
                     CAST(SUM(n_number) AS BIGINT) AS sum_numbers,
                     CAST(SUM(len(t)) AS BIGINT) AS len_sum,
                     CAST(SUM(CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS BIGINT)
                       AS md5_checksum
              FROM r3""")),

    // Per-domain URL census ([[TextStats.urlDomains]]): same
    // synthesized-content discipline — every doc carries a
    // lang/source-derived domain, a shared CDN URL on a doc_id stride,
    // a same-domain duplicate on another stride (pinning n_urls vs
    // n_docs), a scheme-less host the pattern must NOT match, and a
    // trailing-dot host pinning greedy boundary behavior.
    Declared(
      "ext_text_domains",
      (s, d) => {
        val withUrls = concat(
          lit("see https://"), col("lang"), lit("-"), col("source"),
          lit(".example.org/p/"), col("doc_id").cast("string"),
          when(col("doc_id") % 4 === 0,
            lit(" plus http://cdn.example.net/x?y=1")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" dup https://"), col("lang"), lit("-"), col("source"),
              lit(".example.org/other"))).otherwise(lit("")),
          lit(" bare www.nope.com trail https://dot.example.org."))
        TextStats.urlDomains(
            Tables.documents(s, d).select(col("doc_id"), withUrls.as("text")),
            "doc_id", "text")
          .orderBy("domain")
      },
      Some("""WITH s AS (
                SELECT doc_id,
                       'see https://' || lang || '-' || source || '.example.org/p/' || doc_id
                       || CASE WHEN doc_id % 4 = 0 THEN ' plus http://cdn.example.net/x?y=1' ELSE '' END
                       || CASE WHEN doc_id % 5 = 0 THEN ' dup https://' || lang || '-' || source || '.example.org/other' ELSE '' END
                       || ' bare www.nope.com trail https://dot.example.org.' AS t
                FROM documents),
              u AS (
                SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[A-Za-z0-9.-]+')) AS url
                FROM s)
              SELECT regexp_replace(url, '^https?://', '') AS domain,
                     COUNT(*) AS n_urls, COUNT(DISTINCT doc_id) AS n_docs
              FROM u GROUP BY 1 ORDER BY domain""")),

    // Rolling-hash fingerprints: the oracle recomputes every k-byte
    // window NAIVELY (exact double polynomial, k=8·base=31 stays under
    // 2^53), so a hash match also cross-checks the O(n) rolling update
    // against the O(n·k) definition.
    Declared(
      "ext_text_rollhash",
      (s, d) =>
        TextStats.rollingFingerprints(Tables.documents(s, d), "doc_id", "text")
          .where(col("roll_fp").isNotNull)
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("roll_fp")).as("uniq_fp"),
            sum(col("roll_fp")).as("fp_checksum")),
      Some("""WITH pos AS (
                 SELECT doc_id, text, unnest(range(1, len(text) - 6)) AS i
                 FROM documents WHERE len(text) >= 8),
               hv AS (
                 SELECT doc_id,
                        CAST(list_sum(list_transform(range(8), j ->
                          ascii(substr(text, CAST(i + j AS INT), 1)) * POW(31, 7 - j)))
                          AS BIGINT) % 1000000007 AS h
                 FROM pos),
               m AS (SELECT doc_id, MIN(h) AS fp FROM hv GROUP BY doc_id)
               SELECT COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS uniq_fp,
                      CAST(SUM(fp) AS BIGINT) AS fp_checksum
               FROM m""")),

    // Within-doc repetition histogram: docs bucketed by their repeated-
    // trigram decile ((total − distinct) · 10 div total) — the
    // boilerplate/spam gate. Identical md5-based trigram hashing on
    // both engines, so even hash collisions cannot diverge.
    Declared(
      "ext_text_repetition",
      (s, d) =>
        TextStats.repetitionStats(Tables.documents(s, d), "doc_id", "text")
          .withColumn("rep_decile",
            expr("((n_grams - n_distinct) * 10) div n_grams"))
          .groupBy("rep_decile")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_grams")).as("sum_grams"))
          .orderBy("rep_decile"),
      Some("""WITH g AS (
                SELECT doc_id, CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) AS h FROM (
                  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' ')) - 1),
                    i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS g
                  FROM documents)),
              d AS (SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT h) AS n_distinct
                    FROM g GROUP BY doc_id)
              SELECT ((n_grams - n_distinct) * 10) // n_grams AS rep_decile,
                     COUNT(*) AS n_docs, CAST(SUM(n_grams) AS BIGINT) AS sum_grams
              FROM d GROUP BY rep_decile ORDER BY rep_decile""")),

    // Perplexity-style quality gate ([[TextStats.unigramSurprisal]]):
    // per-doc summed unigram surprisal under the corpus's own model —
    // the LM-filtering screen (low ≈ boilerplate, high ≈ garbled).
    // Surprisal is rounded to an exact e6-scaled BIGINT once per
    // DISTINCT word (one ln on identical doubles both engines, ~|V|
    // roundings instead of per-token; the e6 scale keeps ~9 digits of
    // margin between double ln error and the rounding boundary — an
    // e9 scale left the half-integer flip within a few ulps), then
    // sums associatively — the top-10 listing is fully integer with a
    // doc_id tie-break.
    Declared(
      "ext_text_surprisal",
      (s, d) =>
        TextStats.unigramSurprisal(Tables.documents(s, d), "doc_id", "text")
          .orderBy(desc("surprisal_e6"), asc("doc_id"))
          .limit(10),
      Some("""WITH w AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
              c AS (SELECT w, COUNT(*) AS c FROM w GROUP BY w),
              n AS (SELECT COUNT(*) AS n FROM w),
              v AS (SELECT c.w,
                           CAST(round(ln(CAST(n.n AS DOUBLE) / c.c) * 1e6) AS BIGINT) AS sp
                    FROM c CROSS JOIN n),
              d AS (SELECT w.doc_id, COUNT(*) AS n_tokens,
                           CAST(SUM(v.sp) AS BIGINT) AS surprisal_e6
                    FROM w JOIN v USING (w) GROUP BY w.doc_id)
              SELECT doc_id, n_tokens, surprisal_e6 FROM d
              ORDER BY surprisal_e6 DESC, doc_id LIMIT 10""")),

    // Per-language token-count quantiles (corpus length profile — what
    // sets curation thresholds). Exact type-7 interpolation on BOTH
    // engines; ×100 integer projection is mathematically integral
    // (interpolation fractions are multiples of 0.01 for these p), so
    // the only float exposure is ~1e-12 summation noise vs a 0.5
    // rounding margin.
    Declared(
      "ext_text_quantiles",
      (s, d) => {
        val n = Tables.documents(s, d)
          .select(col("lang"), size(split(col("text"), " ")).as("n_tokens"))
        Stats.quantiles(n, Seq("lang"), col("n_tokens"), Seq(0.5, 0.9, 0.99))
          .select(col("lang"),
            expr("cast(round(p50 * 100) as bigint)").as("p50_x100"),
            expr("cast(round(p90 * 100) as bigint)").as("p90_x100"),
            expr("cast(round(p99 * 100) as bigint)").as("p99_x100"))
          .orderBy("lang")
      },
      Some("""SELECT lang,
                     CAST(round(quantile_cont(n, 0.5) * 100) AS BIGINT) AS p50_x100,
                     CAST(round(quantile_cont(n, 0.9) * 100) AS BIGINT) AS p90_x100,
                     CAST(round(quantile_cont(n, 0.99) * 100) AS BIGINT) AS p99_x100
              FROM (SELECT lang, len(string_split(text, ' ')) AS n FROM documents)
              GROUP BY lang ORDER BY lang""")),

    // Cardinality profile ([[Stats.cardinality]]): exact per-type
    // event/user counts — the oracle-checkable baseline of the
    // sketch family; the mergeable DataSketches HLL path
    // ([[Stats.hllSketches]]/[[Stats.hllUnion]]) is spec-pinned
    // against this within HLL error bounds (estimates are
    // engine-specific, so no DuckDB twin can exist for them).
    Declared(
      "ext_stats_cardinality",
      (s, d) =>
        Stats.cardinality(Tables.events(s, d), Seq("event_type"), col("user_id"))
          .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n_rows,
                     COUNT(DISTINCT user_id) AS n_distinct
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Per-column data-quality profile ([[Stats.profile]]): one pass,
    // one row per column — completeness / key-ness / domain bounds,
    // the "validate the snapshot before training on it" gate. Exact
    // distinct is the oracle baseline; [[Stats.profileApprox]] (no
    // Expand, single scan) is the 100 TB path, spec-pinned.
    Declared(
      "ext_stats_profile",
      (s, d) =>
        Stats.profile(Tables.documents(s, d),
          Seq("doc_id", "text", "lang", "source", "n_chars"))
          .orderBy("column"),
      Some {
        def one(c: String, integral: Boolean) = {
          val mn = if (integral) s"COALESCE(CAST(MIN($c) AS BIGINT), -1)"
                   else "CAST(-1 AS BIGINT)"
          val mx = if (integral) s"COALESCE(CAST(MAX($c) AS BIGINT), -1)"
                   else "CAST(-1 AS BIGINT)"
          s"""SELECT '$c' AS "column", COUNT(*) AS n_rows,
                     CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                     CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
                     $mn AS min_int, $mx AS max_int,
                     COALESCE(CAST(MAX(LEN(CAST($c AS VARCHAR))) AS BIGINT), -1) AS max_strlen
              FROM documents"""
        }
        Seq(one("doc_id", true), one("text", false), one("lang", false),
          one("source", false), one("n_chars", true))
          .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
      }),

    // Equi-width length histogram per language ([[Stats.histogram]]):
    // integral-div bucketing end to end (bucket edges cannot drift
    // between engines), last bucket absorbs the tail. Shuffle rows
    // bounded by groups × buckets at any input size.
    Declared(
      "ext_stats_histogram",
      (s, d) =>
        Stats.histogram(Tables.documents(s, d), Seq("lang"), col("n_chars"),
          width = 100, nBuckets = 8)
          .select(col("lang"), col("bucket"), col("bucket_lo"), col("n"))
          .orderBy("lang", "bucket"),
      Some("""SELECT lang, LEAST(7, n_chars // 100) AS bucket,
                     LEAST(7, n_chars // 100) * 100 AS bucket_lo,
                     COUNT(*) AS n
              FROM documents GROUP BY 1, 2, 3 ORDER BY lang, bucket""")),

    // Key-frequency skew profile ([[Stats.keySkew]]) of the fact
    // table's supplier key — the pre-join shuffle diagnostic (max vs
    // p99 exposes hot keys BEFORE they become one straggler task).
    // Exact percentile over per-key counts is the oracle baseline;
    // approxTail=true is the bounded-memory 100 TB path.
    Declared(
      "ext_stats_skew",
      (s, d) => Stats.keySkew(Tables.lineitem(s, d), col("l_suppkey")),
      Some("""WITH c AS (
                SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY 1)
              SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS n_rows,
                     MAX(c) AS max_key_rows,
                     CAST(round(quantile_cont(c, 0.5) * 100) AS BIGINT) AS p50_x100,
                     CAST(round(quantile_cont(c, 0.99) * 100) AS BIGINT) AS p99_x100
              FROM c""")),

    // Exact-moment Pearson correlation ([[Stats.corrExact]]): the five
    // moment sums accumulate as exact longs (partial-aggregated, one
    // shuffle row per group), doubles appear only in the final
    // one-row-per-group formula — so both engines compute THE SAME
    // doubles and the 1e-6 integer projection is noise-free, unlike
    // native corr() whose streaming accumulation is order-dependent.
    Declared(
      "ext_stats_corr",
      (s, d) =>
        Stats.corrExact(Tables.lineitem(s, d), Seq("l_returnflag"),
          round(col("l_quantity")), round(col("l_discount") * 100))
          .orderBy("l_returnflag"),
      Some("""WITH m AS (
                SELECT l_returnflag, COUNT(*) AS n,
                       CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                       CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy,
                       CAST(SUM(x*y) AS BIGINT) AS sxy
                FROM (SELECT l_returnflag,
                             CAST(round(l_quantity) AS BIGINT) AS x,
                             CAST(round(l_discount * 100) AS BIGINT) AS y
                      FROM lineitem)
                GROUP BY l_returnflag)
              SELECT l_returnflag, n,
                     CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 THEN
                       CAST(round(CAST(n*sxy - sx*sy AS DOUBLE)
                         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                            * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) * 1e6) AS BIGINT)
                     END AS corr_e6
              FROM m ORDER BY l_returnflag""")),

    // Count-min heavy-hitter screen ([[Stats.countMin]]): the sketch
    // builds distributed (treeAggregate merge; only the finished
    // width×depth table reaches the driver), then two probe panels
    // pin BOTH halves of the CMS contract. (1) The true top-10 tokens
    // (oracle states their identities and exact counts with a
    // count-desc/token tie-break): `over_ok` = estimate ≥ truth
    // ALWAYS (structural, never fails), `bound_ok` = estimate ≤
    // truth + eps·N. (2) Five keys PROVABLY absent from the corpus —
    // they contain a space, and no token of a split-on-space
    // tokenization can — whose truth is 0, pinning the half of the
    // contract the heavy-hitter probe cannot see: an absent key's
    // estimate is pure collision mass and must still sit ≤ eps·N.
    // The oracle re-derives absence (COUNT(*) per absent key over the
    // token relation — a present key would red the true_cnt column,
    // not just the booleans). bound_ok is probabilistic by theory but
    // deterministic given the fixed seed, and at depth 10
    // (confidence 0.9999) the per-key failure odds are ~5e-5 — the
    // ivf_nprobe recall-floor pattern: Spark flipping false
    // hash-mismatches loudly.
    Declared(
      "ext_stats_countmin",
      (s, d) => {
        import s.implicits._
        val words = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
        val eps = 0.01
        val sketch = Stats.countMin(words, "w", eps = eps,
          confidence = 0.9999, seed = 42)
        val bound = math.ceil(eps * sketch.totalCount).toLong
        // top-10 probe keys: k driver rows, the bounded-artifact
        // collect discipline (same as IVF centroids / bloom bytes)
        val top = words.groupBy("w").agg(count(lit(1)).as("true_cnt"))
          .orderBy(desc("true_cnt"), asc("w")).limit(10).collect()
        val hitters = top.toSeq.map { r =>
          val est = sketch.estimateCount(r.getString(0))
          (r.getString(0), r.getLong(1),
            est >= r.getLong(1), est <= r.getLong(1) + bound)
        }
        val absent = (0 until 5).map { i =>
          val k = s"absent key $i" // contains a space ⇒ never a token
          (k, 0L, sketch.estimateCount(k) >= 0L,
            sketch.estimateCount(k) <= bound)
        }
        (hitters ++ absent)
          .toDF("token", "true_cnt", "over_ok", "bound_ok")
          .orderBy(desc("true_cnt"), asc("token"))
      },
      Some("""WITH w AS (
                SELECT unnest(string_split(text, ' ')) AS token FROM documents),
              c AS (
                SELECT token, COUNT(*) AS true_cnt FROM w GROUP BY token
                ORDER BY true_cnt DESC, token LIMIT 10),
              a AS (
                SELECT 'absent key ' || CAST(i AS VARCHAR) AS token,
                       (SELECT COUNT(*) FROM w
                        WHERE w.token = 'absent key ' || CAST(i AS VARCHAR)) AS true_cnt
                FROM range(5) t(i))
              SELECT token, true_cnt, TRUE AS over_ok, TRUE AS bound_ok FROM c
              UNION ALL
              SELECT token, true_cnt, TRUE AS over_ok, TRUE AS bound_ok FROM a
              ORDER BY true_cnt DESC, token""")),

    // --- Multimodal ---------------------------------------------------

    // REAL image decode end to end: one genuine PNG per document
    // (dims = arithmetic functions of doc_id, pixels encoded with
    // javax.imageio on the executors), then a real header decode
    // recovers width/height. The oracle states the dims from the
    // id formulas alone — it cannot decode, so a green row proves the
    // PNG encode→decode round trip genuinely parsed the bytes.
    // n_undecodable = 0 pins that NO payload fell back to NULL dims.
    Declared(
      "ext_multimodal_meta",
      (s, d) =>
        Multimodal.decodeImageMeta(
          Multimodal.syntheticImages(Tables.documents(s, d), "doc_id"))
          .agg(count(lit(1)).as("n_images"),
            sum(when(col("width").isNull, 1L).otherwise(0L)).as("n_undecodable"),
            sum(col("width")).as("sum_width"),
            sum(col("height")).as("sum_height"),
            sum(col("media_id") * col("width")).as("dim_checksum")),
      Some("""SELECT COUNT(*) AS n_images,
                     CAST(0 AS BIGINT) AS n_undecodable,
                     CAST(SUM(doc_id % 61 + 4) AS BIGINT) AS sum_width,
                     CAST(SUM(doc_id * 7 % 43 + 4) AS BIGINT) AS sum_height,
                     CAST(SUM(doc_id * (doc_id % 61 + 4)) AS BIGINT) AS dim_checksum
              FROM documents""")),

    // REAL video frame extraction end to end: one genuine animated
    // GIF per document (frame count / dims / gray pixels all
    // arithmetic formulas of (doc_id, frame, x, y), encoded with the
    // JDK GIF sequence writer), then sampleFrames truly parses the
    // container, strided-samples min(4, n_frames) frames at
    // k*n_frames/m, decodes each, and re-encodes it as PNG — which
    // feeds the SAME imageChannelStats used by ext_multimodal_channels
    // for a second full decode. The oracle restates sampled-frame
    // indices and per-frame pixel sums from the formulas alone (it
    // cannot decode), so a green row proves genuine container parse +
    // frame indexing + two lossless codec round trips. (Formula
    // arithmetic stays in BIGINT range for doc_id up to ~3.4e9 —
    // DuckDB raises on overflow where Spark ANSI also raises, so the
    // ceiling is loud, not silent.)
    Declared(
      "ext_multimodal_frames",
      (s, d) => {
        val frames = PlanCache.cached("gifFrames/doc_id/4",
          Multimodal.syntheticGifs(Tables.documents(s, d), "doc_id"))(
          Multimodal.sampleFrames(_, n = 4))
        val meta = frames.agg(
          count(lit(1)).as("n_frames_sampled"),
          sum(col("frame_no")).as("frame_no_checksum"),
          sum(col("n_frames")).as("container_frames"))
        val px = Multimodal.imageChannelStats(frames).agg(
          sum(when(col("n_pixels").isNull, 1L).otherwise(0L))
            .as("n_unreadable_frames"),
          sum(col("n_pixels")).as("total_pixels"),
          sum(col("sum_r")).as("total_r"),
          sum(col("sum_g")).as("total_g"),
          sum(col("sum_b")).as("total_b"),
          sum(col("media_id") * col("n_pixels")).as("px_checksum"))
        meta.crossJoin(px)
      },
      Some("""WITH f AS (
                SELECT doc_id,
                       (doc_id % 5 + 2) AS nf,
                       (k * (doc_id % 5 + 2)) // LEAST(4, doc_id % 5 + 2) AS fr
                FROM documents, range(4) t(k)
                WHERE k < LEAST(4, doc_id % 5 + 2)),
              px AS (
                SELECT doc_id,
                       ((doc_id % 1000003 + fr * 101 + x * 31 + y * 17) * 2654435761) & 255 AS g
                FROM f, range(16) tx(x), range(14) ty(y)
                WHERE x < doc_id % 13 + 4 AND y < doc_id * 3 % 11 + 4)
              SELECT (SELECT COUNT(*) FROM f) AS n_frames_sampled,
                     (SELECT CAST(SUM(fr) AS BIGINT) FROM f) AS frame_no_checksum,
                     (SELECT CAST(SUM(nf) AS BIGINT) FROM f) AS container_frames,
                     CAST(0 AS BIGINT) AS n_unreadable_frames,
                     COUNT(*) AS total_pixels,
                     CAST(SUM(g) AS BIGINT) AS total_r,
                     CAST(SUM(g) AS BIGINT) AS total_g,
                     CAST(SUM(g) AS BIGINT) AS total_b,
                     CAST(SUM(doc_id) AS BIGINT) AS px_checksum
              FROM px""")),

    // REAL pixel-level fidelity: full decode of every PNG, exact
    // long sums of the R/G/B channel bytes over the raster (the
    // integer core of an image featurizer). The pixels are generated
    // by an arithmetic formula of (doc_id, x, y), so the oracle
    // recomputes the identical sums WITHOUT decoding — a green row
    // proves every pixel of every image survives the PNG
    // encode→decode round trip bit-for-bit, strictly stronger than
    // the header check above. (Formula ceiling: the hash multiply
    // stays in BIGINT only for doc_id ≲ 3.4e9 — past it DuckDB
    // raises and Spark ANSI raises too, so the ceiling is loud on
    // both sides, never a silent divergence.)
    Declared(
      "ext_multimodal_channels",
      (s, d) =>
        Multimodal.imageChannelStats(
          Multimodal.syntheticImages(Tables.documents(s, d), "doc_id"))
          .agg(count(lit(1)).as("n_images"),
            sum(when(col("n_pixels").isNull, 1L).otherwise(0L))
              .as("n_undecodable"),
            sum(col("n_pixels")).as("total_pixels"),
            sum(col("sum_r")).as("total_r"),
            sum(col("sum_g")).as("total_g"),
            sum(col("sum_b")).as("total_b"),
            sum(col("media_id") * col("n_pixels")).as("px_checksum")),
      Some("""WITH px AS (
                SELECT doc_id,
                       ((doc_id % 1000003 + x * 31 + y * 17) * 2654435761) & 16777215 AS v
                FROM documents, range(64) tx(x), range(46) ty(y)
                WHERE x < doc_id % 61 + 4 AND y < doc_id * 7 % 43 + 4)
              SELECT (SELECT COUNT(*) FROM documents) AS n_images,
                     CAST(0 AS BIGINT) AS n_undecodable,
                     COUNT(*) AS total_pixels,
                     CAST(SUM((v >> 16) & 255) AS BIGINT) AS total_r,
                     CAST(SUM((v >> 8) & 255) AS BIGINT) AS total_g,
                     CAST(SUM(v & 255) AS BIGINT) AS total_b,
                     CAST(SUM(doc_id) AS BIGINT) AS px_checksum
              FROM px""")),

    // REAL audio decode end to end: one genuine WAV (RIFF + 16-bit LE
    // mono PCM) per document, written and re-decoded with
    // javax.sound.sampled on the executors; exact long sums of the
    // decoded samples. Samples are an arithmetic formula of
    // (doc_id, i), so the oracle recomputes the identical sums
    // WITHOUT an audio decoder — green proves every sample survives
    // the WAV container round trip bit-for-bit (the audio twin of
    // ext_multimodal_channels, sharing its ~3.4e9 doc_id formula
    // ceiling — loud on both engines, never silent).
    Declared(
      "ext_multimodal_audio",
      (s, d) =>
        Multimodal.audioSampleStats(
          Multimodal.syntheticWavs(Tables.documents(s, d), "doc_id"))
          .agg(count(lit(1)).as("n_clips"),
            sum(when(col("n_samples").isNull, 1L).otherwise(0L))
              .as("n_undecodable"),
            sum(col("n_samples")).as("total_samples"),
            sum(col("sum_s")).as("total_s"),
            sum(col("sum_abs")).as("total_abs"),
            sum(col("media_id") * col("n_samples")).as("clip_checksum")),
      Some("""WITH sp AS (
                SELECT doc_id,
                       (((doc_id % 1000003 + i * 7) * 2654435761) & 65535) - 32768 AS v
                FROM documents, range(1800) t(i)
                WHERE i < doc_id % 1500 + 300)
              SELECT (SELECT COUNT(*) FROM documents) AS n_clips,
                     CAST(0 AS BIGINT) AS n_undecodable,
                     COUNT(*) AS total_samples,
                     CAST(SUM(v) AS BIGINT) AS total_s,
                     CAST(SUM(ABS(v)) AS BIGINT) AS total_abs,
                     CAST(SUM(doc_id) AS BIGINT) AS clip_checksum
              FROM sp""")),

    // REAL image resize round trip: genuine PNGs → javax.imageio
    // decode → Graphics2D scale to exactly 12×9 → PNG re-encode →
    // decode AGAIN. The re-decoded dims can only equal the target if
    // every stage truly parsed, scaled, and re-wrote image bytes; the
    // oracle predicts them from the row count alone.
    Declared(
      "ext_multimodal_resize",
      (s, d) =>
        Multimodal.decodeImageMeta(
          Multimodal.resizeImages(
            Multimodal.syntheticImages(Tables.documents(s, d), "doc_id"),
            w = 12, h = 9))
          .agg(count(lit(1)).as("n_images"),
            sum(col("width")).as("sum_width"),
            sum(col("height")).as("sum_height"),
            sum(when(col("n_bytes") > 0, 1L).otherwise(0L)).as("n_nonempty")),
      Some("""SELECT COUNT(*) AS n_images,
                     COUNT(*) * 12 AS sum_width,
                     COUNT(*) * 9 AS sum_height,
                     COUNT(*) AS n_nonempty
              FROM documents""")),

    // REAL batch featurizer (mapPartitions in grouped batches, the
    // mapInPandas shape): each feature is per-channel moments
    // [mean, mean-of-squares]×RGB of the DECODED pixels. Means are
    // exact divisions sum/n, so multiplying each component back by
    // the formula pixel count and rounding reconstructs the integer
    // channel sums EXACTLY (sums ≤ 2e8 ≪ 2^53, double round-trip
    // error ≪ 0.5) — the oracle restates those sums from the pixel
    // formula without decoding, pinning that the features really are
    // moments of genuinely decoded pixels, not payload-byte hashes.
    Declared(
      "ext_multimodal_features",
      (s, d) =>
        Multimodal.extractFeatures(
          Multimodal.syntheticImages(Tables.documents(s, d), "doc_id"))
          .select(col("media_id"), col("feature"),
            ((col("media_id") % 61 + 4) * (col("media_id") * 7 % 43 + 4))
              .as("n_px"))
          .agg(count(lit(1)).as("n_media"),
            sum(when(col("feature").isNull, 1L).otherwise(0L))
              .as("n_undecodable"),
            sum(size(col("feature"))).as("sum_dims"),
            sum(round(element_at(col("feature"), 1) * col("n_px")).cast("long"))
              .as("sum_r"),
            sum(round(element_at(col("feature"), 2) * col("n_px")).cast("long"))
              .as("sum_g"),
            sum(round(element_at(col("feature"), 3) * col("n_px")).cast("long"))
              .as("sum_b"),
            sum(round(element_at(col("feature"), 4) * col("n_px")).cast("long"))
              .as("sumsq_r"),
            sum(round(element_at(col("feature"), 5) * col("n_px")).cast("long"))
              .as("sumsq_g"),
            sum(round(element_at(col("feature"), 6) * col("n_px")).cast("long"))
              .as("sumsq_b")),
      Some("""WITH px AS (
                SELECT doc_id,
                       ((doc_id % 1000003 + x * 31 + y * 17) * 2654435761) & 16777215 AS v
                FROM documents, range(64) tx(x), range(46) ty(y)
                WHERE x < doc_id % 61 + 4 AND y < doc_id * 7 % 43 + 4)
              SELECT (SELECT COUNT(*) FROM documents) AS n_media,
                     CAST(0 AS BIGINT) AS n_undecodable,
                     (SELECT CAST(COUNT(*) * 6 AS BIGINT) FROM documents) AS sum_dims,
                     CAST(SUM((v >> 16) & 255) AS BIGINT) AS sum_r,
                     CAST(SUM((v >> 8) & 255) AS BIGINT) AS sum_g,
                     CAST(SUM(v & 255) AS BIGINT) AS sum_b,
                     CAST(SUM(((v >> 16) & 255) * ((v >> 16) & 255)) AS BIGINT) AS sumsq_r,
                     CAST(SUM(((v >> 8) & 255) * ((v >> 8) & 255)) AS BIGINT) AS sumsq_g,
                     CAST(SUM((v & 255) * (v & 255)) AS BIGINT) AS sumsq_b
              FROM px""")),

    // --- Relational extensions (SURVEY §2.3.4 / §2.3.7: categories
    // absent from the reference, free in Spark) ------------------------

    // Hierarchical aggregate (ROLLUP): subtotal + grand-total rows.
    // NULLS FIRST pinned explicitly — Spark defaults nulls-first on
    // ASC, DuckDB defaults nulls-last.
    Declared(
      "ext_rel_rollup",
      (s, d) =>
        Tables.lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"),
            FixedPoint.outCents(FixedPoint.sumCents(col("l_quantity"))).as("qty"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0, 2) AS qty
              FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
              ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // Four-dimension star join over the fact table (region → nation →
    // supplier and part, TPC-H flavor): every dimension is broadcast,
    // so the lineitem fact never shuffles before the final small
    // aggregate — the canonical 100 TB star-join plan. Also the only
    // queries exercising the part and region tables.
    Declared(
      "ext_rel_star_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val sup = broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"))
        val nat = broadcast(Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey"))
        val reg = broadcast(Tables.region(s, d).select("r_regionkey", "r_name"))
        val prt = broadcast(Tables.part(s, d).select("p_partkey", "p_brand"))
        li.join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(nat, col("s_nationkey") === col("n_nationkey"))
          .join(reg, col("n_regionkey") === col("r_regionkey"))
          .join(prt, col("l_partkey") === col("p_partkey"))
          .groupBy("r_name", "p_brand")
          .agg(count(lit(1)).as("n"),
            FixedPoint.outCents(FixedPoint.sumCents(col("l_extendedprice"))).as("revenue"))
          .orderBy("r_name", "p_brand")
      },
      Some("""SELECT r_name, p_brand, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0, 2) AS revenue
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              JOIN part ON l_partkey = p_partkey
              GROUP BY r_name, p_brand
              ORDER BY r_name, p_brand""")),

    // Pivot (wide crosstab): event-type counts per user decile, via
    // Spark's native pivot with explicit value list (no extra
    // distinct-discovery job — the 100 TB discipline); the oracle is
    // the equivalent FILTER aggregation.
    Declared(
      "ext_rel_pivot",
      (s, d) =>
        Tables.events(s, d)
          .groupBy((col("user_id") % 10).as("bucket"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("bucket"),
      Some("""SELECT user_id % 10 AS bucket,
                     COUNT(*) FILTER (event_type = 'click') AS click,
                     COUNT(*) FILTER (event_type = 'error') AS error,
                     COUNT(*) FILTER (event_type = 'purchase') AS purchase,
                     COUNT(*) FILTER (event_type = 'signup') AS signup,
                     COUNT(*) FILTER (event_type = 'view') AS view
              FROM events GROUP BY 1 ORDER BY 1""")),

    // CUBE: all 2^2 grouping combinations over (returnflag,
    // linestatus) — subtotal rows carry NULL group keys on both
    // engines; ORDER BY pins NULLS FIRST explicitly (Spark's ASC
    // default) so row order agrees.
    Declared(
      "ext_rel_cube",
      (s, d) =>
        Tables.lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            FixedPoint.outCents(FixedPoint.sumCents(col("l_quantity")))
              .as("qty_sum"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0, 2) AS qty_sum
              FROM lineitem
              GROUP BY CUBE (l_returnflag, l_linestatus)
              ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // Set operations: INTERSECT / EXCEPT (distinct semantics on both
    // engines).
    Declared(
      "ext_rel_setops",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey"))
        val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
        val ni = c.intersect(o).agg(count(lit(1)).as("n_intersect"))
        val ne = c.except(o).agg(count(lit(1)).as("n_except"))
        ni.crossJoin(ne)
      },
      Some("""SELECT
                (SELECT COUNT(*) FROM
                  (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)) AS n_intersect,
                (SELECT COUNT(*) FROM
                  (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)) AS n_except""")),

    // As-of join ([[TimeJoin.asofJoin]]): each click matched to the
    // user's latest at-or-before view, aggregated per user with an
    // id-product checksum + exact millisecond gap sum that pin every
    // individual (click, view) pairing. The oracle is a portable
    // window formulation (verified equal to DuckDB's native ASOF
    // JOIN on this data); timestamps are globally unique in events,
    // so the match is tie-free on both engines.
    Declared(
      "ext_rel_asof",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select("user_id", "ts", "event_id")
        val views = ev.where(col("event_type") === "view")
          .select("user_id", "ts", "event_id")
        TimeJoin.asofJoin(clicks, views, Seq("user_id"), "ts", "ts",
            payload = Seq("event_id", "ts"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_clicks"),
            count(col("asof_event_id")).as("n_matched"),
            // ids reduce mod a prime BEFORE the product: raw ids carry
            // the scale-copy shift (c·10⁹), whose products overflow
            // BIGINT — the checksum must survive any @k
            coalesce(sum((col("event_id") % 1000003L) *
              (col("asof_event_id") % 1000003L)), lit(0L))
              .as("pair_checksum"),
            coalesce(sum(unix_millis(col("ts")) - unix_millis(col("asof_ts"))),
              lit(0L)).as("gap_ms_sum"))
          .orderBy("user_id")
      },
      Some("""WITH u AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN event_type='click' THEN 1 ELSE 0 END AS is_l
                FROM events WHERE event_type IN ('click','view')
              ), w AS (
                SELECT user_id, ts, event_id, is_l,
                       last_value(CASE WHEN is_l=0 THEN event_id END IGNORE NULLS)
                         OVER win AS m_id,
                       last_value(CASE WHEN is_l=0 THEN epoch_ms(ts) END IGNORE NULLS)
                         OVER win AS m_ms
                FROM u
                WINDOW win AS (PARTITION BY user_id ORDER BY ts, is_l
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              )
              SELECT user_id, COUNT(*) AS n_clicks, COUNT(m_id) AS n_matched,
                     CAST(COALESCE(SUM((event_id % 1000003) * (m_id % 1000003)), 0)
                       AS BIGINT) AS pair_checksum,
                     CAST(COALESCE(SUM(epoch_ms(ts) - m_ms), 0) AS BIGINT)
                       AS gap_ms_sum
              FROM w WHERE is_l = 1
              GROUP BY user_id ORDER BY user_id""")),

    // Forward as-of: each click matched to the user's EARLIEST
    // at-or-after view — the other direction of the same operator,
    // exercised end to end (the spec pins all four modes on synthetic
    // data; this pins forward on the real table against its own
    // oracle, a DESC-traversal mirror of the backward formulation).
    Declared(
      "ext_rel_asof_fwd",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select("user_id", "ts", "event_id")
        val views = ev.where(col("event_type") === "view")
          .select("user_id", "ts", "event_id")
        TimeJoin.asofJoin(clicks, views, Seq("user_id"), "ts", "ts",
            payload = Seq("event_id", "ts"), forward = true)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_clicks"),
            count(col("asof_event_id")).as("n_matched"),
            // mod-prime before the product — see ext_rel_asof
            coalesce(sum((col("event_id") % 1000003L) *
              (col("asof_event_id") % 1000003L)), lit(0L))
              .as("pair_checksum"),
            coalesce(sum(unix_millis(col("asof_ts")) - unix_millis(col("ts"))),
              lit(0L)).as("gap_ms_sum"))
          .orderBy("user_id")
      },
      Some("""WITH u AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN event_type='click' THEN 1 ELSE 0 END AS is_l
                FROM events WHERE event_type IN ('click','view')
              ), w AS (
                SELECT user_id, ts, event_id, is_l,
                       last_value(CASE WHEN is_l=0 THEN event_id END IGNORE NULLS)
                         OVER win AS m_id,
                       last_value(CASE WHEN is_l=0 THEN epoch_ms(ts) END IGNORE NULLS)
                         OVER win AS m_ms
                FROM u
                WINDOW win AS (PARTITION BY user_id ORDER BY ts DESC, is_l
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              )
              SELECT user_id, COUNT(*) AS n_clicks, COUNT(m_id) AS n_matched,
                     CAST(COALESCE(SUM((event_id % 1000003) * (m_id % 1000003)), 0)
                       AS BIGINT) AS pair_checksum,
                     CAST(COALESCE(SUM(m_ms - epoch_ms(ts)), 0) AS BIGINT)
                       AS gap_ms_sum
              FROM w WHERE is_l = 1
              GROUP BY user_id ORDER BY user_id""")),

    // Batch gap sessionization ([[TimeJoin.sessionize]]): 30-minute
    // gap sessions per user; per-session event counts and exact
    // durations pin the session SEGMENTATION, not just counts. The
    // streaming twin is [[graft.streaming.Sessionize]].
    Declared(
      "ext_rel_sessionize",
      (s, d) => {
        val ev = Tables.events(s, d).select("user_id", "ts")
        TimeJoin.sessionize(ev, Seq("user_id"), "ts", gapMs = 1800000L)
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            (unix_millis(max(col("ts"))) - unix_millis(min(col("ts"))))
              .as("dur_ms"),
            unix_millis(min(col("ts"))).as("start_ms"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
            max(col("n_events")).as("max_events"),
            sum(col("dur_ms")).as("dur_ms_sum"),
            (sum(col("start_ms")) % 1000000007L).as("start_checksum"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (
                SELECT user_id, ts,
                       CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
                            OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
              ), s AS (
                SELECT user_id, ts,
                       SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM g
              ), agg AS (
                SELECT user_id, sid, COUNT(*) AS n_events,
                       epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS dur_ms,
                       epoch_ms(MIN(ts)) AS start_ms
                FROM s GROUP BY user_id, sid
              )
              SELECT user_id, COUNT(*) AS n_sessions,
                     CAST(MAX(n_events) AS BIGINT) AS max_events,
                     CAST(SUM(dur_ms) AS BIGINT) AS dur_ms_sum,
                     CAST(SUM(start_ms) % 1000000007 AS BIGINT) AS start_checksum
              FROM agg GROUP BY user_id ORDER BY user_id""")),

    // Banded range join ([[TimeJoin.rangeJoin]]): clicks in the two
    // hours before each error, same user. The oracle states the raw
    // inequality join; the Spark plan is the banded equi-join (the
    // ≤2-band probe), so a green row proves banding loses no pair.
    Declared(
      "ext_rel_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val errors = ev.where(col("event_type") === "error")
          .select("user_id", "ts", "event_id")
        val clicks = ev.where(col("event_type") === "click")
          .select("user_id", "ts", "event_id")
        TimeJoin.rangeJoin(errors, clicks, Seq("user_id"), "ts", "ts",
            lowerMs = -7200000L, upperMs = 0L)
          .groupBy(col("l_user_id").as("user_id"))
          .agg(countDistinct(col("l_event_id")).as("n_errors_matched"),
            count(lit(1)).as("n_pairs"),
            // mod-prime before the product — see ext_rel_asof
            sum((col("l_event_id") % 1000003L) *
              (col("r_event_id") % 1000003L)).as("pair_checksum"))
          .orderBy("user_id")
      },
      Some("""SELECT e.user_id,
                     COUNT(DISTINCT e.event_id) AS n_errors_matched,
                     COUNT(*) AS n_pairs,
                     CAST(SUM((e.event_id % 1000003) * (c.event_id % 1000003))
                       AS BIGINT) AS pair_checksum
              FROM events e JOIN events c
                ON c.user_id = e.user_id AND c.event_type = 'click'
               AND c.ts >= e.ts - INTERVAL 120 MINUTE AND c.ts < e.ts
              WHERE e.event_type = 'error'
              GROUP BY e.user_id ORDER BY e.user_id""")),

    // Left-outer banded range join ([[TimeJoin.rangeJoin]]
    // joinType="left") on the real events table: every error keeps a
    // row even with no click in its 2-hour window. Runs the
    // `leftIdCol` (natural-unique-key) variant — the fully lazy,
    // no-materialization 100 TB path — with event_id as the identity
    // the anti-join needs; n_unmatched pins the null-padded rows the
    // inner query can't see.
    Declared(
      "ext_rel_range_join_left",
      (s, d) => {
        val ev = Tables.events(s, d)
        val errors = ev.where(col("event_type") === "error")
          .select("user_id", "ts", "event_id")
        val clicks = ev.where(col("event_type") === "click")
          .select("user_id", "ts", "event_id")
        TimeJoin.rangeJoin(errors, clicks, Seq("user_id"), "ts", "ts",
            lowerMs = -7200000L, upperMs = 0L, joinType = "left",
            leftIdCol = Some("event_id"))
          .groupBy(col("l_user_id").as("user_id"))
          .agg(countDistinct(col("l_event_id")).as("n_errors"),
            sum(when(col("r_event_id").isNull, 1L).otherwise(0L))
              .as("n_unmatched"),
            // mod-prime before the product — see ext_rel_asof
            coalesce(sum((col("l_event_id") % 1000003L) *
              (col("r_event_id") % 1000003L)), lit(0L))
              .as("pair_checksum"))
          .orderBy("user_id")
      },
      Some("""SELECT e.user_id,
                     COUNT(DISTINCT e.event_id) AS n_errors,
                     CAST(SUM(CASE WHEN c.event_id IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_unmatched,
                     CAST(COALESCE(SUM((e.event_id % 1000003) * (c.event_id % 1000003)), 0)
                       AS BIGINT) AS pair_checksum
              FROM (SELECT * FROM events WHERE event_type = 'error') e
              LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
                ON c.user_id = e.user_id
               AND c.ts >= e.ts - INTERVAL 120 MINUTE AND c.ts < e.ts
              GROUP BY e.user_id ORDER BY e.user_id""")),

    // --- Similarity search --------------------------------------------

    // Integer-projected LSH bucket census per table: the correctness
    // anchor for the banded random-projection machinery.
    Declared(
      "ext_sim_lsh_census",
      (s, d) =>
        Similarity.lshBuckets(Tables.embeddings(s, d), "vec_id", "embedding",
          nTables = 4, planesPerTable = 8)
          .groupBy("tbl", "bucket").agg(count(lit(1)).as("cnt"))
          .groupBy("tbl")
          .agg(sum(when(col("cnt") >= 2, 1).otherwise(0)).as("dup_buckets"),
            sum(expr("(cnt * (cnt - 1)) div 2")).as("cand_pairs"),
            sum(col("cnt")).as("n_docs"))
          .orderBy("tbl"),
      Some(s"""WITH $lshBuckCte,
               bc AS (SELECT tbl, bucket, COUNT(*) AS cnt FROM buck GROUP BY tbl, bucket)
               SELECT tbl,
                      CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_buckets,
                      CAST(SUM((cnt * (cnt - 1)) // 2) AS BIGINT) AS cand_pairs,
                      CAST(SUM(cnt) AS BIGINT) AS n_docs
               FROM bc GROUP BY tbl ORDER BY tbl""")),

    // Brute-force pair count at a cosine margin over a bounded slice —
    // the id_checksum pins WHICH pairs matched, not just how many.
    Declared(
      "ext_sim_pairs_margin",
      (s, d) => {
        val e = Tables.embeddings(s, d).where(col("vec_id") < 500)
        val a = Similarity.normalized(e, "vec_id", "embedding", "a_id", "av")
        val b = Similarity.normalized(e, "vec_id", "embedding", "b_id", "bv")
        a.join(b, col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            Similarity.unitDot(col("av"), col("bv")).as("cos"))
          // 9-dp quantize before the threshold (see lshNearPairs note)
          .where(round(col("cos"), 9) >= 0.3)
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("a_id") + col("b_id")).as("id_checksum"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                         FROM embeddings WHERE vec_id < 500),
              p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                           list_cosine_similarity(a.v, b.v) AS c
                    FROM e a JOIN e b ON a.vec_id < b.vec_id)
              SELECT COUNT(*) AS n_pairs,
                     CAST(SUM(a_id + b_id) AS BIGINT) AS id_checksum
              FROM p WHERE round(c, 9) >= 0.3""")),

    // Recall of banded LSH top-10 against the brute-force top-10 for a
    // query panel — integers (hit counts), so oracle-checkable.
    Declared(
      "ext_sim_lsh_recall",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.where(col("vec_id") < 20)
        val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
          .select("query_id", "neighbor_id")
        val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", k = 10,
          nTables = 4, planesPerTable = 8)
          .select("query_id", "neighbor_id")
        val total = bf.agg(count(lit(1)).as("n_bf"))
        val hits = bf.join(lsh, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("n_hits"))
        total.crossJoin(hits)
      },
      Some(s"""WITH $lshBuckCte,
               cand AS (
                 SELECT DISTINCT qb.vec_id AS qid, cb.vec_id AS nid
                 FROM buck qb JOIN buck cb
                   ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
                  AND qb.vec_id < 20 AND qb.vec_id <> cb.vec_id),
               lsh AS (
                 SELECT qid, nid FROM (
                   SELECT qid, nid,
                          ROW_NUMBER() OVER (PARTITION BY qid ORDER BY
                            list_cosine_similarity(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]) DESC,
                            nid) AS rk
                   FROM cand
                   JOIN embeddings eq ON eq.vec_id = qid
                   JOIN embeddings en ON en.vec_id = nid)
                 WHERE rk <= 10),
               bf AS (
                 SELECT qid, nid FROM (
                   SELECT q.vec_id AS qid, c.vec_id AS nid,
                          ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                            list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                            c.vec_id) AS rk
                   FROM embeddings q JOIN embeddings c
                     ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
                 WHERE rk <= 10)
               SELECT (SELECT COUNT(*) FROM bf) AS n_bf,
                      (SELECT COUNT(*) FROM bf JOIN lsh
                        ON bf.qid = lsh.qid AND bf.nid = lsh.nid) AS n_hits""")),

    // Top-k queries, emitted as tie-safe integer projections so each
    // is hash-checked end to end (previously rows-only float
    // listings). See [[topkChecksum]]: raw rank-k listings are
    // engine-dependent when scores tie within double noise; the
    // projection is not. The float listings remain the library API
    // (bruteForceTopK / lshTopK / ivfTopK).
    Declared(
      "ext_sim_cosine_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        topkChecksum(Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 3),
          "vec_id", "embedding", k = 5))
      },
      Some(s"""WITH $bruteTopCte
               $topkChecksumSql""")),

    Declared(
      "ext_sim_lsh_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        topkChecksum(Similarity.lshTopK(emb, emb.where(col("vec_id") < 3),
          "vec_id", "embedding", k = 5, nTables = 4, planesPerTable = 8))
      },
      Some(s"""WITH $lshBuckCte,
               sc0 AS (
                 SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
                 FROM buck qb JOIN buck cb
                   ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
                  AND qb.vec_id < 3 AND qb.vec_id <> cb.vec_id),
               sc AS (
                 SELECT query_id, neighbor_id,
                        list_cosine_similarity(eq.embedding::DOUBLE[], en.embedding::DOUBLE[]) AS cos
                 FROM sc0
                 JOIN embeddings eq ON eq.vec_id = query_id
                 JOIN embeddings en ON en.vec_id = neighbor_id),
               $rankTopKthCte
               $topkChecksumSql""")),

    // IVF ANN run at nprobe = k (probe every list): provably equal to
    // the brute-force ranking — same scoring expression over the same
    // candidate set — so the DuckDB brute-force SQL oracles the WHOLE
    // IVF pipeline (centroid training, assignment, probe expansion,
    // list join, ranking) end to end. The approximate nprobe < k
    // serving path is pinned by DedupSimilaritySpec (nprobe=1 cluster
    // recovery; nprobe=k ≡ brute-force). Similarity.IvfIndex.build
    // memoizes training per corpus — the build-once/query-many shape.
    Declared(
      "ext_sim_ivf_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val index = Similarity.IvfIndex.build(emb, "vec_id", "embedding", k = 16, iters = 3)
        topkChecksum(Similarity.ivfTopK(emb, emb.where(col("vec_id") < 3),
          "vec_id", "embedding", k = 5, index.centers, nprobe = 16))
      },
      Some(s"""WITH $bruteTopCte
               $topkChecksumSql""")),

    // IVF at the ACTUAL serving configuration — nprobe = 4 of 16
    // lists, the 4× candidate-scan reduction a 100 TB ANN deployment
    // runs — pinned PER QUERY against the brute-force top-10 over a
    // 20-query panel: each query row carries its brute-force count
    // (oracle-exact) and a ≥1-hit floor, and the query_id = -1 total
    // row carries the 0.40 aggregate recall floor. The pipeline is
    // fully deterministic (hash-seeded k-means init, fixed
    // iterations), so every boolean either always holds at a given
    // corpus or its row goes red. Floors: per-query ≥1 of 10 vs a
    // measured min of 2 across sf0.001/0.01/0.1; aggregate 0.40 vs
    // measured 0.515-0.59 — margin for corpus growth, while a broken
    // probe expansion (or one query's bucket routing going dark)
    // still trips its own row.
    Declared(
      "ext_sim_ivf_nprobe",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.where(col("vec_id") < 20)
        val index = Similarity.IvfIndex.build(emb, "vec_id", "embedding", k = 16, iters = 3)
        val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
            k = 10, index.centers, nprobe = 4)
          .select("query_id", "neighbor_id")
        val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
          .select("query_id", "neighbor_id")
        val hits = bf.join(ivf, Seq("query_id", "neighbor_id"))
          .groupBy("query_id").agg(count(lit(1)).as("__h"))
        // ONE execution of the bf+ivf subtree, then the 20-row panel
        // summary comes to the driver (bounded-artifact collect
        // discipline) — deriving the per-query rows and the total row
        // as separate plan branches re-ran the whole pipeline per
        // branch (measured 3×)
        val perQ = bf.groupBy("query_id").agg(count(lit(1)).as("n_bf"))
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id").cast("long"), col("n_bf"),
            coalesce(col("__h"), lit(0L)))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val totalBf = perQ.map(_._2).sum
        val totalH = perQ.map(_._3).sum
        import s.implicits._
        (perQ.map { case (q, nbf, h) => (q, nbf, h >= 1) }.toSeq :+
          ((-1L, totalBf, totalH * 5 >= totalBf * 2)))
          .toDF("query_id", "n_bf", "recall_ok")
          .orderBy("query_id")
      },
      Some("""WITH bf AS (
                 SELECT qid, nid FROM (
                   SELECT q.vec_id AS qid, c.vec_id AS nid,
                          ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                            list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                            c.vec_id) AS rk
                   FROM embeddings q JOIN embeddings c
                     ON q.vec_id < 20 AND q.vec_id <> c.vec_id)
                 WHERE rk <= 10)
               SELECT CAST(qid AS BIGINT) AS query_id, COUNT(*) AS n_bf,
                      TRUE AS recall_ok
               FROM bf GROUP BY qid
               UNION ALL
               SELECT CAST(-1 AS BIGINT), (SELECT COUNT(*) FROM bf), TRUE
               ORDER BY query_id""")),

    // Quantized (int8-range) ANN ([[Similarity.quantizedTopK]]): the
    // 100 TB storage/bandwidth path — clamp(floor(x·127+0.5)) per dim
    // (floor, not round: half-even vs half-away differs across
    // engines; floor doesn't), then exact integer dot products. The
    // integer scores make the ENTIRE ranking portable, so the oracle
    // pins rank order itself (sum of neighbor_id·rank), strictly
    // stronger than the margin-cleared checksum the float listings
    // need.
    Declared(
      "ext_sim_quantized_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.quantizedTopK(emb, emb.where(col("vec_id") < 3),
            "vec_id", "embedding", k = 5)
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("neighbor_id") * col("rank")).as("rank_checksum"),
            sum(col("score")).as("score_sum"))
          .orderBy("query_id")
      },
      Some("""WITH q AS (
                SELECT vec_id, list_transform(embedding, x ->
                  CAST(greatest(-127, least(127,
                    floor(CAST(x AS DOUBLE) * 127 + 0.5))) AS BIGINT)) AS qv
                FROM embeddings),
              sc AS (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
                         i -> a.qv[i] * b.qv[i])) AS BIGINT) AS score
                FROM q a JOIN q b ON a.vec_id < 3 AND a.vec_id <> b.vec_id),
              rk AS (
                SELECT query_id, neighbor_id, score,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY score DESC, neighbor_id) AS rnk
                FROM sc),
              top AS (SELECT * FROM rk WHERE rnk <= 5)
              SELECT query_id, COUNT(*) AS n_rows,
                     CAST(SUM(neighbor_id * rnk) AS BIGINT) AS rank_checksum,
                     CAST(SUM(score) AS BIGINT) AS score_sum
              FROM top GROUP BY query_id ORDER BY query_id""")),

    // --- End-to-end curation pipeline ---------------------------------
    // The capstone composition ([[graft.ext.Curation]]): language gate
    // → quality gate → exact dedup → LSH near-dedup (verified pairs +
    // degenerate clusters), emitted as one row of per-stage attrition
    // counts plus id/token checksums of the FINAL corpus — the
    // checksums pin exactly WHICH documents survive, so the oracle
    // verifies the whole pipeline end to end, not just cardinalities.
    Declared(
      "ext_pipeline_curation",
      (s, d) => {
        val c = Curation.curate(Tables.documents(s, d), "doc_id", "text")
        c.gateStats
          .crossJoin(c.exactKept.agg(count(lit(1)).as("n_exact")))
          .crossJoin(c.nearDupPairs.agg(count(lit(1)).as("n_near_pairs")))
          .crossJoin(c.finalDocs.agg(count(lit(1)).as("n_final"),
            sum(col("doc_id")).as("id_checksum"),
            sum(col("n_tokens")).as("token_checksum")))
      },
      Some(s"""WITH lid AS (
                 SELECT doc_id, text,
                   len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and','to'))) AS en,
                   len(list_filter(string_split(text,' '), x -> x IN ('el','la','de','que','y'))) AS es,
                   len(list_filter(string_split(text,' '), x -> x IN ('der','die','und','ist','das'))) AS de,
                   len(list_filter(string_split(text,' '), x -> x IN ('le','la','et','les','des'))) AS fr
                 FROM documents),
               lang_kept AS (
                 SELECT doc_id, text FROM lid
                 WHERE en > 0 AND en >= es AND en >= de AND en >= fr),
               qual AS (
                 SELECT doc_id, text, len(string_split(text,' ')) AS n_tokens,
                        (len(list_distinct(string_split(text,' '))) * 10)
                          // len(string_split(text,' ')) AS ttr
                 FROM lang_kept),
               qual_kept AS (
                 SELECT doc_id, text, n_tokens FROM qual
                 WHERE n_tokens >= 30 AND ttr >= 3),
               ex AS (SELECT MIN(doc_id) AS doc_id FROM qual_kept GROUP BY md5(text)),
               surv AS (SELECT q.* FROM qual_kept q JOIN ex USING (doc_id)),
               tok AS (
                 SELECT DISTINCT doc_id, w FROM (
                   SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM surv)
                 WHERE w <> ''),
               h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS hv FROM tok),
               mh AS (
                 SELECT doc_id, i, MIN(((2*i + 3) * hv + (5*i + 7)) % 2147483647) AS minh
                 FROM h, range(16) t(i) GROUP BY doc_id, i),
               sigs AS (
                 SELECT doc_id, CAST(i // 4 AS INT) AS band,
                        string_agg(CAST(minh AS VARCHAR), ',' ORDER BY i) AS sig
                 FROM mh GROUP BY doc_id, band),
               okb AS (SELECT band, sig FROM sigs GROUP BY band, sig HAVING COUNT(*) <= $MaxBucket),
               bigc AS (
                 SELECT DISTINCT s.doc_id FROM sigs s
                 JOIN (SELECT band, sig, MIN(doc_id) AS rep FROM sigs
                       GROUP BY band, sig HAVING COUNT(*) > $MaxBucket) b
                   ON s.band = b.band AND s.sig = b.sig AND s.doc_id <> b.rep),
               sig2 AS (SELECT sigs.* FROM sigs JOIN okb USING (band, sig)),
               cand AS (
                 SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM sig2 a JOIN sig2 b
                   ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
               tp AS (
                 SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                        unnest(range(len(string_split(text, ' ')))) AS pos
                 FROM surv),
               sh0 AS (
                 SELECT doc_id,
                        w || ' ' || LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                          || ' ' || LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS shingle
                 FROM tp),
               sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
               shh AS (
                 SELECT DISTINCT doc_id,
                        CAST('0x' || substr(md5(shingle), 1, 8) AS BIGINT) AS sh
                 FROM sh),
               kept AS (SELECT sh FROM shh GROUP BY sh HAVING COUNT(*) <= $DfCap),
               fsh AS (SELECT doc_id, sh FROM shh JOIN kept USING (sh)),
               card AS (SELECT doc_id, COUNT(*) AS n FROM fsh GROUP BY doc_id),
               inter AS (
                 SELECT doc_a, doc_b, COUNT(*) AS inter FROM cand
                 JOIN fsh fa ON fa.doc_id = doc_a
                 JOIN fsh fb ON fb.doc_id = doc_b AND fa.sh = fb.sh
                 GROUP BY doc_a, doc_b),
               ver AS (
                 SELECT doc_a, doc_b, inter, ca.n + cb.n - inter AS uni
                 FROM inter JOIN card ca ON doc_a = ca.doc_id
                 JOIN card cb ON doc_b = cb.doc_id
                 WHERE inter * 5 >= (ca.n + cb.n - inter) * 4),
               neardrop AS (
                 SELECT DISTINCT doc_b AS doc_id FROM ver
                 UNION SELECT doc_id FROM bigc),
               fin AS (SELECT s.* FROM surv s ANTI JOIN neardrop d ON s.doc_id = d.doc_id)
               SELECT
                 (SELECT COUNT(*) FROM documents) AS n_input,
                 (SELECT COUNT(*) FROM lang_kept) AS n_lang,
                 (SELECT COUNT(*) FROM qual_kept) AS n_quality,
                 (SELECT COUNT(*) FROM surv) AS n_exact,
                 (SELECT COUNT(*) FROM ver) AS n_near_pairs,
                 COUNT(*) AS n_final,
                 CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                 CAST(SUM(n_tokens) AS BIGINT) AS token_checksum
               FROM fin""")),

    // Sequence packing census: documents pack into ~2048-token training
    // bins per language (contiguous by doc_id — the "concat the shard,
    // chop every budget" assignment). Per-lang bin counts, the heaviest
    // bin, and a bin-weighted checksum pin every assignment.
    Declared(
      "ext_pipeline_pack",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("lang"), col("doc_id"),
            size(split(col("text"), " ")).as("n_tokens"))
        Sampling.packBins(docs, Seq("lang"), col("doc_id"), col("n_tokens"),
            budget = 2048)
          .groupBy("lang", "bin")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("load"),
            sum(col("doc_id") * (col("bin") + 1)).as("ck"))
          .groupBy("lang")
          .agg(countDistinct(col("bin")).as("n_bins"),
            sum(col("n_docs")).as("n_docs"),
            max(col("load")).as("max_bin_tokens"),
            sum(col("ck")).as("assign_checksum"))
          .orderBy("lang")
      },
      Some("""WITH t AS (
                SELECT lang, doc_id, len(string_split(text, ' ')) AS n FROM documents),
              b AS (
                SELECT lang, doc_id, n,
                  CAST((SUM(n) OVER (PARTITION BY lang ORDER BY doc_id) - n) // 2048 AS BIGINT) AS bin
                FROM t),
              pb AS (
                SELECT lang, bin, COUNT(*) AS n_docs, SUM(n) AS load,
                       SUM(doc_id * (bin + 1)) AS ck
                FROM b GROUP BY lang, bin)
              SELECT lang, COUNT(DISTINCT bin) AS n_bins,
                     CAST(SUM(n_docs) AS BIGINT) AS n_docs,
                     CAST(MAX(load) AS BIGINT) AS max_bin_tokens,
                     CAST(SUM(ck) AS BIGINT) AS assign_checksum
              FROM pb GROUP BY lang ORDER BY lang""")),

    // Eval-set decontamination: the eval slice is a deterministic 5%
    // hash sample; training docs sharing any word 8-gram with it are
    // dropped. The oracle matches on raw n-gram STRINGS while Spark
    // matches 64-bit xxhash64 gram hashes (never building gram
    // strings at all) — a hash-collision mismatch would surface here
    // as a checksum diff, so the green row also bounds collision
    // over-dropping at this scale. Remaining Spark-vs-DuckDB gap at
    // sf0.1 is per-stage launch overhead (the same plan's core is
    // sub-second warm), not plan cost.
    Declared(
      "ext_pipeline_decontam",
      (s, d) => {
        val b = Tables.documents(s, d)
          .withColumn("__eb", Sampling.hashBucket(col("doc_id"), 100, "eval"))
        val ev = b.where(col("__eb") < 5).select("doc_id", "text")
        val tr = b.where(col("__eb") >= 5).select("doc_id", "text")
        val clean = Curation.decontaminate(tr, "doc_id", "text", ev, "text", n = 8)
        b.agg(sum(when(col("__eb") >= 5, 1L).otherwise(0L)).as("n_train"),
            sum(when(col("__eb") < 5, 1L).otherwise(0L)).as("n_eval"))
          .crossJoin(clean.agg(count(lit(1)).as("n_clean"),
            sum(col("doc_id")).as("id_checksum")))
      },
      Some("""WITH b AS (
                SELECT doc_id, text,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'eval'), 1, 8) AS BIGINT) % 100 AS eb
                FROM documents),
              ev AS (SELECT doc_id, text FROM b WHERE eb < 5),
              tr AS (SELECT doc_id, text FROM b WHERE eb >= 5),
              evg AS (
                SELECT DISTINCT unnest(list_transform(range(1, len(string_split(text,' ')) - 6),
                  i -> array_to_string(string_split(text,' ')[i:i+7], ' '))) AS g
                FROM ev),
              trg AS (
                SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' ')) - 6),
                  i -> array_to_string(string_split(text,' ')[i:i+7], ' '))) AS g
                FROM tr),
              contam AS (SELECT DISTINCT doc_id FROM trg JOIN evg USING (g)),
              clean AS (SELECT t.* FROM tr t ANTI JOIN contam c ON t.doc_id = c.doc_id)
              SELECT (SELECT COUNT(*) FROM tr) AS n_train,
                     (SELECT COUNT(*) FROM ev) AS n_eval,
                     COUNT(*) AS n_clean,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum
              FROM clean""")),

    // The 100 TB decontamination default: the eval gram set folds
    // into ONE Bloom filter (bounded bytes, independent of corpus
    // size) and train grams probe it map-side — no broadcast join,
    // no shuffle of the train side. The error contract is one-sided
    // (might_contain has NO false negatives, so every exactly-
    // contaminated doc is dropped; false positives over-drop at the
    // realized fpp). Here the filter is sized at 1M capacity for a
    // ~12k-gram eval set, so the realized per-probe fpp is ~(k·m/bits)^k
    // ≈ 1e-21 — over-dropping a single clean doc is a ~1e-16 event,
    // which is why the oracle can assert the bloom clean set EQUALS
    // the exact string-matched one (same SQL twin as
    // ext_pipeline_decontam; the sketch build itself is work the
    // oracle side never does). A genuine false positive would surface
    // loudly as a row/checksum diff.
    Declared(
      "ext_pipeline_decontam_bloom",
      (s, d) => {
        val b = Tables.documents(s, d)
          .withColumn("__eb", Sampling.hashBucket(col("doc_id"), 100, "eval"))
        val ev = b.where(col("__eb") < 5).select("doc_id", "text")
        val tr = b.where(col("__eb") >= 5).select("doc_id", "text")
        val clean = Curation.decontaminateBloom(tr, "doc_id", "text", ev, "text",
          n = 8, expectedItems = 1000000L, fpp = 0.001)
        b.agg(sum(when(col("__eb") >= 5, 1L).otherwise(0L)).as("n_train"),
            sum(when(col("__eb") < 5, 1L).otherwise(0L)).as("n_eval"))
          .crossJoin(clean.agg(count(lit(1)).as("n_clean"),
            sum(col("doc_id")).as("id_checksum")))
      },
      Some("""WITH b AS (
                SELECT doc_id, text,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'eval'), 1, 8) AS BIGINT) % 100 AS eb
                FROM documents),
              ev AS (SELECT doc_id, text FROM b WHERE eb < 5),
              tr AS (SELECT doc_id, text FROM b WHERE eb >= 5),
              evg AS (
                SELECT DISTINCT unnest(list_transform(range(1, len(string_split(text,' ')) - 6),
                  i -> array_to_string(string_split(text,' ')[i:i+7], ' '))) AS g
                FROM ev),
              trg AS (
                SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' ')) - 6),
                  i -> array_to_string(string_split(text,' ')[i:i+7], ' '))) AS g
                FROM tr),
              contam AS (SELECT DISTINCT doc_id FROM trg JOIN evg USING (g)),
              clean AS (SELECT t.* FROM tr t ANTI JOIN contam c ON t.doc_id = c.doc_id)
              SELECT (SELECT COUNT(*) FROM tr) AS n_train,
                     (SELECT COUNT(*) FROM ev) AS n_eval,
                     COUNT(*) AS n_clean,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum
              FROM clean""")),

    // Shard-export census ([[Curation.exportShards]]): the corpus is
    // actually WRITTEN as a hive-partitioned training layout
    // (lang=<l>/ dirs, 2 deterministic hash shards per dir, files
    // internally sorted) into a temp dir, then read back through the
    // partition-discovery reader. The oracle replays the md5 shard
    // routing in SQL and states every (lang, shard) cell's row count
    // and id checksum — row-for-row routing determinism — plus
    // n_files = 1: a shard bucket always lands in exactly one file
    // (hash repartition sends each (lang, shard) combo to one task).
    Declared(
      "ext_pipeline_shard_export",
      (s, d) => {
        // deterministic per-(query, sf) path + mode-overwrite write:
        // repeated executions (bench warm-up + timed runs) reuse ONE
        // dir instead of leaking a corpus-sized parquet copy each —
        // a fresh createTempDirectory per run was measured filling
        // /tmp across bench cycles
        val out = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_shard_census_${d.replaceAll("[^A-Za-z0-9.]", "_")}").toString
        Curation.exportShards(
          Tables.documents(s, d).select("doc_id", "lang", "text"),
          out, Seq("lang"), "doc_id", shardsPerPart = 2)
        s.read.parquet(out)
          .withColumn("__file", input_file_name())
          .withColumn("shard",
            pmod(graft.ext.Hashing.h32(col("doc_id").cast("string")), lit(2)))
          .groupBy("lang", "shard")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id")).as("id_checksum"),
            countDistinct(col("__file")).as("n_files"))
          .orderBy("lang", "shard")
      },
      Some("""WITH r AS (
                SELECT lang, doc_id,
                       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 AS shard
                FROM documents)
              SELECT lang, shard, COUNT(*) AS n_rows,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                     CAST(1 AS BIGINT) AS n_files
              FROM r GROUP BY lang, shard ORDER BY lang, shard""")),

    // Z-order layout census ([[Layout.writeZOrdered]]): lineitem is
    // actually WRITTEN range-partitioned + sorted on the Morton
    // interleave of two 6-bit dims, then read back. The oracle
    // replays the Morton bit-math in SQL and states the exact row
    // count, z checksum, and global z range — pinning the interleave
    // computation and lossless routing. File boundaries come from
    // range-partitioner sampling (not run-deterministic), so the
    // layout contract is pinned structurally instead: exactly 16
    // files whose recomputed [min_z, max_z] spans are pairwise
    // DISJOINT — the property that makes parquet min-max stats prune
    // box predicates to O(box volume) files at 100 TB.
    Declared(
      "ext_pipeline_zorder",
      (s, d) => {
        // deterministic per-(query, sf) path + mode-overwrite write —
        // same no-leak discipline as ext_pipeline_shard_export
        val out = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_zorder_census_${d.replaceAll("[^A-Za-z0-9.]", "_")}").toString
        val li = Tables.lineitem(s, d).select(col("l_orderkey"),
          (col("l_partkey") % 64).as("x"), (col("l_suppkey") % 64).as("y"))
        graft.ext.Layout.writeZOrdered(li, out, "x", "y", bits = 6, nFiles = 16)
        val back = s.read.parquet(out)
          .withColumn("__file", input_file_name())
          .withColumn("__z", graft.ext.Layout.morton2(col("x"), col("y"), 6))
        val w = org.apache.spark.sql.expressions.Window.orderBy("zmin")
        // 16 file-summary rows — the single-partition window is over
        // file count, never data. Each file's zmin is checked against
        // the RUNNING max of every preceding file's zmax (not just its
        // immediate predecessor): a wide early file spanning several
        // later ones would pass a lag-1 check while still overlapping
        // — the running max is what "pairwise disjoint" actually means
        // for interval spans sorted by their lower end.
        val files = back.groupBy("__file")
          .agg(min("__z").as("zmin"), max("__z").as("zmax"))
          .withColumn("__prev_max", max("zmax").over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("__prev_max").isNotNull &&
              col("__prev_max") >= col("zmin"), 1L).otherwise(0L)).as("__ovl"))
        back.agg(count(lit(1)).as("n_rows"),
            sum(col("__z")).as("z_checksum"),
            min(col("__z")).as("z_min"), max(col("__z")).as("z_max"))
          .crossJoin(files)
          .select(col("n_rows"), col("z_checksum"), col("z_min"), col("z_max"),
            col("n_files"), (col("__ovl") === 0).as("files_disjoint"))
      },
      Some("""WITH z AS (
                -- bitwise ops all share one precedence tier in DuckDB
                -- (left-to-right), so every term is fully parenthesized
                SELECT ((((l_partkey % 64) >> 0) & 1) << 0)  | ((((l_suppkey % 64) >> 0) & 1) << 1)
                     | ((((l_partkey % 64) >> 1) & 1) << 2)  | ((((l_suppkey % 64) >> 1) & 1) << 3)
                     | ((((l_partkey % 64) >> 2) & 1) << 4)  | ((((l_suppkey % 64) >> 2) & 1) << 5)
                     | ((((l_partkey % 64) >> 3) & 1) << 6)  | ((((l_suppkey % 64) >> 3) & 1) << 7)
                     | ((((l_partkey % 64) >> 4) & 1) << 8)  | ((((l_suppkey % 64) >> 4) & 1) << 9)
                     | ((((l_partkey % 64) >> 5) & 1) << 10) | ((((l_suppkey % 64) >> 5) & 1) << 11)
                       AS z
                FROM lineitem)
              SELECT COUNT(*) AS n_rows, CAST(SUM(z) AS BIGINT) AS z_checksum,
                     CAST(MIN(z) AS BIGINT) AS z_min, CAST(MAX(z) AS BIGINT) AS z_max,
                     CAST(16 AS BIGINT) AS n_files, TRUE AS files_disjoint
              FROM z""")),

    // Deterministic split + stratified-downsampling census: every row
    // is assigned val/test/train by a salted hash of its id, and
    // independently marked kept/dropped by a per-language per-mille
    // rate (en 500‰, es/de/fr 250‰, default 100‰ — exercises the
    // fallback on zh). The id checksum pins exact membership of every
    // (split, lang) cell, so the oracle verifies assignment and
    // sampling decisions row-for-row, not just proportions.
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
              FROM b GROUP BY split, lang ORDER BY split, lang""")),

    // TF-IDF distinctive terms ([[Search.topTerms]]): top-3 terms per
    // document for the doc_id < 20 panel, idf from the FULL corpus.
    // Output is integer/string only; the float score is compared
    // through round(·, 9) + term tie-break (the one cross-engine
    // hazard is ln's last ulp — a rounded-score tie resolves by term
    // on both engines).
    Declared(
      "ext_text_tfidf",
      (s, d) =>
        Search.topTerms(Tables.documents(s, d), "doc_id", "text", k = 3)
          .where(col("doc_id") < 20)
          .orderBy("doc_id", "rk"),
      Some("""WITH t0 AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
              tf AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM t0
                WHERE term <> '' GROUP BY doc_id, term),
              df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
              n AS (SELECT COUNT(*) AS n_docs FROM documents),
              sc AS (
                SELECT doc_id, term,
                       tf * ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) AS tfidf
                FROM tf JOIN df USING (term) CROSS JOIN n),
              rk AS (
                SELECT doc_id, term,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY round(tfidf, 9) DESC, term) AS rk
                FROM sc)
              SELECT doc_id, rk, term FROM rk
              WHERE rk <= 3 AND doc_id < 20
              ORDER BY doc_id, rk""")),

    // BM25 search ([[Search.search]]): top-10 documents for a 3-term
    // query. k1=1.5, b=0.75 — chosen so every derived constant
    // (k1+1=2.5, 1−b=0.25) is an EXACT double and the oracle's
    // literals mean identical bits; the per-term partials add in fixed
    // literal order on both engines (no float SUM aggregation), so
    // only ln's last ulp differs — absorbed by round(·, 9) + doc_id
    // tie-break.
    Declared(
      "ext_text_bm25",
      (s, d) =>
        Search.search(Tables.documents(s, d), "doc_id", "text",
          Seq("merge", "vector", "window"), k = 10, k1 = 1.5, b = 0.75),
      Some("""WITH base AS (
                SELECT doc_id,
                       len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl,
                       string_split(text, ' ') AS toks
                FROM documents),
              corpus AS (
                SELECT COUNT(*) AS n_docs,
                       CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
                FROM base),
              tf AS (
                SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
                  SELECT doc_id, dl, unnest(toks) AS term FROM base)
                WHERE term IN ('merge', 'vector', 'window')
                GROUP BY doc_id, dl, term),
              df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
              sc AS (
                SELECT doc_id, tf.term,
                       ln(CAST(1.0 AS DOUBLE) + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
                         * (tf * CAST(2.5 AS DOUBLE))
                         / (tf + CAST(1.5 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS s
                FROM tf JOIN df USING (term) CROSS JOIN corpus),
              byDoc AS (
                SELECT doc_id,
                       MAX(CASE WHEN term = 'merge' THEN s END) AS s0,
                       MAX(CASE WHEN term = 'vector' THEN s END) AS s1,
                       MAX(CASE WHEN term = 'window' THEN s END) AS s2,
                       COUNT(*) AS n_matched
                FROM sc GROUP BY doc_id),
              scored AS (
                SELECT doc_id, n_matched,
                       COALESCE(s0, CAST(0 AS DOUBLE)) + COALESCE(s1, CAST(0 AS DOUBLE))
                         + COALESCE(s2, CAST(0 AS DOUBLE)) AS score
                FROM byDoc),
              rk AS (
                SELECT doc_id, n_matched,
                       ROW_NUMBER() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rk
                FROM scored)
              SELECT rk, doc_id, n_matched FROM rk WHERE rk <= 10 ORDER BY rk""")),

    // Sliding-window chunking ([[Curation.chunk]]): width 64 / stride
    // 48 training spans, census per chunk index — chunk counts, token
    // coverage, and an id checksum pin every span boundary. The
    // operator is a pure map-side generate (one scan at 100 TB).
    Declared(
      "ext_pipeline_chunk",
      (s, d) =>
        Curation.chunk(Tables.documents(s, d), "doc_id", "text",
            width = 64, stride = 48)
          .groupBy("chunk_idx")
          .agg(count(lit(1)).as("n_chunks"),
            sum(col("chunk_len")).as("sum_len"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy("chunk_idx"),
      Some("""WITH c AS (
                SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
              s AS (SELECT doc_id, n, unnest(range(0, n, 48)) AS start FROM c)
              SELECT start // 48 AS chunk_idx, COUNT(*) AS n_chunks,
                     CAST(SUM(LEAST(64, n - start)) AS BIGINT) AS sum_len,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum
              FROM s GROUP BY chunk_idx ORDER BY chunk_idx""")),

    // Salted skew join ([[Skew.saltedJoin]]) surfaced as an
    // oracle-checked query: events (the big, potentially hot-keyed
    // side) join a derived event_type dim, salted 8 ways — result is
    // row-identical to the plain join, which is exactly what the
    // oracle asserts. The replicated dim stays broadcast-small
    // (|dim| × salt), so the big side never shuffles for the join.
    Declared(
      "ext_rel_skew_salted",
      (s, d) => {
        val ev = Tables.events(s, d)
        val dim = ev.select("event_type").distinct()
          .withColumn("type_code", row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy("event_type")))
        Skew.saltedJoin(ev, dim, "event_type", salt = 8, distributeBy = "event_id")
          .groupBy("event_type", "type_code")
          .agg(count(lit(1)).as("n"),
            FixedPoint.sumCents(col("value")).as("__cents"))
          .select(col("event_type"), col("type_code"), col("n"),
            FixedPoint.outCents(col("__cents")).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""WITH dim AS (
                SELECT event_type,
                       ROW_NUMBER() OVER (ORDER BY event_type) AS type_code
                FROM (SELECT DISTINCT event_type FROM events)),
              j AS (
                SELECT e.event_type, d.type_code, e.value
                FROM events e JOIN dim d USING (event_type))
              SELECT event_type, type_code, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_value
              FROM j GROUP BY event_type, type_code ORDER BY event_type""")),

    // Triangle/wedge census ([[Graph.triangleStats]]) of the MinHash-
    // LSH candidate graph: transitivity (3·triangles/wedges) is the
    // dedup-policy diagnostic — a highly transitive pair graph means
    // pairwise drops under-merge and the component policy is worth its
    // iterative cost. Ordered wedge enumeration (a<b<c) counts each
    // triangle exactly once; all-integer output, so the oracle replays
    // the same joins bit-for-bit.
    Declared(
      "ext_graph_triangles",
      (s, d) => {
        // same checkpointed candidate relation the verified-pairs
        // pipeline uses (ext_dedup_lsh_verified): the census and the
        // verify stage are two consumers of ONE candidate generation
        val cands = Dedup.minhashLshCandidates(Tables.documents(s, d),
          "doc_id", "text", k = 16, rowsPerBand = 4, maxBucket = MaxBucket)
        Graph.triangleStats(cands, "doc_a", "doc_b",
          cacheTag = "query/graph_triangles")
      },
      Some(s"""WITH $minhashSigCte,
               okb AS (
                 SELECT band, sig FROM sigs
                 GROUP BY band, sig HAVING COUNT(*) <= $MaxBucket),
               sig2 AS (SELECT sigs.* FROM sigs JOIN okb USING (band, sig)),
               e AS (
                 SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                 FROM sig2 a JOIN sig2 b
                   ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
               deg AS (
                 SELECT node, COUNT(*) AS d FROM (
                   SELECT a AS node FROM e UNION ALL SELECT b FROM e)
                 GROUP BY node),
               tri AS (
                 SELECT COUNT(*) AS n_triangles
                 FROM e e1
                 JOIN e e2 ON e1.b = e2.a
                 JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
               SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
                      (SELECT COUNT(*) FROM e) AS n_edges,
                      (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
                      (SELECT n_triangles FROM tri) AS n_triangles""")),

    // Exact z-score anomaly gate ([[Stats.zOutlierFlags]]) over event
    // values in cents: |x−μ| > 3σ decided by integer cross-
    // multiplication ((n·x−s)² > 9·(n·q−s²), DECIMAL/HUGEINT exact on
    // both engines) — no division, no sqrt, no float, so a borderline
    // event cannot flip across engines. Per-type outlier counts + id
    // checksums pin exact membership.
    Declared(
      "ext_stats_outliers",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
        Stats.zOutlierFlags(ev, Seq("event_type"), col("cents"), z = 3)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("__is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
            sum(when(col("__is_outlier"), col("event_id")).otherwise(0L)).as("id_checksum"))
          .orderBy("event_type")
      },
      Some("""WITH v AS (
                SELECT event_id, event_type,
                       CAST(round(value * 100) AS BIGINT) AS c
                FROM events),
              m AS (
                SELECT event_type, COUNT(c) AS n,
                       CAST(SUM(c) AS BIGINT) AS s,
                       CAST(SUM(c * c) AS BIGINT) AS q
                FROM v GROUP BY event_type),
              f AS (
                SELECT v.event_id, v.event_type,
                       (CAST(n AS HUGEINT) * CAST(c AS HUGEINT) - CAST(s AS HUGEINT))
                         * (CAST(n AS HUGEINT) * CAST(c AS HUGEINT) - CAST(s AS HUGEINT))
                         > 9 * (CAST(n AS HUGEINT) * CAST(q AS HUGEINT)
                                - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS is_out
                FROM v JOIN m USING (event_type))
              SELECT event_type, COUNT(*) AS n,
                     CAST(SUM(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                     CAST(SUM(CASE WHEN is_out THEN event_id ELSE 0 END) AS BIGINT) AS id_checksum
              FROM f GROUP BY event_type ORDER BY event_type""")),

    // PMI collocations ([[Search.pmiPairs]]): top-20 term pairs by
    // document-co-occurrence pointwise mutual information. The
    // co-occurrence count comes from the posting-list self-join on
    // doc_id (Σ v² per doc, df-bounded); ln's argument is one division
    // of exact integer products, rank pinned by round(·,9) +
    // lexicographic tie-break.
    Declared(
      "ext_text_pmi",
      (s, d) =>
        Search.pmiPairs(Tables.documents(s, d), "doc_id", "text",
          k = 20, minDf = 2),
      Some("""WITH p AS (
                SELECT DISTINCT doc_id, w AS term FROM (
                  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
                WHERE w <> ''),
              df AS (
                SELECT term, COUNT(*) AS df FROM p
                GROUP BY term HAVING COUNT(*) >= 2),
              p2 AS (SELECT p.doc_id, p.term, df.df FROM p JOIN df USING (term)),
              pr AS (
                SELECT a.term AS t1, b.term AS t2,
                       a.df AS df1, b.df AS df2, COUNT(*) AS c_ab
                FROM p2 a JOIN p2 b
                  ON a.doc_id = b.doc_id AND a.term < b.term
                GROUP BY 1, 2, 3, 4),
              n AS (SELECT COUNT(*) AS n_docs FROM documents),
              sc AS (
                SELECT t1, t2, c_ab,
                       ln(CAST(n_docs * c_ab AS DOUBLE) / CAST(df1 * df2 AS DOUBLE)) AS pmi
                FROM pr CROSS JOIN n),
              rk AS (
                SELECT t1, t2, c_ab,
                       ROW_NUMBER() OVER (ORDER BY round(pmi, 9) DESC, t1, t2) AS rk
                FROM sc)
              SELECT rk, t1, t2, c_ab FROM rk WHERE rk <= 20 ORDER BY rk""")),

    // Sliding event-time windows (batch): 2-hour windows every hour —
    // each event contributes to exactly width/slide = 2 overlapping
    // windows. Spark's native window(ts, width, slide) generates the
    // window structs map-side (a Generate, no join, no shuffle beyond
    // the aggregation); the oracle reproduces the window lattice by
    // unnesting the 2 per-event window starts. Complements
    // dq14_tumbling_window (slide = width) — the overlap is what a
    // rolling-rate monitor needs.
    Declared(
      "ext_rel_sliding_window",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"),
            FixedPoint.sumCents(col("value")).as("__cents"))
          .select(
            date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("event_type"), col("n"),
            FixedPoint.outCents(col("__cents")).as("v"))
          .orderBy("ws", "event_type"),
      Some("""WITH x AS (
                SELECT event_type, value,
                       date_trunc('hour', ts) - unnest([INTERVAL 0 HOUR, INTERVAL 1 HOUR]) AS w
                FROM events)
              SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS ws, event_type,
                     COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS v
              FROM x GROUP BY ws, event_type ORDER BY ws, event_type""")),

    // Per-group bounded top-k ([[graft.functions.TopK]]): top-5 events
    // by value within each event_type through the k-heap typed
    // Aggregator — the buffer never exceeds k, partials merge
    // map-side, k rows per group cross the shuffle (the window-rank
    // formulation the ORACLE uses sorts whole groups instead — fine
    // for DuckDB at sf0.1, the thing this operator exists to avoid at
    // 100 TB).
    Declared(
      "ext_rel_group_topk",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("cents"))
        ev.groupBy("event_type")
          .agg(graft.functions.TopK.topK(5)(col("cents"), col("event_id")).as("top"))
          .select(col("event_type"), posexplode(col("top")))
          .select(col("event_type"), (col("pos") + 1).cast("long").as("rk"),
            col("col.id").as("event_id"), col("col.score").as("cents"))
          .orderBy("event_type", "rk")
      },
      Some("""WITH v AS (
                SELECT event_type, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                         ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id) AS rk
                FROM events)
              SELECT event_type, rk, event_id, cents FROM v
              WHERE rk <= 5 ORDER BY event_type, rk""")),

    // Fuzzy probe→vocabulary matching ([[Search.fuzzyVocabMatch]]):
    // spell-correction over the corpus vocabulary by Levenshtein ≤ 2
    // with length-band blocking, candidates ranked by document
    // frequency. Both engines implement the identical DP distance, so
    // the full match set is exact; one probe ("zzz") is a deliberate
    // no-match pinning that blocking prunes rather than fabricates.
    Declared(
      "ext_text_fuzzy",
      (s, d) =>
        Search.fuzzyVocabMatch(Tables.documents(s, d), "doc_id", "text",
            Seq("joni", "tabel", "vectr", "qery", "zzz"), maxDist = 2)
          .orderBy("probe", "dist", "term"),
      Some("""WITH p AS (
                SELECT DISTINCT doc_id, w AS term FROM (
                  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
                WHERE w <> ''),
              vocab AS (SELECT term, COUNT(*) AS df FROM p GROUP BY term),
              probes AS (
                SELECT unnest(['joni', 'tabel', 'vectr', 'qery', 'zzz']) AS probe)
              SELECT probe, levenshtein(term, probe) AS dist, term, df
              FROM vocab CROSS JOIN probes
              WHERE abs(len(term) - len(probe)) <= 2
                AND levenshtein(term, probe) <= 2
              ORDER BY probe, dist, term""")),

    // Training-sequence materialization: concatenate each packed bin's
    // documents in deterministic order and fingerprint the BYTES —
    // ext_pipeline_pack pins the doc→bin assignment, this pins the
    // assembled sequence itself (the md5 of the concatenation matches
    // only if both engines agree on membership, order, separator, and
    // every byte). collect_list is order-nondeterministic under
    // partial aggregation, so the list is array_sort'ed on the
    // (doc_id, text) struct before assembly — the engine-portable way
    // to make an aggregated concatenation deterministic.
    Declared(
      "ext_pipeline_concat",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), col("text"), col("n_chars"))
        Sampling.packBins(docs, Seq("lang"), col("doc_id"), col("n_chars"),
            budget = 4000)
          .groupBy("lang", "bin")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
            graft.ext.Hashing.h60(concat_ws(" ",
              transform(
                array_sort(collect_list(struct(col("doc_id"), col("text")))),
                x => x.getField("text")))).as("text_h"))
          .orderBy("lang", "bin")
      },
      Some("""WITH b AS (
                SELECT lang, doc_id, text, n_chars,
                       CAST((SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id)
                         - n_chars) // 4000 AS BIGINT) AS bin
                FROM documents)
              SELECT lang, bin, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS chars,
                     CAST('0x' || substr(md5(string_agg(text, ' ' ORDER BY doc_id)), 1, 15) AS BIGINT) AS text_h
              FROM b GROUP BY lang, bin ORDER BY lang, bin"""))
  )

  /** Tie-safe integer projection of a top-k listing (query_id,
    * neighbor_id, cos): per query — the row count, the count of
    * neighbors clearing the engine's OWN k-th score by ≥ 1e-9, and
    * the neighbor-id checksum of that clear-cut set. Cross-engine
    * double noise (~1e-15, summation order) cannot move a neighbor
    * across the 1e-9 margin, so the projection hashes identically on
    * both engines even when rank-k ties make the raw listing
    * engine-dependent (scores within 1e-9 of the k-th are excluded on
    * BOTH sides by each engine's own threshold).
    */
  private def topkChecksum(listing: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // the k-th score via a window over the SAME partition key the
    // listing's rank window used — one pass, no added shuffle; a
    // groupBy+self-join would execute the (expensive) listing subtree
    // twice at scale
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
    val clear = col("cos") >= col("__kth") + 1e-9
    listing
      .withColumn("__kth", min(col("cos")).over(w))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(clear, 1L).otherwise(0L)).as("n_clear"),
        sum(when(clear, col("neighbor_id")).otherwise(0L)).as("id_checksum"))
      .orderBy("query_id")
  }

  /** DuckDB CTE text: brute-force scored pairs for the vec_id < 3
    * query panel — `sc(query_id, neighbor_id, cos)` + rank/top/kth.
    */
  private def bruteTopCte =
    s"""sc AS (
         SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos
         FROM embeddings q JOIN embeddings c
           ON q.vec_id < 3 AND q.vec_id <> c.vec_id),
       $rankTopKthCte"""

  /** DuckDB CTE text: rank an `sc(query_id, neighbor_id, cos)` set,
    * keep the top 5 per query, derive each query's k-th score.
    */
  private def rankTopKthCte =
    """rk AS (
         SELECT query_id, neighbor_id, cos,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id) AS rnk
         FROM sc),
       top AS (SELECT * FROM rk WHERE rnk <= 5),
       kth AS (SELECT query_id, MIN(cos) AS kc FROM top GROUP BY query_id)"""

  /** DuckDB twin of [[topkChecksum]]'s final aggregate. */
  private def topkChecksumSql =
    """SELECT query_id, COUNT(*) AS n_rows,
              CAST(SUM(CASE WHEN cos >= kc + 1e-9 THEN 1 ELSE 0 END) AS BIGINT) AS n_clear,
              CAST(SUM(CASE WHEN cos >= kc + 1e-9 THEN neighbor_id ELSE 0 END) AS BIGINT) AS id_checksum
       FROM top JOIN kth USING (query_id)
       GROUP BY query_id ORDER BY query_id"""
}
