package graft.queries

import graft.Tables
import graft.ext.{Dedup, Multimodal, Similarity, TextStats}
import org.apache.spark.sql.functions._

/** Declared queries for the LLM-pipeline extension operators
  * (north_star): dedup, text analysis, similarity search, multimodal.
  * Oracle SQL is provided wherever the operator is expressible in
  * DuckDB SQL with engine-portable arithmetic (integer-only outputs,
  * md5-based hashing — see [[graft.ext.Hashing]]); the float-scored
  * similarity queries are rows-only by design (SURVEY §2.4 note).
  */
object ExtQueries {

  /** Shared DuckDB CTE text: distinct (doc_id, token) with 32-bit hash. */
  private val tokCte =
    """tok AS (
         SELECT DISTINCT doc_id, w FROM (
           SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE w <> ''),
       h AS (
         SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS hv FROM tok)"""

  /** Shared DuckDB CTE text: distinct word-trigram shingles per doc. */
  private val shingleCte =
    """tp AS (
         SELECT doc_id, i AS pos, string_split(text, ' ')[i + 1] AS w
         FROM documents, range(len(string_split(text, ' '))) t(i)),
       sh0 AS (
         SELECT doc_id,
                w || ' ' || LEAD(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                  || ' ' || LEAD(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS shingle
         FROM tp),
       sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL)"""

  val all: Seq[Declared] = Seq(

    // --- Deduplication ------------------------------------------------
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
      Some(s"""WITH $tokCte,
               mh AS (
                 SELECT doc_id, i,
                        MIN(((2*i + 3) * hv + (5*i + 7)) % 2147483647) AS minh
                 FROM h, range(16) t(i) GROUP BY doc_id, i),
               sigs AS (
                 SELECT doc_id, CAST(i // 4 AS INT) AS band,
                        string_agg(CAST(minh AS VARCHAR), ',' ORDER BY i) AS sig
                 FROM mh GROUP BY doc_id, band),
               buckets AS (
                 SELECT band, sig, COUNT(*) AS cnt FROM sigs GROUP BY band, sig)
               SELECT band,
                      CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_buckets,
                      CAST(SUM((cnt * (cnt - 1)) // 2) AS BIGINT) AS cand_pairs,
                      CAST(SUM(cnt) AS BIGINT) AS n_docs
               FROM buckets GROUP BY band ORDER BY band""")),

    Declared(
      "ext_dedup_simhash",
      (s, d) =>
        Dedup.simhash(Tables.documents(s, d), "doc_id", "text")
          .select((col("simhash") % 64).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket"),
      Some(s"""WITH $tokCte,
               bits AS (
                 SELECT doc_id, b,
                        SUM(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
                 FROM h, range(16) t(b) GROUP BY doc_id, b),
               simh AS (
                 SELECT doc_id,
                        SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
                 FROM bits GROUP BY doc_id)
               SELECT CAST(simhash % 64 AS BIGINT) AS bucket, COUNT(*) AS n
               FROM simh GROUP BY bucket ORDER BY bucket""")),

    Declared(
      "ext_dedup_ngram_jaccard",
      (s, d) =>
        Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text")
          .where(col("inter") >= 2)
          .orderBy(col("inter").desc, col("doc_a"), col("doc_b"))
          .limit(20),
      Some(s"""WITH $shingleCte,
               card AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
               pairs AS (
                 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                 FROM sh a JOIN sh b
                   ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
               SELECT doc_a, doc_b, inter, ca.n + cb.n - inter AS uni
               FROM pairs
               JOIN card ca ON doc_a = ca.doc_id
               JOIN card cb ON doc_b = cb.doc_id
               WHERE inter >= 2
               ORDER BY inter DESC, doc_a, doc_b LIMIT 20""")),

    // Embedding near-dup: pairs above a cosine threshold via LSH
    // candidate buckets. Float-scored → rows-only (no oracle).
    Declared(
      "ext_dedup_embedding",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.lshTopK(emb, emb, "vec_id", "embedding", k = 3)
          .where(col("cos") >= 0.5)
          .groupBy("query_id").agg(count(lit(1)).as("n_near"))
          .agg(count(lit(1)).as("docs_with_near_dup"), sum("n_near").as("n_pairs"))
      },
      None),

    // --- Text analysis ------------------------------------------------
    Declared(
      "ext_text_langid",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("lang"), TextStats.langId(col("text")).as("predicted"))
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

    // --- Multimodal ---------------------------------------------------
    Declared(
      "ext_multimodal_meta",
      (s, d) =>
        Multimodal.decodeImageMeta(
          Multimodal.fromText(Tables.documents(s, d), "doc_id", "text"))
          .agg(count(lit(1)).as("n_images"),
            sum(col("n_bytes")).as("sum_bytes"),
            sum(col("width")).as("sum_width"),
            sum(col("height")).as("sum_height")),
      Some("""SELECT COUNT(*) AS n_images,
                     CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
                     CAST(SUM(octet_length(encode(text)) % 640 + 1) AS BIGINT) AS sum_width,
                     CAST(SUM(octet_length(encode(text)) * 7 % 480 + 1) AS BIGINT) AS sum_height
              FROM documents WHERE doc_id % 3 = 0""")),

    // --- Similarity search (float-scored → rows-only) -----------------
    Declared(
      "ext_sim_cosine_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 3),
          "vec_id", "embedding", k = 5)
          .orderBy("query_id", "rank")
      },
      None),

    Declared(
      "ext_sim_lsh_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.lshTopK(emb, emb.where(col("vec_id") < 3),
          "vec_id", "embedding", k = 5)
          .orderBy("query_id", "rank")
      },
      None)
  )
}
