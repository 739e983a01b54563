package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (north_star):
  * language-ID, quality scoring, token counting, fingerprinting. All
  * codegen'd built-ins (higher-order array functions + portable
  * hashing) — no UDFs in the hot path, so 100 TB scans stay inside
  * whole-stage codegen.
  */
object TextStats {

  /** Tiny per-language stopword lists for the n-gram/stopword-hit
    * language heuristic. Deliberately small and deterministic; real
    * pipelines would plug in a larger table (broadcast join) without
    * changing the shape.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  private def hits(textCol: Column, words: Seq[String]): Column =
    size(filter(split(textCol, " "), x => x.isin(words.map(lit(_)): _*)))

  /** Heuristic language-ID: argmax of stopword hit counts with a fixed
    * tie-break order (list order above), 'und' (undetermined) when no
    * list hits. Pure CASE/array arithmetic — identical in DuckDB.
    */
  def langId(textCol: Column): Column = {
    val scored = stopwords.map { case (lang, words) => (lang, hits(textCol, words)) }
    // argmax with first-listed-wins tie-break: lang wins if its score is
    // strictly greater than every earlier lang's and >= every later one.
    val best = scored.zipWithIndex.foldLeft(lit("und")) { case (acc, ((lang, score), idx)) =>
      val beatsEarlier = scored.take(idx).map(_._2).foldLeft(lit(true))((a, s) => a && score > s)
      val tiesLater = scored.drop(idx + 1).map(_._2).foldLeft(lit(true))((a, s) => a && score >= s)
      when(score > 0 && beatsEarlier && tiesLater, lang).otherwise(acc)
    }
    best
  }

  /** Quality features per document: token count, distinct-token count,
    * type/token decile, mean token length ×10 (integer — portable).
    * The text is split ONCE into a `toks` column; downstream features
    * reference that column, so the (expensive) split never re-evaluates
    * — Catalyst keeps the projections separate because `toks` is
    * non-cheap and multiply-referenced.
    */
  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
        col(idCol).as("doc_id"),
        length(regexp_replace(col(textCol), " ", "")).as("n_nonspace_chars"),
        split(col(textCol), " ").as("toks"))
      .select(
        col("doc_id"),
        col("n_nonspace_chars"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_distinct"),
        expr("(n_distinct * 10) div n_tokens").as("ttr_decile"),
        expr("(n_nonspace_chars * 10) div n_tokens").as("mean_tok_len_x10"))

  /** Whitespace token count plus a BPE-ish subword count: alternating
    * letter-run / digit-run pieces capped at 4 chars — a deterministic
    * stand-in for a real BPE vocab, portable to SQL via ceil(len/4) on
    * letter runs.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).as("n_ws_tokens"),
      // each word contributes ceil(len/4) subword pieces
      expr(s"aggregate(split($textCol, ' '), 0, (acc, w) -> acc + CAST(ceil(length(w) / 4.0) AS INT))")
        .as("n_subword_tokens"))

  /** Content fingerprint (60-bit md5 prefix) and a winnowing-style
    * shingle fingerprint (min trigram-shingle hash) per doc. Two docs
    * with equal `winnow_fp` share their minimal shingle — a cheap
    * near-dup signal; `content_fp` equality is exact-dup (mod 2^-60
    * collisions).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val content = docs.select(col(idCol).as("doc_id"),
      Hashing.h60(col(textCol)).as("content_fp"))
    // min of shingle hashes — dedup unnecessary under min, so this
    // aggregates rawShingles directly (partial agg map-side)
    val winnow = Dedup.rawShingles(docs, idCol, textCol)
      .groupBy("doc_id")
      .agg(min(Hashing.h32(col("shingle"))).as("winnow_fp"))
    content.join(winnow, "doc_id")
  }
}
