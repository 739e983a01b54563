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

  /** Argmax over per-language score columns with a fixed
    * first-listed-wins tie-break, 'und' when no list hits. The inputs
    * MUST be cheap references (each score is referenced up to
    * 2·|langs|−1 times in the CASE tree) — see [[withLangId]].
    */
  private def argmaxLang(scored: Seq[(String, Column)]): Column =
    scored.zipWithIndex.foldLeft(lit("und")) { case (acc, ((lang, score), idx)) =>
      val beatsEarlier = scored.take(idx).map(_._2).foldLeft(lit(true))((a, s) => a && score > s)
      val tiesLater = scored.drop(idx + 1).map(_._2).foldLeft(lit(true))((a, s) => a && score >= s)
      when(score > 0 && beatsEarlier && tiesLater, lang).otherwise(acc)
    }

  /** Heuristic language-ID: argmax of stopword hit counts, appended to
    * `docs` as column `out`. Two projections, deliberately staged so
    * the expensive work runs ONCE per row:
    *
    *   1. score: ONE fused tokenize+count pass over the text bytes
    *      ([[graft.functions.StopwordHits]]) emitting an array<int> of
    *      per-language hits — no token array is ever materialized;
    *   2. argmax: a CASE tree over cheap element_at references.
    *
    * The staged `__scores` alias is non-cheap and multiply-referenced,
    * so Catalyst's CollapseProject keeps the boundary — a single-Column
    * formulation instead inlines the whole scoring tree at every CASE
    * reference (28 copies of `split(text)` for 4 languages — 28
    * redundant tokenization passes per row at scale), and even staged
    * `size(filter(split))` columns pay an interpreted lambda per token
    * per language (~2× the parquet text-scan cost measured at sf0.1).
    */
  def withLangId(docs: DataFrame, textCol: String, out: String = "predicted"): DataFrame = {
    val keep = docs.columns.toSeq.map(col)
    val scored = docs.select(
      keep :+ graft.functions.StopwordHits
        .stopwordHits(col(textCol), stopwords.map(_._2)).as("__scores"): _*)
    val refs = stopwords.zipWithIndex.map { case ((lang, _), i) =>
      (lang, col("__scores")(i))
    }
    scored.select(keep :+ argmaxLang(refs).as(out): _*)
  }

  /** Engine-portable text normalization — the standard pass before
    * hashing/dedup so trivial formatting variants (case, punctuation,
    * whitespace runs) collapse to one canonical form: lower-case,
    * non-[a-z0-9 ] → space, whitespace runs collapsed, trimmed. Pure
    * codegen projection; deliberately restricted to character classes
    * whose regex semantics are identical in Java (Spark) and RE2
    * (DuckDB), so the oracle reproduces it byte-for-byte.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** HTML/markup → text extraction, the ingest front door of a web
    * training corpus: drop `<script>`/`<style>` blocks wholesale
    * (their CONTENT is code, not text — tag-stripping alone would
    * leak it into the corpus), strip remaining tags, decode the
    * common entities (`&amp;` LAST, so `&amp;lt;` decodes to the
    * literal `&lt;` and not to `<` — the classic double-decode bug),
    * and collapse whitespace. Pure codegen regexp/replace chain over
    * patterns whose Java-vs-RE2 semantics agree, same stance as
    * [[normalize]]. This is the markup-shaped 95% case, not a
    * browser: malformed nesting degrades to extra whitespace, never
    * to an exception.
    */
  def stripMarkup(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&nbsp;", " "), "&amp;", "&")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Entity-escape text for embedding in markup (`&` first — the
    * inverse composition order of [[stripMarkup]]'s decode).
    */
  def escapeMarkup(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;")

  /** Canonical form of a URL for crawl dedup — the variants that don't
    * change the fetched resource collapse to one key: scheme and host
    * lowercase, leading `www.` and explicit default ports (`:80`,
    * `:443`) dropped, fragment dropped, trailing path slash dropped,
    * tracking query params (`utm_*`, `fbclid`, `gclid`) removed with
    * the remaining params kept IN ORDER (param reordering is not
    * assumed safe). A string that doesn't parse as `scheme://host…`
    * passes through unchanged — never null out an id column.
    *
    * Pure map-side codegen (regexp extracts + one higher-order array
    * filter); every pattern is single-match and Java-vs-RE2 agreeing,
    * so the DuckDB twin canonicalizes identically. One scan at 100 TB.
    */
  def canonicalUrl(url: Column): Column = {
    val u0 = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(u0, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(u0, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
        "^www\\.", ""),
      ":(80|443)$", "")
    val rest = regexp_extract(u0, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/$", "")
    val q = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = filter(split(q, "&"),
      x => !(x.rlike("^(utm_|fbclid=|gclid=)") || x === lit("")))
    when(scheme === "" || host === "", url).otherwise(
      concat(scheme, lit("://"), host, path,
        when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
          .otherwise(lit(""))))
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

  /** Append `n_tokens`, `n_distinct`, `ttr_decile` to `docs` without
    * dropping any column — the map-side quality gate of a curation
    * pipeline ([[Curation]]): unlike [[qualityFeatures]] there is no
    * join-back by id, so at 100 TB the gate costs zero shuffles. Same
    * staged-projection idiom: `__toks` is non-cheap and multiply
    * referenced, so CollapseProject keeps the boundary and the split
    * runs once per row.
    */
  def withQualityFeatures(docs: DataFrame, textCol: String): DataFrame = {
    val keep = docs.columns.toSeq.map(col)
    docs.select(keep :+ split(col(textCol), " ").as("__toks"): _*)
      .select(keep ++ Seq(
        size(col("__toks")).as("n_tokens"),
        size(array_distinct(col("__toks"))).as("n_distinct")): _*)
      .withColumn("ttr_decile", expr("(n_distinct * 10) div n_tokens"))
  }

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

  /** Within-document repetition: per doc, total vs distinct word
    * n-gram occurrences — the repeated-n-gram quality filter (a doc
    * whose trigrams are mostly repeats is boilerplate/spam, the
    * classic "repetition removal" gate that token-type ratio alone
    * misses at n>1). Shape: map-side n-gram generate → one groupBy
    * per doc over 12-byte (doc_id, hash) rows, partial-agg map-side;
    * hashing is the engine-portable [[Hashing.h32]], so any (rare)
    * collision is IDENTICAL on the oracle side and cannot diverge.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame =
    Dedup.rawNgrams(docs, idCol, textCol, n)
      .select(col("doc_id"), Hashing.h32(col("shingle")).as("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("g")).as("n_distinct"))

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

  /** Rolling-hash (Rabin–Karp) document fingerprint: min polynomial
    * hash over all k-byte windows, O(n) per doc via
    * [[graft.functions.RollingHashMin]] — a pure codegen projection,
    * no explode/shuffle at all (vs the word-shingle winnowing path,
    * which generates a row per shingle). NULL for docs shorter than k.
    */
  def rollingFingerprints(docs: DataFrame, idCol: String, textCol: String,
                          k: Int = 8): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.functions.RollingHashMin.rollingHashMin(col(textCol), k).as("roll_fp"))

  /** PII-redaction rules, applied in list order: (name, pattern,
    * replacement token). Patterns are deliberately restricted to
    * constructs with identical semantics in Java regex (Spark) and RE2
    * (DuckDB) — character classes, greedy counted/unbounded repetition,
    * no lookaround/backrefs — so the oracle reproduces every match
    * boundary byte-for-byte. Order matters: emails first (their local
    * parts contain digit runs), then dotted quads, then bare long digit
    * runs; replacement tokens contain no digits, so a later rule can
    * never re-match inside an earlier rule's output.
    */
  val redactRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("number", "[0-9]{9,}", "<NUM>"))

  /** Text with all [[redactRules]] applied in order — the map-side
    * PII-scrub pass of a curation pipeline. Three codegen'd
    * regexp_replace passes, no shuffle, no UDF.
    */
  def redact(text: Column): Column =
    redactRules.foldLeft(text) { case (t, (_, pat, tok)) =>
      regexp_replace(t, pat, tok)
    }

  /** Per-document redaction audit: match counts per rule plus the
    * redacted text — what a compliance gate logs before training data
    * ships. Each rule COUNTS on the same intermediate text it REPLACES
    * on (rule k sees rule k-1's output), so counts and replacements
    * can never disagree. One staged projection per rule: the
    * intermediate text alias is non-cheap and referenced twice (count
    * + replace), so CollapseProject keeps the stage boundary and each
    * regex pass runs once per row.
    */
  def redactStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val start = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
    val done = redactRules.foldLeft((start, Seq.empty[String])) {
      case ((df, counts), (name, pat, tok)) =>
        val cnt = s"n_$name"
        (df.select(Seq(col("doc_id")) ++ counts.map(col) ++ Seq(
          regexp_count(col("__t"), lit(pat)).as(cnt),
          regexp_replace(col("__t"), pat, tok).as("__t")): _*),
          counts :+ cnt)
    }._1
    done.withColumnRenamed("__t", "redacted")
  }

  /** URL pattern for [[urlDomains]]: scheme + host charset (path/query
    * stop at the first `/` or `?`, which the class excludes) — same
    * Java/RE2-portable discipline as [[redactRules]].
    */
  val urlRe: String = "https?://[A-Za-z0-9.-]+"

  /** Per-domain URL census over a corpus: (domain, n_urls, n_docs) —
    * the domain-level statistics a curation pipeline filters on
    * (blocklists, per-domain caps, source mix). Shape: map-side
    * extract-all + explode (rows ∝ URL occurrences, never corpus²),
    * one partial-aggregated groupBy whose output is bounded by the
    * number of distinct domains at any input size.
    */
  /** Perplexity-style quality scoring under the corpus's own unigram
    * model: per-token surprisal −ln(c(w)/N) summed per document — the
    * classic LM-filtering gate (very low average surprisal ≈
    * boilerplate/repetition, very high ≈ noise/garbled text), here
    * with the corpus itself as the model so no external LM is needed.
    *
    * Portability discipline: surprisal is computed ONCE PER DISTINCT
    * WORD (vocabulary-sized, so float rounding happens ~|V| times,
    * not once per token) as `round(ln(N/c)·1e6)` — a single double
    * division and one ln on identical inputs in both engines, scaled
    * and rounded to an exact BIGINT that then sums associatively.
    * The 1e6 scale leaves ~9 decimal digits of headroom between a
    * double's ~1e-15 relative ln error and the 0.5 rounding margin
    * (an e9 scale left only ~3 — a 1-ulp engine disagreement near a
    * half-integer could flip a word's BIGINT and grow riskier with
    * |V|), while still resolving counts apart to one part in 1e6 —
    * far finer than any real surprisal tie. Per-doc output is
    * all-integer: (n_tokens, surprisal_e6 sum).
    *
    * 100 TB shape: one vocabulary-sized groupBy (Heaps-law bounded),
    * one scalar total, then tokens equi-join the vocabulary with an
    * EXPLICIT broadcast hint — the vocabulary is Heaps-law bounded
    * (always broadcastable) but sits under an aggregate whose size
    * estimate is unreliable, and a sort-merge fallback would shuffle
    * the full token stream keyed by WORD, the corpus's worst skew key
    * ("the"). Broadcast makes the join map-side: the corpus scans
    * once and no token row ever crosses an exchange.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("__w"))
    val counts = words.groupBy("__w").agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum(col("__c")).as("__n"))
    val vocab = counts.crossJoin(broadcast(total))
      .select(col("__w"),
        round(log(col("__n").cast("double") / col("__c")) * 1e6)
          .cast("long").as("__sp"))
    words.join(broadcast(vocab), "__w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("__sp")).as("surprisal_e6"))
  }

  def urlDomains(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(regexp_extract_all(col(textCol), lit(urlRe), lit(0))).as("url"))
      .select(col("doc_id"), regexp_replace(col("url"), "^https?://", "").as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"), countDistinct(col("doc_id")).as("n_docs"))
}
