package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines
  * (north_star; SURVEY §7.1 ext/). Four families:
  *
  *  - exact:        hash-groupBy on content (or an 8-byte fingerprint
  *                  so the shuffle ships hashes, not document bytes);
  *  - MinHash+LSH:  shingle → K minhashes → band → bucket-join — the
  *                  classic near-dup candidate generator; cost is
  *                  linear in corpus size, never pairwise;
  *  - SimHash:      64-bit-ish signature whose hamming distance tracks
  *                  cosine similarity of the token multiset;
  *  - n-gram Jaccard: exact pairwise verification, applied only to
  *                  candidate pairs (here: pairs sharing a shingle).
  *
  * Everything is built from codegen'd built-ins over the portable
  * [[Hashing]] base so results are engine-checkable (no UDFs).
  */
object Dedup {

  /** Exact dedup: keep one row per distinct value of `on`. At 100 TB,
    * prefer `exactByFingerprint` — dropDuplicates on a long text column
    * shuffles the full text bytes.
    */
  def exact(df: DataFrame, on: Seq[String]): DataFrame =
    df.dropDuplicates(on)

  /** Exact dedup shipping only an 8-byte fingerprint + tie-break id
    * through the shuffle: rows whose `textCol` collide on a 60-bit
    * content hash are deduplicated (keeping the smallest `idCol`).
    * False-collision probability at 60 bits is ~n²/2^61.
    */
  def exactByFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(Hashing.h60(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Distinct (doc, token, token-hash) triples — the shared first stage
    * of MinHash and SimHash. Tokens split on single spaces (the
    * documents corpus is space-separated word soup; callers with richer
    * text pass their own tokenizer output).
    */
  def tokenHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .distinct()
      .withColumn("hv", Hashing.h32(col("w")))

  /** MinHash signatures: one row per (doc_id, i) with the i-th minhash,
    * i ∈ [0, k). The permutation-index table is tiny and broadcast; the
    * heavy groupBy is a partial-aggregated min — Catalyst combines
    * map-side, so the shuffle carries ≤ k rows per doc.
    */
  def minhash(tok: DataFrame, k: Int): DataFrame = {
    val spark = tok.sparkSession
    val perms = broadcast(spark.range(k).select(col("id").cast("int").as("i")))
    tok.crossJoin(perms)
      .groupBy("doc_id", "i")
      .agg(min(Hashing.permute(col("hv"), col("i"))).as("minh"))
  }

  /** LSH banding: concat each band's minhashes into a signature string;
    * docs sharing (band, sig) are near-dup candidates. Returns one row
    * per (doc_id, band, sig).
    */
  def lshBands(sigs: DataFrame, rowsPerBand: Int): DataFrame =
    sigs
      .withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy("doc_id", "band")
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("minh")))),
          x => x.getField("minh").cast("string"))).as("sig"))

  /** Per-band LSH bucket census: how many buckets hold ≥2 docs, how
    * many candidate pairs they imply, and the total docs per band —
    * integer-only, so oracle-checkable. A full dedup would follow with
    * `ngramJaccardPairs` on the candidates.
    */
  def minhashLshCensus(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 16, rowsPerBand: Int = 4): DataFrame =
    lshBands(minhash(tokenHashes(docs, idCol, textCol), k), rowsPerBand)
      .groupBy("band", "sig").agg(count(lit(1)).as("cnt"))
      .groupBy("band")
      .agg(sum(when(col("cnt") >= 2, 1).otherwise(0)).as("dup_buckets"),
        sum(expr("(cnt * (cnt - 1)) div 2")).as("cand_pairs"),
        sum(col("cnt")).as("n_docs"))
      .orderBy("band")

  /** 16-bit SimHash per doc over distinct token hashes: bit b is set
    * when more tokens have bit b set than clear. (16 bits keeps every
    * intermediate in BIGINT range on both engines; widen by raising
    * `bits` up to 60.)
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    val bitIdx = broadcast(spark.range(bits).select(col("id").cast("int").as("b")))
    tokenHashes(docs, idCol, textCol)
      .crossJoin(bitIdx)
      .groupBy("doc_id", "b")
      .agg(sum(when(expr("shiftright(hv, b) & 1") === 1, 1).otherwise(-1)).as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0, expr("shiftleft(1, b)")).otherwise(0)).as("simhash"))
  }

  /** Distinct word-trigram shingles per doc, built relationally
    * (posexplode + window lead — both engines express this identically).
    * `concat` (not concat_ws) so trailing partial shingles null out.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tp = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val win = Window.partitionBy("doc_id").orderBy("pos")
    tp.select(col("doc_id"),
        concat(col("w"), lit(" "), lead("w", 1).over(win),
          lit(" "), lead("w", 2).over(win)).as("shingle"))
      .where(col("shingle").isNotNull)
      .distinct()
  }

  /** Pairwise n-gram Jaccard via a shingle-equijoin: only pairs that
    * share ≥1 shingle are ever materialized (candidate generation and
    * verification in one shuffle). Emits (doc_a, doc_b, inter, uni);
    * jaccard = inter/uni left to the caller so the result stays
    * integer-exact. At 100 TB you'd run this on LSH candidates only and
    * salt hot shingles; here the shingle join IS the candidate filter.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = shingles(docs, idCol, textCol)
    val card = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(card.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(card.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("ca.n") + col("cb.n") - col("inter")).as("uni"))
  }
}
