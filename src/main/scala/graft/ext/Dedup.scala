package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (north_star; SURVEY §7.1 ext/). Four families:
  *
  *  - exact:        hash-groupBy on content (or an 8-byte fingerprint
  *                  so the shuffle ships hashes, not document bytes);
  *  - MinHash+LSH:  shingle → K minhashes → band → bucket-join — the
  *                  classic near-dup candidate generator; cost is
  *                  linear in corpus size, never pairwise;
  *  - SimHash:      bit signature whose hamming distance tracks
  *                  cosine similarity of the token multiset;
  *  - n-gram Jaccard: exact pairwise verification over hashed,
  *                  frequency-capped shingles — run on LSH candidates
  *                  (`ngramJaccardOnCandidates`) at scale.
  *
  * Everything is built from codegen'd built-ins over the portable
  * [[Hashing]] base so results are engine-checkable (no UDFs).
  *
  * 100 TB shape notes: MinHash/SimHash are each ONE groupBy whose
  * shuffle carries exactly one row per document (k minhash columns /
  * one signature), with Catalyst partial aggregation map-side; the
  * Jaccard self-join operates on 8-byte shingle hashes with hot
  * shingles (df > cap) dropped, so no posting list explodes the join.
  */
object Dedup {

  /** Exact dedup: keep one row per distinct value of `on`. Keeps an
    * arbitrary row per group (Spark semantics); use
    * `exactByFingerprint` for a deterministic winner and a shuffle
    * that ships hashes instead of full rows for wide text columns.
    */
  def exact(df: DataFrame, on: Seq[String]): DataFrame =
    df.dropDuplicates(on)

  /** Exact dedup by 60-bit content fingerprint, keeping the smallest
    * `idCol` per duplicate set. Shape: groupBy(fp).agg(min(id)) then a
    * semi-join on the id — two hash shuffles of (8-byte, 8-byte)
    * pairs; no global sort, no window, and the text bytes never cross
    * the wire. False-collision probability at 60 bits is ~n²/2^61.
    */
  def exactByFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = df
      .select(col(idCol).as("__id"), Hashing.h60(col(textCol)).as("__fp"))
      .groupBy("__fp").agg(min(col("__id")).as("__id"))
      .select("__id")
    df.join(keep, col(idCol) === col("__id"), "left_semi")
  }

  /** The 60-bit fingerprint store of a corpus: one 8-byte row per
    * distinct content. This is the artifact an INCREMENTAL pipeline
    * maintains between ingests — at 100 TB the store is ~0.3% the
    * corpus size, and deduping a new batch against it never re-reads
    * corpus text ([[incrementalExact]]). Union the new batch's kept
    * fingerprints back in to roll the store forward.
    */
  def fingerprintStore(df: DataFrame, textCol: String): DataFrame =
    df.select(Hashing.h60(col(textCol)).as("fp")).distinct()

  /** Incremental exact dedup: keep the rows of `batch` whose content
    * is new — not in `store` (a [[fingerprintStore]]) and, within the
    * batch, the smallest `idCol` per duplicate set. Shape: the batch
    * (small) hashes map-side, left-anti joins the store on the 8-byte
    * fingerprint, then in-batch min-id dedup — corpus cost is ONE scan
    * of the store column, zero text bytes shuffled, independent of
    * corpus text size.
    */
  def incrementalExact(batch: DataFrame, idCol: String, textCol: String,
                       store: DataFrame): DataFrame = {
    val hashed = batch.withColumn("__fp", Hashing.h60(col(textCol)))
    // NULL-SAFE fingerprint compare (<=>): h60(null text) is null, and
    // a plain === anti-join never matches null=null — a null-text row
    // would be re-admitted on EVERY batch (and, in the StreamIngest
    // deployment, append a fresh null fp to the store each time:
    // unbounded duplicate accumulation under the operator's
    // "a duplicate ingested a year ago is still dropped" contract).
    // With <=> null content is one ordinary content value, matching
    // the null-key discipline of [[Changelog.mergeBatch]] and
    // [[graft.ext.Curation.kAnonymize]]; <=> is still an equi-join
    // key, so the anti-join stays hash-joinable.
    val fresh = hashed.join(store, col("__fp") <=> store("fp"), "left_anti")
    // min-id per fingerprint as ONE window over the anti-join output
    // (same single shuffle on __fp a groupBy would cost), not a
    // groupBy + semi-join back onto `fresh`: the self-join referenced
    // the anti-join subtree twice, and Catalyst's semi/anti-join
    // pushdown through Union then SQUARES the duplication when batch
    // or store is a many-branch union (the @32 scale harness hit a
    // 111k-node physical plan, ~85 s of pure planning on a query
    // whose data work is ~2 s). Documented trade-off vs the groupBy
    // shape: the window forgoes map-side partial aggregation, so a
    // fingerprint duplicated k× IN ONE BATCH serializes k rows into
    // one sorted partition — fine for the operator's contract
    // (batches are the small side; cross-batch duplication is the
    // store's job), but a single batch KNOWN to be dominated by one
    // hot document should pre-collapse with groupBy(min(id)) against
    // a persisted `fresh` leaf instead. Tie semantics: exactly one
    // row survives per (__fp, min id) — a batch carrying bit-equal
    // rows under the same id keeps one of them, which IS dedup.
    val w = Window.partitionBy("__fp").orderBy(col(idCol))
    fresh.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__fp")
  }

  /** Debounce: drop a row when the PREVIOUS row of the same `keys`
    * (ordered by `tsCol` then `tieCols` — supply tie columns that
    * make the order total, or equal-ts rows debounce in an arbitrary
    * but fixed order) carries the same `contentCols` AND arrived
    * within `withinMs` — consecutive-duplicate suppression for
    * repeated clicks / double-fired webhooks / retried ingests.
    * Comparison is against the previous EVENT, not the previous
    * KEPT row: a burst of n identical events, each within the gap of
    * its predecessor, keeps only the first even if the burst spans
    * longer than the gap (each arrival "refreshes" the window — the
    * usual debounce). The compare is null-safe (`<=>` on the content
    * struct), so null content equals null content.
    *
    * Scale shape: one hash shuffle on the keys + one in-partition
    * sort serve the single lag() — the same single-windowed-scan cost
    * as [[TimeJoin.sessionize]], with per-key row count as the skew
    * contract.
    */
  def debounce(df: DataFrame, keys: Seq[String], tsCol: String,
               contentCols: Seq[String], withinMs: Long,
               tieCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "debounce needs at least one key column")
    require(contentCols.nonEmpty, "debounce needs content columns")
    require(withinMs > 0, s"withinMs=$withinMs must be positive")
    val w = Window.partitionBy(keys.toIndexedSeq.map(col): _*)
      .orderBy((tsCol +: tieCols).toIndexedSeq.map(col): _*)
    val c = struct(contentCols.toIndexedSeq.map(col): _*)
    val prevC = lag(c, 1).over(w)
    val prevTs = lag(col(tsCol), 1).over(w)
    // micros, not millis: unix_millis truncates sub-ms parts per
    // OPERAND, so a true gap within ±1 ms of the threshold could
    // flip against an exact-interval comparison elsewhere
    df.withColumn("__drop",
        prevTs.isNotNull && (c <=> prevC) &&
          unix_micros(col(tsCol)) - unix_micros(prevTs) <= withinMs * 1000L)
      .where(!col("__drop")).drop("__drop")
  }

  /** Distinct (doc, token, token-hash) triples — the shared first stage
    * of MinHash and SimHash. Tokens split on single spaces (the
    * documents corpus is space-separated word soup; callers with richer
    * text pass their own tokenizer output).
    *
    * The per-doc dedup is `array_distinct` BEFORE the explode — pure
    * map-side, identical to a global distinct on (doc_id, token) but
    * without its 1.5M-row exchange at sf0.1.
    */
  def tokenHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(split(col(textCol), " "))).as("w"))
      .where(col("w") =!= "")
      .withColumn("hv", Hashing.h32(col("w")))

  /** MinHash signature matrix: ONE row per doc with k minhash columns
    * `m0..m{k-1}` — all k universal-hash permutations evaluated per
    * token row inside one whole-stage-codegen'd aggregate, partial
    * map-side, so the shuffle carries a single k-column row per doc
    * (vs. the naive ×k row blowup of a crossJoin with a permutation
    * table).
    */
  def minhashSignatures(tok: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(i => min(Hashing.permute(col("hv"), lit(i))).as(s"m$i"))
    tok.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a signature matrix: one row per (doc_id, band)
    * with the band's minhashes comma-joined into a signature string;
    * docs sharing (band, sig) are near-dup candidates.
    */
  def lshBands(sigs: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    require(k % rowsPerBand == 0,
      s"k=$k must be a multiple of rowsPerBand=$rowsPerBand " +
        "(trailing minhashes would be silently dropped)")
    val nBands = k / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until rowsPerBand).map(r =>
          col(s"m${b * rowsPerBand + r}").cast("string")): _*).as("sig"))
    }
    sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Distinct candidate pairs (doc_a < doc_b) from an LSH banding: the
    * self-join is co-partitioned on (band, sig), so only same-bucket
    * docs ever meet — linear in corpus size for non-degenerate
    * buckets, never all-pairs.
    *
    * Buckets larger than `maxBucket` are skipped: a bucket of m docs
    * implies m²/2 pairs, so one degenerate cluster (boilerplate,
    * near-identical template docs — the sf0.1 corpus has a 2,676-doc
    * one) would alone produce millions of pairs and re-quadratic the
    * pipeline. Members of an over-cap bucket agree on a whole band of
    * minhashes — they ARE near-dups of each other; handle them as a
    * cluster (keep one representative) rather than pairwise.
    */
  def lshCandidatePairs(bands: DataFrame, maxBucket: Int = 64): DataFrame = {
    // deliberately NOT persisted: the banding is ~4 narrow rows/doc
    // and its three consumers (census + both self-join sides) reuse
    // the aggregate exchange; measured cold runs were 1-4s SLOWER with
    // a persist here (InMemoryRelation build + broken stage pipelining
    // outweigh the recompute)
    val bp = bands
    val ok = bp.groupBy("band", "sig").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") <= maxBucket).select("band", "sig")
    val b = bp.join(ok, Seq("band", "sig"))
    b.as("a")
      .join(b.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Degenerate LSH clusters: the over-cap buckets that
    * [[lshCandidatePairs]] SKIPS, reduced to what cluster-level dedup
    * needs — (band, sig, representative = min doc_id, size). Members
    * of an over-cap bucket agree on a whole band of minhashes (they
    * are near-dups of each other); at 100 TB the dedup action is
    * "keep the representative, drop or down-weight the rest", an
    * O(cluster) aggregate instead of the O(cluster²) pairwise work
    * the cap exists to avoid. Complements lshCandidatePairs: the two
    * together cover every bucket exactly once.
    */
  def lshDegenerateClusters(bands: DataFrame, maxBucket: Int = 64): DataFrame =
    bands.groupBy("band", "sig")
      .agg(min(col("doc_id")).as("rep_doc"), count(lit(1)).as("size"))
      .where(col("size") > maxBucket)

  /** End-to-end MinHash-LSH candidate generation (tokenize → minhash
    * signatures → banding → under-cap bucket pairs), memoized via
    * [[PlanCache.checkpointed]] keyed on the input plan and every
    * parameter: the candidate set is the small artifact (id pairs) a
    * two-stage near-dup pipeline re-reads many times — once to
    * verify, once to census, once to act — while its lineage is the
    * corpus-sized minhash subtree. Checkpointing truncates that
    * lineage out of every consumer plan and computes the subtree
    * once per corpus. (The BANDS relation stays deliberately
    * unpersisted — see [[lshCandidatePairs]] — it is the candidate
    * OUTPUT that is worth pinning, not the wide intermediate.)
    */
  def minhashLshCandidates(docs: DataFrame, idCol: String, textCol: String,
                           k: Int = 16, rowsPerBand: Int = 4,
                           maxBucket: Int = 64): DataFrame =
    PlanCache.checkpointed(
      s"lshCands/$idCol/$textCol/$k/$rowsPerBand/$maxBucket", docs) { d =>
      lshCandidatePairs(
        lshBands(minhashSignatures(tokenHashes(d, idCol, textCol), k),
          k, rowsPerBand),
        maxBucket)
    }

  /** Ingest-time near-dup candidates: (new doc, corpus doc) pairs
    * sharing any LSH bucket between a NEW batch's banding and a
    * standing corpus BAND STORE — the incremental twin of
    * [[lshCandidatePairs]] and the near-dup sibling of
    * [[incrementalExact]]. At 100 TB the store is a parquet table
    * written at corpus-build time (one narrow row per (doc, band));
    * ingest re-LSHes ONLY the delta and equi-joins it against the
    * store — the corpus text is never re-read and nothing quadratic
    * in corpus size runs.
    *
    * Store buckets larger than `maxBucket` are skipped, mirroring
    * [[lshCandidatePairs]]: a batch doc landing in a degenerate
    * bucket is a cluster-dup of its representative (handle via
    * [[lshDegenerateClusters]] policy), not pairwise work. Batch-
    * internal duplicates are a separate [[lshCandidatePairs]] call on
    * the batch banding alone.
    */
  def incrementalLshCandidates(batchBands: DataFrame, storeBands: DataFrame,
                               maxBucket: Int = 64): DataFrame = {
    val ok = storeBands.groupBy("band", "sig").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") <= maxBucket).select("band", "sig")
    batchBands.as("n")
      .join(storeBands.join(ok, Seq("band", "sig")).as("s"),
        col("n.band") === col("s.band") && col("n.sig") === col("s.sig") &&
          col("n.doc_id") =!= col("s.doc_id"))
      .select(col("n.doc_id").as("doc_new"), col("s.doc_id").as("doc_corpus"))
      .distinct()
  }

  /** Ingest-time SimHash near-dup: (new doc, corpus doc, dist) pairs
    * within hamming ≤ `maxDist` between a NEW batch's signatures and
    * a standing corpus SIGNATURE STORE — the SimHash sibling of
    * [[incrementalLshCandidates]], completing the incremental family
    * (exact fingerprints / MinHash-LSH bands / SimHash signatures all
    * dedup a delta against a store artifact without re-reading corpus
    * text). SimHash signatures are doc-local, so the store is exactly
    * the persisted [[simhashShared]] relation (8+8 bytes per doc)
    * written at corpus-build time; ingest hashes ONLY the batch.
    *
    * Candidates come from the same pigeonhole multi-index as
    * [[simhashNearPairs]] — segment-value equality on any of
    * `maxDist + 1` disjoint segments (exact, no recall loss) — but
    * joined batch-against-store instead of self-joined, so the work
    * is |batch| × bucket density, independent of corpus size. Store
    * segment buckets larger than `maxSegBucket` can be dropped
    * (boilerplate clusters: handle as clusters, not pairwise);
    * default is exact.
    */
  def incrementalSimhashCandidates(batchSigs: DataFrame, storeSigs: DataFrame,
                                   bits: Int = 60, maxDist: Int = 3,
                                   maxSegBucket: Int = Int.MaxValue): DataFrame = {
    val nSeg = maxDist + 1
    require(bits % nSeg == 0,
      s"bits=$bits must be divisible by maxDist+1=$nSeg segments")
    val storeSegs0 = segExplode(storeSigs, bits, nSeg)
    val storeSegs =
      if (maxSegBucket == Int.MaxValue) storeSegs0
      else {
        val ok = storeSegs0.groupBy("seg", "segv").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") <= maxSegBucket).select("seg", "segv")
        storeSegs0.join(ok, Seq("seg", "segv"))
      }
    segExplode(batchSigs, bits, nSeg).as("n")
      .join(storeSegs.as("s"),
        col("n.seg") === col("s.seg") && col("n.segv") === col("s.segv") &&
          col("n.doc_id") =!= col("s.doc_id"))
      .select(col("n.doc_id").as("doc_new"), col("s.doc_id").as("doc_corpus"),
        hamming(col("n.simhash"), col("s.simhash")).as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /** Per-band LSH bucket census: how many buckets hold ≥2 docs, how
    * many candidate pairs they imply, and the total docs per band —
    * integer-only, so oracle-checkable.
    */
  def minhashLshCensus(docs: DataFrame, idCol: String, textCol: String,
                       k: Int = 16, rowsPerBand: Int = 4): DataFrame =
    lshBands(minhashSignatures(tokenHashes(docs, idCol, textCol), k), k, rowsPerBand)
      .groupBy("band", "sig").agg(count(lit(1)).as("cnt"))
      .groupBy("band")
      .agg(sum(when(col("cnt") >= 2, 1).otherwise(0)).as("dup_buckets"),
        sum(expr("(cnt * (cnt - 1)) div 2")).as("cand_pairs"),
        sum(col("cnt")).as("n_docs"))
      .orderBy("band")

  /** SimHash per doc over distinct token hashes: bit b is set when
    * more tokens have bit b of their hash set than clear. All `bits`
    * per-bit tallies are computed as columns of ONE aggregate —
    * single shuffle row per doc, map-side partial agg — then folded
    * into the signature. Up to 32 bits the token hash is the 32-bit
    * [[Hashing.h32]] (oracle-portable); wider signatures (≤ 60, the
    * real-use width) draw bits from [[Hashing.h60]].
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    require(bits <= 60, "token hash is 60-bit; widen Hashing.h60 before raising bits")
    val hashed =
      if (bits <= 32) tokenHashes(docs, idCol, textCol)
      else
        docs.select(col(idCol).as("doc_id"),
            explode(array_distinct(split(col(textCol), " "))).as("w"))
          .where(col("w") =!= "")
          .withColumn("hv", Hashing.h60(col("w")))
    // branchless packed tallies: count ones per bit (shift+and, no
    // CASE) with THREE bit-counts packed into one long aggregate
    // column as 20-bit fields — a doc has far fewer than 2^20 distinct
    // tokens, so fields never carry into each other. One third the
    // aggregate-buffer columns (and per-row buffer writes) of the
    // naive one-column-per-bit layout; the majority sign is recovered
    // from 2·ones > n, algebraically identical to sum(±1) > 0.
    val nPack = (bits + 2) / 3
    val tallies = (0 until nPack).map { j =>
      val terms = (0 until 3).collect {
        case i if 3 * j + i < bits =>
          s"(shiftleft(shiftright(hv, ${3 * j + i}) & 1, ${20 * i}))"
      }
      sum(expr(terms.mkString(" + "))).as(s"p$j")
    } :+ count(lit(1)).as("n")
    val sig = (0 until bits).map { b =>
      val ones = expr(s"shiftright(p${b / 3}, ${20 * (b % 3)}) & 1048575")
      when(ones * 2 > col("n"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    hashed
      .groupBy("doc_id").agg(tallies.head, tallies.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** [[simhash]] as a PlanCache-shared relation keyed on (input plan,
    * bits): the signature table is the artifact every SimHash consumer
    * starts from — the bucket census, the near-pair multi-index, and
    * the component closure each need (doc_id, simhash), and computing
    * it per consumer re-runs the corpus scan + tokenize + per-bit
    * aggregation (the family's dominant cost) up to three times per
    * session. 16-byte rows — one per doc — so the persisted relation
    * is as small as a relation over the corpus can be.
    */
  def simhashShared(docs: DataFrame, idCol: String, textCol: String,
                    bits: Int = 16): DataFrame =
    PlanCache.cached(s"simhash/$idCol/$textCol/$bits", docs) {
      simhash(_, idCol, textCol, bits)
    }

  /** Hamming distance between two simhash signatures — the similarity
    * measure for SimHash-based near-dup (bit_count is codegen'd).
    */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Multi-index segment explosion of a (doc_id, simhash) relation:
    * one row per (doc, segment index, segment value) — the equi-join
    * key space of the pigeonhole candidate generation used by both
    * the full self-join ([[simhashNearPairs]]) and the incremental
    * batch-vs-store join ([[incrementalSimhashCandidates]]). A pure
    * map-side shift/mask projection — never cache it; cache the
    * 16-byte signature relation it projects from.
    */
  private def segExplode(sigs: DataFrame, bits: Int, nSeg: Int): DataFrame = {
    // uneven split when nSeg does not divide bits: the first
    // bits % nSeg segments take one extra bit (identical to the old
    // even split when the remainder is 0). Pigeonhole needs only that
    // the segments be disjoint and cover all bits — widths may vary.
    val base = bits / nSeg
    val rem = bits % nSeg
    val segStructs = (0 until nSeg).map { i =>
      val off = i * base + math.min(i, rem)
      val len = base + (if (i < rem) 1 else 0)
      val mask = (1L << len) - 1
      // arithmetic shiftright sign-extends a bit-63 signature; the
      // mask strips the extension, so the top segment is still exact
      struct(lit(i).as("seg"),
        expr(s"shiftright(simhash, $off) & $mask").as("segv"))
    }
    sigs.select(col("doc_id"), col("simhash"),
        explode(array(segStructs: _*)).as("sv"))
      .select(col("doc_id"), col("simhash"),
        col("sv.seg").as("seg"), col("sv.segv").as("segv"))
  }

  /** Near-duplicate pairs by SimHash hamming distance: distinct pairs
    * (doc_a < doc_b) whose `bits`-bit signatures differ in ≤ `maxDist`
    * bits, with the distance attached.
    *
    * The pair join stays bucketed via the multi-index trick: the
    * signature splits into `maxDist + 1` disjoint segments, and any
    * pair within `maxDist` must agree EXACTLY on at least one segment
    * (pigeonhole: ≤ maxDist differing bits cannot touch all
    * maxDist + 1 segments) — so candidates are pairs sharing
    * (segment index, segment value), an equijoin co-partitioned on
    * the segment key, and the hamming verification runs on candidates
    * only. Exact (no recall loss), never all-pairs; degenerate
    * segments (e.g. all-zero high bits across the corpus) are the
    * skew case — at 100 TB, cap or salt hot (seg, segv) buckets the
    * same way [[lshCandidatePairs]] caps hot LSH buckets.
    */
  def simhashNearPairs(docs: DataFrame, idCol: String, textCol: String,
                       bits: Int = 60, maxDist: Int = 3,
                       maxSegBucket: Int = Int.MaxValue): DataFrame = {
    // the persisted diamond anchor is the SHARED signature relation
    // ([[simhashShared]] — one 16-byte row per doc, also consumed by
    // the bucket census and any other SimHash query in the session):
    // the pair self-join reads the segment explosion on BOTH sides,
    // and without a cache underneath it the whole scan→tokenize→
    // simhash aggregation executes twice (measured 2× the query's
    // runtime). The segment explosion itself stays UNCACHED — it is a
    // pure map-side shift/mask projection of the cached signatures
    // (recomputing it per join side costs ~nothing), and caching the
    // wider 4-rows/doc form instead would quadruple the storage while
    // denying the census its narrow shared anchor.
    signatureNearPairs(simhashShared(docs, idCol, textCol, bits),
      bits, maxDist, maxSegBucket)
  }

  /** Near-duplicate pairs among PRECOMPUTED `bits`-wide signatures —
    * the pigeonhole multi-index engine behind [[simhashNearPairs]],
    * exposed for any doc-local 64-bit-or-narrower signature: text
    * SimHash, image perceptual hashes ([[Multimodal.imageAHash]]),
    * audio fingerprints. Input is a (doc_id, simhash) relation (cache
    * it — both self-join sides read it); output is distinct
    * (doc_a < doc_b, dist) pairs with hamming ≤ `maxDist`.
    *
    * Exactness and scale contract are [[simhashNearPairs]]'s: the
    * signature splits into maxDist + 1 disjoint segments (uneven
    * widths allowed — see segExplode), any qualifying pair agrees
    * exactly on ≥1 segment, candidates are an equi-join on
    * (segment index, value), and hot segment buckets can be capped
    * via `maxSegBucket` (handle those as clusters).
    */
  def signatureNearPairs(sigs: DataFrame, bits: Int, maxDist: Int,
                         maxSegBucket: Int = Int.MaxValue): DataFrame = {
    val nSeg = maxDist + 1
    require(maxDist >= 1 && nSeg <= bits,
      s"maxDist=$maxDist out of range for $bits-bit signatures")
    // signatures ride along (8 bytes) so verification needs no
    // join-back to the signature table
    val allSegs = segExplode(sigs, bits, nSeg)
    // optional skew guard for the 100 TB case: a (seg, segv) bucket of
    // m docs implies m²/2 candidate pairs, and a boilerplate cluster
    // of near-identical simhashes lands whole in one bucket. Capping
    // drops those buckets from PAIRWISE generation (handle them as
    // clusters — the members agree on a quarter of the signature);
    // pairs whose OTHER segments still agree under-cap are unaffected.
    // Default Int.MaxValue = exact (the oracle-checked mode).
    val segs =
      if (maxSegBucket == Int.MaxValue) allSegs
      else {
        val ok = allSegs.groupBy("seg", "segv").agg(count(lit(1)).as("cnt"))
          .where(col("cnt") <= maxSegBucket).select("seg", "segv")
        allSegs.join(ok, Seq("seg", "segv"))
      }
    // no join-strategy hint, deliberately (A/B at sf0.1: broadcast
    // 0.75 s vs shuffle_hash 1.54 s): segment rows are ~20 bytes so
    // the cached relation broadcasts cheaply while its stats fit, and
    // past the broadcast threshold Catalyst/AQE falls back to the
    // shuffle join on (seg, segv) on its own — the right call at both
    // scales, unlike lsh_verified's wide-row self-join where broadcast
    // measured 6× slower and the hint is pinned
    segs.as("a")
      .join(segs.as("b"),
        col("a.seg") === col("b.seg") && col("a.segv") === col("b.segv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming(col("a.simhash"), col("b.simhash")).as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /** Connected components over an undirected edge list: (node,
    * component) where component = the MINIMUM node id reachable from
    * `node` — the canonical representative a transitive dedup class
    * needs (pairwise near-dup output alone under-merges: A~B and B~C
    * must collapse to one class even when A~C was never emitted).
    *
    * Algorithm: min-label propagation with pointer jumping. Each
    * round every node takes the least of its own label, its
    * neighbors' labels, and its label's label (path halving). Plain
    * neighbor propagation needs O(diameter) rounds; the jump step
    * halves label-chain depth each round, giving O(log n) worst case
    * — the classic MapReduce-CC recipe, here as nothing but
    * equi-joins and min-aggregates that AQE plans freely at any
    * scale. Each iteration is localCheckpoint-truncated: an iterative
    * loop otherwise compounds its own lineage into an
    * analysis-time blowup. Convergence = a round that changed no
    * label (the round function is deterministic, so an unchanged
    * round IS the fixpoint); the previous label rides through the
    * round and an OBSERVED metric on the round's own checkpoint job
    * counts changes — no extra confirming round, no separate
    * convergence action.
    *
    * Isolated nodes (no edges) don't appear; callers union them back
    * as singleton components if needed.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIters: Int = 30): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
      .localCheckpoint() // static across rounds; materialize once
    // fused round 0: label(v) = min(v, min N(v)) falls out of one
    // groupBy over the edge list — no join needed. A dense near-dup
    // cluster (the common dedup graph) is fully labeled right here,
    // so the loop below runs only its confirming round.
    var labels = sym.groupBy(col("a")).agg(min(col("b")).as("__nb"))
      .select(col("a").as("node"), least(col("a"), col("__nb")).as("label"))
      .localCheckpoint()
    var it = 0
    var converged = labels.isEmpty
    while (!converged && it < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("node").as("b"), col("label").as("bl")), Seq("b"))
        .groupBy(col("a").as("node")).agg(min(col("bl")).as("nl"))
      // the PREVIOUS label rides through the round as __old so the
      // per-round aggregate can count changed rows directly: a round
      // that changes nothing IS the fixpoint (the round function is
      // deterministic), detected immediately — no label-sum seeding,
      // no second confirming round
      val stepped = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label").as("__old"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        // materialized: the pointer-jump below reads stepped on BOTH
        // sides — un-checkpointed, the sym⋈labels aggregation above
        // would execute twice per round (only its shuffle files are
        // reusable, not the aggregation over them)
        .localCheckpoint()
      // the changed-row count rides the checkpoint job as an observed
      // metric — the convergence check costs NO extra Spark action
      // (was a separate aggregate job per round: 3 actions/round → 2,
      // measured -38% on the whole loop at sf0.1)
      val obs = org.apache.spark.sql.Observation()
      val jumped = stepped
        .join(stepped.select(col("node").as("pl"), col("label").as("pll")),
          stepped("label") === col("pl"), "left")
        .select(col("node"), col("__old"),
          least(stepped("label"), coalesce(col("pll"), stepped("label"))).as("label"))
        .observe(obs, sum(when(col("label") =!= col("__old"), 1L).otherwise(0L))
          .as("changed"))
        .localCheckpoint()
      val changed = Option(obs.get("changed")).map(_.asInstanceOf[Long]).getOrElse(0L)
      converged = changed == 0L
      labels = jumped.drop("__old")
      it += 1
    }
    labels.select(col("node"), col("label").as("component"))
  }

  /** [[connectedComponents]] memoized per (edge plan, session) via
    * [[PlanCache]] — the labels relation is consumed by BOTH the
    * class-census query and canonical-survivor selection; unshared,
    * each would re-run the whole O(log n)-round loop (~3 s at sf0.1,
    * and at 100 TB a full re-shuffle of the pair graph per consumer).
    * Same lifecycle policy as [[simhashShared]]: one persisted copy
    * per session, released by `PlanCache.clear()`.
    */
  def connectedComponentsShared(edges: DataFrame, srcCol: String,
                                dstCol: String): DataFrame =
    PlanCache.cached(s"components/$srcCol/$dstCol", edges) {
      connectedComponents(_, srcCol, dstCol)
    }

  /** Drop list of a component-representative dedup policy: every node
    * of the pair graph EXCEPT each component's min-id representative.
    * Subsumes per-pair doc_b-dropping, which under-merges on chains —
    * with pairs (B,C) and (A,C), B is never a doc_b and survives even
    * though it is transitively duplicate with A.
    */
  def componentDrops(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    connectedComponents(edges, srcCol, dstCol)
      .where(col("node") =!= col("component"))
      .select(col("node"))

  /** Canonical-survivor selection: the production completion of the
    * duplicate-class machinery. [[connectedComponents]] answers "which
    * docs are the same"; this answers the question a pipeline actually
    * ships on — "which copy do we KEEP". Every document of `docs`
    * (including ones in no pair — their class is themselves) is
    * assigned to its duplicate class, and each class keeps exactly one
    * survivor: the row with the maximum `qualityCol`, ties broken by
    * the SMALLEST `idCol` — a total, engine-independent order, so the
    * kept set is reproducible bit-for-bit across runs and engines.
    *
    * Returns one row per class:
    * `(cls, <idCol>, <qualityCol>, class_size)` — the survivor's id
    * and quality plus how many docs the class absorbed
    * (`class_size - 1` = rows dropped).
    *
    * Scale shape: one equi-join of docs to the component labels (the
    * labels relation is |pair-graph nodes| rows, far smaller than the
    * corpus) and ONE hash aggregate whose state per class is a single
    * (quality, -id) struct — max over structs is associative, so the
    * map-side combine reduces each partition to |classes| rows before
    * the shuffle. No text bytes move; at 100 TB the shuffle carries
    * 24-byte rows. `idCol` and `qualityCol` must be numeric (the
    * tie-break negates the id inside the ordering struct).
    */
  def keepCanonical(docs: DataFrame, idCol: String, qualityCol: String,
                    edges: DataFrame, srcCol: String, dstCol: String,
                    components: Option[DataFrame] = None): DataFrame = {
    val comp = components.getOrElse(connectedComponents(edges, srcCol, dstCol))
    val labeled = docs
      .join(comp, docs(idCol).cast("long") === comp("node"), "left")
      .select(docs(idCol).cast("long").as("__id"), col(qualityCol).as("__q"),
        coalesce(col("component"), docs(idCol).cast("long")).as("cls"))
    labeled.groupBy("cls")
      .agg(max(struct(col("__q"), (-col("__id")).as("__nid"))).as("__w"),
        count(lit(1)).as("class_size"))
      .select(col("cls"), (-col("__w.__nid")).as(idCol),
        col("__w.__q").as(qualityCol), col("class_size"))
  }

  /** Word n-grams per doc, entirely map-side: the token array is
    * zipped with its n−1 self-shifts (`arrays_zip` pads the shorter
    * arrays with null) and exploded; `concat` — not concat_ws — makes
    * the trailing partial n-grams null out. No posexplode+window (an
    * exchange + sort of every token) and no interpreted lambdas — the
    * pipeline is scan → project → generate, nothing shuffles. NOT
    * deduplicated — callers dedup on the hashed form (narrower rows).
    */
  def rawNgrams(docs: DataFrame, idCol: String, textCol: String, n: Int,
                out: String = "shingle"): DataFrame = {
    require(n >= 1, s"n=$n must be positive")
    val toks = split(col(textCol), " ")
    val shifts = (0 until n).map { i =>
      val c = if (i == 0) toks
              else slice(toks, lit(i + 1), greatest(size(toks) - i, lit(0)))
      c.as(s"w$i")
    }
    val joined = (0 until n).flatMap { i =>
      if (i == 0) Seq(col(s"z.w$i")) else Seq(lit(" "), col(s"z.w$i"))
    }
    docs.select(col(idCol).as("doc_id"), explode(arrays_zip(shifts: _*)).as("z"))
      .select(col("doc_id"), concat(joined: _*).as(out))
      .where(col(out).isNotNull)
  }

  /** [[rawNgrams]] in the hash domain, skipping string construction:
    * the n shifted word columns feed a single multi-argument
    * `xxhash64` (codegen'd, chained per-word — word boundaries are
    * part of the seed chain, so no concat-ambiguity), emitting one
    * 64-bit gram hash per position with NO per-gram string alloc and
    * no digest. For consumers that only ever compare grams for
    * equality (decontamination), this is the whole n-gram pipeline
    * cost: measured ~2.5× faster than concat + md5-prefix at sf0.1.
    */
  def hashedNgrams(docs: DataFrame, idCol: String, textCol: String, n: Int,
                   out: String = "__g"): DataFrame = {
    require(n >= 1, s"n=$n must be positive")
    val toks = split(col(textCol), " ")
    val shifts = (0 until n).map { i =>
      val c = if (i == 0) toks
              else slice(toks, lit(i + 1), greatest(size(toks) - i, lit(0)))
      c.as(s"w$i")
    }
    docs.select(col(idCol).as("doc_id"), explode(arrays_zip(shifts: _*)).as("z"))
      // xxhash64 SKIPS null inputs (seed passes through), so an
      // end-of-doc position with a null last word would silently hash
      // as a shorter gram — filter to full-width positions explicitly
      // (rawNgrams gets this via concat's null propagation)
      .where(col(s"z.w${n - 1}").isNotNull)
      .select(col("doc_id"),
        xxhash64((0 until n).map(i => col(s"z.w$i")): _*).as(out))
  }

  /** Word-trigram n-grams — the shingle width the dedup family uses. */
  def rawShingles(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    rawNgrams(docs, idCol, textCol, 3)

  /** Distinct word-trigram shingles per doc. */
  def shingles(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    rawShingles(docs, idCol, textCol).distinct()

  /** Distinct (doc_id, 32-bit shingle hash) pairs with stop-shingles
    * removed: any shingle appearing in more than `dfCap` documents is
    * dropped before any join. This is what keeps the pairwise
    * verification non-quadratic — one hot shingle ("of the and")
    * otherwise makes the self-join quadratic in its posting list.
    * Shingles are hashed BEFORE the dedup exchange, so every shuffle
    * in the pipeline carries 12-byte (doc_id, hash) rows, never
    * strings; that distinct exchange is also the plan's shared anchor
    * — every downstream consumer (df census, join sides, cardinality)
    * reuses it (ReuseExchange) instead of recomputing the scan.
    */
  def cappedShingleHashes(docs: DataFrame, idCol: String, textCol: String,
                          dfCap: Int): DataFrame =
    PlanCache.cached(s"cappedShingles/$idCol/$textCol/$dfCap", docs) { d =>
      val sh = rawShingles(d, idCol, textCol)
        .select(col("doc_id"), Hashing.h32(col("shingle")).as("sh"))
        .distinct()
      val kept = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .where(col("df") <= dfCap).select("sh")
      // shuffle-hash join with the build table on the (small) kept set,
      // not broadcast: a broadcast build side would re-execute the whole
      // shingle subtree instead of reusing the shuffled one.
      // The result is persisted (via PlanCache, one relation per input
      // plan, releasable with PlanCache.clear()): every caller fans it
      // into a diamond (cardinality + both self-join sides), and
      // exchange reuse under AQE is best-effort — without the persist
      // the scan+shingle subtree executes up to 8×. 12-byte rows:
      // ~n_docs × shingles/doc × 12 B, spillable (MEMORY_AND_DISK) and
      // lineage-preserving.
      sh.join(kept.hint("shuffle_hash"), "sh")
    }

  /** Pairwise n-gram Jaccard via a hashed-shingle equijoin: only pairs
    * sharing ≥1 (non-capped) shingle are ever materialized. Emits
    * (doc_a, doc_b, inter, uni) over the capped shingle sets;
    * jaccard = inter/uni left to the caller so the result stays
    * integer-exact. For corpora where even capped posting lists are
    * large, generate candidates with LSH and verify with
    * `ngramJaccardOnCandidates` instead.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        dfCap: Int = 100): DataFrame =
    withUnion(sharedInterPairs(docs, idCol, textCol, dfCap),
      sharedCard(docs, idCol, textCol, dfCap))

  /** (doc_a < doc_b, inter) over a capped posting-list relation — the
    * shared core of the symmetric-pair operators. shuffle_hash pins
    * the self-join strategy: once the persisted relation materializes,
    * its (columnar-compressed) stats can fall under the broadcast
    * threshold and flip this to a broadcast of the FULL shingle set —
    * measured 6× slower at sf0.1 (driver collect + row-expanded build
    * per run) and lethal at scale, where the posting-list relation is
    * never broadcastable. (A collect_list posting-pair rewrite was
    * ALSO measured slower: the cached relation's hash partitioning is
    * not visible through InMemoryRelation under AQE, so the groupBy
    * re-shuffles anyway and ObjectHashAggregate loses to the
    * codegen'd join.)
    */
  private def interPairs(fsh: DataFrame): DataFrame =
    fsh.as("a")
      .join(fsh.as("b").hint("shuffle_hash"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))

  /** The (doc_a, doc_b, inter) co-occurrence relation and the
    * per-doc cardinality relation, PlanCache-shared across every
    * consumer keyed on (input plan, dfCap): ngram-Jaccard and
    * containment are two projections of the SAME pair relation, so
    * computing it per-query would run the posting self-join (the
    * pipeline's most expensive shuffle) twice. Σc² pair rows are
    * bounded by the df-cap (≤ dfCap · |postings|), i.e. the persisted
    * relation is the same size class as the data any single consumer
    * must shuffle anyway.
    */
  private def sharedInterPairs(docs: DataFrame, idCol: String, textCol: String,
                               dfCap: Int): DataFrame =
    PlanCache.cached(s"interPairs/$idCol/$textCol/$dfCap", docs) { d =>
      interPairs(cappedShingleHashes(d, idCol, textCol, dfCap))
    }

  /** Per-doc capped-shingle cardinality — a free projection of the
    * persisted [[shingleSets]] relation (n = size of the set array),
    * NOT its own aggregate: a separate groupBy+count would re-shuffle
    * the posting relation and persist a second copy of per-doc
    * information the set relation already holds.
    */
  private def sharedCard(docs: DataFrame, idCol: String, textCol: String,
                         dfCap: Int): DataFrame =
    shingleSets(docs, idCol, textCol, dfCap)
      .select(col("doc_id"), size(col("shs")).cast("long").as("n"))

  /** Pairwise shingle CONTAINMENT: (doc_a, doc_b, inter, n_a, n_b)
    * for every pair sharing ≥1 non-capped shingle — containment of the
    * smaller set = inter / min(n_a, n_b), the asymmetric near-dup
    * metric Jaccard misses: a document quoted wholesale inside a much
    * larger one has tiny Jaccard (union ≈ the big doc) but containment
    * ≈ 1. Counts stay integer-exact; callers threshold with integer
    * arithmetic (`inter * 10 >= least(n_a, n_b) * 8` for ≥0.8) so the
    * decision is engine-portable. Same bounded shape as
    * [[ngramJaccardPairs]]: only co-occurring pairs materialize, the
    * df-cap bounds posting lists, never corpus².
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       dfCap: Int = 100): DataFrame = {
    val card = sharedCard(docs, idCol, textCol, dfCap)
    sharedInterPairs(docs, idCol, textCol, dfCap)
      .join(card.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(card.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        col("ca.n").as("n_a"), col("cb.n").as("n_b"))
  }

  /** Per-doc capped-shingle SET as one sorted array row — the compact
    * verification fingerprint a two-stage pipeline stores next to the
    * corpus (PlanCache-shared like the relations it derives from).
    * ~|shingles(doc)| ints per doc; at 100 TB this is the thing you
    * persist to reliable storage at the candidate-generation boundary.
    */
  private def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                          dfCap: Int): DataFrame =
    PlanCache.cached(s"shingleSets/$idCol/$textCol/$dfCap", docs) { d =>
      cappedShingleHashes(d, idCol, textCol, dfCap)
        .groupBy("doc_id").agg(sort_array(collect_list(col("sh"))).as("shs"))
    }

  /** n-gram Jaccard restricted to the given candidate pairs
    * (doc_a, doc_b) — the verification stage of an LSH pipeline: cost
    * is Σ|shingles(doc)| over candidate occurrences, independent of
    * corpus size. Pairs sharing no (non-capped) shingle drop out
    * (inter=0 ⇒ not a near-dup).
    *
    * Shape: two equi-joins of the candidate ids against the per-doc
    * [[shingleSets]] fingerprints, intersection computed per PAIR in
    * one `array_intersect` pass — no (doc, shingle) row explosion and
    * no pair re-aggregation (the former fsh⋈fsh formulation emitted
    * Σ|shingles| rows and shuffled them into a groupBy; this emits
    * one row per candidate pair, full stop). The planner broadcasts
    * whichever side is small: the candidate set here, the fingerprint
    * relation never (it is corpus-sized — at scale both joins are
    * plain hash shuffles on doc ids, still candidate-bounded).
    */
  def ngramJaccardOnCandidates(docs: DataFrame, idCol: String, textCol: String,
                               candidates: DataFrame, dfCap: Int = 100): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, dfCap)
    candidates
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa.shs"), col("sb.shs"))).as("inter"),
        (size(col("sa.shs")) + size(col("sb.shs"))).as("__tot"))
      .where(col("inter") > 0)
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("__tot") - col("inter")).as("uni"))
  }

  /** Attach union cardinality: uni = |A| + |B| - inter. */
  private def withUnion(pairs: DataFrame, card: DataFrame): DataFrame =
    pairs
      .join(card.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(card.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("ca.n") + col("cb.n") - col("inter")).as("uni"))

  /** Duplicated-SUBSTRING spans — span-level exact dedup, the
    * within-document counterpart to [[exactByFingerprint]]'s
    * whole-document dedup (the "exact substring" pass of training-data
    * curation: whole docs may be unique while long runs of boilerplate
    * repeat verbatim across the corpus). A token k-gram is duplicated
    * when its text occurs more than once corpus-wide (any docs,
    * including twice in one doc); per document, the duplicated gram
    * positions' intervals `[pos, pos+k)` are merged into maximal
    * spans. Returns one row per span: (doc_id, start_pos, end_pos) in
    * token coordinates — `end_pos - start_pos` is the count of tokens
    * a span-level cut would remove.
    *
    * 100 TB shape, two bounded shuffles before the merge: the gram
    * TEXT never leaves the map side — each gram is fingerprinted by
    * TWO independently-seeded 64-bit hashes, (1) the corpus-wide
    * duplicate scan groups the 16-byte pair with map-side partial
    * aggregation (the exchange carries one row per distinct gram per
    * partition, not per occurrence — a hot boilerplate gram collapses
    * map-side instead of serializing into one sorted window
    * partition), (2) occurrences semi-join the duplicated-key set
    * (16-byte keys; AQE broadcasts it when small), and (3) interval
    * merge is one window per doc_id ordered by pos (per-partition
    * state ≤ tokens per document). A false dup needs a simultaneous
    * collision in both hashes (~n²/2^127 — far inside the accepted
    * [[exactByFingerprint]] 60-bit contract). No self-join, no
    * pairwise blowup: cost is linear in corpus grams.
    */
  def duplicatedKgramSpans(docs: DataFrame, idCol: String, textCol: String,
                           k: Int): DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"),
        filter(split(col(textCol), "[^a-zA-Z]+"), t => t =!= "").as("ts"))
      .where(size(col("ts")) >= k)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("ts")) - k),
          i => array_join(slice(col("ts"), i + 1, lit(k)), " "))))
      .toDF("doc_id", "pos", "gram")
      .select(col("doc_id"), col("pos"),
        xxhash64(col("gram")).as("h"),
        xxhash64(lit("substr_v2"), col("gram")).as("h2"))
    val dupKeys = grams.groupBy("h", "h2")
      .agg(count(lit(1)).as("c")).where(col("c") > 1).select("h", "h2")
    val verified = grams.join(dupKeys, Seq("h", "h2"), "left_semi")
      .select("doc_id", "pos")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    verified
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byDoc) <= k, lit(0)).otherwise(lit(1)))
      .withColumn("span_id", sum("brk").over(byDoc))
      .groupBy("doc_id", "span_id")
      .agg(min("pos").as("start_pos"), (max(col("pos")) + k).as("end_pos"))
      .select("doc_id", "start_pos", "end_pos")
  }

  /** Apply span-level dedup — re-emit each document with its
    * duplicated spans cut out (the "cut" half of the exact-substring
    * pass; [[duplicatedKgramSpans]] is the "detect" half). Tokens
    * whose position falls inside any of the doc's spans are dropped;
    * the survivors re-join into `clean_text` in original order, with
    * `n_tokens`/`n_kept` carrying the before/after census.
    *
    * Shape: spans collapse to one small struct-array per affected doc
    * (≤ tokens/k entries), ONE equi-join attaches them, and the
    * token filter runs map-side as a higher-order array expression —
    * per-row cost tokens × spans, no explode, no second shuffle.
    */
  def cutSpans(docs: DataFrame, idCol: String, textCol: String,
               spans: DataFrame): DataFrame = {
    val sp = spans.groupBy("doc_id")
      .agg(collect_list(struct(col("start_pos"), col("end_pos"))).as("sps"))
    docs
      .select(col(idCol).as("doc_id"),
        filter(split(col(textCol), "[^a-zA-Z]+"), t => t =!= "").as("ts"))
      .join(sp, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("sps").isNull, col("ts")).otherwise(
          filter(col("ts"), (t, i) =>
            !exists(col("sps"), s =>
              i >= s.getField("start_pos") && i < s.getField("end_pos")))))
      .select(col("doc_id"), size(col("ts")).as("n_tokens"),
        size(col("kept")).as("n_kept"),
        array_join(col("kept"), " ").as("clean_text"))
  }
}
