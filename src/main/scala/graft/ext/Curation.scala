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

  /** The gate projection alone: appends `__predicted`, quality
    * features, and `__lang_ok` / `__qual_ok` flags — one map-side
    * pass, no shuffle, no state. Because it is a pure stateless
    * transform it applies unchanged to a STREAMING DataFrame (gate an
    * ingest stream at the edge, before anything stateful); the
    * streaming spec pins it differentially against this same batch
    * path.
    */
  def gateFlags(docs: DataFrame, textCol: String, keepLang: String = "en",
                minTokens: Int = 30, minTtrDecile: Int = 3): DataFrame =
    TextStats.withQualityFeatures(
        TextStats.withLangId(docs, textCol, "__predicted"), textCol)
      .withColumn("__lang_ok", col("__predicted") === keepLang)
      .withColumn("__qual_ok",
        col("__lang_ok") && col("n_tokens") >= minTokens &&
          col("ttr_decile") >= minTtrDecile)

  /** Filter form of [[gateFlags]]: the rows that pass both gates,
    * keeping (id, text, n_tokens). Streaming-safe (stateless).
    */
  def gates(docs: DataFrame, idCol: String, textCol: String,
            keepLang: String = "en", minTokens: Int = 30,
            minTtrDecile: Int = 3): DataFrame =
    gateFlags(docs.select(col(idCol), col(textCol)), textCol, keepLang,
        minTokens, minTtrDecile)
      .where(col("__qual_ok"))
      .select(col(idCol), col(textCol), col("n_tokens"))

  /** Eval-set decontamination: drop every training document sharing
    * at least one word `n`-gram with the eval corpus — the standard
    * guard against benchmark leakage into pretraining data.
    *
    * 100 TB shape: the eval side reduces to a DISTINCT set of 8-byte
    * n-gram hashes (eval sets are tiny next to the corpus), so the
    * planner broadcasts it and the train side never shuffles — one
    * map-side n-gram generate + broadcast semi-join + broadcast
    * anti-join, cost linear in the train scan. Matching on hashes can
    * only OVER-drop (a hash collision drops a clean doc, never keeps
    * a contaminated one) — the safe direction for decontamination;
    * 64-bit gram hashes ([[Dedup.hashedNgrams]]: one codegen'd
    * `xxhash64` per position, no per-gram string ever built) keep
    * even that negligible — a 32-bit variant was measured dropping
    * one clean doc at sf0.1; the birthday bound
    * ~|train grams|·|eval grams|/2^32 ≈ 0.7 predicted exactly that,
    * and the string-matching oracle caught it.
    *
    * When the eval gram set outgrows broadcast size (a full eval
    * SUITE at 100 TB), [[decontaminateBloom]] is the default: the
    * gram set folds into one bounded-size filter probed map-side.
    */
  def decontaminate(train: DataFrame, idCol: String, textCol: String,
                    eval: DataFrame, evalTextCol: String,
                    n: Int = 8): DataFrame = {
    val evalGrams = sharedEvalGrams(eval, evalTextCol, n)
    val trainGrams = sharedTrainGrams(train, idCol, textCol, n)
    // the contaminated-id DROP-LIST is a checkpointed leaf, not an
    // inline subtree: Catalyst pushes the final anti-join through a
    // Union-shaped train corpus (many sources / the @k harness),
    // duplicating the anti-join's right side into EVERY branch — as a
    // plan, that re-ran the grams⋈grams join per branch (measured
    // super-linear at @32); as a leaf it is one broadcast probe per
    // branch of a list built once. Keyed on BOTH inputs AND every
    // parameter that shapes the list (evalTextCol included): the same
    // corpus against a different eval suite or column must rebuild.
    val contaminated = PlanCache.checkpointed2(
      s"decontam/contamIds/$idCol/$textCol/$evalTextCol/$n", train, eval) { (_, _) =>
        trainGrams.join(evalGrams, "__g")
          .select(col("doc_id").as("__contam_id")).distinct()
      }
    train.join(contaminated, col(idCol) === col("__contam_id"), "left_anti")
  }

  /** Graded contamination: per train doc, how many of its distinct
    * `n`-grams appear in the eval suite — (doc_id, n_grams, n_hit).
    * [[decontaminate]]'s binary drop is the right default for eval
    * integrity; the SCORE is the audit view that ranks what the drop
    * would remove (n_hit/n_grams ≈ 1 is a verbatim leak, a low ratio
    * is shared boilerplate) and feeds threshold tuning. Both counts
    * stay integers — the caller divides. Docs shorter than `n` tokens
    * emit no grams and no row.
    *
    * Scale shape: same PlanCache-shared relations as the drop paths
    * (one corpus gram scan serves drop + Bloom + score), one distinct
    * exchange on (doc_id, gram), then a broadcast left join against
    * the eval gram set and a partial-aggregated count — no corpus
    * text past the gram hasher, no second shuffle.
    */
  def contaminationScore(train: DataFrame, idCol: String, textCol: String,
                         eval: DataFrame, evalTextCol: String,
                         n: Int = 8): DataFrame = {
    val evalGrams = sharedEvalGrams(eval, evalTextCol, n)
    val dg = sharedTrainGrams(train, idCol, textCol, n)
      .select("doc_id", "__g").distinct()
    dg.join(evalGrams.select(col("__g"), lit(1L).as("__h")), Seq("__g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__h"), lit(0L))).as("n_hit"))
  }

  /** The train-side gram relation, PlanCache-shared keyed on (input
    * plan, n): the exact and Bloom decontamination paths both probe
    * THE SAME (doc_id, gram-hash) relation — a pipeline that runs
    * both (exact for a core eval set, Bloom for the full suite) would
    * otherwise re-scan and re-gram the whole corpus per variant,
    * which IS each variant's dominant cost (the probe itself is a
    * broadcast semi-join / map-side filter). 16-byte rows, spillable;
    * same persistence discipline as [[Dedup.cappedShingleHashes]].
    */
  private def sharedTrainGrams(train: DataFrame, idCol: String,
                               textCol: String, n: Int): DataFrame =
    PlanCache.cached(s"decontam/trainGrams/$idCol/$textCol/$n", train) {
      Dedup.hashedNgrams(_, idCol, textCol, n)
    }

  /** The distinct eval gram-hash set, likewise shared: eval sets are
    * tiny next to the corpus, but both variants need the distinct set
    * (one to broadcast-join, one to fold into the Bloom build) and
    * the dedup exchange is the non-trivial part of that subtree.
    */
  private def sharedEvalGrams(eval: DataFrame, evalTextCol: String,
                              n: Int): DataFrame =
    PlanCache.cached(s"decontam/evalGrams/$evalTextCol/$n", eval) { e =>
      Dedup.hashedNgrams(
          e.select(lit(0L).as("__eid"), col(evalTextCol)),
          "__eid", evalTextCol, n)
        .select("__g").distinct()
    }

  /** Probabilistic [[decontaminate]] for when the eval n-gram set is
    * too large to broadcast exactly: the eval grams fold into ONE
    * Bloom filter value (`bloom_filter_agg` — size ∝ capacity/fpp,
    * independent of the train corpus), and train grams probe it with
    * `might_contain`, a pure map-side projection. The error is
    * one-sided, on the safe side for eval integrity: NO false
    * negatives (every exactly-contaminated doc is dropped — spec-
    * pinned), while false positives over-drop clean docs at ≈ fpp per
    * gram. Size `expectedItems` at-or-above the true distinct eval
    * gram count; `numBits ≈ -n·ln(fpp)/ln(2)²` follows.
    */
  def decontaminateBloom(train: DataFrame, idCol: String, textCol: String,
                         eval: DataFrame, evalTextCol: String,
                         n: Int = 8, expectedItems: Long = 1000000L,
                         fpp: Double = 0.001): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    // BloomFilterAggregate SILENTLY clamps both parameters to the
    // runtime-filter session confs (defaults: 4e6 items, 67108864
    // bits) — an oversized request would quietly degrade the actual
    // fpp by orders of magnitude and over-drop most of a clean train
    // corpus. Fail loudly instead; raise the confs for bigger filters.
    val conf = train.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom sizing (items=$expectedItems, bits=$numBits) exceeds the session " +
        s"clamps (maxNumItems=$maxItems, maxNumBits=$maxBits); " +
        "BloomFilterAggregate would silently clamp and the realized fpp " +
        "would be far above the requested one — raise " +
        "spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits}")
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnShim
    import org.apache.spark.sql.types.BinaryType
    // the filter BUILDS distributed (partial aggregation merges
    // per-partition sketches); only the finished bloom BYTES come to
    // the driver — one bounded index artifact (size ∝ capacity/fpp,
    // ~1.2 MB at 1M items / 1e-3), the same collect discipline as IVF
    // centroids. It returns to the plan as a LITERAL because
    // BloomFilterMightContain requires a constant filter side
    // (bloom_filter_agg / might_contain are not SQL-registered —
    // constructed via the ColumnShim bridge, still full codegen).
    // The bytes are MEMOIZED per (eval plan, params): the filter is
    // the index artifact of the eval corpus — deterministic, built by
    // its own job+collect — and re-running that build on every
    // execution of the probe query (bench warm-up + timed runs) was
    // the query's dominant fixed overhead once the gram relations
    // were shared.
    val bloomBytes = PlanCache.artifact(
      s"decontam/bloom/$evalTextCol/$n/$expectedItems/$numBits", eval) { e =>
      sharedEvalGrams(e, evalTextCol, n)
        .select(ColumnShim.column(
          new BloomFilterAggregate(ColumnShim.expression(col("__g")),
            Literal(expectedItems), Literal(numBits))
            .toAggregateExpression()).as("__bloom"))
        .head().getAs[Array[Byte]](0)
    }
    val trainGrams = sharedTrainGrams(train, idCol, textCol, n)
    val contaminated = trainGrams
      .where(ColumnShim.column(BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        ColumnShim.expression(col("__g")))))
      .select(col("doc_id").as("__contam_id")).distinct()
    train.join(contaminated, col(idCol) === col("__contam_id"), "left_anti")
  }

  /** SEMANTIC decontamination: drop train rows whose EMBEDDING is
    * near (quantized cosine ≥ `minCos`) any eval embedding — the
    * paraphrase-contamination pass the n-gram paths above cannot see
    * (a reworded eval question shares no 8-gram with its source).
    *
    * Batch-vs-store shape, never corpus × eval: both sides bucket
    * with the same sign-LSH ([[Similarity.lshBuckets]], OR over
    * `nTables`), candidates come from an equi-join on (tbl, bucket),
    * and the double-precision cosine verify runs on candidates only
    * (9-dp-quantized, the cross-engine threshold rule). Recall is the
    * OR-construction's — a contaminated row is dropped when ANY
    * table co-buckets it with its eval neighbor; raise `nTables` for
    * stricter suites. The contaminated-id drop-list is a
    * checkpointed leaf for the same Union-pushdown reason as
    * [[decontaminate]]'s.
    */
  def decontaminateEmbedding(train: DataFrame, idCol: String, vecCol: String,
                             eval: DataFrame, evalIdCol: String,
                             evalVecCol: String, minCos: Double,
                             nTables: Int = 4, planesPerTable: Int = 8,
                             dim: Int = 64): DataFrame = {
    val tb = PlanCache.cached(
      s"lshBuckets/$idCol/$vecCol/$nTables/$planesPerTable/$dim", train)(
      Similarity.lshBuckets(_, idCol, vecCol, nTables, planesPerTable, dim))
    val tv = PlanCache.cached(s"unitVecs/$idCol/$vecCol", train)(
      Similarity.normalized(_, idCol, vecCol, "__id", "__v"))
    val contaminated = PlanCache.checkpointed2(
      s"decontamEmb/contamIds/$idCol/$vecCol/$evalIdCol/$evalVecCol" +
        s"/$minCos/$nTables/$planesPerTable/$dim",
      train, eval) { (_, e) =>
        val eb = Similarity.lshBuckets(e, evalIdCol, evalVecCol,
            nTables, planesPerTable, dim)
          .select(col("vid").as("__evid"), col("tbl"), col("bucket"))
        val ev = Similarity.normalized(e, evalIdCol, evalVecCol, "__eid", "__ev")
        tb.join(eb, Seq("tbl", "bucket"))
          .select(col("vid").as("__tid"), col("__evid")).distinct()
          .join(tv, col("__tid") === col("__id"))
          .join(ev, col("__evid") === col("__eid"))
          .where(round(Similarity.unitDot(col("__v"), col("__ev")), 9) >= minCos)
          .select(col("__tid").as("__contam_id")).distinct()
      }
    train.join(contaminated, col(idCol) === col("__contam_id"), "left_anti")
  }

  /** Sliding-window chunking of documents into training spans: one row
    * per (doc_id, chunk_idx) covering tokens [start, start+width) of
    * the raw single-space split, starts at 0, stride, 2·stride, … while
    * start < n_tokens (the tail chunk may be short; stride < width
    * gives overlapping context windows). Purely map-side — a sequence
    * generate inside the projection, no shuffle, no state — so chunking
    * 100 TB costs exactly one scan and composes with every downstream
    * partitioner. Emits (doc_id, chunk_idx, start, chunk_len).
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      s"need 0 < stride=$stride <= width=$width")
    docs
      .select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).as("__n"))
      .select(col("doc_id"), col("__n"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("int").as("chunk_idx"),
        col("start"),
        least(lit(width), col("__n") - col("start")).as("chunk_len"))
  }

  /** Export a curated corpus as training shards: hive-partitioned by
    * `partCols` (split/lang/source — the dirs a trainer's data loader
    * globs), `shardsPerPart` files per partition with rows assigned by
    * a deterministic hash of `keyCol` and each file internally sorted
    * by `keyCol` — so a re-run of the same corpus produces
    * byte-identical shard membership and order (resumable exports,
    * diffable datasets), unlike the default round-robin task
    * assignment which reshuffles every run.
    *
    * Scale shape: one hash repartition + per-partition sort (no global
    * sort), then the parquet committer's atomic rename per file — the
    * same output discipline as the engine's text sink (E9).
    */
  def exportShards(df: DataFrame, outDir: String, partCols: Seq[String],
                   keyCol: String, shardsPerPart: Int = 1): Unit =
    shardPlan(df, partCols, keyCol, shardsPerPart)
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(outDir)

  /** The planned (pre-write) frame of [[exportShards]], exposed so the
    * export's plan shape is pinnable: ONE hash exchange keyed on
    * (partCols, shard) and a partition-LOCAL sort on (partCols, key)
    * — no global sort, no second shuffle.
    */
  def shardPlan(df: DataFrame, partCols: Seq[String],
                keyCol: String, shardsPerPart: Int = 1): DataFrame = {
    require(partCols.nonEmpty, "exportShards needs partition columns")
    require(shardsPerPart > 0, s"shardsPerPart=$shardsPerPart must be positive")
    // the shard bucket joins the repartition key, so a partition dir
    // splits into ≤ shardsPerPart deterministic files — and each
    // (partCols, shard) combo lands in exactly ONE task, which is
    // what makes n_files-per-shard deterministic. That means write
    // parallelism = #combos (capped by shuffle partitions):
    // shardsPerPart is BOTH the file-layout and the parallelism knob,
    // and a 100 TB export must size it so combos ≫ executor cores
    // (e.g. 1000 shards per lang), which also caps file size
    df
      .withColumn("__shard",
        pmod(Hashing.h32(col(keyCol).cast("string")), lit(shardsPerPart)))
      .repartition((partCols.map(col) :+ col("__shard")): _*)
      .drop("__shard")
      .sortWithinPartitions(partCols.map(col) :+ col(keyCol): _*)
  }

  /** k-anonymity suppression: keep only rows whose QUASI-IDENTIFIER
    * combination (`quasiCols` — e.g. language × source × region)
    * occurs at least `k` times — the standard long-tail privacy gate
    * for training corpora: a document whose metadata combination is
    * nearly unique can re-identify its author even after
    * [[graft.ext.TextStats]]-style PII redaction scrubs the text, so
    * rare combinations are suppressed outright rather than published.
    *
    * Scale shape: ONE partial-aggregated groupBy over the quasi
    * columns (shuffle rows bounded by combination cardinality, never
    * corpus size) and a semi-join back — combination counts are
    * dimension-sized, so the join side carries an EXPLICIT
    * `broadcast()` hint (a size estimate above the auto threshold
    * would otherwise silently degrade to sort-merge-joining the
    * 100 TB corpus) and the corpus never shuffles. NULL-SAFE key
    * comparison throughout: a null quasi value is one ordinary
    * combination (groupBy already counts it as one group; a plain
    * equi semi-join would silently drop every null-combo row however
    * frequent).
    *
    * `maxBroadcastCombos` (> 0) pre-counts the surviving combination
    * list and fails loudly when it exceeds the cap — the forced hint
    * means an unexpectedly high-cardinality quasi set (someone passes
    * a near-unique column) would otherwise surface as a broadcast
    * OOM. The pre-count costs one extra pass over the corpus groupBy,
    * so it defaults OFF; enable it when the quasi columns'
    * cardinality is not bounded by construction.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long,
                 maxBroadcastCombos: Long = 0L): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymize needs quasi-identifier columns")
    require(k >= 1, s"k=$k must be positive")
    val kept = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= k)
      .select(quasiCols.map(c => col(c).as(s"__q_$c")): _*)
    if (maxBroadcastCombos > 0)
      require(kept.limit(math.min(maxBroadcastCombos + 1, Int.MaxValue).toInt)
        .count() <= maxBroadcastCombos,
        s"more than $maxBroadcastCombos quasi-identifier combinations survive — " +
          "too many to broadcast; coarsen the quasi columns (see " +
          "kAnonymizeGeneralized) or raise maxBroadcastCombos")
    val bkept = broadcast(kept)
    val cond = quasiCols.map(c => df(c) <=> bkept(s"__q_$c")).reduce(_ && _)
    df.join(bkept, cond, "left_semi")
  }

  /** Generalize-then-suppress k-anonymity: combinations below `k` get
    * their `generalizeCol` value COARSENED to `otherValue` first (one
    * rung of a generalization hierarchy — "rare source → 'other'"),
    * pooling the long tail into per-remaining-quasi buckets; only
    * rows whose COARSENED combination still falls below `k` are
    * suppressed. Strictly dominates suppression-only
    * ([[kAnonymize]]): rows in frequent combinations are untouched
    * (so nothing kept there changes), while pooled rare rows survive
    * whenever their bucket reaches `k` — suppression-only over-drops
    * exactly those (every long-tail language × rare-source document
    * dies even when publishing it as source='other' is safe). Kept
    * rows are returned WITH the coarsened value: publishing the
    * original rare value would re-identify the row the coarsening
    * just protected.
    *
    * Scale shape: the corpus crosses one combo-bounded groupBy
    * (map-side partial), one broadcast inner join (attach the row's
    * coarsened value), and one broadcast semi-join (the kept
    * coarsened combinations) — the pooled recount happens entirely on
    * the DIMENSION side (a groupBy of the combo-count relation, never
    * a second corpus pass), and the corpus never shuffles, the same
    * contract as [[kAnonymize]]. Null quasi values are ordinary
    * combination values throughout (null-safe joins); a rare null
    * coarsens to `otherValue` like any rare value.
    */
  def kAnonymizeGeneralized(df: DataFrame, quasiCols: Seq[String], k: Long,
                            generalizeCol: Option[String] = None,
                            otherValue: String = "other",
                            maxBroadcastCombos: Long = 0L): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymizeGeneralized needs quasi-identifier columns")
    require(k >= 1, s"k=$k must be positive")
    val gcol = generalizeCol.getOrElse(quasiCols.last)
    require(quasiCols.contains(gcol),
      s"generalizeCol $gcol must be one of the quasi columns ${quasiCols.mkString(",")}")
    require(df.schema(gcol).dataType ==
      org.apache.spark.sql.types.StringType,
      s"generalizeCol $gcol must be a string column (coarsening writes '$otherValue')")
    val rest = quasiCols.filterNot(_ == gcol)
    // combo counts (dimension-sized), each tagged with its coarsened
    // generalize value: rare combos pool under otherValue
    val coarse = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__g", when(col("__n") < k, lit(otherValue)).otherwise(col(gcol)))
    // same guard contract as kAnonymize, on the relation both
    // broadcasts derive from: the forced hints below mean an
    // unexpectedly high-cardinality quasi set would otherwise surface
    // as a broadcast OOM mid-job instead of this loud pre-flight
    if (maxBroadcastCombos > 0)
      require(coarse.limit(math.min(maxBroadcastCombos + 1, Int.MaxValue).toInt)
        .count() <= maxBroadcastCombos,
        s"more than $maxBroadcastCombos quasi-identifier combinations — too " +
          "many to broadcast; coarsen further (pre-bucket a near-unique " +
          "column) or raise maxBroadcastCombos")
    // pooled recount on the coarsened combination — dimension-side only
    val keptCombos = broadcast(coarse
      .groupBy((rest.map(col) :+ col("__g")): _*)
      .agg(sum(col("__n")).as("__cn"))
      .where(col("__cn") >= k)
      .select((rest.map(c => col(c).as(s"__q_$c")) :+ col("__g").as("__q_g")): _*))
    // attach each row's coarsened value (exactly one combo row per
    // row's combination — the inner join never duplicates)
    val cdim = broadcast(coarse.select(
      (quasiCols.map(c => col(c).as(s"__c_$c")) :+ col("__g")): _*))
    val markCond = quasiCols.map(c => df(c) <=> cdim(s"__c_$c")).reduce(_ && _)
    val marked = df.join(cdim, markCond)
      .select(df.columns.toIndexedSeq.map(c =>
        if (c == gcol) cdim("__g").as(gcol) else df(c)): _*)
    val keepCond = rest.map(c => marked(c) <=> keptCombos(s"__q_$c"))
      .foldLeft(marked(gcol) <=> keptCombos("__q_g"))(_ && _)
    marked.join(keptCombos, keepCond, "left_semi")
  }

  /** Contiguous global sequence ids 0..N−1 in `orderCol` order — the
    * "number the corpus" step of a corpus build (stable example ids,
    * shard-offset bookkeeping, join keys for downstream systems that
    * want dense longs). THE scale trap this replaces: the SQL
    * formulation `ROW_NUMBER() OVER (ORDER BY k)` is a GLOBAL window,
    * which Spark executes by moving every row to one partition (the
    * WindowExec single-partition warning) — a 100 TB corpus dies
    * there. This is the distributed twin: one range-partitioning
    * exchange + partition-local sort (the [[graft.ext.Layout
    * .compactPlan]] discipline — range partitions ARE the global
    * order), then zipWithIndex's two-phase indexing: a lightweight
    * job collecting per-partition COUNTS (row counts only — no data
    * moves) and a map-side add of each partition's cumulative
    * offset. One shuffle plus one metadata job at any corpus size.
    *
    * The RDD hop (zipWithIndex has no Column-API equivalent) leaves
    * whole-stage codegen for exactly the indexing map; everything
    * upstream/downstream of the returned frame plans normally. Ties
    * in `orderCol` get arbitrary-but-valid consecutive ids — pass a
    * unique key (or append one as a tiebreaker) when the mapping must
    * be reproducible across runs.
    */
  def assignIds(df: DataFrame, orderCol: String, out: String = "seq_id",
                partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    require(!df.columns.contains(out), s"output column $out already exists")
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        out, org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }

  /** One epoch's accepted documents plus the batch/exact-survivor
    * counts the ingest audit wants ([[epochIngest]]).
    */
  final case class EpochResult(accepted: DataFrame, nBatch: DataFrame,
                               nExact: DataFrame)

  /** Epoch-composed near-dedup ingest: fold `epochs` (in order) into
    * a standing corpus, each epoch running the production two-pass
    * policy — (1) exact-fingerprint dedup against the rolling
    * fingerprint store ([[Dedup.incrementalExact]]: anti-join on the
    * 8-byte fp, min-id within batch), then (2) MinHash-LSH near-dedup
    * of the exact survivors against the rolling BAND store
    * ([[Dedup.incrementalLshCandidates]] + exact n-gram-Jaccard
    * verification on candidates only): a survivor verified ≥
    * `jaccardNum/jaccardDen` similar to ANY standing-corpus doc is
    * dropped; batch-internal near-dups both survive (they meet again
    * as store entries in the NEXT epoch). Accepted docs roll all
    * three artifacts forward: corpus ids, fingerprint store, band
    * store.
    *
    * This is the composition the streaming ingest deliberately does
    * NOT attempt ([[graft.streaming.StreamIngest]]'s scaladoc): greedy
    * near-dedup is arrival-order-dependent, so the gateable contract
    * is PER-EPOCH — each epoch's accept set is deterministic given
    * its batch and the stores as of the previous epoch, and this
    * function pins exactly that fold (epochs ordered, stores rolled
    * between them).
    *
    * Scale shape per epoch: the batch hashes/LSHes map-side; the
    * corpus is touched only through the fingerprint COLUMN (anti-join)
    * and the band STORE (bucket-capped equi-join) — corpus text is
    * never re-read, nothing quadratic in corpus size runs, exactly
    * the per-epoch cost of the two incremental operators. Each
    * epoch's accept set is [[PlanCache.checkpointed]] (keyed
    * `cacheTag/e<i>`): epoch i+1's three rolled stores all reference
    * it, and without the cut the fold's lineage — and the planning
    * time — grows geometrically with epoch count.
    *
    * `verifyDocs` supplies the text relation for Jaccard verification
    * (normally the full documents table: the df-capped stop-shingle
    * set is estimated over the whole collection, and candidate pairs
    * always span batch + corpus).
    */
  def epochIngest(standing: DataFrame, epochs: Seq[DataFrame],
                  verifyDocs: DataFrame, idCol: String, textCol: String,
                  cacheTag: String, k: Int = 16, rowsPerBand: Int = 4,
                  maxBucket: Int = 64, dfCap: Int = 100,
                  jaccardNum: Int = 4, jaccardDen: Int = 5): Seq[EpochResult] = {
    require(epochs.nonEmpty, "epochIngest needs at least one epoch")
    def bandsOf(df: DataFrame) = Dedup.lshBands(
      Dedup.minhashSignatures(Dedup.tokenHashes(df, idCol, textCol), k),
      k, rowsPerBand)
    var fpStore = Dedup.fingerprintStore(standing, textCol)
    var bandStore = bandsOf(standing)
    epochs.zipWithIndex.map { case (batch0, i) =>
      val batch = batch0.select(col(idCol), col(textCol))
      val exact = Dedup.incrementalExact(batch, idCol, textCol, fpStore)
      val cands = Dedup.incrementalLshCandidates(bandsOf(exact), bandStore,
        maxBucket)
      val nearDrop = Dedup.ngramJaccardOnCandidates(verifyDocs, idCol, textCol,
          cands.select(col("doc_new").as("doc_a"), col("doc_corpus").as("doc_b")),
          dfCap)
        .where(col("inter") * jaccardDen >= col("uni") * jaccardNum)
        .select(col("doc_a").as(idCol)).distinct()
      val accepted = PlanCache.checkpointed(s"$cacheTag/e$i",
        exact.join(nearDrop, Seq(idCol), "left_anti"))(identity)
      fpStore = fpStore.unionByName(
        accepted.select(Hashing.h60(col(textCol)).as("fp")).distinct())
      bandStore = bandStore.unionByName(bandsOf(accepted))
      EpochResult(accepted,
        batch.agg(count(lit(1)).as("n_batch")),
        exact.agg(count(lit(1)).as("n_exact")))
    }
  }

  /** Run the pipeline over `docs`. Near-dup threshold is the rational
    * jaccardNum/jaccardDen (integer cross-multiplication — no float
    * compare anywhere).
    *
    * `maxRepDecile` < 10 enables a third gate between quality and
    * exact dedup: drop docs whose repeated-trigram decile
    * ([[TextStats.repetitionStats]]) exceeds it — phrase-level
    * boilerplate that unigram TTR passes. It costs one extra
    * (doc_id, hash) groupBy over gate survivors, so it is off by
    * default (10: decile is always ≤ 9). Run it only after a
    * minTokens ≥ 3 quality gate — docs with no trigram would
    * otherwise be dropped outright.
    *
    * `qualitySurvivor = true` upgrades the near-dup drop policy to
    * canonical-survivor selection ([[Dedup.keepCanonical]]): the pair
    * graph is closed into duplicate CLASSES and each class keeps its
    * highest-`n_tokens` member (ties → min id) instead of the min-id
    * member — "keep the best copy", the resolver a production
    * pipeline actually wants once quality scores exist. Implies the
    * component closure (subsumes `componentPolicy`); costs the same
    * O(log n) label loop plus one 24-byte-row struct-max aggregate.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             keepLang: String = "en",
             minTokens: Int = 30, minTtrDecile: Int = 3,
             maxRepDecile: Int = 10,
             jaccardNum: Int = 4, jaccardDen: Int = 5,
             k: Int = 16, rowsPerBand: Int = 4,
             maxBucket: Int = 64, dfCap: Int = 100,
             componentPolicy: Boolean = false,
             qualitySurvivor: Boolean = false): Curated = {
    val input = docs.select(col(idCol), col(textCol))
    // one gate projection carrying pass/fail flags instead of filtering
    // immediately: the audit counts then need no extra passes, and the
    // kept-frames below are cheap filters over the same projection
    def gateProjection(d: DataFrame): DataFrame =
      gateFlags(d, textCol, keepLang, minTokens, minTtrDecile)
    val gated = gateProjection(input)
    val gateStats = gated.agg(
      count(lit(1)).as("n_input"),
      sum(when(col("__lang_ok"), 1L).otherwise(0L)).as("n_lang"),
      sum(when(col("__qual_ok"), 1L).otherwise(0L)).as("n_quality"))
    val langKept = gated.where(col("__lang_ok"))
      .select(col(idCol), col(textCol))
    // PlanCache keys canonicalize the INPUT plan they are given — so
    // every cached relation here keys on the small `input` scan plan
    // (params live in the tag) and derives inside the build closure.
    // Keying on the derived plans instead was measured 10-45 s/call
    // once a session held other cached relations: canonicalizing the
    // multi-join near-dup tree is driver-side quadratic-ish work, paid
    // on every lookup, hit or miss.
    def repGate(kept: DataFrame): DataFrame =
      if (maxRepDecile >= 10) kept
      else {
        val ok = TextStats.repetitionStats(kept, idCol, textCol)
          .where(expr(s"((n_grams - n_distinct) * 10) div n_grams") <= maxRepDecile)
          .select(col("doc_id").as("__rep_id"))
        kept.join(ok, col(idCol) === col("__rep_id"), "left_semi")
      }
    val gateTag =
      s"$idCol/$textCol/$keepLang/$minTokens/$minTtrDecile/$maxRepDecile"
    val surv = PlanCache.cached(s"curation/surv/$gateTag", input) { d =>
      Dedup.exactByFingerprint(
        repGate(gateProjection(d).where(col("__qual_ok"))
          .select(col(idCol), col(textCol), col("n_tokens"))),
        idCol, textCol)
    }
    val qualityKept = gated.where(col("__qual_ok"))
      .select(col(idCol), col(textCol), col("n_tokens"))

    val bands = Dedup.lshBands(
      Dedup.minhashSignatures(Dedup.tokenHashes(surv, idCol, textCol), k),
      k, rowsPerBand)
    // the two drop-side artifacts are CHECKPOINTED, not just persisted:
    // their full lineage is the multi-join near-dup subtree, and it
    // would otherwise be inlined (twice — audit count + anti-join) into
    // every composed consumer plan; as LogicalRDDs they compose for free
    val verified = PlanCache.checkpointed(
      s"curation/pairs/$gateTag/$jaccardNum/$jaccardDen/$k/$rowsPerBand/$maxBucket/$dfCap",
      input) { _ =>
      Dedup.ngramJaccardOnCandidates(surv, idCol, textCol,
          Dedup.lshCandidatePairs(bands, maxBucket), dfCap)
        .where(col("inter") * jaccardDen >= col("uni") * jaccardNum)
    }
    // members of degenerate buckets, minus each bucket's representative
    val clusterDrops = PlanCache.checkpointed(
      s"curation/clusters/$gateTag/$k/$rowsPerBand/$maxBucket", input) { _ =>
      bands
        .join(Dedup.lshDegenerateClusters(bands, maxBucket), Seq("band", "sig"))
        .where(col("doc_id") =!= col("rep_doc"))
        .select("doc_id")
    }
    // near-dup drop policy. Default: drop each verified pair's doc_b —
    // single-pass, SQL-expressible for the oracle, but it under-merges
    // on chains (pairs (B,C),(A,C) leave B alive though transitively
    // duplicate with A). componentPolicy=true closes the pair graph
    // with [[Dedup.connectedComponents]] and keeps exactly one min-id
    // representative per duplicate CLASS — the policy a production
    // dedup wants; it costs the O(log n)-round iterative loop, and its
    // closure has no single-pass SQL twin (the components QUERY
    // oracle covers it via a recursive CTE instead).
    val pairDrops =
      if (qualitySurvivor)
        PlanCache.checkpointed(
          s"curation/qualdrops/$gateTag/$jaccardNum/$jaccardDen/$k/$rowsPerBand/$maxBucket/$dfCap",
          input) { _ =>
          // close the pair graph once, pick each class's max-quality
          // (n_tokens) member via keepCanonical's struct-max (24-byte
          // shuffle rows), then drop every other node of the class.
          // keepCanonical labels ALL surv docs (singletons keep
          // themselves, class_size 1); restricting the anti-join side
          // to class_size > 1 keeps it |pair-graph classes|-sized
          val comp = Dedup.connectedComponentsShared(verified, "doc_a", "doc_b")
          val survivors = Dedup.keepCanonical(
              surv.select(col(idCol), col("n_tokens")),
              idCol, "n_tokens", verified, "doc_a", "doc_b", Some(comp))
            .where(col("class_size") > 1)
          comp.select(col("node").as("doc_id"))
            .join(survivors.select(col(idCol).cast("long").as("__keep")),
              col("doc_id") === col("__keep"), "left_anti")
        }
      else if (componentPolicy)
        PlanCache.checkpointed(
          s"curation/compdrops/$gateTag/$jaccardNum/$jaccardDen/$k/$rowsPerBand/$maxBucket/$dfCap",
          input) { _ =>
          Dedup.componentDrops(verified, "doc_a", "doc_b")
            .withColumnRenamed("node", "doc_id")
        }
      else verified.select(col("doc_b").as("doc_id"))
    val drops = pairDrops
      .union(clusterDrops).distinct()
      .withColumnRenamed("doc_id", "__drop_id")
    val finalDocs = surv
      .join(drops, col(idCol) === col("__drop_id"), "left_anti")
    Curated(input, langKept, qualityKept, surv, verified, finalDocs, gateStats)
  }
}
