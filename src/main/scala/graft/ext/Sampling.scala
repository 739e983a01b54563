package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines — the operators that carve a curated corpus into
  * train/val/test and rebalance domain mixtures.
  *
  * Everything keys off a salted content hash ([[Hashing.h32]] over
  * the stringified key), never `rand()`:
  *
  *  - reproducible across runs, executors, partitionings, AND engines
  *    (the DuckDB oracle computes the identical buckets), which is
  *    what makes a resumable 100 TB pipeline possible — re-running a
  *    failed stage re-draws the same sample;
  *  - pure map-side codegen projection — sampling 100 TB costs one
  *    scan, zero shuffles, and composes with partition pruning;
  *  - independent decisions come from independent SALTS (the split
  *    bucket and a downsampling bucket of the same row are
  *    decorrelated by their salt strings, not by praying over one
  *    hash's bits).
  *
  * Fractions are integer per-cent / per-mille rationals — no float
  * thresholds anywhere, so bucket membership is exact on both
  * engines.
  */
object Sampling {

  /** The salted hash bucket of `key` in [0, den): the primitive every
    * operator here builds on. DuckDB twin:
    * `CAST('0x' || substr(md5(CAST(key AS VARCHAR) || salt), 1, 8) AS BIGINT) % den`.
    */
  def hashBucket(key: Column, den: Int, salt: String = ""): Column = {
    require(den > 0, s"den=$den must be positive")
    val keyed = if (salt.isEmpty) key.cast("string")
                else concat(key.cast("string"), lit(salt))
    Hashing.h32(keyed) % den
  }

  /** Keep rows whose bucket falls below num/den — deterministic
    * Bernoulli(num/den) by key. Same key + salt ⇒ same decision,
    * forever.
    */
  def byHash(df: DataFrame, key: Column, num: Int, den: Int,
             salt: String = ""): DataFrame = {
    require(num >= 0 && num <= den, s"num=$num must be in [0, den=$den]")
    df.where(hashBucket(key, den, salt) < num)
  }

  /** Append a `split` column assigning each row to val/test/train by
    * percentage (val takes buckets [0, valPct), test
    * [valPct, valPct+testPct), train the rest) — disjoint and
    * exhaustive by construction, stable under corpus growth: a row's
    * assignment never changes when other rows are added, the property
    * that keeps eval sets uncontaminated across dataset versions.
    */
  def withSplit(df: DataFrame, key: Column, valPct: Int, testPct: Int,
                salt: String = "split", out: String = "split"): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"valPct=$valPct + testPct=$testPct must fit in 100")
    val b = hashBucket(key, 100, salt)
    df.withColumn(out,
      when(b < valPct, "val")
        .when(b < valPct + testPct, "test")
        .otherwise("train"))
  }

  /** Keep-decision for stratified (per-stratum-rate) downsampling:
    * true when the row's [0,1000) bucket falls under its stratum's
    * per-mille rate — the domain-mixture rebalancing primitive
    * ("keep 50% of web, 100% of books"). `rates` compiles to a
    * literal CASE chain (no join, pure codegen); strata absent from
    * `rates` fall back to `defaultPerMille`.
    */
  def stratifiedKeep(key: Column, stratum: Column, rates: Seq[(String, Int)],
                     defaultPerMille: Int, salt: String = "strat"): Column = {
    (rates.map(_._2) :+ defaultPerMille).foreach(r =>
      require(r >= 0 && r <= 1000, s"per-mille rate $r must be in [0, 1000]"))
    val rate = rates.foldRight(lit(defaultPerMille)) { case ((s, r), acc) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    hashBucket(key, 1000, salt) < rate
  }

  /** Filter form of [[stratifiedKeep]]. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 rates: Seq[(String, Int)], defaultPerMille: Int,
                 salt: String = "strat"): DataFrame =
    df.where(stratifiedKeep(key, stratum, rates, defaultPerMille, salt))

  /** Greedy contiguous sequence packing: assign each document to a
    * training bin of ~`budget` tokens, walking documents in `orderCol`
    * order within each `partCols` group (bin = tokens-before-me div
    * budget — the "concat the shard, chop every budget tokens"
    * assignment, deterministic and engine-portable).
    *
    * Scale shape: the prefix sum is a window PARTITIONED BY the shard
    * columns — every shard packs independently in parallel, and a
    * shard is whatever already bounds your data (split × lang ×
    * source, a file, a bucket). There is deliberately NO unpartitioned
    * variant: a global prefix-sum over 100 TB would serialize into one
    * task, and cross-shard bin continuity buys nothing for training
    * batches.
    *
    * `orderCol` must be unique within a shard: the default window
    * frame under an ORDER BY is RANGE (tied rows would all see the
    * same prefix sum) — identical semantics on the DuckDB side, so
    * results still match, but "ties share a prefix" is rarely the
    * packing a caller wants.
    */
  /** Deterministic fixed-size sample: exactly min(k, |stratum|) rows
    * per stratum, the ones with the smallest salted hash — a
    * "reservoir" whose membership is a pure function of (key, salt),
    * so it reproduces across runs/engines and is STABLE under corpus
    * growth in expectation (a new row displaces at most one member,
    * unlike rand()-ranked sampling where everything reshuffles).
    * One shuffle on the strata; the rank window streams each stratum.
    *
    * Contract (same class of requirement as [[packBins]]'s order
    * key): `key` must be UNIQUE within each stratum and non-null.
    * The (hash, key) sort breaks hash collisions between distinct
    * keys, but duplicate key values produce identical sort tuples and
    * row_number picks between them arbitrarily per run — use the row
    * id, not a repeatable attribute. Null keys hash to null and sort
    * first, permanently seizing reservoir slots; filter them
    * upstream.
    */
  def reservoirPerStratum(df: DataFrame, strataCols: Seq[String], key: Column,
                          k: Int, salt: String = "resv"): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(Hashing.h32(concat(key.cast("string"), lit(salt))), key)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic WEIGHTED fixed-size sample: min(k, |stratum|) rows
    * per stratum, selected by smallest `hash div weight` — an
    * integer-exact surrogate of weighted reservoir sampling
    * (Efraimidis–Spirakis keys are u^(1/w); this ranks by the
    * integer quotient u/w instead, which keeps the defining
    * properties — selection probability strictly monotone in weight,
    * membership a pure function of (key, salt, weight) — while
    * staying exactly reproducible across engines, which floating
    * pow/log cannot be. The pairwise win law differs from the
    * exponential race — u/w gives P(i beats j) = wᵢ/2wⱼ for wᵢ ≤ wⱼ
    * instead of wᵢ/(wᵢ+wⱼ) — documented, not hidden).
    *
    * Same key contract as [[reservoirPerStratum]] (unique, non-null
    * within stratum); `weight` must additionally be a POSITIVE
    * integral column. The two invalid cases fail differently: a ZERO
    * weight throws DIVIDE_BY_ZERO at runtime (this engine runs with
    * spark.sql.ansi.enabled=true, where integral `div` by zero is an
    * error, not null — loud, which is fine), while a NULL weight
    * divides to a null priority, which sorts first and permanently
    * seizes a reservoir slot — silent, so filter nulls upstream.
    */
  def weightedReservoirPerStratum(df: DataFrame, strataCols: Seq[String],
                                  key: Column, weight: Column, k: Int,
                                  salt: String = "wres"): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    Seq("__wpri", "__wh", "__ww", "__rk").foreach(t =>
      require(!df.columns.contains(t),
        s"column name $t is reserved by weightedReservoirPerStratum"))
    // integral `div`, not `/`: float division then truncation can
    // round across the integer boundary and disagree with the
    // oracle's exact `//`
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(col("__wpri"), key)
    df.withColumn("__wh", Hashing.h32(concat(key.cast("string"), lit(salt))))
      .withColumn("__ww", weight.cast("long"))
      .withColumn("__wpri", expr("__wh div __ww"))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk", "__wpri", "__wh", "__ww")
  }

  /** Deterministic token-budget selection: per stratum, keep documents
    * in salted-hash order until the budget is spent — "give me exactly
    * ~N tokens of each language", the data-mixture primitive that
    * turns mixture WEIGHTS into an actual training set. A row is kept
    * while the tokens BEFORE it (hash order) total under `budget`, so
    * the first document always survives and overshoot is bounded by
    * one document.
    *
    * Hash-ranked like [[reservoirPerStratum]] (and with the same key
    * contract: unique within stratum, non-null), so the selection is
    * reproducible across runs/engines and stable under corpus growth —
    * a new document only displaces the tail of its stratum, never
    * reshuffling the whole sample the way rand() ranking would.
    *
    * Scale shape: one window partitioned by the strata — each stratum
    * prefix-sums independently in parallel; there is deliberately no
    * unpartitioned variant (a global prefix-sum serializes into one
    * task, same reasoning as [[packBins]]).
    */
  def tokenBudget(df: DataFrame, strataCols: Seq[String], key: Column,
                  tokensCol: Column, budget: Long,
                  salt: String = "budget"): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    require(strataCols.nonEmpty,
      "tokenBudget requires strata columns: an unpartitioned prefix-sum cannot scale")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(Hashing.h32(concat(key.cast("string"), lit(salt))), key)
    df.withColumn("__tb_prefix",
        (sum(tokensCol).over(w) - tokensCol).cast("bigint"))
      .where(col("__tb_prefix") < budget)
      .drop("__tb_prefix")
  }

  /** Temperature-rebalanced token budget (α = 0.5): split
    * `totalBudget` across strata in proportion to √(stratum row
    * count) — the multilingual-LLM mixture rule that upsamples tail
    * languages relative to their natural share without letting the
    * head starve them — then keep each stratum's documents in salted-
    * hash order until its share is spent ([[tokenBudget]]'s
    * per-stratum selection with DATA-DERIVED budgets).
    *
    * Everything is integer-exact on both engines: the weight is
    * isqrt(n) = floor(sqrt(n)) — exact for n < 2^52 because an IEEE
    * correctly-rounded sqrt of an integer that far below 2^52 cannot
    * cross an integer boundary (counts at 100 TB are ≪ that) — and
    * the share is `budget·w div Σw` in DECIMAL(38,0)/HUGEINT integral
    * arithmetic, so no float threshold anywhere can flip a membership.
    *
    * By default the tempering is over ROW counts; set
    * `weighByTokens = true` to temper over each stratum's TOKEN MASS
    * (Σ tokensCol) instead — the convention most multilingual
    * sampling papers use, and materially different when strata have
    * skewed document lengths (a language of few huge documents is
    * "bigger" by mass than by count). Same isqrt exactness bound
    * (token mass at 100 TB still ≪ 2^52 per stratum... if not, scale
    * the unit upstream).
    *
    * Scale shape: one partial-aggregated groupBy produces the
    * per-stratum counts (rows = |strata|, tiny), the share relation
    * broadcasts back onto the corpus, and the selection is the same
    * single per-stratum prefix-sum window as [[tokenBudget]]. Rows
    * with a null stratum drop at the share join — coalesce upstream
    * if they must participate.
    */
  def temperedTokenBudget(df: DataFrame, strataCols: Seq[String], key: Column,
                          tokensCol: Column, totalBudget: Long,
                          salt: String = "mix",
                          weighByTokens: Boolean = false): DataFrame = {
    require(totalBudget > 0, s"totalBudget=$totalBudget must be positive")
    require(strataCols.nonEmpty,
      "temperedTokenBudget requires strata columns: an unpartitioned prefix-sum cannot scale")
    val strata = strataCols.map(col)
    val mass = if (weighByTokens) sum(tokensCol.cast("long")) else count(lit(1))
    val weights = df.groupBy(strata: _*)
      .agg(mass.as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("bigint"))
    val wsum = weights.agg(sum(col("__w")).as("__wsum"))
    val targets = weights.crossJoin(wsum)
      .withColumn("__target",
        expr(s"CAST(CAST($totalBudget AS DECIMAL(38,0)) * __w AS DECIMAL(38,0)) div __wsum"))
      .select(strata :+ col("__target"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata: _*)
      .orderBy(Hashing.h32(concat(key.cast("string"), lit(salt))), key)
    df.join(broadcast(targets), strataCols)
      .withColumn("__prefix", (sum(tokensCol).over(w) - tokensCol).cast("bigint"))
      .where(col("__prefix") < col("__target"))
      .drop("__prefix", "__target")
  }

  /** α=0.5 temperature UPSAMPLING — the dual of
    * [[temperedTokenBudget]]: instead of cutting head strata down to
    * their tempered share, repeat tail strata up to it. Each stratum
    * gets the integer repeat factor
    * `ceil(temperedShare / naturalShare)` =
    * `ceil(isqrt(n_g)·N / (Σ isqrt·n_g))` (exact DECIMAL integral
    * arithmetic, ≥ 1 always, 1 for head strata by construction), and
    * every row is emitted once per epoch with an `epoch` column in
    * [0, factor) — the "repeat small languages k× per training pass"
    * primitive, with the epoch index preserved so downstream shuffling
    * can decorrelate repeats (salt with it).
    *
    * Scale shape: the per-stratum counts are one partial-aggregated
    * groupBy (rows = |strata|), factors broadcast back, and the
    * expansion is a pure map-side `explode(sequence(...))` — no
    * shuffle of the corpus, output volume = Σ n_g·f_g by design.
    * Same isqrt exactness bound and null-stratum contract as
    * [[temperedTokenBudget]].
    */
  def temperedRepeats(df: DataFrame, strataCols: Seq[String],
                      out: String = "epoch"): DataFrame = {
    require(strataCols.nonEmpty, "temperedRepeats requires strata columns")
    val strata = strataCols.map(col)
    val counts = df.groupBy(strata: _*).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("bigint"))
    val tot = counts.agg(sum(col("__n")).as("__tot"), sum(col("__w")).as("__wsum"))
    val factors = counts.crossJoin(tot)
      .withColumn("__f",
        expr("CAST((CAST(__w AS DECIMAL(38,0)) * __tot + CAST(__wsum AS DECIMAL(38,0)) * __n - 1) AS DECIMAL(38,0)) div (CAST(__wsum AS DECIMAL(38,0)) * __n)"))
      .select(strata :+ col("__f"): _*)
    df.join(broadcast(factors), strataCols)
      .withColumn(out, explode(sequence(lit(0L), col("__f") - 1)))
      .drop("__f")
  }

  /** Curriculum staging: append an `out` column assigning each row to
    * one of `nBuckets` equal-count stages per stratum, walking rows in
    * `orderCols` order (supply a difficulty proxy plus a unique
    * tie-breaker to make the order total — SQL NTILE puts its
    * remainder rows in the LEADING buckets, identically on both
    * engines, but tied rows land arbitrarily). "Quartile the corpus
    * by length per language, train easy→hard" is
    * `curriculumBuckets(docs, Seq("lang"), Seq($"n_chars", $"doc_id"), 4)`.
    *
    * Scale shape: one window per stratum — same single
    * shuffle-and-sort cost and per-stratum skew contract as
    * [[tokenBudget]]; there is deliberately no unpartitioned variant.
    */
  def curriculumBuckets(df: DataFrame, strataCols: Seq[String],
                        orderCols: Seq[Column], nBuckets: Int,
                        out: String = "stage"): DataFrame = {
    require(nBuckets > 0, s"nBuckets=$nBuckets must be positive")
    require(strataCols.nonEmpty,
      "curriculumBuckets requires strata columns: an unpartitioned ntile cannot scale")
    require(orderCols.nonEmpty, "curriculumBuckets needs order columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(out, ntile(nBuckets).over(w))
  }

  def packBins(df: DataFrame, partCols: Seq[String], orderCol: Column,
               tokensCol: Column, budget: Int, out: String = "bin"): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    require(partCols.nonEmpty,
      "packBins requires shard columns: an unpartitioned prefix-sum cannot scale")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*).orderBy(orderCol)
    // integral `div`, not `/`: Spark's `/` is double division, which
    // loses exactness once a shard's prefix sum passes 2^53 — the
    // oracle's `//` is exact at all magnitudes and bins must match it
    df.withColumn("__pack_prefix",
        (sum(tokensCol).over(w) - tokensCol).cast("bigint"))
      .withColumn(out, expr(s"__pack_prefix div $budget"))
      .drop("__pack_prefix")
  }
}
