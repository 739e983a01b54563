package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics for corpus profiling (length/quality
  * distributions drive curation thresholds).
  *
  * Two quantile paths with an explicit trade:
  *
  *  - [[quantiles]] — EXACT type-7 linear interpolation (identical
  *    definition to DuckDB's `quantile_cont`, so results are
  *    oracle-checkable bit-for-bit after integer projection). Spark's
  *    exact `percentile` buffers each group's values — fine for
  *    per-group profiling where groups fit an executor, wrong for a
  *    single 100 TB-wide group;
  *  - [[approxQuantiles]] — `approx_percentile` (t-digest style
  *    sketch, bounded memory, mergeable map-side): THE 100 TB path.
  *    Its exact outputs are engine-specific, so correctness is pinned
  *    by spec against the exact path within the sketch's accuracy
  *    bound, not by the DuckDB oracle.
  */
object Stats {

  /** Exact per-group quantiles of `value` at `ps`, one output column
    * per requested quantile named `p<pct>` (e.g. p50, p99).
    */
  def quantiles(df: DataFrame, groupCols: Seq[String], value: Column,
                ps: Seq[Double]): DataFrame =
    quantilesWith(df, groupCols, value, ps,
      pcts => s"percentile(__v, array($pcts))")

  /** Sketched per-group quantiles (same column naming), with
    * `accuracy` as in `approx_percentile` (higher = tighter).
    */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], value: Column,
                      ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    quantilesWith(df, groupCols, value, ps,
      pcts => s"approx_percentile(__v, array($pcts), $accuracy)")

  private def quantilesWith(df: DataFrame, groupCols: Seq[String],
                            value: Column, ps: Seq[Double],
                            aggSql: String => String): DataFrame = {
    val cols = ps.zipWithIndex.map { case (p, i) =>
      element_at(col("__ps"), i + 1).as(s"p${(p * 100).round}")
    }
    df.withColumn("__v", value)
      .groupBy(groupCols.map(col): _*)
      .agg(expr(aggSql(ps.mkString(", "))).as("__ps"))
      .select(groupCols.map(col) ++ cols: _*)
  }

  // ----- Cardinality ------------------------------------------------

  /** Exact per-group cardinality profile of `value`: (group, n_rows,
    * n_distinct). Exact distinct is a full shuffle of the distinct
    * values — the oracle-checkable baseline, not the 100 TB path.
    */
  def cardinality(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    df.withColumn("__v", value)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("__v")).as("n_distinct"))

  /** Per-group DataSketches HLL sketches of `value` — THE 100 TB
    * cardinality path: one pass, bounded memory (2^lgK registers),
    * partial-aggregated map-side, and the output sketch is a VALUE.
    * Sketches built per shard/day/group union losslessly into coarser
    * rollups ([[hllUnion]]) without re-reading the data — the property
    * exact countDistinct fundamentally lacks (distinct sets don't
    * add). Estimates are engine-specific, so correctness is
    * spec-pinned against the exact path within HLL error bounds, not
    * DuckDB-oracle-checked.
    */
  def hllSketches(df: DataFrame, groupCols: Seq[String], value: Column,
                  lgK: Int = 12): DataFrame =
    df.withColumn("__v", value)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col("__v"), lit(lgK)).as("sketch"))

  /** Union previously-built sketches (e.g. per-group → global) and
    * estimate: (n_groups, estimate). `allowDifferentLgK` tolerates
    * mixing sketches built at different precisions (the union
    * downgrades to the coarsest).
    */
  def hllUnion(sketches: DataFrame, allowDifferentLgK: Boolean = false): DataFrame =
    sketches.agg(count(lit(1)).as("n_groups"),
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(allowDifferentLgK)))
        .as("estimate"))

  // ----- Column profiling -------------------------------------------

  /** Data-quality profile of `cols`: ONE row per column —
    * `(column, n_rows, n_nulls, n_distinct, min_int, max_int,
    * max_strlen)` — computed in a single pass over `df`.
    * `min_int`/`max_int` are populated for integral columns and -1
    * otherwise (a sentinel, not NULL: the all-BIGINT no-NULL output
    * crosses engines and dataframe bridges without type coercion
    * surprises); `max_strlen` is the longest string rendering, the
    * column-width statistic a sink schema needs.
    *
    * This is the "validate a snapshot before training on it" operator:
    * completeness (n_nulls), key-ness (n_distinct == n_rows), domain
    * bounds (min/max) per column, one scan.
    *
    * Scale note: exact multi-column COUNT(DISTINCT) makes Catalyst
    * EXPAND each row once per distinct aggregate (×|cols| shuffle
    * volume). That is the oracle-checkable baseline; at 100 TB use
    * [[profileApprox]], which swaps in `approx_count_distinct` (HLL++,
    * partial-aggregated, no Expand — one plain scan for any number of
    * columns, estimates within ~2%).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** [[profile]] with sketched distinct counts — THE 100 TB shape (no
    * Expand, single scan); spec-pinned against [[profile]].
    */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctAgg: String => Column): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val schema = df.schema
    val aggs = cols.flatMap { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val integral = schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      def ext(f: Column => Column): Column =
        if (integral) coalesce(f(col(c)).cast("long"), lit(-1L)) else lit(-1L)
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        distinctAgg(c).cast("long").as(s"__nd_$c"),
        ext(min).as(s"__mn_$c"),
        ext(max).as(s"__mx_$c"),
        coalesce(max(length(col(c).cast("string"))).cast("long"), lit(-1L))
          .as(s"__ml_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // one wide row → |cols| rows: a driver-sized explode, not a shuffle
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_int"), col(s"__mx_$c").as("max_int"),
        col(s"__ml_$c").as("max_strlen"))
    }
    wide.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  // ----- Histograms -------------------------------------------------

  /** Equi-width histogram of non-negative integer `value` per group:
    * `(groupCols..., bucket, bucket_lo, n)` where
    * `bucket = min(nBuckets-1, value div width)` (the last bucket
    * absorbs the tail) and `bucket_lo = bucket * width`. Integral
    * `div` end to end — no float bucket-edge ambiguity, the DuckDB
    * twin (`//`) bins identically. Empty buckets are absent (sparse
    * output; at 100 TB a dense 0-filled histogram per group is a
    * driver-side fill, not a data-side join).
    *
    * One partial-aggregated groupBy — shuffle rows bounded by
    * groups × nBuckets regardless of input size.
    */
  def histogram(df: DataFrame, groupCols: Seq[String], value: Column,
                width: Int, nBuckets: Int): DataFrame = {
    require(width > 0, s"width=$width must be positive")
    require(nBuckets > 0, s"nBuckets=$nBuckets must be positive")
    val b = least(lit(nBuckets - 1L),
      expr(s"__hv div $width"))
    df.withColumn("__hv", value.cast("long"))
      .withColumn("bucket", b)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", col("bucket") * width)
  }

  /** Population stability index between an `expected` (reference) and
    * an `actual` sample of `value` over the SAME fixed equi-width
    * bucketing — the standard drift alarm between dataset versions,
    * train/serving distributions, or split halves (PSI < 0.1 stable,
    * 0.1–0.25 drifting, > 0.25 shifted). ONE row:
    * `(psi_e9, n_expected, n_actual)`.
    *
    * Determinism contract (the [[graft.queries]] e9 pattern): each
    * bucket's share is floored at 1e-6 (the conventional zero-bucket
    * guard — PSI is infinite on a truly-empty-vs-occupied bucket),
    * its term `(p−q)·ln(p/q)` — non-negative by construction — is
    * rounded ONCE to an e9-scaled BIGINT, and the cross-bucket sum is
    * integer, so float summation order can never flip the result.
    *
    * Scale shape: two partial-aggregated [[histogram]] scans (shuffle
    * rows ≤ nBuckets each); everything after runs on ≤ nBuckets rows
    * against two broadcast single-row totals.
    *
    * Contract: `value` must be NON-NEGATIVE (inherited from
    * [[histogram]]'s non-negative-integer bucketing). A negative value
    * produces a negative bucket id that falls off the `range(nBuckets)`
    * grid join — excluded from psi_e9 AND from n_expected/n_actual
    * without an error — so quantize signed metrics to a non-negative
    * scale first (shift, or abs, whichever the drift question means).
    * The caller can audit the contract cheaply: n_expected/n_actual
    * equal the input row counts iff no value was out of range.
    */
  def psi(expected: DataFrame, actual: DataFrame, value: Column,
          width: Int, nBuckets: Int): DataFrame = {
    val he = histogram(expected, Nil, value, width, nBuckets)
      .select(col("bucket"), col("n").as("__ne"))
    val ha = histogram(actual, Nil, value, width, nBuckets)
      .select(col("bucket"), col("n").as("__na"))
    val grid = expected.sparkSession.range(nBuckets).toDF("bucket")
    val j = grid.join(he, Seq("bucket"), "left")
      .join(ha, Seq("bucket"), "left")
      .na.fill(0L, Seq("__ne", "__na"))
    val tot = j.agg(sum(col("__ne")).as("__te"), sum(col("__na")).as("__ta"))
    j.crossJoin(broadcast(tot))
      .select(col("__ne"), col("__na"),
        greatest(col("__ne") / col("__te"), lit(1e-6)).as("__p"),
        greatest(col("__na") / col("__ta"), lit(1e-6)).as("__q"))
      .select(col("__ne"), col("__na"),
        round((col("__p") - col("__q")) * log(col("__p") / col("__q")) * lit(1e9))
          .cast("bigint").as("__term_e9"))
      .agg(sum(col("__term_e9")).as("psi_e9"),
        sum(col("__ne")).as("n_expected"),
        sum(col("__na")).as("n_actual"))
  }

  /** Exact two-sample Kolmogorov–Smirnov distance per stratum:
    * `(strata..., ks_num, ks_den, n_a, n_b)` where the KS statistic
    * is the RATIONAL ks_num / ks_den — max over observed values of
    * |cumA·n_b − cumB·n_a|, over n_a·n_b. Everything is integer, so
    * unlike the float-CDF formulation the max can never flip between
    * engines; ties contribute after both sides' tied rows (the
    * standard ties convention, implied by evaluating the CDF at
    * distinct values). [[psi]]'s exact cousin: psi needs a bucketing
    * choice, KS doesn't — use KS when the metric is already discrete
    * and psi when it needs quantizing.
    *
    * `value` must be integer-typed (quantize floats first, exactly
    * the decision [[psi]]'s bucketing makes explicit), and
    * n_a·n_b must fit a long — at 2⁶³ that is ~3e9 rows per side per
    * stratum; shard the stratum first if you have more.
    *
    * Scale shape: one partial-aggregated union-groupBy collapses the
    * corpus to DISTINCT (stratum, value) rows — the shuffle carries
    * counts, not rows — then one window per stratum walks those
    * distinct values. Per-stratum distinct-value cardinality is the
    * skew contract (quantization bounds it when the metric is
    * continuous).
    */
  def ks(a: DataFrame, b: DataFrame, strataCols: Seq[String],
         value: Column): DataFrame = {
    require(strataCols.nonEmpty,
      "ks requires strata columns: an unpartitioned CDF walk cannot scale")
    val strata = strataCols.map(col)
    def tag(df: DataFrame, ca: Long, cb: Long) =
      df.select(strata ++ Seq(value.cast("long").as("__v"),
        lit(ca).as("__ca"), lit(cb).as("__cb")): _*)
    val u = tag(a, 1L, 0L).unionByName(tag(b, 0L, 1L))
      .groupBy(strata :+ col("__v"): _*)
      .agg(sum(col("__ca")).as("__ca"), sum(col("__cb")).as("__cb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata: _*).orderBy(col("__v"))
    val whole = org.apache.spark.sql.expressions.Window
      .partitionBy(strata: _*)
    u.withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .withColumn("__na", sum(col("__ca")).over(whole))
      .withColumn("__nb", sum(col("__cb")).over(whole))
      .groupBy(strata: _*)
      .agg(max(abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
          .as("ks_num"),
        max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"))
      .withColumn("ks_den", col("n_a") * col("n_b"))
      .select(strata ++ Seq(col("ks_num"), col("ks_den"),
        col("n_a"), col("n_b")): _*)
  }

  /** Pearson chi-square homogeneity statistic between two cohorts of
    * one categorical column: ONE row `(chi2_e9, dof, n_a, n_b)` —
    * the categorical drift test completing the drift family ([[psi]]
    * quantizes a numeric metric, [[ks]] walks an ordered CDF; chi2 is
    * the test when the column is NOMINAL and bucketing/ordering are
    * meaningless). `cohort` must be a boolean column splitting the
    * frame (true → cohort a); each category contributes
    * (o−e)²/e for both cohort cells with e the usual row·col/N
    * expectation.
    *
    * Float discipline ([[psi]]'s): the two cells' terms are summed in
    * a FIXED written order (a-cell + b-cell, each a chain of exactly-
    * rounded IEEE ops on exact integer counts — the products stay
    * under 2⁵³ up to ~3e9 rows per side at 1e6 categories), rounded
    * ONCE per category to an e9 BIGINT; the cross-category sum is
    * integer, so partition/summation order cannot flip the gate.
    *
    * Scale shape: one partial-aggregated groupBy collapses the corpus
    * to |categories| count rows; everything after runs on those
    * against one broadcast totals row. Category cardinality is the
    * only contract (a chi-square over an unbounded-cardinality column
    * is statistically meaningless anyway — quantize first, which is
    * [[psi]]).
    */
  def chiSquare(df: DataFrame, cohort: Column, category: Column): DataFrame = {
    val obs = df.select(cohort.as("__c"), category.as("__cat"))
      .groupBy("__cat")
      .agg(sum(when(col("__c"), 1L).otherwise(0L)).as("__oa"),
        sum(when(!col("__c"), 1L).otherwise(0L)).as("__ob"))
    val tot = obs.agg(sum(col("__oa")).as("__ta"), sum(col("__ob")).as("__tb"),
      sum(col("__oa") + col("__ob")).as("__n"))
    val rowTot = col("__oa") + col("__ob")
    val ea = (col("__ta").cast("double") * rowTot) / col("__n")
    val eb = (col("__tb").cast("double") * rowTot) / col("__n")
    val term = (col("__oa") - ea) * (col("__oa") - ea) / ea +
      (col("__ob") - eb) * (col("__ob") - eb) / eb
    obs.crossJoin(broadcast(tot))
      .select(col("__oa"), col("__ob"),
        round(term * lit(1e9)).cast("bigint").as("__term_e9"))
      .agg(sum(col("__term_e9")).as("chi2_e9"),
        (count(lit(1)) - lit(1)).cast("bigint").as("dof"),
        sum(col("__oa")).as("n_a"), sum(col("__ob")).as("n_b"))
  }

  /** Rolling z-score anomaly flags: for each row, compare its integer
    * measure against the mean ± z·σ of the SAME key's rows in the
    * trailing `[ts − windowMs, ts − 1]` ms window (equivalently
    * `[ts − windowMs, ts)`: the left endpoint IS included, the row's
    * own millisecond is not) — EXCLUSIVE of the current
    * row and of its same-millisecond peers, so a spike can never mask
    * itself and tied timestamps cannot make the verdict order-
    * dependent. The live-metric twin of [[zOutlierFlags]]: the flag
    * is decided by the identical integer cross-multiplication
    * (n·x − s)² > z²·(n·q − s²) in DECIMAL(38,0), no division, no
    * sqrt, no float — bit-exact on both engines. Rows with fewer than
    * `minN` trailing observations flag false (no evidence, no alarm);
    * a null measure flags null. The same DECIMAL moment-overflow
    * loud-failure contract as [[zOutlierFlags]] applies.
    *
    * Scale shape: ONE hash shuffle on the keys + one in-partition
    * sort serves all six frame aggregates (shared window); per-key
    * event volume is the skew contract, the same as
    * [[TimeJoin.sessionize]]'s. The trailing frame is deliberately
    * NOT a single bounded RANGE frame: Spark re-evaluates a
    * bounded sliding frame's aggregates from scratch for every row
    * (no retraction), an O(rows × frame) blow-up the 8 GiB
    * survivability probe measured at 236 s for 20 k rows × ~1300-row
    * frames of DECIMAL arithmetic. Each moment is instead the
    * DIFFERENCE of two unbounded-start running frames
    * ((−∞, −1] minus (−∞, −windowMs−1]), which Spark maintains
    * incrementally — O(rows) total, measured back under a second —
    * and integer/DECIMAL subtraction is exact, so the verdicts are
    * bit-identical to the bounded-frame formulation.
    */
  def rollingZOutliers(df: DataFrame, keys: Seq[String], tsCol: String,
                       ints: Column, windowMs: Long, z: Int = 3,
                       minN: Int = 2, out: String = "is_outlier"): DataFrame = {
    require(keys.nonEmpty, "rollingZOutliers needs key columns")
    require(windowMs > 0, s"windowMs=$windowMs must be positive")
    require(z > 0, s"z=$z must be positive")
    require(minN >= 2, s"minN=$minN: variance needs at least 2 observations")
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val base = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.toIndexedSeq.map(col): _*)
      .orderBy(unix_millis(col(tsCol)))
    val upTo = base.rangeBetween(Window.unboundedPreceding, -1L)
    val before = base.rangeBetween(Window.unboundedPreceding, -windowMs - 1L)
    val c = ints.cast("long")
    def diff(agg: org.apache.spark.sql.expressions.WindowSpec => Column): Column =
      coalesce(agg(upTo), lit(0).cast(D)) - coalesce(agg(before), lit(0).cast(D))
    val n = count(c).over(upTo) - count(c).over(before)
    val s = diff(sum(c.cast(D)).over(_))
    val q = diff(sum(c.cast(D) * c.cast(D)).over(_))
    val dev = n.cast(D) * c.cast(D) - s
    val varN3 = n.cast(D) * q - s * s
    val rawFlag = dev * dev > lit(z * z) * varN3
    df.withColumn(out,
      when(c.isNull, lit(null).cast("boolean"))
        .when(n < minN, lit(false))
        .when(rawFlag.isNull || varN3 < 0,
          raise_error(lit("rollingZOutliers: moment overflow (n*B^2 " +
            "headroom exceeded) - quantize the measure coarser upstream")))
        .otherwise(rawFlag))
  }

  // ----- Key-skew profiling -----------------------------------------

  /** Key-frequency skew profile of `key`: ONE row —
    * `(n_keys, n_rows, max_key_rows, p50_x100, p99_x100)` over the
    * per-key count distribution. THE pre-join diagnostic: a max far
    * above p99 says the shuffle has a hot key and the join wants
    * [[Skew.saltedJoin]] / AQE skew handling before it runs, which at
    * 100 TB is the difference between a straggler-free stage and one
    * task holding the cluster.
    *
    * Two aggregations: per-key counts (partial-aggregated — shuffle
    * carries one row per key), then a single-group fold over the
    * counts. `approxTail = true` swaps the exact percentile (which
    * buffers all n_keys counts in one reducer — the oracle baseline)
    * for `approx_percentile`, the bounded-memory 100 TB path.
    */
  def keySkew(df: DataFrame, key: Column, approxTail: Boolean = false): DataFrame = {
    val pct = if (approxTail) "approx_percentile" else "percentile"
    df.groupBy(key.as("__k")).agg(count(lit(1)).as("__c"))
      .agg(count(lit(1)).as("n_keys"),
        sum("__c").cast("long").as("n_rows"),
        max("__c").as("max_key_rows"),
        round(expr(s"$pct(__c, 0.5)") * 100).cast("long").as("p50_x100"),
        round(expr(s"$pct(__c, 0.99)") * 100).cast("long").as("p99_x100"))
  }

  // ----- Exact-moment correlation -----------------------------------

  /** Pearson correlation of integer-valued `x`, `y` per group, from
    * EXACT integer moments: the five sums accumulate as longs (exact,
    * partial-aggregated), and only the final one-row-per-group formula
    * touches doubles — so the result is bit-identical on any engine
    * evaluating the same formula, unlike native `corr()` whose
    * streaming double accumulation is summation-order-dependent.
    * Output: `(groupCols..., n, corr_e6)` with corr scaled to 1e-6
    * integer precision (NULL when either variance is zero).
    *
    * Caller contract: |x|,|y| small enough that n·Σx² stays within
    * long (≈9.2e18) AND within double's exact-integer range (2^53)
    * for the final division — fine for bounded features (quantities,
    * percentages, token counts); re-scale wide-range features first.
    */
  def corrExact(df: DataFrame, groupCols: Seq[String],
                x: Column, y: Column): DataFrame = {
    val moments = df
      .withColumn("__x", x.cast("long")).withColumn("__y", y.cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum("__x").as("__sx"), sum("__y").as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x") * col("__y")).as("__sxy"))
    val cov = col("n") * col("__sxy") - col("__sx") * col("__sy")
    val vx = col("n") * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("n") * col("__syy") - col("__sy") * col("__sy")
    moments.select(groupCols.map(col) :+ col("n") :+
      when(vx > 0 && vy > 0,
        round(cov.cast("double") / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))) * 1e6)
          .cast("long")).as("corr_e6"): _*)
  }

  /** Count-min sketch of a column — the bounded-memory frequency
    * sketch completing the family (HLL = distinct counts, Bloom =
    * membership, CMS = per-item counts): width ⌈e/eps⌉ × depth
    * ⌈ln(1/(1−confidence))⌉ counters regardless of cardinality,
    * mergeable across partitions (built distributed by Spark's stat
    * machinery, only the finished sketch reaches the driver). Error is
    * one-sided: estimate(x) ≥ true(x) always, and ≤ true(x) + eps·N
    * with the configured confidence — over-estimation only, the safe
    * direction for heavy-hitter screening (no hitter is missed).
    */
  def countMin(df: DataFrame, column: String, eps: Double = 0.001,
               confidence: Double = 0.99, seed: Int = 42): org.apache.spark.util.sketch.CountMinSketch =
    df.stat.countMinSketch(column, eps, confidence, seed)

  /** Exact per-group z-score outlier flags over an integer-valued
    * column (`ints` — e.g. FixedPoint cents of a money column):
    * appends `__is_outlier` = |value − μ| > z·σ, evaluated WITHOUT
    * ever forming a float. Population moments give
    * z² > k² ⟺ (n·x − s)² > k²·(n·q − s²) with s = Σx, q = Σx² —
    * both sides exact DECIMAL(38,0) products, so Spark and a SQL
    * oracle agree bit-for-bit and no engine's division/sqrt rounding
    * can flip a borderline row (the classic failure of float z-score
    * gates). σ = 0 groups flag nothing (both sides 0, strict >).
    *
    * Shape: one partial-aggregated groupBy for the 3 moments, then a
    * join back — group-cardinality rows, broadcast by the planner when
    * small (profiling dims always are). The moment sums Σx and Σx²
    * accumulate in DECIMAL(38,0) from the first multiply — NOT
    * long·long then cast, whose wraparound in a non-ANSI session is a
    * FINITE wrong value that can slip past every guard — so overflow
    * is impossible below 10^38, far beyond any n·B² a real corpus
    * reaches.
    *
    * Defense in depth, both modes: under Spark 4's default ANSI mode
    * any overflow throws; in a non-ANSI session decimal overflow
    * yields NULL (which a downstream `when(__is_outlier, …)` would
    * silently read as "not an outlier"), so a guard raises on any
    * null flag for a non-null value, and a Cauchy-Schwarz check
    * (n·q − s² ≥ 0 must hold for true moments) stays as a tripwire.
    * Reserved working names (`__c/__n/__s/__q/__is_outlier`) are
    * rejected on input rather than clobbered.
    */
  def zOutlierFlags(df: DataFrame, groupCols: Seq[String], ints: Column,
                    z: Int = 3): DataFrame = {
    require(z > 0, s"z=$z must be positive")
    require(groupCols.nonEmpty, "zOutlierFlags needs grouping columns")
    val reserved = Seq("__c", "__n", "__s", "__q", "__is_outlier")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"zOutlierFlags reserves column names ${clash.mkString(", ")} — rename them upstream")
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val vals = df.withColumn("__c", ints.cast("long"))
    // moments over the NON-NULL population: count(__c), not count(*) —
    // s and q skip nulls, so an all-rows n would bias μ/σ low and
    // silently misflag whenever the measure column has nulls (null
    // rows themselves get a null flag, never a verdict)
    val stats = vals.groupBy(groupCols.map(col): _*)
      // __q squares and accumulates in DECIMAL(38,0), not long·long:
      // a wrapped long square is a FINITE wrong value that can slip
      // past both the null guard and the Cauchy-Schwarz check in a
      // non-ANSI session — decimal arithmetic overflows to NULL there
      // (and throws under ANSI), so the loud-failure contract holds
      // in BOTH modes instead of by-default-ANSI only
      .agg(count(col("__c")).as("__n"), sum(col("__c").cast(D)).as("__s"),
        sum(col("__c").cast(D) * col("__c").cast(D)).as("__q"))
    // every product in DECIMAL (not long·long then cast): the long
    // path would wrap first at extreme n×B, and the oracle's HUGEINT
    // arithmetic must mean the same bits at every magnitude
    val dev = col("__n").cast(D) * col("__c").cast(D) - col("__s").cast(D)
    val varN3 = col("__n").cast(D) * col("__q").cast(D) -
      col("__s").cast(D) * col("__s").cast(D)
    // null-SAFE join back: groupBy keeps a null group, and a plain
    // equi-join would silently DROP its rows — a flag-appending
    // operator must preserve row count
    val cond = groupCols.map(c => vals(c) <=> stats(c)).reduce(_ && _)
    val rawFlag = dev * dev > lit(z * z) * varN3
    groupCols
      .foldLeft(vals.join(stats, cond))((d, c) => d.drop(stats(c)))
      .withColumn("__is_outlier",
        when(col("__c").isNotNull && (rawFlag.isNull || varN3 < 0),
          raise_error(lit("zOutlierFlags: moment overflow (n*B^2 headroom " +
            "exceeded) - accumulate moments in DECIMAL upstream")))
          .otherwise(rawFlag))
      // explicit select: the join+drop shuffles column order around;
      // the contract is the INPUT schema plus the flag, in that order
      .select(df.columns.toIndexedSeq.map(col) :+ col("__is_outlier"): _*)
  }

  /** Join pre-flight: the EXACT output cardinality of `a ⋈ b` on
    * `aKey = bKey`, without running the join — Σ over shared keys of
    * cntA·cntB — plus the skew diagnosis that decides the physical
    * plan: n_shared_keys, and the hottest key with its product
    * (ties to the largest key, pinned). One row:
    * (join_rows, n_shared_keys, hot_key, hot_product).
    *
    * This is the number to consult BEFORE launching a 100 TB join:
    * the two inputs reduce to (key, count) profiles via
    * partial-aggregated counts (counts cross the exchanges, never
    * payloads), the profile join is keys-sized, and a hot_product
    * that rivals join_rows says "salt this key or cap it" while the
    * estimate is still a pre-flight, not a post-mortem. Null keys
    * are excluded, matching inner-join semantics.
    */
  def joinCardinality(a: DataFrame, aKey: String,
                      b: DataFrame, bKey: String): DataFrame = {
    val ca = a.where(col(aKey).isNotNull)
      .groupBy(col(aKey).as("__k")).agg(count(lit(1)).as("__ca"))
    val cb = b.where(col(bKey).isNotNull)
      .groupBy(col(bKey).as("__k")).agg(count(lit(1)).as("__cb"))
    ca.join(cb, "__k")
      .select(col("__k"), (col("__ca") * col("__cb")).as("__p"))
      .agg(sum(col("__p")).as("join_rows"),
        count(lit(1)).as("n_shared_keys"),
        max_by(col("__k"), struct(col("__p"), col("__k"))).as("hot_key"),
        max(col("__p")).as("hot_product"))
  }

  /** Declarative data-quality rules, each a (name, violation-count
    * aggregate) pair for [[checkConstraints]] — the ingest gate a
    * pipeline runs before accepting a new corpus drop. Violation
    * COUNTS, not booleans: "how broken" decides quarantine-vs-reject,
    * and counts stay integers for the oracle.
    */
  object Check {
    /** Rows where `c` is null. */
    def notNull(c: String): (String, Column) =
      (s"not_null:$c", sum(when(col(c).isNull, 1L).otherwise(0L)))

    /** Rows beyond the first per value — 0 iff `c` is unique.
      * (COUNT(c) − COUNT(DISTINCT c): nulls excluded from both, so
      * null uniqueness is [[notNull]]'s job, not double-counted here.)
      */
    def unique(c: String): (String, Column) =
      (s"unique:$c", count(col(c)) - countDistinct(col(c)))

    /** Non-null rows outside [lo, hi]. */
    def inRange(c: String, lo: Long, hi: Long): (String, Column) =
      (s"range:$c",
        sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
          .otherwise(0L)))

    /** Non-null rows whose value is not in `values`. */
    def inSet(c: String, values: Seq[String]): (String, Column) =
      (s"in_set:$c",
        sum(when(col(c).isNotNull && !col(c).isin(values: _*), 1L)
          .otherwise(0L)))

    /** Non-null rows containing no match of `regex` (find semantics
      * on both engines — Spark rlike / DuckDB regexp_matches; anchor
      * explicitly for full-match rules).
      */
    def matches(c: String, regex: String): (String, Column) =
      (s"matches:$c",
        sum(when(col(c).isNotNull && !col(c).rlike(regex), 1L)
          .otherwise(0L)))
  }

  /** Evaluate every rule in ONE aggregation pass over `df` and emit
    * (rule, violations, pass) per rule — the whole constraint suite
    * costs one scan with partial aggregation regardless of how many
    * rules it carries (the per-rule rows come from a map-side unpivot
    * of the single aggregate row; `unique` rules add the one Expand
    * pass all exact distinct-counts share). At 100 TB this is the
    * difference between a quality gate and a quality job.
    */
  def checkConstraints(df: DataFrame,
                       rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkConstraints needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "constraint rule names must be unique")
    val agged = df.agg(rules.head._2.as(rules.head._1),
      rules.tail.map { case (n, c) => c.as(n) }: _*)
    val pairs = rules.flatMap { case (n, _) => Seq(lit(n), col(n)) }
    agged.select(stack((lit(rules.size) +: pairs): _*)
        .as(Seq("rule", "violations")))
      .withColumn("pass", (col("violations") === 0L).cast("int"))
  }
}
