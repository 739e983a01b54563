package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
