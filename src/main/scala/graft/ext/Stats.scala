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
}
