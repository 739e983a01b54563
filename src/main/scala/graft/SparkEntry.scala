package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Declared, DeclaredQueries, ExtQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in registries ([[graft.queries.DeclaredQueries]] and
  * the ext/ objects); this object only flattens them into the maps the
  * driver consumes.
  */
object SparkEntry {
  private def registry: Seq[Declared] =
    DeclaredQueries.all ++ ExtQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  /** Flagship: the end-to-end curation pipeline (language gate →
    * quality gate → exact dedup → LSH near-dedup) — the library's
    * most representative composition. One audit row; driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    ExtQueries.all.find(_.name == "ext_pipeline_curation").get
      .df(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.df).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(q.name -> _)).toMap
}
