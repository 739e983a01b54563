package graft.queries

/** Declared queries for the LLM-pipeline extension operators
  * (north_star): dedup, text analysis, similarity search, multimodal,
  * relational, stats, pipeline, graph, and gated streaming replays.
  * EVERY query carries a DuckDB oracle SQL twin with engine-portable
  * arithmetic (integer-only outputs, md5-based hashing — see
  * [[graft.ext.Hashing]]); float-scored top-k machinery is checked
  * through tie-safe integer projections ([[ExtShared.topkChecksum]])
  * plus the census/margin/recall queries.
  *
  * The registry is split one file per family (round 10); this object
  * is the flat aggregation [[graft.SparkEntry]] consumes.
  */
object ExtQueries {
  val all: Seq[Declared] =
    ExtDedupQueries.all ++
    ExtTextQueries.all ++
    ExtStatsQueries.all ++
    ExtMultimodalQueries.all ++
    ExtRelQueries.all ++
    ExtSimQueries.all ++
    ExtPipelineQueries.all ++
    ExtSamplingQueries.all ++
    ExtVersionQueries.all ++
    ExtGraphQueries.all ++
    ExtStreamQueries.all ++
    ExtStoreQueries.all ++
    ExtSourceQueries.all
}
