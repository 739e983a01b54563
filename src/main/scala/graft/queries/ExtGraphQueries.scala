package graft.queries

import graft.Tables
import graft.ext.{Curation, Dedup, Graph, Multimodal, PlanCache, Sampling, Search, Similarity, Skew, Stats, TextStats, TimeJoin}
import org.apache.spark.sql.functions._

import ExtShared._

/** Graph family: triangle count.
  *
  * Declared-query registry split out of the former monolithic
  * ExtQueries.scala (round 10, mechanical — blocks moved verbatim);
  * shared caps/CTE text/checksum helpers live in [[ExtShared]].
  */
object ExtGraphQueries {

  val all: Seq[Declared] = Seq(

    // Triangle/wedge census ([[Graph.triangleStats]]) of the MinHash-
    // LSH candidate graph: transitivity (3·triangles/wedges) is the
    // dedup-policy diagnostic — a highly transitive pair graph means
    // pairwise drops under-merge and the component policy is worth its
    // iterative cost. Ordered wedge enumeration (a<b<c) counts each
    // triangle exactly once; all-integer output, so the oracle replays
    // the same joins bit-for-bit.
    Declared(
      "ext_graph_triangles",
      (s, d) => {
        // same checkpointed candidate relation the verified-pairs
        // pipeline uses (ext_dedup_lsh_verified): the census and the
        // verify stage are two consumers of ONE candidate generation
        val cands = Dedup.minhashLshCandidates(Tables.documents(s, d),
          "doc_id", "text", k = 16, rowsPerBand = 4, maxBucket = MaxBucket)
        Graph.triangleStats(cands, "doc_a", "doc_b",
          cacheTag = "query/graph_triangles")
      },
      Some(s"""WITH $minhashSigCte,
               okb AS (
                 SELECT band, sig FROM sigs
                 GROUP BY band, sig HAVING COUNT(*) <= $MaxBucket),
               sig2 AS (SELECT sigs.* FROM sigs JOIN okb USING (band, sig)),
               e AS (
                 SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
                 FROM sig2 a JOIN sig2 b
                   ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
               deg AS (
                 SELECT node, COUNT(*) AS d FROM (
                   SELECT a AS node FROM e UNION ALL SELECT b FROM e)
                 GROUP BY node),
               tri AS (
                 SELECT COUNT(*) AS n_triangles
                 FROM e e1
                 JOIN e e2 ON e1.b = e2.a
                 JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
               SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
                      (SELECT COUNT(*) FROM e) AS n_edges,
                      (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
                      (SELECT n_triangles FROM tri) AS n_triangles"""))
  )
}
