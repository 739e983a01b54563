package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Graph census operators over undirected edge lists — the
  * diagnostics a near-dup pair graph needs before acting on it
  * (transitivity says whether pairwise drops under-merge; degree
  * skew says whether a hub doc is gluing unrelated clusters).
  * Complements [[Dedup.connectedComponents]] (which CLOSES the graph)
  * with the numbers that say how closed it already is.
  *
  * Scale shape: everything is equi-joins and aggregates over the
  * canonical (a < b) edge list. Triangle counting joins edges on a
  * shared endpoint — co-partitioned by node, linear in Σ d(v)² rather
  * than corpus²; the classic hazard is a high-degree hub (d² wedges
  * from one node), the same skew [[Dedup.lshCandidatePairs]] caps at
  * bucket level — cap upstream (the edge GENERATORS bound degree) or
  * salt the wedge join when feeding raw graphs.
  */
object Graph {

  /** Canonical undirected edges: distinct (a < b), self-loops and
    * null endpoints dropped. Accepts edges in either orientation.
    *
    * Ids keep their NATIVE type: least/greatest are symmetric in
    * their arguments, so both orientations of an edge collapse to
    * the same (min, max) pair under ANY orderable type — numeric ids
    * order numerically, string/hash/URL ids lexicographically (the
    * ordering only needs to be consistent, and "9" vs "09" stay
    * distinct ids rather than silently merging through a cast). No
    * endpoint is ever dropped or null'ed by coercion.
    */
  def canonicalEdges(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .where(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()

  /** Degree frame of an ALREADY-canonical edge list. */
  private def degreesOf(canonical: DataFrame, out: String): DataFrame =
    canonical.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as(out))

  /** Per-node degree of the canonical edge list: (node, degree). */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    degreesOf(canonicalEdges(edges, srcCol, dstCol), "degree")

  /** One-row triangle/wedge census: n_nodes, n_edges, n_wedges
    * (open + closed paths of length 2 = Σ d(d−1)/2), n_triangles.
    * Global transitivity = 3·n_triangles / n_wedges — left to the
    * caller as a ratio of the two exact integers (no float in the
    * frame, so the census is engine-portable bit-for-bit).
    *
    * Triangles enumerate each once via the ordered wedge join: with
    * canonical a < b edges, e1(a,b) ⋈ e2(b,c) forces a < b < c, and
    * the closing edge (a,c) is probed with one more join — two
    * shuffles on single endpoints, never an all-pairs product. The
    * edge list fans into four consumers (degree census + three join
    * sides), so it rides [[PlanCache]] keyed on the input plan.
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String,
                    cacheTag: String = "graph/edges"): DataFrame = {
    val e = PlanCache.cached(s"$cacheTag/$srcCol/$dstCol", edges) { d =>
      canonicalEdges(d, srcCol, dstCol)
    }
    val deg = degreesOf(e, "d")
    // coalesce: sum over an empty degree frame is NULL, and the census
    // contract is all-integer (callers divide by n_wedges)
    val nodesWedges = deg.agg(
      count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val triangles = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    nodesWedges.crossJoin(nEdges).crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"))
  }
}
