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

  /** Integer-exact PageRank over the undirected graph: (node, pr)
    * after `iters` synchronous iterations, every value a BIGINT.
    *
    * The use here is dedup-policy centrality: in a near-dup pair
    * graph, PageRank concentrates on the docs that bridge many
    * near-dup neighborhoods — a survivor-selection signal (keep the
    * most central representative) and a hub diagnostic (one template
    * doc gluing unrelated clusters shows up as a rank outlier)
    * complementing [[triangleStats]]'s global transitivity.
    *
    * Arithmetic contract: ranks are fixed-point integers (`scale` =
    * 1.0) and every operation is integer multiply / floor-divide /
    * sum — r′(v) = (15·scale) div 100 + (85 · Σ_{u∈N(v)} r(u) div
    * d(u)) div 100 — so the result is bit-identical across engines,
    * partitionings, and summation orders (integer addition commutes;
    * doubles would make the gate flap on reduction order). Floor
    * division loses ≤1 unit of mass per edge per iteration —
    * irrelevant at scale=1e9 for a RANKING — and both engines floor
    * identically on the all-positive values.
    *
    * Scale shape: the symmetrized (src, dst, d) edge relation is
    * built once and [[PlanCache]]-persisted (it is the big side,
    * re-read every iteration); each iteration is ONE equi-join of the
    * O(V) rank relation onto it plus one groupBy(dst) — the canonical
    * O(E)-per-iteration bulk-iterative shape, partial-aggregated
    * map-side. Teleport needs no separate all-nodes union because the
    * symmetrized graph gives every node an in-edge. `iters` is small
    * and fixed, so the rank lineage stays `iters` joins deep — a
    * 1000-executor deployment running tens of iterations would
    * checkpoint ranks every few rounds instead; at 5 the re-plan is
    * cheaper than 5 persists of a V-row frame.
    *
    * Isolated docs (no candidate pair) never enter the graph and
    * carry no rank — the caller's join decides their default.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 5, scale: Long = 1000000000L,
               cacheTag: String = "graph/pagerank"): DataFrame = {
    require(iters >= 1, s"iters=$iters: need at least one iteration")
    val sym = PlanCache.cached(s"$cacheTag/$srcCol/$dstCol", edges) { df =>
      val e = canonicalEdges(df, srcCol, dstCol)
      val both = e.select(col("a").as("src"), col("b").as("dst"))
        .union(e.select(col("b").as("src"), col("a").as("dst")))
      val deg = both.groupBy("src").agg(count(lit(1)).as("d"))
      both.join(deg, "src")
    }
    val teleport = (15L * scale) / 100L
    var ranks = sym.select(col("src").as("v")).distinct()
      .withColumn("r", lit(scale))
    for (_ <- 1 to iters) {
      // the contribution sum accumulates in DECIMAL(38,0), not long:
      // the DuckDB twin's SUM(BIGINT) is HUGEINT, so a long sum here
      // could wrap (silently in a non-ANSI session) at V·scale ≈
      // 2^63/85 while the oracle keeps exact — decimal keeps both
      // engines bit-identical at any V·scale below 10^38, and the
      // final per-node rank (≤ total mass ≈ V·scale) still fits the
      // long the `div 100` returns
      ranks = sym.join(ranks, sym("src") === ranks("v"))
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy("dst")
        .agg((lit(teleport) +
          expr("(85 * sum(cast(c as decimal(38,0)))) div 100")).as("r"))
        .select(col("dst").as("v"), col("r"))
    }
    ranks.select(col("v").as("node"), col("r").as("pr"))
  }

  /** Common-neighbor census: every node pair (a < b) sharing at least
    * `minInter` neighbors, with the intersection size and both
    * degrees — the Jaccard numerator |N(a)∩N(b)| and the terms of its
    * denominator (deg_a + deg_b − inter), kept as EXACT INTEGERS so
    * the whole frame is engine-portable bit-for-bit (emitting the
    * ratio would put a float division's representation in the gate
    * for no analytical gain — callers divide when they need the
    * score). On a near-dup candidate graph this is the link-prediction
    * / cluster-tightness signal: a pair with many shared neighbors but
    * no direct edge is a banding near-miss worth verifying, and a
    * direct edge with few shared neighbors is a likely hub artifact.
    *
    * Scale shape: same ordered wedge join as [[triangleStats]] —
    * symmetrize the canonical edges, self-join on the shared endpoint
    * (x), count per (a, b). Work is Σ d(v)², so degree is the skew
    * contract (here bounded upstream by the LSH bucket cap); the
    * `minInter` filter sits AFTER the count (it cannot prune the
    * join) but bounds the emitted frame. Shares the canonical-edge
    * [[PlanCache]] relation with triangles/kCore — one generation,
    * N consumers.
    */
  def commonNeighbors(edges: DataFrame, srcCol: String, dstCol: String,
                      minInter: Int = 2,
                      cacheTag: String = "graph/edges"): DataFrame = {
    require(minInter >= 1, s"minInter=$minInter: need at least 1")
    val e = PlanCache.cached(s"$cacheTag/$srcCol/$dstCol", edges)(
      canonicalEdges(_, srcCol, dstCol))
    val ed = e.select(col("a").as("x"), col("b").as("y"))
      .union(e.select(col("b").as("x"), col("a").as("y")))
    val deg = ed.groupBy("x").agg(count(lit(1)).as("d"))
    // shuffle_hash on every join here: the wedge join and the two
    // degree attachments are equi-joins of moderate, hash-exchange-
    // partitioned relations, and the default sort-merge pays two full
    // sorts per join for nothing (the grouped consumers re-hash
    // anyway); a cached edge relation must also never be left to a
    // size estimate that could flip the SELF-join to broadcast (the
    // verified 6x regression the repo's join discipline pins against)
    val pairs = ed.as("e1")
      .join(ed.as("e2").hint("shuffle_hash"),
        col("e1.x") === col("e2.x") && col("e1.y") < col("e2.y"))
      .select(col("e1.y").as("a"), col("e2.y").as("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("inter"))
      .where(col("inter") >= minInter)
    pairs
      .join(deg.select(col("x").as("a"), col("d").as("deg_a"))
        .hint("shuffle_hash"), "a")
      .join(deg.select(col("x").as("b"), col("d").as("deg_b"))
        .hint("shuffle_hash"), "b")
      .select("a", "b", "inter", "deg_a", "deg_b")
  }

  /** k-core peeling: `rounds` synchronous rounds of "drop every node
    * whose degree in the surviving induced subgraph is < k", returning
    * the survivors with their induced-subgraph degrees (node, deg).
    * The k-core — the maximal subgraph where everyone keeps ≥ k
    * neighbors — is the near-dup graph's "dense boilerplate nucleus"
    * detector: template/spam families survive peeling, incidental
    * pairs fall away round by round (a node can start ≥ k and die in
    * round 2 because its round-1 neighbors died — the propagation is
    * the operator). `rounds` is a fixed unroll, not
    * run-to-convergence: emitted degrees < k mean "not yet
    * converged", visible in the output rather than hidden; a
    * production caller loops with a driver-side changed-count check
    * (one O(1) action per round) until stable.
    *
    * Scale shape: the peel does NOT grow lineage exponentially even
    * though each round consumes its own output twice (degree side +
    * filter side) — every round's survivor set is an O(V) node list
    * pinned as a [[PlanCache.checkpointed]] LEAF (keyed on the input
    * plan + every parameter + the round index), so round i's plan is
    * always {canonical-edge cache ⋈ leaf ⋈ leaf → agg}, constant
    * depth. Per round: two semi-joins of the O(E) edge cache against
    * the node list (broadcast when it fits) + one partial-aggregated
    * degree count — the same O(E)-per-iteration bulk shape as
    * [[pageRank]].
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int,
            cacheTag: String = "graph/edges"): DataFrame = {
    require(k >= 1, s"k=$k: need at least 1")
    require(rounds >= 1, s"rounds=$rounds: need at least one peel")
    // the default tag deliberately matches [[triangleStats]]': both
    // build the SAME canonical a<b edge relation from the same input,
    // so sharing the tag shares ONE persisted copy — a second tag for
    // the canonically-identical plan would re-persist it (CacheManager
    // dedupes with an "already cached" warning, but one relation is
    // the intent)
    val e0 = PlanCache.cached(s"$cacheTag/$srcCol/$dstCol", edges)(
      canonicalEdges(_, srcCol, dstCol))
    def induced(alive: Option[DataFrame]): DataFrame = alive match {
      case None => e0
      case Some(nodes) =>
        e0.join(nodes.select(col("node").as("a")), Seq("a"), "left_semi")
          .join(nodes.select(col("node").as("b")), Seq("b"), "left_semi")
    }
    var alive: Option[DataFrame] = None
    for (i <- 1 to rounds) {
      val prev = alive
      alive = Some(PlanCache.checkpointed(
        s"$cacheTag/$srcCol/$dstCol/k$k/round$i", edges) { _ =>
          degreesOf(induced(prev), "d")
            .where(col("d") >= k).select("node")
        })
    }
    degreesOf(induced(alive), "deg")
  }
}
