package graft

import graft.ext.Graph
import org.apache.spark.sql.functions._

/** Graph census pinned on hand-drawn graphs: triangle enumeration
  * order (a<b<c exactly once), wedge counting, canonicalization of
  * messy edge lists (duplicates, reversed orientation, self-loops,
  * nulls).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalEdges dedups, orients, drops self-loops and nulls") {
    val messy = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 1L),     // same edge, both orientations
      (2L, 3L), (3L, 3L),     // self-loop dropped
      (null, 4L), (4L, null)) // null endpoints dropped
      .toDF("s", "t")
    val e = Graph.canonicalEdges(messy, "s", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((1L, 2L), (2L, 3L)))
  }

  test("triangleStats on K4: 4 triangles, 12 wedges, 6 edges") {
    // complete graph on {1,2,3,4}: C(4,3)=4 triangles; every vertex
    // has degree 3 → 4·C(3,2)=12 wedges
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("s", "t")
    val r = Graph.triangleStats(k4, "s", "t", cacheTag = "spec/k4").collect().head
    assert((r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles")) == (4L, 6L, 12L, 4L))
  }

  test("triangleStats counts a triangle once regardless of input orientation") {
    // triangle {1,2,3} fed in scrambled orientations + a pendant edge
    val g = Seq((2L, 1L), (3L, 2L), (1L, 3L), (3L, 1L), (4L, 3L)).toDF("s", "t")
    val r = Graph.triangleStats(g, "s", "t", cacheTag = "spec/tri1").collect().head
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("n_edges") == 4L)
    // degrees: 1→2, 2→2, 3→3, 4→1 → wedges 1+1+3+0 = 5
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Long]("n_nodes") == 4L)
  }

  test("triangle-free path graph reports zero triangles, correct wedges") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "t")
    val r = Graph.triangleStats(path, "s", "t", cacheTag = "spec/path").collect().head
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Long]("n_wedges") == 2L)
  }

  test("canonicalEdges keeps string ids native: orientations collapse, nothing dropped") {
    // least/greatest are orientation-symmetric on strings too — both
    // orientations of ("9","10") land on the same lexicographic
    // (min,max) pair, so distinct() leaves exactly one edge
    val messy = Seq(("9", "10"), ("10", "9")).toDF("s", "t")
    val e = Graph.canonicalEdges(messy, "s", "t")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(e.toSeq == Seq(("10", "9")), s"got ${e.toSeq}")
    // non-numeric ids (hash/URL) survive — a long cast would null
    // them out and silently drop every such edge
    val hashes = Seq(("sha:ab", "sha:cd"), ("sha:cd", "sha:ab")).toDF("s", "t")
    val h = Graph.canonicalEdges(hashes, "s", "t")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(h.toSeq == Seq(("sha:ab", "sha:cd")), s"got ${h.toSeq}")
    // "9" and "09" are DIFFERENT string ids, not one numeric node
    val zeros = Seq(("09", "9")).toDF("s", "t")
    assert(Graph.canonicalEdges(zeros, "s", "t").count() == 1L)
  }

  test("triangleStats on an empty graph is all zeros, never NULL") {
    val none = Seq((1L, 1L)).toDF("s", "t") // only a self-loop → no edges
    val r = Graph.triangleStats(none, "s", "t", cacheTag = "spec/empty").collect().head
    assert(!r.anyNull, s"census must be all-integer: $r")
    assert((r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles")) == (0L, 0L, 0L, 0L))
  }

  test("degrees matches hand counts") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("s", "t")
    val d = Graph.degrees(g, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  /** The exact integer recurrence restated in ~10 lines of driver
    * Scala — a genuinely independent implementation (Map fold vs
    * distributed join/agg) that must agree BIT-FOR-BIT because the
    * arithmetic contract is integer-only.
    */
  private def naivePageRank(edges: Seq[(Long, Long)], iters: Int,
                            scale: Long): Map[Long, Long] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (canon ++ canon.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val teleport = 15L * scale / 100L
    var r = deg.keys.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = adj.toSeq.flatMap { case (u, vs) =>
        vs.map(v => v -> r(u) / deg(u))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = contrib.map { case (v, s) => v -> (teleport + 85L * s / 100L) }
    }
    r
  }

  test("pageRank matches the naive integer recurrence bit-for-bit") {
    // a barbell: two triangles bridged by one edge, plus a pendant —
    // asymmetric degrees so ranks genuinely differ across nodes
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L), (6L, 7L))
    val got = Graph.pageRank(edges.toDF("s", "t"), "s", "t",
        iters = 5, cacheTag = "spec/pr-barbell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = naivePageRank(edges, iters = 5, scale = 1000000000L)
    assert(got == want, s"got $got\nwant $want")
    // bridge/hub nodes 3 and 4 must outrank the pendant 7
    assert(got(3L) > got(7L) && got(4L) > got(7L))
  }

  test("pageRank is orientation- and duplicate-insensitive") {
    val clean = Seq((1L, 2L), (2L, 3L)).toDF("s", "t")
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (2L, 3L), (2L, 2L))
      .toDF("s", "t")
    val a = Graph.pageRank(clean, "s", "t", iters = 3,
      cacheTag = "spec/pr-clean").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Graph.pageRank(messy, "s", "t", iters = 3,
      cacheTag = "spec/pr-messy").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // symmetric path endpoints tie exactly (integer arithmetic: a
    // float implementation could break the tie by summation order)
    val m = a.toMap
    assert(m(1L) == m(3L))
  }

  test("kCore: the peel CASCADES — a node can die only because its neighbor died") {
    import spark.implicits._
    // triangle {1,2,3} + chain 3-4-5: node 4 starts at degree 2 (≥ k)
    // and only falls below k after round 1 removes the leaf 5
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "t")
    val r1 = Graph.kCore(g, "s", "t", k = 2, rounds = 1,
        cacheTag = "spec/kcore-r1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // after one peel: 5 gone, 4 still in — with its UNCONVERGED degree 1
    assert(r1 == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    val r2 = Graph.kCore(g, "s", "t", k = 2, rounds = 2,
        cacheTag = "spec/kcore-r2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // round 2 drops 4; the triangle is the 2-core, every degree == 2
    assert(r2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val r3 = Graph.kCore(g, "s", "t", k = 2, rounds = 3,
        cacheTag = "spec/kcore-r3")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r3 == r2, "converged core must be a fixpoint")
  }

  test("kCore with k above the max core empties the graph") {
    import spark.implicits._
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "t")
    assert(Graph.kCore(tri, "s", "t", k = 3, rounds = 2,
      cacheTag = "spec/kcore-empty").count() == 0L)
  }

  test("commonNeighbors: K4 + pendant — hand-counted intersections and both thresholds") {
    import spark.implicits._
    // K4 on {1,2,3,4} plus pendant (4,5): every K4 pair shares exactly
    // the other two K4 vertices (5 is adjacent only to 4, so it joins
    // no pair's intersection); (x,5) pairs share {4} for x ∈ {1,2,3}
    val g = ((for { a <- 1 to 4; b <- 1 to 4 if a < b }
        yield (a.toLong, b.toLong)) :+ (4L, 5L))
      .toDF("s", "t")
    def rows(minInter: Int) =
      Graph.commonNeighbors(g, "s", "t", minInter = minInter,
          cacheTag = s"spec/cn$minInter")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val at2 = rows(2)
    val k4pairs = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    assert(at2.keySet == k4pairs.toSet, s"got ${at2.keySet}")
    k4pairs.foreach { case (a, b) =>
      val dA = if (a == 4L) 4L else 3L
      val dB = if (b == 4L) 4L else 3L
      assert(at2((a, b)) == (2L, dA, dB), s"pair ($a,$b): ${at2((a, b))}")
    }
    // minInter=1 additionally surfaces the pendant's inter-1 pairs
    val at1 = rows(1)
    assert(at1.keySet == k4pairs.toSet ++ Set((1L, 5L), (2L, 5L), (3L, 5L)))
    assert(at1((1L, 5L)) == (1L, 3L, 1L))
  }
}
