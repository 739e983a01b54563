package graft

/** Physical-plan shape pins for the declared queries: the properties
  * that make each plan scale — broadcast where a side is dim-sized,
  * TakeOrdered instead of a global sort, partial aggregation before
  * the exchange, pushed filters and pruned scans — asserted on the
  * EXECUTED plan string so a regression (a new Spark version flipping
  * a join strategy, an edit dropping a pushdown) fails a test instead
  * of silently multiplying shuffle bytes at scale.
  *
  * Counting operator occurrences in the plan string is deliberately
  * coarse: the pins state "no more than N exchanges" / "this strategy,
  * not that one", not byte-exact plans — they should survive cosmetic
  * Spark changes while catching structural ones.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Executed-plan string after running the query (AQE FINAL plan).
    * The action must go through df's own QueryExecution — a
    * noop-sink write plans a separate execution and leaves
    * df.queryExecution stuck at isFinalPlan=false, so the pins would
    * read the pre-AQE initial plan.
    */
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true") || !plan.contains("AdaptiveSparkPlan"),
      s"$name: expected the finalized adaptive plan:\n$plan")
    // the finalized string prints BOTH "== Final Plan ==" and
    // "== Initial Plan ==" sections — count operators in the final
    // section only or every pin double-counts
    plan.split("== Initial Plan ==").head
  }

  private def count(plan: String, op: String): Int =
    op.r.findAllIn(plan).length

  test("dq05_topk: TakeOrderedAndProject, no global sort") {
    val plan = planOf("dq05_topk")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded heap, not sort-the-world:\n$plan")
  }

  test("dq10_join_agg: dimension joins broadcast; no shuffle of the fact side for the join") {
    val plan = planOf("dq10_join_agg")
    assert(count(plan, "BroadcastHashJoin") >= 2,
      s"customer and nation should broadcast:\n$plan")
    assert(count(plan, "SortMergeJoin") == 0,
      s"no dim join should fall back to sort-merge at this scale:\n$plan")
  }

  test("ext_rel_star_join: all four dimensions broadcast") {
    val plan = planOf("ext_rel_star_join")
    assert(count(plan, "BroadcastHashJoin") >= 4,
      s"4-dim star join must broadcast every dimension:\n$plan")
    assert(count(plan, "SortMergeJoin") == 0, s"unexpected SMJ:\n$plan")
  }

  test("dq12_exact_dedup: the exchange partitions on the md5 hash, not raw text") {
    val plan = planOf("dq12_exact_dedup")
    // the md5 must be computed in the partial aggregate BELOW the
    // exchange so only 16-byte digests cross the wire; partitioning
    // directly on the text attribute would ship document bytes
    assert(plan.contains("hashpartitioning(md5"),
      s"expected the shuffle keyed on the map-side md5:\n$plan")
    assert(!"hashpartitioning\\(text#".r.findFirstIn(plan).isDefined,
      s"raw text column as shuffle key:\n$plan")
  }

  test("ext_pipeline_chunk: map-side generate — no exchange below the aggregation") {
    val plan = planOf("ext_pipeline_chunk")
    // exactly the two required exchanges: partial→final agg, and the
    // range partitioning for the final orderBy
    assert(count(plan, "Exchange") <= 2,
      s"chunking must not shuffle before aggregation:\n$plan")
    assert(plan.contains("Generate"), s"expected explode generate:\n$plan")
  }

  test("dq04_grep: predicate pushed into the parquet scan, schema pruned") {
    val df = SparkEntry.queries("dq04_grep")(spark, sfDir)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("Scan parquet")).getOrElse("")
    val full = df.queryExecution.toString
    assert(full.contains("PushedFilters: [IsNotNull(text)")
      || full.contains("StringContains"),
      s"contains-filter should push to the reader:\n$full")
    assert(!full.contains("n_chars") || !scan.contains("n_chars"),
      s"unused columns must prune from ReadSchema:\n$scan")
  }

  test("ext_pipeline_decontam: eval-gram side broadcasts (train side never shuffles for the join)") {
    val plan = planOf("ext_pipeline_decontam")
    assert(count(plan, "BroadcastHashJoin") >= 2,
      s"contamination semi-join and final anti-join should broadcast:\n$plan")
  }

  test("ext_sim_cosine_topk: one corpus scan, queries broadcast, no cartesian") {
    val plan = planOf("ext_sim_cosine_topk")
    assert(!plan.contains("CartesianProduct"),
      s"brute-force top-k must be broadcast, not cartesian:\n$plan")
    assert(count(plan, "BroadcastNestedLoopJoin") <= 1,
      s"at most the bounded query-panel loop join:\n$plan")
  }

  test("ext_dedup_incremental_lsh: band probe is an equi-join — no nested-loop, no cartesian") {
    val plan = planOf("ext_dedup_incremental_lsh")
    assert(!plan.contains("CartesianProduct"),
      s"band/signature probe must never go all-pairs:\n$plan")
    // the probe and verify joins must all be equi (hash) joins; the
    // single permitted nested loop is the final 1-row×1-row census
    // cross join
    assert(count(plan, "BroadcastNestedLoopJoin") <= 1,
      s"store probe must stay an equi hash join on (band, sig):\n$plan")
    assert(count(plan, "ShuffledHashJoin|BroadcastHashJoin|SortMergeJoin") >= 2,
      s"expected equi joins for band probe and shingle verification:\n$plan")
  }

  test("ext_rel_range_join_left: outer path without localCheckpoint, banded equi-join (no BNLJ)") {
    val plan = planOf("ext_rel_range_join_left")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded rewrite must keep the range join equi-keyed:\n$plan")
    // the left-outer completion is a lazy anti-join on the natural
    // key — a localCheckpoint here would truncate lineage and pin
    // executor-local blocks, the thing the 100 TB path avoids
    assert(!plan.contains("localCheckpoint"),
      s"left-outer path must not materialize via localCheckpoint:\n$plan")
  }

  test("ext_multimodal_channels: codec work runs in one mapPartitions pass after the fixture repartition") {
    val plan = planOf("ext_multimodal_channels")
    assert(plan.contains("MapPartitions"),
      s"decode must be per-partition batch work:\n$plan")
    assert(count(plan, "ShuffledHashJoin|SortMergeJoin") == 0,
      s"no join belongs in a straight decode pass:\n$plan")
    // exchanges: the fixture's one explicit repartition (inside the
    // cached relation) + partial→final agg; anything more means a
    // shuffle crept between decode stages and would ship image BYTES
    assert(count(plan, "Exchange") <= 3,
      s"decode pipeline must not shuffle payload bytes:\n$plan")
  }

  test("ext_multimodal_frames: container parse + two decode passes, no shuffle of frame bytes") {
    val plan = planOf("ext_multimodal_frames")
    assert(count(plan, "MapPartitions") >= 2,
      s"gif sampling and png channel stats are both per-partition passes:\n$plan")
    assert(count(plan, "ShuffledHashJoin|SortMergeJoin") == 0,
      s"frame pipeline has no join work:\n$plan")
    assert(count(plan, "BroadcastNestedLoopJoin") <= 1,
      s"only the bounded 1-row×1-row census cross join may loop:\n$plan")
  }

  test("ext_multimodal_audio: wav decode is one mapPartitions pass over the cached fixture") {
    val plan = planOf("ext_multimodal_audio")
    assert(plan.contains("MapPartitions"),
      s"decode must be per-partition batch work:\n$plan")
    assert(count(plan, "Exchange") <= 3,
      s"audio bytes must not cross an extra shuffle:\n$plan")
  }

  test("ext_pipeline_decontam_bloom: gram probe is a map-side filter, never a join") {
    val plan = planOf("ext_pipeline_decontam_bloom")
    // the whole point of the bloom path: eval grams reach the train
    // side as a LITERAL filter probed in the scan pipeline — the only
    // hash join allowed is the final doc-id anti-join
    assert(plan.contains("might_contain"),
      s"bloom probe must appear as a map-side predicate:\n$plan")
    assert(count(plan, "BroadcastHashJoin") <= 1,
      s"only the final anti-join may hash-join:\n$plan")
    assert(count(plan, "SortMergeJoin") == 0, s"unexpected SMJ:\n$plan")
  }

  test("ext_multimodal_features: featurizer is one mapPartitions pass, no join work") {
    val plan = planOf("ext_multimodal_features")
    assert(plan.contains("MapPartitions"),
      s"decode+featurize must be per-partition batch work:\n$plan")
    assert(count(plan, "ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin") == 0,
      s"no join belongs in the featurize pass:\n$plan")
    assert(count(plan, "Exchange") <= 3,
      s"image bytes must not cross an extra shuffle:\n$plan")
  }

  test("ext_pipeline_shard_export: read-back census is two exchanges, no join") {
    val plan = planOf("ext_pipeline_shard_export")
    assert(count(plan, "ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin") == 0,
      s"shard census is a straight groupBy over the read-back scan:\n$plan")
    assert(count(plan, "Exchange") <= 3,
      s"census needs only the groupBy and orderBy exchanges:\n$plan")
  }

  test("dq09_numeric_agg: long-cents sums, partial aggregation before the exchange") {
    val plan = planOf("dq09_numeric_agg")
    assert(plan.contains("partial_sum"),
      s"map-side combine missing:\n$plan")
    assert(!plan.toLowerCase.contains("decimal(38"),
      s"cents path must not fall back to wide decimal:\n$plan")
  }
}
