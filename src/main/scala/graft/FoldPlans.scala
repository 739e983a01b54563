package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev evidence tool: prints `.explain("formatted")` for ONE
  * view-maintenance fold of each flavor (count/sum delta, min/max,
  * sketch) over the real fixture — the plan-shape record for the
  * fold-internal claims the gated queries' own explains cannot show
  * (their declared frames are checkpoint-truncated by design).
  *
  * Reading the output on the round-16 tree: `mergeAggMinMax` /
  * `mergeAggSketch` are EAGER (the dim-bounded fold state
  * localCheckpoints inside the call), so the printed plan is the
  * post-checkpoint CONTINUATION — which is itself the claim under
  * test: a no-retraction/no-drain fold's committed plan must show a
  * bare LogicalRDD scan with NO recompute branch and NO parquet scan
  * (the pre-checkpoint fused exchange is pinned separately by
  * PlanShapeSpec's poisoned-source tests and visible in the
  * round-15 worktree dump, where the same call was lazy and the
  * printed plan carries the full fold). Not part of the driver
  * contract.
  *
  * Usage: runMain graft.FoldPlans <sfDir>
  */
object FoldPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = col("user_id") + 1450
    val seed = Tables.customer(spark, sfDir).select(
      col("c_custkey"), col("c_mktsegment"),
      round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
      lit("U").as("op"), timestamp_millis(lit(0L)).as("ts"),
      lit(-1L).as("event_id"))
    val log = Tables.events(spark, sfDir).select(
      k.as("c_custkey"), col("event_type").as("c_mktsegment"),
      round(col("value") * 100).cast("long").as("bal_cents"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      col("ts"), col("event_id"))
    val b0 = log.where(pmod(col("event_id"), lit(4)) === 0)
    // an insert-only batch of brand-new keys: retracts no boundary,
    // drains no sketch — the common fast path whose committed plan
    // shape is the headline claim
    val ins = Tables.customer(spark, sfDir).limit(50).select(
      (col("c_custkey") + 1000000L).as("c_custkey"), col("c_mktsegment"),
      lit(1L).as("bal_cents"), lit("U").as("op"),
      timestamp_millis(lit(1L)).as("ts"), lit(1L).as("event_id"))

    println("==== mergeAggMinMax (real batch b0 — retraction path) ====")
    val aggMM = graft.ext.Changelog.aggSnapshotMinMax(seed, "op",
      Seq("c_mktsegment"), "bal_cents", nCol = "n", sumCol = "sum_cents",
      minCol = "min_cents", maxCol = "max_cents")
    graft.ext.Changelog.mergeAggMinMax(aggMM, seed, b0, "c_custkey", "op",
      Seq("ts", "event_id"), Seq("c_mktsegment"), "bal_cents",
      nCol = "n", sumCol = "sum_cents", minCol = "min_cents",
      maxCol = "max_cents", maxBroadcastKeys = 0L).explain("formatted")

    println("==== mergeAggMinMax (insert-only batch — no-retraction path) ====")
    graft.ext.Changelog.mergeAggMinMax(aggMM, seed, ins, "c_custkey", "op",
      Seq("ts", "event_id"), Seq("c_mktsegment"), "bal_cents",
      nCol = "n", sumCol = "sum_cents", minCol = "min_cents",
      maxCol = "max_cents", maxBroadcastKeys = 0L).explain("formatted")

    println("==== mergeAggSketch (real batch b0) ====")
    val aggSk = graft.ext.Changelog.aggSnapshotSketch(seed, "op",
      Seq("c_mktsegment"), "bal_cents", k = 8, nCol = "n",
      sumCol = "sum_cents", minCol = "min_cents", maxCol = "max_cents")
    graft.ext.Changelog.mergeAggSketch(aggSk, seed, b0, "c_custkey", "op",
      Seq("ts", "event_id"), Seq("c_mktsegment"), "bal_cents", k = 8,
      nCol = "n", sumCol = "sum_cents", minCol = "min_cents",
      maxCol = "max_cents", maxBroadcastKeys = 0L).explain("formatted")

    spark.stop()
  }
}
