package graft

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerSpeculativeTaskSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Speculative-execution parity with the reference's straggler path:
  * crash.so DELAYS a task 0–10 s with probability 1/3
  * (/root/reference/src/mrapps/crash.go:26-31) and the coordinator's
  * 10 s requeue re-issues the slow task to another worker
  * (/root/reference/src/mr/coordinator.go:114-138), with the atomic
  * rename ensuring one output wins. The Spark analogue:
  * `spark.speculation` detects the straggling attempt against the
  * successful-task median and resubmits it, and the output-commit
  * coordinator lets exactly one attempt commit.
  *
  * Runs on `local-cluster[2,2,1536]` (real separate executor JVMs):
  * Spark's TaskSchedulerImpl never starts the speculation thread
  * under a local[...] master. build.sbt isolates this suite in its
  * own forked JVM so this cluster session and the shared local
  * session never coexist in one JVM.
  *
  * What is asserted: the straggler is DETECTED and submitted for
  * speculation (SparkListenerSpeculativeTaskSubmitted — the analogue
  * of the reference's timeout requeue marking a BUSY task READY
  * again), and the job's output is complete and exactly-once. The
  * speculative COPY cannot launch here: the scheduler refuses to
  * place a speculative attempt on the same HOST as the original
  * (dequeue excludes hosts with a live attempt), and every
  * local-cluster executor shares localhost — re-execution of an
  * attempt to an oracle-equal result is covered by ChaosSpec's
  * retry tests, which run the same recovery machinery.
  */
class SpeculationSpec extends AnyFunSuite {

  test("a straggler is detected for speculation and output commits exactly once") {
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1536]")
      .appName("graft-speculation")
      // executor JVMs need the repo's classes (this spec's closures)
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.quantile", "0.5")
      .config("spark.speculation.multiplier", "1.2")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val sc = spark.sparkContext
      sc.setLogLevel("WARN")
      @volatile var speculativeSubmitted = 0
      @volatile var speculativeLaunched = 0
      sc.addSparkListener(new SparkListener {
        override def onSpeculativeTaskSubmitted(
            e: SparkListenerSpeculativeTaskSubmitted): Unit =
          speculativeSubmitted += 1
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
          if (e.taskInfo.speculative) speculativeLaunched += 1
      })
      // 8 tasks; partition 0's FIRST attempt is an 8 s straggler (a
      // speculative re-launch would have attemptNumber 1 and run
      // fast), the rest take ~300 ms so the speculation
      // quantile/multiplier thresholds are met quickly
      val out = java.nio.file.Files.createTempDirectory("graft_spec").toString + "/res"
      spark.range(0, 80, 1, 8)
        .mapPartitions { it =>
          val tc = TaskContext.get()
          if (tc.partitionId() == 0 && tc.attemptNumber() == 0) Thread.sleep(8000)
          else Thread.sleep(300)
          it.map(i => (i, i * 2))
        }
        .toDF("k", "v")
        .write.mode("overwrite").parquet(out)
      // exactly-once commit: any duplicate or partial attempt output
      // would surface as duplicate/missing rows here
      val got = spark.read.parquet(out).as[(Long, Long)].collect().sorted.toSeq
      assert(got == (0L until 80L).map(i => (i, i * 2)))
      // the listener bus is async — poll for the detection event
      val deadline = System.currentTimeMillis + 30000
      while (speculativeSubmitted == 0 && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      assert(speculativeSubmitted >= 1,
        "the straggler was never submitted for speculative execution")
      info(s"speculative: submitted=$speculativeSubmitted launched=$speculativeLaunched")
    } finally spark.stop()
  }

  test("minhash-LSH dedup pipeline is identical under multi-JVM network shuffle") {
    // the one execution dimension the rest of the suite never
    // crosses: every other test shuffles in-process (local[n] moves
    // rows through the block manager of ONE JVM). local-cluster runs
    // real separate executor JVMs, so this pipeline's exchanges —
    // token explode → signature agg → band self-join → shingle-set
    // joins — serialize over the network, exercising codegen'd
    // hash/agg/join operators against real UnsafeRow wire traffic.
    // Any serialization-dependent nondeterminism (hash seeds, array
    // ordering, partitioner drift) breaks the set equality below.
    def pipeline(s: SparkSession): Set[(Long, Long, Int, Int)] = {
      val docs = Tables.documents(s, "/root/testdata/sf0.001")
      val cands = graft.ext.Dedup.minhashLshCandidates(
        docs, "doc_id", "text", k = 16, rowsPerBand = 4, maxBucket = 64)
      graft.ext.Dedup.ngramJaccardOnCandidates(docs, "doc_id", "text", cands, 100)
        .where(org.apache.spark.sql.functions.col("inter") >= 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
        .toSet
    }
    def session(master: String): SparkSession = SparkSession.builder()
      .master(master)
      .appName("graft-cluster-parity")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    val local = session("local[4]")
    val expected = try pipeline(local) finally {
      graft.ext.PlanCache.clear(); local.stop()
    }
    assert(expected.nonEmpty, "reference pipeline returned no verified pairs")
    val cluster = session("local-cluster[2,2,1536]")
    val got = try pipeline(cluster) finally {
      graft.ext.PlanCache.clear(); cluster.stop()
    }
    assert(got == expected,
      s"multi-JVM shuffle diverged: only-local=${(expected -- got).take(5)} " +
        s"only-cluster=${(got -- expected).take(5)}")
  }

  test("versioning/window ops are identical under multi-JVM network shuffle") {
    // the round-11 CDC/window family crosses execution dimensions the
    // minhash test doesn't: max_by partial aggregation merged across
    // executor JVMs (applyLog), sort-based window frames fed by a
    // network shuffle (scd2's lead, debounce's lag), the tempered
    // mixture's DECIMAL share division + broadcast-join + per-stratum
    // prefix sum (mixture), and a two-phase countDistinct merged
    // across JVMs (transitions). Round 12 adds the lifecycle ops'
    // multi-JVM dimensions: the streaming foreachBatch CDC merge
    // (store versions written through real executors' output commit,
    // stream_merge), compaction's range-exchange rewrite + census
    // over executor-committed files (compact), and zipWithIndex's
    // per-partition offsets collected across JVMs (ids). Run the
    // GATED queries verbatim (each carries a total ORDER BY) and
    // require row-for-row equality between one-JVM and two-JVM
    // execution.
    val names = Seq("ext_pipeline_merge", "ext_pipeline_scd2",
      "ext_dedup_debounce", "ext_pipeline_mixture", "ext_rel_transitions",
      "ext_stream_merge", "ext_pipeline_compact", "ext_pipeline_ids")
    def run(s: SparkSession): Map[String, Seq[String]] =
      names.map(n => n -> graft.SparkEntry.queries(n)(s, "/root/testdata/sf0.001")
        .collect().map(_.toString).toSeq).toMap
    def session(master: String): SparkSession = SparkSession.builder()
      .master(master)
      .appName("graft-cluster-parity-r11")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val local = session("local[4]")
    val expected = try run(local) finally {
      graft.ext.PlanCache.clear(); local.stop()
    }
    names.foreach(n => assert(expected(n).nonEmpty, s"$n returned no rows"))
    val cluster = session("local-cluster[2,2,1536]")
    val got = try run(cluster) finally {
      graft.ext.PlanCache.clear(); cluster.stop()
    }
    names.foreach { n =>
      assert(got(n) == expected(n),
        s"$n diverged under multi-JVM shuffle: first diff at index " +
          s"${expected(n).zip(got(n)).indexWhere(p => p._1 != p._2)}")
    }
  }
}
