package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
import graft.apps.Apps
import graft.engine.{MapReduce, SequentialOracle}

/** Chaos twin of crash.so (SURVEY §5.4): inject a first-attempt
  * failure into the map stage and assert the job still produces
  * oracle-equal output via Spark task retry — the Spark analogue of
  * the reference's 10 s requeue + re-execution
  * (/root/reference/src/mr/coordinator.go:114-138) — and that exactly
  * one attempt per partition commits (≡ jobcount,
  * src/mrapps/jobcount.go:34-46).
  */
class ChaosSpec extends SparkSpec {
  private val corpusDir = Paths.get("/root/reference/src/main")
  private lazy val corpusFiles: Seq[String] =
    Files.list(corpusDir).iterator().asScala
      .map(_.toString).filter(_.matches(".*/pg-.*\\.txt")).toSeq.sorted

  test("first-attempt map failures are retried to an oracle-equal result") {
    import spark.implicits._
    val successfulTasks = spark.sparkContext.longAccumulator("successfulMapTasks")
    val crashyMap =
      MapReduce.wholeFiles(spark, corpusFiles)
        .flatMap { case (file, contents) =>
          val tc = TaskContext.get()
          if (tc.attemptNumber() == 0 && tc.partitionId() % 2 == 0)
            throw new RuntimeException("injected crash (chaos spec)")
          successfulTasks.add(1)
          Apps.SortedMultisetAgg.map(file, contents)
        }
    val engine = crashyMap
      .groupByKey(_._1)
      .mapGroups((k, rows) => (k, Apps.SortedMultisetAgg.reduce(k, rows.map(_._2))))
      .collect().toSeq

    val corpusInMem = corpusFiles.map { p =>
      (p.substring(p.lastIndexOf('/') + 1),
        new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
    }
    val oracle = SequentialOracle.run(corpusInMem,
      Apps.SortedMultisetAgg.map, Apps.SortedMultisetAgg.reduce)
    assert(engine.sortBy(_._1) == oracle.sortBy(_._1))
    // 4 map records per file (SortedMultisetAgg) × 8 files, each counted
    // once per *successful* map execution; retried partitions may double
    // count the accumulator only if a failed attempt got past add() —
    // it cannot, because the throw precedes it.
    assert(successfulTasks.value == 8)
  }

  /** Reference parity: crash.so injects into Reduce as well
    * (/root/reference/src/mrapps/crash.go:45-47 — maybeCrash() is the
    * first line of Reduce). Post-shuffle retry is a different recovery
    * path than map retry: the failed reduce task is re-fetched from
    * the surviving shuffle files, and the map stage must NOT re-run.
    */
  test("first-attempt reduce failures are retried to an oracle-equal result") {
    import spark.implicits._
    val mapRuns = spark.sparkContext.longAccumulator("mapRecordRuns")
    val engine = MapReduce.wholeFiles(spark, corpusFiles)
      .flatMap { case (file, contents) =>
        mapRuns.add(1)
        Apps.SortedMultisetAgg.map(file, contents)
      }
      .groupByKey(_._1)
      .mapGroups { (k, rows) =>
        val tc = TaskContext.get()
        if (tc.attemptNumber() == 0 && tc.partitionId() % 2 == 0)
          throw new RuntimeException("injected reduce crash (chaos spec)")
        (k, Apps.SortedMultisetAgg.reduce(k, rows.map(_._2)))
      }
      .collect().toSeq

    val corpusInMem = corpusFiles.map { p =>
      (p.substring(p.lastIndexOf('/') + 1),
        new String(Files.readAllBytes(Paths.get(p)), "UTF-8"))
    }
    val oracle = SequentialOracle.run(corpusInMem,
      Apps.SortedMultisetAgg.map, Apps.SortedMultisetAgg.reduce)
    assert(engine.sortBy(_._1) == oracle.sortBy(_._1))
    // reduce retries recompute from shuffle files: every map record ran
    // exactly once despite the injected reduce-stage failures
    assert(mapRuns.value == 8)
  }

  test("iterative graph ops converge oracle-equal under injected task failures") {
    // the multi-round interaction the single-stage chaos tests above
    // don't cover: pageRank re-reads a PERSISTED symmetrized edge
    // relation every iteration, and kCore pins each round's survivor
    // set as a localCheckpoint leaf — injected first-attempt failures
    // land inside those materializations, and task retry must rebuild
    // the cached/checkpointed blocks to the same bits the clean run
    // produces (integer fixed-point arithmetic: ANY divergence is
    // visible, no float tolerance to hide behind). A checkpointed
    // block lost AFTER materialization (executor death) is the
    // documented loud-failure trade-off of localCheckpoint — see
    // PlanCache.checkpointed's scaladoc — not a silent-recovery path.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def edges(chaos: Boolean) = {
      val src = spark.range(0, 400).repartition(8).as[Long].mapPartitions { it =>
        if (chaos) {
          val tc = TaskContext.get()
          if (tc.attemptNumber() == 0 && tc.partitionId() % 2 == 0)
            throw new RuntimeException("injected crash (iterative chaos)")
        }
        it
      }.toDF("x")
      // quadratic residues give IRREGULAR degrees: uniform ranks or an
      // all-or-nothing core would make the equality checks vacuous
      // (a 2-regular graph is pageRank's fixed point)
      src.select((col("x") % 57).as("a"), ((col("x") * col("x") + 1) % 61).as("b"))
        .where(col("a") =!= col("b"))
    }
    def pr(chaos: Boolean) =
      graft.ext.Graph.pageRank(edges(chaos), "a", "b", iters = 5,
          cacheTag = s"chaos/pr/$chaos")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prClean = pr(chaos = false)
    val prChaos = pr(chaos = true)
    assert(prClean.nonEmpty)
    assert(prClean.values.toSet.size > 1,
      "uniform ranks — the propagation check is vacuous on this graph")
    assert(prChaos == prClean,
      "pageRank diverged from the clean run under injected task failures")
    def kc(chaos: Boolean) =
      graft.ext.Graph.kCore(edges(chaos), "a", "b", k = 8, rounds = 3,
          cacheTag = s"chaos/kc/$chaos")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kcClean = kc(chaos = false)
    val kcChaos = kc(chaos = true)
    assert(kcClean.nonEmpty && kcClean.size < prClean.size,
      s"need a PARTIAL core (got ${kcClean.size} of ${prClean.size}) or the peel cascade is untested")
    assert(kcChaos == kcClean,
      "kCore diverged from the clean run under injected task failures")
  }
}
