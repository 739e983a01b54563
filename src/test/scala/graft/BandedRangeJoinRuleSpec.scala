package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** Specs for the [[graft.plans.BandedRangeJoinRule]] optimizer rule:
  * a keyless time-range join must stop planning as
  * BroadcastNestedLoopJoin and still return exactly the same rows;
  * joins that already carry an equi-key must be left untouched.
  *
  * The rule-bearing session is a SECOND SparkSession over the shared
  * SparkContext (clear default → builder.withExtensions → getOrCreate)
  * so the suite's shared session stays extension-free; the shared
  * session doubles as the oracle.
  */
class BandedRangeJoinRuleSpec extends SparkSpec {

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // getOrCreate with the default cleared builds a NEW session over
      // the existing SparkContext, extensions applied; never stop() it
      // (that would stop the shared context)
      val ext = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
      f(ext)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("keyless range join: BNLJ replaced by banded hash join, rows identical") {
    val oracle = {
      val ev = Tables.events(spark, "/root/testdata/sf0.001")
      val l = ev.where(col("event_type") === "error")
        .select(col("ts").as("lts"), col("event_id").as("lid"))
      val r = ev.where(col("event_type") === "click")
        .select(col("ts").as("rts"), col("event_id").as("rid"))
      l.join(r, col("rts") >= col("lts") - expr("INTERVAL 2 HOURS") &&
          col("rts") < col("lts"))
        .select("lid", "rid")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    }
    assert(oracle.nonEmpty)
    withExtSession { s =>
      val ev = Tables.events(s, "/root/testdata/sf0.001")
      val l = ev.where(col("event_type") === "error")
        .select(col("ts").as("lts"), col("event_id").as("lid"))
      val r = ev.where(col("event_type") === "click")
        .select(col("ts").as("rts"), col("event_id").as("rid"))
      val j = l.join(r, col("rts") >= col("lts") - expr("INTERVAL 2 HOURS") &&
          col("rts") < col("lts"))
        .select("lid", "rid")
      val physical = j.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin"), physical.take(800))
      assert(j.queryExecution.optimizedPlan.toString.contains("__lband"))
      val got = j.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == oracle)
    }
  }

  test("strict/inclusive operand forms normalize to the same rows") {
    withExtSession { s =>
      val ev = Tables.events(s, "/root/testdata/sf0.001")
      val l = ev.where(col("event_type") === "error")
        .select(col("ts").as("lts"), col("event_id").as("lid"))
      val r = ev.where(col("event_type") === "click")
        .select(col("ts").as("rts"), col("event_id").as("rid"))
      // flipped operands + strict > and <= variants of the same window
      val a = l.join(r, col("lts") - expr("INTERVAL 2 HOURS") <= col("rts") &&
          col("lts") > col("rts"))
        .select("lid", "rid")
      assert(a.queryExecution.optimizedPlan.toString.contains("__lband"))
      val b = l.join(r, col("rts") >= col("lts") - expr("INTERVAL 2 HOURS") &&
          col("rts") < col("lts"))
        .select("lid", "rid")
      assert(a.collect().map(x => (x.getLong(0), x.getLong(1))).toSet ==
        b.collect().map(x => (x.getLong(0), x.getLong(1))).toSet)
    }
  }

  test("TIMESTAMP_NTZ range join: rule still fires, rows identical") {
    // read the parquet RAW (no Tables normalization): the tz-less
    // `timestamp[us]` fixture surfaces as TIMESTAMP_NTZ — exactly the
    // encoding that silently disabled the rule in round 8 and
    // regressed the keyless join to BroadcastNestedLoopJoin
    def sides(s: SparkSession): (DataFrame, DataFrame) = {
      val ev = s.read.parquet("/root/testdata/sf0.001/events.parquet")
      assert(ev.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      (ev.where(col("event_type") === "error")
        .select(col("ts").as("lts"), col("event_id").as("lid")),
        ev.where(col("event_type") === "click")
          .select(col("ts").as("rts"), col("event_id").as("rid")))
    }
    val oracle = {
      val (l, r) = sides(spark)
      l.join(r, col("rts") >= col("lts") - expr("INTERVAL 2 HOURS") &&
          col("rts") < col("lts"))
        .select("lid", "rid")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    }
    assert(oracle.nonEmpty)
    withExtSession { s =>
      val (l, r) = sides(s)
      val j = l.join(r, col("rts") >= col("lts") - expr("INTERVAL 2 HOURS") &&
          col("rts") < col("lts"))
        .select("lid", "rid")
      val physical = j.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin"), physical.take(800))
      assert(j.queryExecution.optimizedPlan.toString.contains("__lband"))
      val got = j.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == oracle)
    }
  }

  test("equi-keyed range join is left untouched by the rule") {
    withExtSession { s =>
      val ev = Tables.events(s, "/root/testdata/sf0.001")
      val l = ev.where(col("event_type") === "error")
        .select(col("user_id").as("lu"), col("ts").as("lts"), col("event_id").as("lid"))
      val r = ev.where(col("event_type") === "click")
        .select(col("user_id").as("ru"), col("ts").as("rts"), col("event_id").as("rid"))
      val j = l.join(r, col("lu") === col("ru") &&
          col("rts") >= col("lts") - expr("INTERVAL 2 HOURS") &&
          col("rts") < col("lts"))
      assert(!j.queryExecution.optimizedPlan.toString.contains("__lband"))
    }
  }
}
