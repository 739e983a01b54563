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

  test("property: random windows/strictness/operand-order/encoding match the naive join") {
    import org.apache.spark.sql.Column
    // deterministic pseudo-random sweep over everything the rewrite
    // normalizes: window offset sign, band width, strict vs inclusive
    // bounds, flipped comparison operand order, and LTZ vs NTZ ts
    // encoding. Timestamps sit on a coarse 250 ms grid so rows land
    // exactly ON band boundaries (the off-by-one-µs territory).
    val rnd = new scala.util.Random(20260814L)
    val base = 1700000000000L
    withExtSession { s =>
      import s.implicits._
      for (trial <- 0 until 10) {
        val ntz = trial % 2 == 1
        val lRows = (0 until 120).map(i => (base + rnd.nextInt(40) * 250L, i.toLong))
        val rRows = (0 until 160).map(i => (base + rnd.nextInt(40) * 250L, 1000L + i))
        val loMs = (rnd.nextInt(41) - 20) * 250L
        val hiMs = loMs + (1 + rnd.nextInt(16)) * 250L
        val strictLo = rnd.nextBoolean()
        val strictHi = rnd.nextBoolean()
        def mkDf(rows: Seq[(Long, Long)], tsName: String, idName: String) = {
          val df = rows.toDF("ms", idName)
            .select(timestamp_millis(col("ms")).as(tsName), col(idName))
          if (ntz) df.withColumn(tsName, col(tsName).cast("timestamp_ntz")) else df
        }
        val l = mkDf(lRows, "lts", "lid")
        val r = mkDf(rRows, "rts", "rid")
        val loB = col("lts") + expr(s"INTERVAL $loMs MILLISECONDS")
        val hiB = col("lts") + expr(s"INTERVAL $hiMs MILLISECONDS")
        // flip operand order randomly — classify() must normalize both
        def ge(a: Column, b: Column, strict: Boolean) =
          if (rnd.nextBoolean()) { if (strict) a > b else a >= b }
          else { if (strict) b < a else b <= a }
        val cond = ge(col("rts"), loB, strictLo) && ge(hiB, col("rts"), strictHi)
        val j = l.join(r, cond).select("lid", "rid")
        assert(j.queryExecution.optimizedPlan.toString.contains("__lband"),
          s"trial $trial (ntz=$ntz lo=$loMs hi=$hiMs) did not rewrite")
        val got = j.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
        val naive = (for {
          (lms, lid) <- lRows
          (rms, rid) <- rRows
          d = rms - lms
          if (if (strictLo) d > loMs else d >= loMs) &&
            (if (strictHi) d < hiMs else d <= hiMs)
        } yield (lid, rid)).toSet
        assert(got == naive,
          s"trial $trial (ntz=$ntz lo=$loMs hi=$hiMs strict=$strictLo/$strictHi): " +
            s"${(got -- naive).size} extra, ${(naive -- got).size} missing")
      }
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
