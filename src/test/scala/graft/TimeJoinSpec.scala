package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TimeJoin

/** Differential specs for [[graft.ext.TimeJoin]]: the banded /
  * windowed implementations are checked against Spark's own naive
  * non-equi formulations (correct by construction, unusable at scale)
  * on data built around the edge cases — equal timestamps across
  * sides, strict vs inclusive bounds, forward direction, null payload
  * fields, band boundaries, unmatched rows.
  */
class TimeJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // left: key, time, lid. Includes a left row exactly at a right
  // row's time (k=1, t=100) and a left row with no admissible match.
  private def left: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", ts(50), 1L),   // before any right row of a
      ("a", ts(100), 2L),  // exactly at right t=100
      ("a", ts(250), 3L),
      ("b", ts(500), 4L),
      ("c", ts(10), 5L)    // key with no right rows at all
    ).toDF("k", "t", "lid")
  }

  // right: key, time, rid, v (v null on one row — payload-tearing trap:
  // a column-wise last(ignoreNulls) would skip rid=11's null v back to
  // rid=10's, pairing rid=11 with v=7.0)
  private def right: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", ts(100), 10L, Some(7.0)),
      ("a", ts(200), 11L, None),
      ("b", ts(400), 12L, Some(9.0)),
      ("b", ts(600), 13L, Some(3.0))
    ).toDF("k", "t", "rid", "v")
  }

  /** Naive as-of twin: non-equi join + max_by over admissible rows. */
  private def naiveAsof(forward: Boolean, inclusive: Boolean): Seq[(Long, Option[Long], Option[Double])] = {
    val l = left.select(col("k").as("lk"), col("t").as("lt"), col("lid"))
    val cmp =
      if (forward && inclusive) col("rt") >= col("lt")
      else if (forward) col("rt") > col("lt")
      else if (inclusive) col("rt") <= col("lt")
      else col("rt") < col("lt")
    val r = right.select(col("k").as("rk"), col("t").as("rt"), col("rid"), col("v"))
    val picked = l.join(r, col("lk") === col("rk") && cmp, "left")
      .groupBy(col("lid"))
      .agg(max_by(struct(col("rid"), col("v")),
        // admissible rows only; nearest = max rt backward, min rt forward
        when(col("rid").isNotNull,
          if (forward) -unix_millis(col("rt")) else unix_millis(col("rt")))).as("m"))
      .select(col("lid"), col("m.rid"), col("m.v"))
    picked.collect().map(row =>
      (row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getLong(1)),
        if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toSeq.sortBy(_._1)
  }

  private def fastAsof(forward: Boolean, inclusive: Boolean): Seq[(Long, Option[Long], Option[Double])] =
    TimeJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("rid", "v"),
        forward = forward, inclusive = inclusive)
      .select(col("lid"), col("asof_rid"), col("asof_v"))
      .collect().map(row =>
        (row.getLong(0),
          if (row.isNullAt(1)) None else Some(row.getLong(1)),
          if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toSeq.sortBy(_._1)

  test("asofJoin matches the naive non-equi join in all four modes") {
    for (forward <- Seq(false, true); inclusive <- Seq(false, true)) {
      val fast = fastAsof(forward, inclusive)
      val naive = naiveAsof(forward, inclusive)
      assert(fast == naive, s"forward=$forward inclusive=$inclusive")
    }
  }

  test("asofJoin boundary semantics: equal timestamp flips on inclusive") {
    def m(inclusive: Boolean): Map[Long, (Option[Long], Option[Double])] =
      fastAsof(forward = false, inclusive = inclusive)
        .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(m(true)(2L)._1.contains(10L))  // t=100 sees rid=10 at t=100
    assert(m(false)(2L)._1.isEmpty)       // strict: nothing before t=100
  }

  test("asofJoin carries a matched row's null field whole (no payload tearing)") {
    val r = fastAsof(forward = false, inclusive = true)
    // lid=3 (t=250) matches rid=11 (t=200) whose v is null — v must be
    // null, not rid=10's 7.0
    assert(r.find(_._1 == 3L).get == ((3L, Some(11L), None)))
    // left-join semantics: lid=5 (key c) survives unmatched
    assert(r.find(_._1 == 5L).get == ((5L, None, None)))
  }

  test("asofJoin null keys match nothing, like a join and unlike a window partition") {
    import spark.implicits._
    val l = Seq((Option("a"), ts(100), 1L), (Option.empty[String], ts(100), 2L))
      .toDF("k", "t", "lid")
    val r = Seq((Option("a"), ts(50), 10L), (Option.empty[String], ts(50), 11L))
      .toDF("k", "t", "rid")
    val got = TimeJoin.asofJoin(l, r, Seq("k"), "t", "t", Seq("rid"))
      .select(col("lid"), col("asof_rid"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got == Map(1L -> Some(10L), 2L -> None))
  }

  test("rangeJoin equals the naive inequality join incl. band boundaries") {
    import spark.implicits._
    // times laid out around the band width (width = upper-lower =
    // 100 s): exact multiples of the width, the window edges
    // themselves, and cross-band matches
    val l = Seq(("a", ts(100), 1L), ("a", ts(250), 2L), ("b", ts(300), 3L))
      .toDF("k", "t", "id")
    val r = Seq(
      ("a", ts(0), 10L), ("a", ts(100), 11L), ("a", ts(199), 12L),
      ("a", ts(200), 13L), ("a", ts(249), 14L), ("a", ts(340), 17L),
      ("b", ts(200), 15L), ("b", ts(399), 16L)).toDF("k", "t", "id")
    // window: right in [t+0, t+100) — inclusive lower, exclusive upper
    val fast = TimeJoin.rangeJoin(l, r, Seq("k"), "t", "t", 0L, 100000L)
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.select(col("k").as("lk"), col("t").as("lt"), col("id").as("l_id"))
      .join(r.select(col("k").as("rk"), col("t").as("rt"), col("id").as("r_id")),
        col("lk") === col("rk") &&
          col("rt") >= col("lt") && col("rt") < col("lt") + expr("INTERVAL 100 SECONDS"))
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(fast == naive)
    // pin the expected pairs so the naive twin can't mask a shared bug:
    // r11 sits exactly on l1's inclusive lower edge; r13 exactly on its
    // exclusive upper edge; r14 is 1 s before l2's window opens; r17 is
    // l2's cross-band match (bands 2→3 for width 100 s)
    assert(fast == Set((1L, 11L), (1L, 12L), (2L, 17L), (3L, 16L)))
  }

  test("asofJoin with a composite key partitions on all key columns") {
    import spark.implicits._
    val l = Seq(
      ("a", 1L, ts(100), 1L),
      ("a", 2L, ts(100), 2L) // same first key, different second key
    ).toDF("k1", "k2", "t", "lid")
    val r = Seq(
      ("a", 1L, ts(50), 10L),
      ("a", 2L, ts(60), 20L),
      ("b", 1L, ts(70), 30L)
    ).toDF("k1", "k2", "t", "rid")
    val got = TimeJoin.asofJoin(l, r, Seq("k1", "k2"), "t", "t", Seq("rid"))
      .select(col("lid"), col("asof_rid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    // each left row matches within its FULL composite key — never the
    // other second-key's row despite the shared first key
    assert(got == Map(1L -> 10L, 2L -> 20L))
  }

  test("asofJoin null timestamps are inadmissible on either side, like a join") {
    import spark.implicits._
    val l = Seq(
      ("a", Option(ts(100)), 1L),
      ("a", Option.empty[Timestamp], 2L) // null left ts: admits nothing
    ).toDF("k", "t", "lid")
    val r = Seq(
      ("a", Option(ts(50)), 10L),
      ("a", Option.empty[Timestamp], 99L) // null right ts: matches nothing
    ).toDF("k", "t", "rid")
    for (forward <- Seq(false, true)) {
      val got = TimeJoin.asofJoin(l, r, Seq("k"), "t", "t", Seq("rid"),
          forward = forward)
        .select(col("lid"), col("asof_rid"))
        .collect().map(x => (x.getLong(0),
          if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
      // backward: lid=1 (t=100) matches rid=10 (t=50); forward: nothing
      // at-or-after 100 — and NEVER the null-ts rid=99; lid=2 (null t)
      // survives unmatched in both directions
      val expect1 = if (forward) None else Some(10L)
      assert(got == Map(1L -> expect1, 2L -> None), s"forward=$forward")
    }
  }

  test("asofJoin property: random events match the naive join in all four modes") {
    import spark.implicits._
    // deterministic pseudo-random corpus with DELIBERATE ts collisions
    // (coarse time grid) so equal-timestamp tie handling is exercised
    // across sides; right ids unique per (key, ts) as the contract
    // requires (at most one right row per key and instant)
    val rnd = new scala.util.Random(4242L)
    val keys = Vector("a", "b", "c", "d")
    val lRows = (0 until 300).map { i =>
      (keys(rnd.nextInt(keys.size)), ts(rnd.nextInt(50) * 10L), i.toLong)
    }
    val rRows = (0 until 500).map { i =>
      (keys(rnd.nextInt(keys.size)), ts(rnd.nextInt(50) * 10L), 1000L + i)
    }.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq // unique (key, ts)
    val l = lRows.toDF("k", "t", "lid")
    val r = rRows.toDF("k", "t", "rid").withColumn("v", col("rid") * 1.5)
    for (forward <- Seq(false, true); inclusive <- Seq(false, true)) {
      val fast = TimeJoin.asofJoin(l, r, Seq("k"), "t", "t", Seq("rid"),
          forward = forward, inclusive = inclusive)
        .select(col("lid"), col("asof_rid"))
        .collect().map(x => (x.getLong(0),
          if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
      // naive oracle in plain Scala: per left row, scan all right rows
      val rByKey = rRows.groupBy(_._1)
      val naive = lRows.map { case (k, lt, lid) =>
        val adm = rByKey.getOrElse(k, Nil).filter { case (_, rt, _) =>
          val d = rt.getTime - lt.getTime
          if (forward) (if (inclusive) d >= 0 else d > 0)
          else (if (inclusive) d <= 0 else d < 0)
        }
        val best = if (adm.isEmpty) None
          else Some((if (forward) adm.minBy(_._2.getTime) else adm.maxBy(_._2.getTime))._3)
        lid -> best
      }.toMap
      assert(fast == naive, s"forward=$forward inclusive=$inclusive")
    }
  }

  test("sessionize: exact-gap stays in session, gap+1ms opens a new one, per-key ordinals") {
    import spark.implicits._
    val gap = 60000L // 1 minute
    val ev = Seq(
      ("u", new Timestamp(0L)),
      ("u", new Timestamp(gap)),          // gap == gapMs → same session
      ("u", new Timestamp(2 * gap + 1)),  // gap+1ms → new session
      ("u", new Timestamp(2 * gap + 2)),
      ("v", new Timestamp(5L))            // other key starts at 1 again
    ).toDF("k", "t")
    val got = TimeJoin.sessionize(ev, Seq("k"), "t", gap)
      .select(col("k"), col("t"), col("session_id"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .toSet
    assert(got == Set(
      ("u", 0L, 1L), ("u", gap, 1L),
      ("u", 2 * gap + 1, 2L), ("u", 2 * gap + 2, 2L),
      ("v", 5L, 1L)))
  }

  test("transitions: consecutive pairs per key, ties by tie column, first event excluded") {
    import spark.implicits._
    val ev = Seq(
      // u1: A →(tie at t=100, ordered by id: B before C)→ B → C
      (1L, ts(50), 1L, "A"),
      (1L, ts(100), 2L, "B"),
      (1L, ts(100), 3L, "C"),
      // u2: A → B
      (2L, ts(10), 4L, "A"),
      (2L, ts(20), 5L, "B"),
      // u3: single event, contributes no pair
      (3L, ts(10), 6L, "A")
    ).toDF("user_id", "t", "event_id", "state")
    val got = TimeJoin.transitions(ev, Seq("user_id"), "t", "state",
        tieCols = Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      ("A", "B", 2L, 2L),  // u1 and u2
      ("B", "C", 1L, 1L))) // u1's tied pair, ordered by event_id
    intercept[IllegalArgumentException] {
      TimeJoin.transitions(ev, Seq.empty, "t", "state")
    }
    // a null timestamp sorts FIRST in the per-key window (nulls-first
    // ASC), so the null-ts event is the entity's first — it feeds a
    // pair into its successor but never consumes one; same contract
    // as sessionize's null handling, pinned so it can't drift
    val withNull = Seq(
      (9L, None, 1L, "Z"),
      (9L, Some(ts(10)), 2L, "A")
    ).toDF("user_id", "t", "event_id", "state")
    val nz = TimeJoin.transitions(withNull, Seq("user_id"), "t", "state",
        tieCols = Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(nz == Set(("Z", "A", 1L)))
  }

  test("batch sessionize segmentation equals the streaming mergeAll fold") {
    import spark.implicits._
    import graft.streaming.Sessionize
    val gap = 1800000L
    // real per-user event times from the smallest fixture
    val times = Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("user_id") === 7).select("ts")
      .as[Timestamp].collect().map(_.getTime).sorted.toSeq
    assert(times.size > 5)
    val batch = TimeJoin.sessionize(
        times.map(t => (7L, new Timestamp(t))).toDF("user_id", "ts"),
        Seq("user_id"), "ts", gap)
      .groupBy("session_id")
      .agg(min(unix_millis(col("ts"))).as("s"), max(unix_millis(col("ts"))).as("e"),
        count(lit(1)).as("n"))
      .select("s", "e", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = Sessionize.mergeAll(
        times.map(t => Sessionize.SessState(t, t, 1L)), gap)
      .map(s => (s.start, s.end, s.n)).toSet
    assert(batch == streamed)
  }

  test("sessionize agrees with Spark's native session_window on every user") {
    import spark.implicits._
    val gap = 1800000L
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id", "ts")
    // ours: per-user gap segmentation → (user, session start/end/n)
    val ours = TimeJoin.sessionize(ev, Seq("user_id"), "ts", gap)
      .groupBy("user_id", "session_id")
      .agg(min(unix_millis(col("ts"))).as("s"),
        max(unix_millis(col("ts"))).as("e"), count(lit(1)).as("n"))
      .select("user_id", "s", "e", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // native: session_window merges events within gap into one window.
    // The two formulations must segment identically — gap boundary
    // semantics included (session_window's window is [start, last+gap),
    // but the EVENT extent min/max is what both report here).
    val native = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(min(unix_millis(col("ts"))).as("s"),
        max(unix_millis(col("ts"))).as("e"), count(lit(1)).as("n"))
      .select("user_id", "s", "e", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(ours == native)
    assert(ours.size > ev.select("user_id").distinct().count(),
      "fixture should contain multi-session users or the check is weak")
  }

  test("rangeJoin negative window (right before left) and no self pair loss") {
    import spark.implicits._
    val ev = Seq(
      ("u", ts(1000), 1L), ("u", ts(1500), 2L), ("u", ts(2000), 3L))
      .toDF("k", "t", "id")
    // right rows in the 10 minutes BEFORE each left row: [t-600, t)
    val pairs = TimeJoin.rangeJoin(ev, ev, Seq("k"), "t", "t", -600000L, 0L)
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs == Set((2L, 1L), (3L, 2L)))
  }

  test("rangeJoin left-outer: leftIdCol path equals synthetic-id path, no checkpoint") {
    import spark.implicits._
    val l = Seq(("a", ts(100), 1L), ("a", ts(500), 2L), ("b", ts(100), 3L),
      ("c", ts(100), 4L)).toDF("k", "t", "id")
    val r = Seq(("a", ts(120), 10L), ("b", ts(700), 11L)).toDF("k", "t", "id")
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_id"), col("r_id"))
      .as[(Long, Option[Long])].collect().toSet
    val viaSynthetic = TimeJoin.rangeJoin(l, r, Seq("k"), "t", "t",
      0L, 100000L, joinType = "left")
    val viaNatural = TimeJoin.rangeJoin(l, r, Seq("k"), "t", "t",
      0L, 100000L, joinType = "left", leftIdCol = Some("id"))
    val want = Set[(Long, Option[Long])](
      (1L, Some(10L)), (2L, None), (3L, None), (4L, None))
    assert(asSet(viaSynthetic) == want)
    assert(asSet(viaNatural) == want)
    assert(viaSynthetic.columns.toSeq == viaNatural.columns.toSeq)
    // the natural-key variant must stay fully lazy and
    // lineage-recoverable: no checkpoint, no synthetic row id
    val plan = viaNatural.queryExecution.analyzed.toString
    assert(!plan.contains("LogicalRDD") && !plan.contains("__lid"),
      s"natural-key path must not materialize the left side:\n$plan")
    // unknown leftIdCol fails loudly
    intercept[IllegalArgumentException] {
      TimeJoin.rangeJoin(l, r, Seq("k"), "t", "t", 0L, 100000L,
        joinType = "left", leftIdCol = Some("nope"))
    }
  }

  test("resample densifies each key's span independently, gaps carry null aggs") {
    import spark.implicits._
    // key a: events in buckets 0 and 30 (10-second grid) — buckets 10
    // and 20 are gaps; key b: a single bucket, no densification
    val df = Seq(
      ("a", Timestamp.valueOf("1970-01-01 00:00:01"), 5L),
      ("a", Timestamp.valueOf("1970-01-01 00:00:09"), 7L),
      ("a", Timestamp.valueOf("1970-01-01 00:00:31"), 1L),
      ("b", Timestamp.valueOf("1970-01-01 00:01:00"), 2L))
      .toDF("k", "t", "x")
    val out = TimeJoin.resample(df, Seq("k"), "t", 10L,
        Seq(count(lit(1)).as("n"), sum(col("x")).as("sx")))
      .orderBy("k", "bucket_s")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", 0L, 2L, 12L), ("a", 10L, -1L, -1L), ("a", 20L, -1L, -1L),
      ("a", 30L, 1L, 1L), ("b", 60L, 1L, 2L)))
  }

  test("trailingWindow frame is CLOSED on both ends, keys independent") {
    import spark.implicits._
    // width 10s: at t=20, the row at exactly t=10 is IN frame (closed
    // lower bound); at t=21 it has just left. Key b never sees key a.
    val df = Seq(
      ("a", new Timestamp(10000L), 1L),
      ("a", new Timestamp(20000L), 2L),
      ("a", new Timestamp(21000L), 4L),
      ("b", new Timestamp(20000L), 8L))
      .toDF("k", "t", "x")
    val w = TimeJoin.trailingWindow(Seq("k"), "t", 10000L)
    val out = df.select(col("k"), col("t"), sum(col("x")).over(w).as("s"))
      .orderBy("k", "t")
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 1L), ("a", 3L), ("a", 6L), ("b", 8L)))
  }

  test("trailingWindow includes ALL equal-timestamp peers (range, not rows)") {
    import spark.implicits._
    val df = Seq(("a", new Timestamp(5000L), 1L), ("a", new Timestamp(5000L), 2L))
      .toDF("k", "t", "x")
    val w = TimeJoin.trailingWindow(Seq("k"), "t", 1000L)
    val out = df.select(sum(col("x")).over(w).as("s"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(3L, 3L), "both peers must see both rows")
  }

  test("resample: a sub-second timestamp stays in its whole-second bucket") {
    import spark.implicits._
    // 9.999s is still bucket 0 on a 10s grid (unix_millis keeps the
    // millis; the floor-div banding can't be pushed over the edge)
    val df = Seq(("a", new Timestamp(9999L), 1L)).toDF("k", "t", "x")
    val out = TimeJoin.resample(df, Seq("k"), "t", 10L,
        Seq(count(lit(1)).as("n")))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 1L)))
  }
}
