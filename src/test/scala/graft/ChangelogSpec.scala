package graft

import org.apache.spark.sql.functions._

import graft.ext.{Changelog, Hashing}

/** Hand-computable cases for [[graft.ext.Changelog]]: latest-wins
  * ordering under out-of-order logs, insert/update/delete/passthrough
  * in one merge, and every diff status from one perturbed snapshot.
  */
class ChangelogSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("applyLog: insert, update, delete, passthrough; latest seq wins out of order") {
    val snap = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "v")
    // key 1: updated twice, LOG ORDER is not seq order — seq 2 must win
    // key 2: updated then deleted (latest = delete)
    // key 4: brand-new key, inserted
    // key 3: untouched, passes through
    val log = Seq(
      (1L, "a2", 11L, "U", 2L),
      (1L, "a1", 99L, "U", 1L),
      (2L, "b1", 21L, "U", 1L),
      (2L, "b1", 0L, "D", 2L),
      (4L, "d", 40L, "U", 1L))
      .toDF("k", "name", "v", "op", "seq")
    val out = Changelog.applyLog(snap, log, "k", "op", Seq("seq"))
      .orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "a2", 11L), (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("applyLog: seq tuple compares lexicographically across columns") {
    val snap = Seq((1L, 0L)).toDF("k", "v")
    // (ts=2, id=0) beats (ts=1, id=9): the FIRST seq column dominates
    val log = Seq((1L, 100L, "U", 1L, 9L), (1L, 200L, "U", 2L, 0L))
      .toDF("k", "v", "op", "ts", "id")
    val out = Changelog.applyLog(snap, log, "k", "op", Seq("ts", "id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 200L)))
  }

  test("applyLog: delete of a key absent from the snapshot leaves no row") {
    val snap = Seq((1L, 10L)).toDF("k", "v")
    val log = Seq((9L, 0L, "D", 1L)).toDF("k", "v", "op", "seq")
    val out = Changelog.applyLog(snap, log, "k", "op", Seq("seq"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L))
  }

  test("applyLog rejects a log missing a payload column") {
    val snap = Seq((1L, 10L)).toDF("k", "v")
    val log = Seq((1L, "U", 1L)).toDF("k", "op", "seq")
    intercept[IllegalArgumentException] {
      Changelog.applyLog(snap, log, "k", "op", Seq("seq"))
    }
  }

  test("mergeBatch: split-invariant, idempotent, tombstones block lower-seq resurrection") {
    // the laws StreamMerge's exactly-once story rests on: folding a
    // log in ANY batch split (including re-applying a batch, the
    // restart-replay case) must equal latest-per-key over the union
    val store0 = Seq((1L, "a", "U", 0L), (2L, "b", "U", 0L))
      .toDF("k", "name", "op", "seq")
    val b1 = Seq((1L, "a1", "U", 2L), (3L, "c", "U", 1L), (2L, "?", "D", 3L))
      .toDF("k", "name", "op", "seq")
    // b2 arrives LATER but carries lower seqs (out-of-order delivery):
    // key 1's seq-1 update and key 2's seq-1 update must both LOSE —
    // key 2 to the retained tombstone
    val b2 = Seq((1L, "aOld", "U", 1L), (2L, "bOld", "U", 1L), (4L, "d", "U", 1L))
      .toDF("k", "name", "op", "seq")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val folded = canon(Changelog.mergeBatch(
      Changelog.mergeBatch(store0, b1, "k", "op", Seq("seq")),
      b2, "k", "op", Seq("seq")))
    val oneShot = canon(Changelog.mergeBatch(store0,
      b1.unionByName(b2), "k", "op", Seq("seq")))
    assert(folded == oneShot, "fold over batch splits diverged from the one-shot merge")
    assert(folded == Seq(
      (1L, "a1", "U", 2L), (2L, "?", "D", 3L),
      (3L, "c", "U", 1L), (4L, "d", "U", 1L)))
    // idempotency: re-applying b2 (restart replay) is a no-op
    val replayed = canon(Changelog.mergeBatch(
      Changelog.mergeBatch(
        Changelog.mergeBatch(store0, b1, "k", "op", Seq("seq")),
        b2, "k", "op", Seq("seq")),
      b2, "k", "op", Seq("seq")))
    assert(replayed == folded, "re-applying a batch changed the store")
    // serving snapshot elides the tombstone
    val snap = Changelog.mergeBatch(store0, b1.unionByName(b2), "k", "op", Seq("seq"))
    val served = snap.where(col("op") =!= "D").select("k").as[Long].collect().sorted
    assert(served.toSeq == Seq(1L, 3L, 4L))
  }

  test("mergeBatch treats a null key as one ordinary key (no duplicate accumulation)") {
    // a plain equi anti-join never matches null=null, so without
    // null-safe keys the store's null row survives UNTOUCHED while
    // the max_by emits the batch's null winner — two rows for one
    // key, compounding per batch
    val store = Seq((Option(1L), "a", "U", 1L), (Option.empty[Long], "n0", "U", 1L))
      .toDF("k", "name", "op", "seq")
    val b1 = Seq((Option.empty[Long], "n1", "U", 2L))
      .toDF("k", "name", "op", "seq")
    val b2 = Seq((Option.empty[Long], "n2", "U", 3L))
      .toDF("k", "name", "op", "seq")
    val out = Changelog.mergeBatch(
      Changelog.mergeBatch(store, b1, "k", "op", Seq("seq")),
      b2, "k", "op", Seq("seq"))
      .orderBy("seq")
      .collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a", 1L), (-1L, "n2", 3L)),
      s"null key must hold exactly one (latest) row, got ${out.toSeq}")
  }

  test("mergeBatch rejects a batch that NARROWS the store schema") {
    val store = Seq((1L, "a", "U", 0L)).toDF("k", "name", "op", "seq")
    val batch = Seq((1L, "U", 1L)).toDF("k", "op", "seq")
    val e = intercept[IllegalArgumentException] {
      Changelog.mergeBatch(store, batch, "k", "op", Seq("seq"))
    }
    assert(e.getMessage.contains("narrows"), e.getMessage)
  }

  test("mergeBatch accepts an additive batch: store null-backfilled, wider schema adopted, old rows intact") {
    val store = Seq((1L, "a", "U", 1L), (2L, "b", "U", 1L))
      .toDF("k", "name", "op", "seq")
    // mid-stream evolution: the batch adds a `lang` column; it updates
    // key 1 and inserts key 3, key 2 passes through null-backfilled
    val batch = Seq((1L, "a2", "en", "U", 2L), (3L, "c", "de", "U", 2L))
      .toDF("k", "name", "lang", "op", "seq")
    val out = Changelog.mergeBatch(store, batch, "k", "op", Seq("seq"))
    assert(out.columns.toSeq == Seq("k", "name", "op", "seq", "lang"),
      "merged store must adopt the widened schema (store order + new columns)")
    val rows = out.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(4)))).toSeq
    assert(rows == Seq((1L, "a2", Some("en")), (2L, "b", None), (3L, "c", Some("de"))))
    // and a FURTHER batch at the widened schema folds normally
    val b2 = Seq((2L, "b2", "fr", "U", 3L)).toDF("k", "name", "lang", "op", "seq")
    val out2 = Changelog.mergeBatch(out, b2, "k", "op", Seq("seq"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(4)))).toSeq
    assert(out2 == Seq((1L, "a2", Some("en")), (2L, "b2", Some("fr")), (3L, "c", Some("de"))))
  }

  test("mergeBatch rejects a drifted type on a shared column name") {
    val store = Seq((1L, "a", "U", 0L)).toDF("k", "name", "op", "seq")
    val batch = Seq((1L, "a", "U", "one")).toDF("k", "name", "op", "seq")
    val e = intercept[IllegalArgumentException] {
      Changelog.mergeBatch(store, batch, "k", "op", Seq("seq"))
    }
    assert(e.getMessage.contains("drifted"), e.getMessage)
  }

  test("mergeBatch reserves its temp names and guards the batch-keys broadcast") {
    val store = Seq((1L, "a", "U", 0L)).toDF("k", "__bk", "op", "seq")
    val batch = Seq((1L, "b", "U", 1L)).toDF("k", "__bk", "op", "seq")
    val e = intercept[IllegalArgumentException] {
      Changelog.mergeBatch(store, batch, "k", "op", Seq("seq"))
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    // over-threshold batch: loud "split the batch", never a silent
    // sort-merge join of the store side
    val s2 = Seq((1L, "a", "U", 0L)).toDF("k", "name", "op", "seq")
    val big = Seq((1L, "x", "U", 1L), (2L, "y", "U", 1L), (3L, "z", "U", 1L))
      .toDF("k", "name", "op", "seq")
    val g = intercept[IllegalArgumentException] {
      Changelog.mergeBatch(s2, big, "k", "op", Seq("seq"), maxBroadcastKeys = 2L)
    }
    assert(g.getMessage.contains("split the batch"), g.getMessage)
  }

  test("aggDelta: losing late entry nets zero; value move within a dim keeps n, moves sum; null dim is a group") {
    // store: k1 (dim a, 10), k2 (dim a, 20), k3 (null dim, 5)
    val store = Seq(
      (1L, Option("a"), 10L, "U", 5L),
      (2L, Option("a"), 20L, "U", 5L),
      (3L, Option.empty[String], 5L, "U", 5L))
      .toDF("k", "dim", "v", "op", "seq")
    // batch: k1 LOSES (seq 3 < 5 — delta must be zero for it), k2
    // value moves 20→25 within dim a (n delta 0, sum delta +5), k3's
    // null-dim row is deleted, k4 inserts into dim b
    val batch = Seq(
      (1L, Option("a"), 999L, "U", 3L),
      (2L, Option("a"), 25L, "U", 6L),
      (3L, Option.empty[String], 0L, "D", 6L),
      (4L, Option("b"), 7L, "U", 6L))
      .toDF("k", "dim", "v", "op", "seq")
    val agg0 = Changelog.aggSnapshot(store, "op", Seq("dim"), "v")
    val delta = Changelog.aggDelta(store, batch, "k", "op", Seq("seq"),
      Seq("dim"), "v", maxBroadcastKeys = 0L)
    val folded = Changelog.mergeAggDelta(agg0, delta, Seq("dim"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    // dim a: still 2 rows (k1 kept old value), sum 10+25; dim b: k4;
    // null dim emptied by the delete → row dropped entirely
    assert(folded == Seq((Option("a"), 2L, 35L), (Option("b"), 1L, 7L)),
      s"got $folded")
    // and it matches the recompute over the merged store
    val merged = Changelog.mergeBatch(store, batch, "k", "op", Seq("seq"))
    val want = Changelog.aggSnapshot(merged, "op", Seq("dim"), "v")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(folded == want)
  }

  test("aggDelta SUM0: deleting a dim's only non-null value leaves sum 0 on BOTH fold and recompute") {
    // plain SQL SUM would say null for a dim whose live rows all
    // carry null values, while the fold's arithmetic cancellation
    // says 0 — the maintained statistic is defined as null-as-zero
    // on both paths so they cannot diverge
    val s2 = Seq((1L, "x", Option(5L), "U", 1L),
      (2L, "x", Option.empty[Long], "U", 1L))
      .toDF("k", "dim", "v", "op", "seq")
    val b2 = Seq((1L, "x", Option.empty[Long], "D", 2L))
      .toDF("k", "dim", "v", "op", "seq")
    val folded = Changelog.mergeAggDelta(
        Changelog.aggSnapshot(s2, "op", Seq("dim"), "v"),
        Changelog.aggDelta(s2, b2, "k", "op", Seq("seq"), Seq("dim"), "v",
          maxBroadcastKeys = 0L),
        Seq("dim"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(folded == Seq(("x", 1L, Some(0L))), s"got $folded")
    val recompute = Changelog.aggSnapshot(
        Changelog.mergeBatch(s2, b2, "k", "op", Seq("seq")),
        "op", Seq("dim"), "v")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(folded == recompute, s"fold $folded vs recompute $recompute")
  }

  test("mergeAggMinMax: boundary retractions recompute, inserts fold self-maintainably, fold == recompute throughout") {
    val seed = Seq(
      (1L, "a", 10L, "U", -1L), (2L, "a", 50L, "U", -1L),
      (3L, "a", 50L, "U", -1L),
      (4L, "b", 5L, "U", -1L), (5L, "b", 7L, "U", -1L))
      .toDF("k", "seg", "v", "op", "seq")
    var store = seed
    var agg = Changelog.aggSnapshotMinMax(seed, "op", Seq("seg"), "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("seg", "n", "sum", "min", "max")
        .as[(String, Long, Long, Option[Long], Option[Long])]
        .collect().toSeq.sortBy(_._1)
    def fold(rows: Seq[(Long, String, Long, String, Long)])
        : Seq[(String, Long, Long, Option[Long], Option[Long])] = {
      val b = rows.toDF("k", "seg", "v", "op", "seq")
      // checkpoint per fold: the maintenance plan references agg and
      // store several times, so un-truncated lineage grows
      // exponentially across folds (the deployed shape truncates
      // naturally — StreamMatview reads each trigger's inputs back
      // from the committed store)
      agg = Changelog.mergeAggMinMax(agg, store, b, "k", "op", Seq("seq"),
        Seq("seg"), "v", maxBroadcastKeys = 0L).localCheckpoint(true)
      store = Changelog.mergeBatch(store, b, "k", "op", Seq("seq"),
        maxBroadcastKeys = 0L).localCheckpoint(true)
      val got = canon(agg)
      assert(got == canon(Changelog.aggSnapshotMinMax(store, "op",
        Seq("seg"), "v")),
        s"fold diverged from the recompute after batch $rows")
      got
    }
    // tied boundary: k=2 (one of two 50s in "a") deleted — recompute
    // fires but the max survives through the tie
    assert(fold(Seq((2L, "a", 0L, "D", 1L))) ==
      Seq(("a", 2L, 60L, Some(10L), Some(50L)),
          ("b", 2L, 12L, Some(5L), Some(7L))))
    // genuine retraction: the last 50 goes, max falls to 10
    assert(fold(Seq((3L, "a", 0L, "D", 2L))) ==
      Seq(("a", 1L, 10L, Some(10L), Some(10L)),
          ("b", 2L, 12L, Some(5L), Some(7L))))
    // self-maintainable insert grows the max; a below-boundary update
    // (k=5: 7 -> 6, neither old min nor max) stays incremental
    assert(fold(Seq((6L, "a", 99L, "U", 3L), (5L, "b", 6L, "U", 3L))) ==
      Seq(("a", 2L, 109L, Some(10L), Some(99L)),
          ("b", 2L, 11L, Some(5L), Some(6L))))
    // downward update OF the max row (k=6: 99 -> 1): leaving value
    // ties the boundary, recompute retracts it and adopts the new min
    assert(fold(Seq((6L, "a", 1L, "U", 4L))) ==
      Seq(("a", 2L, 11L, Some(1L), Some(10L)),
          ("b", 2L, 11L, Some(5L), Some(6L))))
    // emptying a dim drops it entirely
    assert(fold(Seq((4L, "b", 0L, "D", 5L), (5L, "b", 0L, "D", 5L))) ==
      Seq(("a", 2L, 11L, Some(1L), Some(10L))))
    // re-delivery (crash replay) is idempotent — same batch again
    assert(fold(Seq((6L, "a", 1L, "U", 4L))) ==
      Seq(("a", 2L, 11L, Some(1L), Some(10L))))
  }

  test("mergeAggMinMax: multi-column dims fold correctly (struct-key joins span the whole tuple)") {
    val seed = Seq(
      (1L, "a", "x", 10L, "U", -1L), (2L, "a", "x", 50L, "U", -1L),
      (3L, "a", "y", 50L, "U", -1L), (4L, "b", "x", 5L, "U", -1L))
      .toDF("k", "s1", "s2", "v", "op", "seq")
    var store = seed
    var agg = Changelog.aggSnapshotMinMax(seed, "op", Seq("s1", "s2"), "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("s1", "s2", "n", "sum", "min", "max")
        .as[(String, String, Long, Long, Option[Long], Option[Long])]
        .collect().toSeq.sorted
    // delete (a,x)'s max: only THAT tuple recomputes — (a,y) keeps its
    // 50 even though it shares s1 = "a"
    val b = Seq((2L, "a", "x", 0L, "D", 0L)).toDF("k", "s1", "s2", "v", "op", "seq")
    agg = Changelog.mergeAggMinMax(agg, store, b, "k", "op", Seq("seq"),
      Seq("s1", "s2"), "v", maxBroadcastKeys = 0L).localCheckpoint(true)
    store = Changelog.mergeBatch(store, b, "k", "op", Seq("seq"),
      maxBroadcastKeys = 0L).localCheckpoint(true)
    assert(canon(agg) == canon(Changelog.aggSnapshotMinMax(store, "op",
      Seq("s1", "s2"), "v")))
    assert(canon(agg) == Seq(
      ("a", "x", 1L, 10L, Some(10L), Some(10L)),
      ("a", "y", 1L, 50L, Some(50L), Some(50L)),
      ("b", "x", 1L, 5L, Some(5L), Some(5L))))
  }

  test("mergeAggMinMax: null dims group as values; all-null dims carry null min/max without faking boundaries") {
    val seed = Seq(
      (1L, Some("a"), Some(10L), "U", -1L),
      (2L, None, Some(20L), "U", -1L),
      (3L, None, Some(30L), "U", -1L),
      (4L, Some("z"), None, "U", -1L), (5L, Some("z"), None, "U", -1L))
      .toDF("k", "seg", "v", "op", "seq")
    var store = seed
    var agg = Changelog.aggSnapshotMinMax(seed, "op", Seq("seg"), "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("seg", "n", "sum", "min", "max")
        .as[(Option[String], Long, Long, Option[Long], Option[Long])]
        .collect().toSeq.sortBy(_._1)
    def fold(rows: Seq[(Long, Option[String], Option[Long], String, Long)]) = {
      val b = rows.toDF("k", "seg", "v", "op", "seq")
      agg = Changelog.mergeAggMinMax(agg, store, b, "k", "op", Seq("seq"),
        Seq("seg"), "v", maxBroadcastKeys = 0L).localCheckpoint(true)
      store = Changelog.mergeBatch(store, b, "k", "op", Seq("seq"),
        maxBroadcastKeys = 0L).localCheckpoint(true)
      val got = canon(agg)
      assert(got == canon(Changelog.aggSnapshotMinMax(store, "op",
        Seq("seg"), "v")),
        s"fold diverged from the recompute after batch $rows")
      got
    }
    // delete the null dim's max (30): the null dim must recompute like
    // any other group, not fall out of a non-null-safe join
    assert(fold(Seq((3L, None, Some(0L), "D", 1L))) ==
      Seq((None, 1L, 20L, Some(20L), Some(20L)),
          (Some("a"), 1L, 10L, Some(10L), Some(10L)),
          (Some("z"), 2L, 0L, None, None)))
    // deleting one all-null row never fakes a boundary; min/max stay
    // null, SUM0 keeps the sum at 0
    assert(fold(Seq((4L, Some("z"), None, "D", 2L))) ==
      Seq((None, 1L, 20L, Some(20L), Some(20L)),
          (Some("a"), 1L, 10L, Some(10L), Some(10L)),
          (Some("z"), 1L, 0L, None, None)))
    // a first non-null value lands as both bounds of the all-null dim
    assert(fold(Seq((6L, Some("z"), Some(42L), "U", 3L))) ==
      Seq((None, 1L, 20L, Some(20L), Some(20L)),
          (Some("a"), 1L, 10L, Some(10L), Some(10L)),
          (Some("z"), 2L, 42L, Some(42L), Some(42L))))
  }

  test("mergeAggSketch: served min/max track the recompute through pops, drains, and refills (k=2)") {
    val seed = (1L to 18L).map(i =>
      (i, s"seg${i % 3}", i * 10L, "U", -1L))
      .toDF("k", "seg", "v", "op", "seq")
    var store = seed
    var agg = Changelog.aggSnapshotSketch(seed, "op", Seq("seg"), "v", k = 2)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("seg", "n", "sum", "min", "max")
        .as[(String, Long, Long, Option[Long], Option[Long])]
        .collect().toSeq.sorted
    var seq = 0L
    def fold(rows: Seq[(Long, String, Long, String)]): Unit = {
      seq += 1
      val b = rows.map { case (k, s, v, op) => (k, s, v, op, seq) }
        .toDF("k", "seg", "v", "op", "seq")
      agg = Changelog.mergeAggSketch(agg, store, b, "k", "op", Seq("seq"),
        Seq("seg"), "v", k = 2, maxBroadcastKeys = 0L).localCheckpoint(true)
      store = Changelog.mergeBatch(store, b, "k", "op", Seq("seq"),
        maxBroadcastKeys = 0L).localCheckpoint(true)
      assert(canon(agg) == canon(Changelog.aggSnapshotMinMax(store, "op",
        Seq("seg"), "v")),
        s"sketched fold diverged from the recompute after batch $seq: $rows")
    }
    // pop within the sketch: seg0's min holder (k=3, 30) leaves —
    // absorbed, no drain (k=2 sketch still holds 60)
    fold(Seq((3L, "seg0", 0L, "D")))
    // DRAIN: both remaining tracked smallest of seg0 leave in one
    // batch (6->60 and 9->90 were the refilled sketch) — rebuild fires
    fold(Seq((6L, "seg0", 0L, "D"), (9L, "seg0", 0L, "D")))
    // boundary moves by update, not delete: max of seg1 (16, 160)
    // drops below everything — pop + splice in one step
    fold(Seq((16L, "seg1", 1L, "U")))
    // inserts beyond a truncated threshold stay untracked and the
    // boundary is still served correctly
    fold(Seq((100L, "seg2", 5000L, "U"), (101L, "seg2", 1L, "U")))
    // drain seg2's min side twice over (forces rebuild with survivors)
    fold(Seq((101L, "seg2", 0L, "D"), (2L, "seg2", 0L, "D"),
      (5L, "seg2", 0L, "D")))
    // pseudo-random churn, deterministic: 6 mixed batches
    val rnd = new scala.util.Random(42)
    (1 to 6).foreach { _ =>
      val rows = (1 to 5).map { _ =>
        val key = rnd.nextInt(30).toLong + 1
        val sg = s"seg${rnd.nextInt(3)}"
        if (rnd.nextBoolean()) (key, sg, rnd.nextInt(500).toLong, "U")
        else (key, sg, 0L, "D")
      }.distinct.groupBy(_._1).map(_._2.head).toSeq // one entry per key
      fold(rows)
    }
    // empty a whole dim
    val seg0Keys = store.where(col("seg") === "seg0" && col("op") =!= "D")
      .select("k").as[Long].collect().toSeq
    if (seg0Keys.nonEmpty) fold(seg0Keys.map(k => (k, "seg0", 0L, "D")))
    assert(!canon(agg).exists(_._1 == "seg0"), "emptied dim must drop")
  }

  test("mergeAggSketch: a boundary deletion inside the sketch does NOT rebuild; the plan's rebuild branch collapses") {
    val seed = (1L to 12L).map(i => (i, s"s${i % 2}", i * 10L, "U", -1L))
      .toDF("k", "seg", "v", "op", "seq")
    val agg = Changelog.aggSnapshotSketch(seed, "op", Seq("seg"), "v", k = 4)
      .localCheckpoint(true)
    // delete s0's max holder (12, 120): mergeAggMinMax would recompute
    // the dim; the k=4 sketch pops it and serves 100 with no rebuild
    val b = Seq((12L, "s0", 0L, "D", 1L)).toDF("k", "seg", "v", "op", "seq")
    val view = Changelog.mergeAggSketch(agg, seed, b, "k", "op", Seq("seq"),
      Seq("seg"), "v", k = 4, maxBroadcastKeys = 0L)
    view.collect()
    val finalPlan = view.queryExecution.executedPlan.toString
    assert(!finalPlan.contains("__rmns"),
      "an absorbed boundary deletion must take the no-rebuild path — " +
        s"the returned plan carries no rebuild branch at all:\n$finalPlan")
    assert(view.where(col("seg") === "s0")
      .select("max").as[Option[Long]].head() == Some(100L))
  }

  test("purgeAggSketch: pops subtract within the sketch; a drained side rebuilds from survivors only; emptied dims drop") {
    val seed = (1L to 18L).map(i => (i, s"seg${i % 3}", i * 10L, "U", -1L))
      .toDF("k", "seg", "v", "op", "seq")
    var store = seed
    var agg = Changelog.aggSnapshotSketch(seed, "op", Seq("seg"), "v", k = 2)
      .localCheckpoint(true)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("seg", "n", "sum", "min", "max")
        .as[(String, Long, Long, Option[Long], Option[Long])]
        .collect().toSeq.sorted
    def purge(keys: Seq[Long]): Unit = {
      agg = Changelog.purgeAggSketch(agg, store, keys.toDF("k"), "k", "op",
        Seq("seg"), "v", k = 2, maxBroadcastKeys = 0L)
      store = store.join(broadcast(keys.toDF("k")), Seq("k"), "left_anti")
        .localCheckpoint(true)
      assert(canon(agg) == canon(Changelog.aggSnapshotMinMax(store, "op",
        Seq("seg"), "v")),
        s"purged sketch view diverged from the recompute after purging $keys")
    }
    // pop WITHIN the sketch: seg0's min holder (k=3, v=30) — absorbed,
    // served min moves to the next tracked value; and the no-drain
    // path's plan must carry no rebuild branch (hence no store scan)
    val popped = Changelog.purgeAggSketch(agg, store, Seq(3L).toDF("k"),
      "k", "op", Seq("seg"), "v", k = 2, maxBroadcastKeys = 0L)
    popped.collect()
    val plan = popped.queryExecution.executedPlan.toString
    assert(!plan.contains("__rmns"),
      "an in-sketch purge must take the no-rebuild path — the returned " +
        s"plan carries no rebuild branch at all:\n$plan")
    purge(Seq(3L))
    // DRAIN: both tracked smallest of seg0 (6->60, 9->90) purged in one
    // call — the rebuild must come from the SURVIVORS (store minus the
    // purged keys), not the pre-purge store
    purge(Seq(6L, 9L))
    // n/sum telescope: purge a mid-range key of seg1 (no boundary)
    purge(Seq(7L))
    // empty a whole dim: every remaining seg2 key goes
    val seg2 = store.where(col("seg") === "seg2").select("k")
      .as[Long].collect().toSeq
    purge(seg2)
    assert(!canon(agg).exists(_._1 == "seg2"), "emptied dim must drop")
    // fold AFTER a purge keeps telescoping (mergeAggSketch over the
    // purged state)
    val b = Seq((100L, "seg0", 5L, "U", 1L)).toDF("k", "seg", "v", "op", "seq")
    agg = Changelog.mergeAggSketch(agg, store, b, "k", "op", Seq("seq"),
      Seq("seg"), "v", k = 2, maxBroadcastKeys = 0L)
    store = Changelog.mergeBatch(store, b, "k", "op", Seq("seq"),
      maxBroadcastKeys = 0L).localCheckpoint(true)
    assert(canon(agg) == canon(Changelog.aggSnapshotMinMax(store, "op",
      Seq("seg"), "v")))
  }

  test("scd2: versions chain, deletes close without opening, last version is current") {
    import java.sql.Timestamp
    def t(s: Int) = new Timestamp(s * 1000L)
    // key 1: v1 → v2 → delete → v3 (re-created, still current)
    // key 2: single version, current
    val log = Seq(
      (1L, "v1", "U", t(10), 1L),
      (1L, "v2", "U", t(20), 2L),
      (1L, "xx", "D", t(30), 3L),
      (1L, "v3", "U", t(40), 4L),
      (2L, "w1", "U", t(15), 5L))
      .toDF("k", "payload", "op", "ts", "id")
    val out = Changelog.scd2(log, "k", "op", Seq("ts", "id"), "ts")
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("payload"),
        r.getAs[Timestamp]("valid_from").getTime / 1000,
        Option(r.getAs[Timestamp]("valid_to")).map(_.getTime / 1000),
        r.getAs[Boolean]("is_current")))
    assert(out.toSeq == Seq(
      (1L, "v1", 10L, Some(20L), false),
      (1L, "v2", 20L, Some(30L), false), // closed BY the delete's ts
      (1L, "v3", 40L, None, true),
      (2L, "w1", 15L, None, true)))
  }

  test("scd2: a key whose last entry is a delete has no current row") {
    import java.sql.Timestamp
    val log = Seq(
      (1L, "v1", "U", new Timestamp(1000L), 1L),
      (1L, "xx", "D", new Timestamp(2000L), 2L))
      .toDF("k", "payload", "op", "ts", "id")
    val out = Changelog.scd2(log, "k", "op", Seq("ts", "id"), "ts")
    assert(out.count() == 1L)
    assert(out.where(col("is_current")).count() == 0L)
  }

  test("asOf: version visible at the instant, delete closes the interval, boundaries inclusive-exclusive") {
    import spark.implicits._
    val log = Seq(
      (1L, "U", 10L, ts(100), "v1"),
      (1L, "U", 20L, ts(200), "v2"),
      (1L, "D", 30L, ts(300), "x"),
      (2L, "U", 40L, ts(150), "w1")
    ).toDF("k", "op", "seq", "t", "payload")
    val hist = Changelog.scd2(log, "k", "op", Seq("seq"), "t")
    def at(sec: Long): Set[(Long, String)] =
      Changelog.asOf(hist, lit(ts(sec)))
        .select("k", "payload").as[(Long, String)].collect().toSet
    assert(at(50) == Set.empty)                       // before any version
    assert(at(100) == Set(1L -> "v1"))                // valid_from inclusive
    assert(at(199) == Set(1L -> "v1", 2L -> "w1"))
    assert(at(200) == Set(1L -> "v2", 2L -> "w1"))    // valid_to exclusive
    assert(at(299) == Set(1L -> "v2", 2L -> "w1"))
    assert(at(300) == Set(2L -> "w1"))                // delete closes k=1
    assert(at(10000) == Set(2L -> "w1"))              // current version persists
  }

  test("diff labels added / removed / changed / unchanged") {
    val a = Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "text")
    val b = Seq((1L, "same"), (2L, "new"), (4L, "born")).toDF("id", "text")
    val out = Changelog.diff(a, b, "id", Hashing.h60(col("text")))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
  }
}
