package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Changelog
import graft.streaming.{BucketStore, StreamIngest, StreamMerge}

/** The bucketed version store's 100 TB contract, pinned on files —
  * not just results: a microbatch must REWRITE ONLY THE BUCKETS ITS
  * KEYS TOUCH (the whole point of the layout; the flat predecessor
  * rewrote the entire store every trigger), while the settled store
  * stays hash-identical to the flat full-merge fold.
  */
class BucketStoreSpec extends SparkSpec {
  import spark.implicits._

  private def bucketDirs(storeDir: String, id: Long): Set[Long] = {
    val d = new java.io.File(s"$storeDir/v$id/data")
    if (!d.isDirectory) Set.empty
    else d.listFiles.toIndexedSeq.filter(_.isDirectory)
      .map(_.getName).collect { case s if s.startsWith("__b=") =>
        s.stripPrefix("__b=").toLong
      }.toSet
  }

  private def mergeBatchDf(keys: Seq[Long], name: String, seq: Long): DataFrame =
    keys.map(k => (k, s"$name-$k", "U", seq)).toDF("k", "name", "op", "seq")

  test("a 1-key merge batch rewrites exactly 1 bucket; the rest are carried by reference") {
    val storeDir = Files.createTempDirectory("graft_bks_store").toString
    val nb = 8
    // seed 100 keys — with B=8 every bucket is populated
    StreamMerge.seed(
      spark.range(0, 100).select(col("id").as("k"),
        concat(lit("seed-"), col("id")).as("name"),
        lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, "k", nb)
    val seedBuckets = bucketDirs(storeDir, -1L)
    assert(seedBuckets == (0L until nb).toSet,
      s"seed should populate all $nb buckets, got $seedBuckets")

    StreamMerge.applyBatch(mergeBatchDf(Seq(7L), "b0", 0L), 0L, storeDir,
      "k", "op", Seq("seq"), retain = 2, nBuckets = nb)

    // THE pin: version 0's data dir holds exactly the one bucket key 7 hashes to
    val touched = bucketDirs(storeDir, 0L)
    assert(touched.size == 1, s"1-key batch rewrote ${touched.size} buckets: $touched")
    val expected = spark.range(1).select(
      pmod(xxhash64(lit(7L)), lit(nb.toLong))).as[Long].head()
    assert(touched == Set(expected))

    // manifest: the touched bucket is owned by v0, every other bucket
    // still points at the seed version — reference, not copy
    val m = BucketStore.readManifest(spark, storeDir, 0L)
    assert(m.owners(expected) == 0L)
    assert((m.owners - expected).values.toSet == Set(-1L),
      s"untouched buckets must keep the seed as owner: ${m.owners}")

    // and the served snapshot still reflects the merge
    val served = StreamMerge.snapshot(spark, storeDir, "op", Seq("seq"))
      .where(col("k") === 7L).select("name").as[String].collect().toSeq
    assert(served == Seq("b0-7"))
    assert(StreamMerge.snapshot(spark, storeDir, "op", Seq("seq")).count() == 100)
  }

  test("settled bucketed store equals the flat full-merge fold, tombstones included") {
    val storeDir = Files.createTempDirectory("graft_bkf_store").toString
    val batches = Seq(
      Seq((1L, "a", "U", 0L), (2L, "b", "U", 0L), (9L, "x", "U", 0L)),
      Seq((1L, "a2", "U", 1L), (3L, "c", "U", 1L)),
      Seq((2L, "", "D", 2L), (4L, "d", "U", 2L)))
    def df(rows: Seq[(Long, String, String, Long)]) =
      rows.toDF("k", "name", "op", "seq")
    batches.zipWithIndex.foreach { case (rows, i) =>
      StreamMerge.applyBatch(df(rows), i.toLong, storeDir, "k", "op", Seq("seq"),
        retain = 2, nBuckets = 4)
    }
    // flat oracle: the same fold without any bucketing
    val flat = batches.map(df).foldLeft(df(Seq.empty[(Long, String, String, Long)])) {
      (store, b) => Changelog.mergeBatch(store, b, "k", "op", Seq("seq"))
    }
    val got = StreamMerge.readStore(spark, storeDir).get
      .select("k", "name", "op", "seq").as[(Long, String, String, Long)]
      .collect().toSeq.sorted
    val want = flat.select("k", "name", "op", "seq")
      .as[(Long, String, String, Long)].collect().toSeq.sorted
    assert(got == want, s"bucketed fold diverged from flat fold:\n$got\nvs\n$want")
    assert(got.exists(_._3 == "D"), "tombstone missing from settled store")
  }

  test("vacuum never deletes a version that still owns buckets for a retained manifest") {
    val storeDir = Files.createTempDirectory("graft_bkv_store").toString
    val nb = 8
    StreamMerge.seed(
      spark.range(0, 100).select(col("id").as("k"), lit("s").as("name"),
        lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, "k", nb)
    // 5 batches all touching the SAME key → same single bucket;
    // retain=2 means v0..v2's bucket data is fully superseded
    (0 to 4).foreach { i =>
      StreamMerge.applyBatch(mergeBatchDf(Seq(7L), s"b$i", i.toLong), i.toLong,
        storeDir, "k", "op", Seq("seq"), retain = 2, nBuckets = nb)
    }
    val left = BucketStore.versions(spark, storeDir)
    // seed still owns the 7 untouched buckets for v3/v4's manifests —
    // it must survive any retain; v0..v2 own nothing a retained
    // manifest references and must be gone
    assert(left.contains(-1L), s"seed version vacuumed out from under the store: $left")
    assert(left.toSet.intersect(Set(0L, 1L, 2L)).isEmpty,
      s"fully superseded versions not vacuumed: $left")
    assert(left.toSet.contains(4L))
    // and the store still reads whole: all 100 keys, key 7 at its last write
    val snap = StreamMerge.snapshot(spark, storeDir, "op", Seq("seq"))
    assert(snap.count() == 100)
    assert(snap.where(col("k") === 7L).select("name").as[String].head() == "b4-7")
  }

  test("a 1-new-doc ingest batch rewrites exactly 1 fingerprint bucket") {
    val storeDir = Files.createTempDirectory("graft_bki_store").toString
    val nb = 8
    StreamIngest.seed(
      spark.range(0, 200).select(concat(lit("doc "), col("id")).as("text")),
      "text", storeDir, nb)
    assert(bucketDirs(storeDir, -1L) == (0L until nb).toSet)
    StreamIngest.applyBatch(
      Seq((9999L, "a brand new doc")).toDF("doc_id", "text"),
      0L, storeDir, "doc_id", "text", retain = 2, nBuckets = nb)
    val touched = bucketDirs(storeDir, 0L)
    assert(touched.size == 1,
      s"1-doc ingest batch rewrote ${touched.size} buckets: $touched")
    // a duplicate-only batch still commits a version (exactly-once
    // bookkeeping) but accepts nothing new into the corpus
    StreamIngest.applyBatch(
      Seq((10000L, "a brand new doc"), (10001L, "doc 3")).toDF("doc_id", "text"),
      1L, storeDir, "doc_id", "text", retain = 2, nBuckets = nb)
    assert(StreamIngest.corpus(spark, storeDir).count() == 1)
  }

  test("bucket count is fixed for the store's lifetime; reserved column name refused") {
    val storeDir = Files.createTempDirectory("graft_bkc_store").toString
    StreamMerge.seed(mergeBatchDf(Seq(1L), "s", -1L), storeDir, "k", nBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      BucketStore.writeVersion(mergeBatchDf(Seq(2L), "x", 0L), storeDir, 0L,
        col("k"), nBuckets = 8)
    }
    assert(e.getMessage.contains("buckets"), e.getMessage)
    // applyBatch must adopt the STORE's count, not the parameter —
    // a key's bucket may never move across versions
    StreamMerge.applyBatch(mergeBatchDf(Seq(2L), "x", 0L), 0L, storeDir,
      "k", "op", Seq("seq"), retain = 2, nBuckets = 16)
    assert(BucketStore.readManifest(spark, storeDir, 0L).nBuckets == 4)
    intercept[IllegalArgumentException] {
      BucketStore.writeVersion(
        Seq((1L, 0L)).toDF("k", "__b"), storeDir, 1L, col("k"), 4)
    }
  }

  test("additive schema evolution: buckets written before the new column read back null-backfilled") {
    val storeDir = Files.createTempDirectory("graft_bke_store").toString
    val nb = 4
    StreamMerge.seed(
      spark.range(0, 50).select(col("id").as("k"), lit("s").as("name"),
        lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, "k", nb)
    // batch adds a column; it touches ONE bucket — the other buckets'
    // files still carry the narrow schema on disk
    StreamMerge.applyBatch(
      Seq((7L, "b", "en", "U", 0L)).toDF("k", "name", "lang", "op", "seq"),
      0L, storeDir, "k", "op", Seq("seq"), retain = 2, nBuckets = nb)
    val m = BucketStore.readManifest(spark, storeDir, 0L)
    assert(m.schema.fieldNames.contains("lang"),
      s"manifest schema did not adopt the widened shape: ${m.schema.simpleString}")
    val store = StreamMerge.readStore(spark, storeDir).get
    assert(store.columns.toSeq == m.schema.fieldNames.toSeq)
    assert(store.count() == 50)
    assert(store.where(col("k") === 7L).select("lang").as[String].head() == "en")
    assert(store.where(col("k") =!= 7L && col("lang").isNotNull).count() == 0,
      "old buckets must read back with lang null-backfilled")
  }

  /** The erasure probe is [[BucketStore.allBytes]] itself — the same
    * implementation the gated rows use, so the spec and the gate
    * cannot drift on what "every file under the store" means.
    */
  private def allBytes(storeDir: String): DataFrame =
    BucketStore.allBytes(spark, storeDir)

  test("purgeKeys erases every trace: live rows, tombstones, and superseded copies") {
    val storeDir = Files.createTempDirectory("graft_bkp_store").toString
    val nb = 8
    StreamMerge.seed(
      spark.range(0, 100).select(col("id").as("k"),
        concat(lit("seed-"), col("id")).as("name"),
        lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, "k", nb)
    // batch 0: update key 7, tombstone key 9 — so the purge set spans
    // a live updated key, a tombstoned key, and an untouched key (13)
    StreamMerge.applyBatch(
      Seq((7L, "b0-7", "U", 0L), (9L, "", "D", 0L)).toDF("k", "name", "op", "seq"),
      0L, storeDir, "k", "op", Seq("seq"), retain = 10, nBuckets = nb)
    // retain=10 keeps the seed's superseded copies of the touched
    // buckets on disk — exactly the residue the purge must scrub
    assert(allBytes(storeDir).where(col("k").isin(7L, 9L)).count() >= 4,
      "fixture should hold superseded copies before the purge")

    val stats = BucketStore.purgeKeys(spark, storeDir,
      Seq(7L, 9L, 13L).toDF("k"), "k")
    assert(stats.purgedRows == 3, s"current-version rows purged: $stats")

    val snap = StreamMerge.snapshot(spark, storeDir, "op", Seq("seq"))
    assert(snap.count() == 97)
    assert(snap.where(col("k").isin(7L, 9L, 13L)).count() == 0)
    // THE erasure pin: no file anywhere under the store still holds
    // the keys — not as live rows, not as tombstones, not in
    // superseded bucket copies of older versions
    assert(allBytes(storeDir).where(col("k").isin(7L, 9L, 13L)).count() == 0,
      "purged keys still present in store bytes")
    // re-running the purge (the crash-between-commit-and-scrub
    // replay) is a no-op that still succeeds
    val again = BucketStore.purgeKeys(spark, storeDir,
      Seq(7L, 9L, 13L).toDF("k"), "k")
    assert(again.purgedRows == 0)
    assert(StreamMerge.snapshot(spark, storeDir, "op", Seq("seq")).count() == 97)
  }

  test("a purge that empties a bucket claims it empty instead of leaving the stale owner") {
    val storeDir = Files.createTempDirectory("graft_bkpe_store").toString
    val nb = 2
    StreamMerge.seed(
      spark.range(0, 10).select(col("id").as("k"), lit("s").as("name"),
        lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, "k", nb)
    // purge every key of bucket 0 — the rewritten relation writes no
    // rows there, so the manifest must claim it empty explicitly
    val b0 = spark.range(0, 10)
      .where(pmod(xxhash64(col("id")), lit(nb.toLong)) === 0L)
      .select(col("id").as("k"))
    val n0 = b0.count()
    assert(n0 > 0, "fixture needs at least one key in bucket 0")
    val stats = BucketStore.purgeKeys(spark, storeDir, b0, "k")
    assert(stats.purgedRows == n0)
    val snap = StreamMerge.snapshot(spark, storeDir, "op", Seq("seq"))
    assert(snap.count() == 10 - n0)
    assert(allBytes(storeDir).join(b0, Seq("k"), "left_semi").count() == 0)
  }

  test("a reader pinned at a version sees a consistent store while writes advance past it") {
    val storeDir = Files.createTempDirectory("graft_bksi_store").toString
    val nb = 4
    StreamMerge.seed(
      spark.range(0, 50).select(col("id").as("k"), lit("s").as("name"),
        lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, "k", nb)
    StreamMerge.applyBatch(mergeBatchDf(Seq(3L), "b0", 0L), 0L, storeDir,
      "k", "op", Seq("seq"), retain = 2, nBuckets = nb)
    val pinned = BucketStore.latestVersion(spark, storeDir).get
    // writer advances: key 3 rewritten again, key 4 tombstoned
    StreamMerge.applyBatch(
      Seq((3L, "b1-3", "U", 1L), (4L, "", "D", 1L)).toDF("k", "name", "op", "seq"),
      1L, storeDir, "k", "op", Seq("seq"), retain = 2, nBuckets = nb)
    val old = BucketStore.read(spark, storeDir, at = Some(pinned)).get
    assert(old.where(col("k") === 3L).select("name").as[String].head() == "b0-3")
    assert(old.where(col("k") === 4L && col("op") === "U").count() == 1,
      "pinned reader must not see the later tombstone")
    val cur = BucketStore.read(spark, storeDir).get
    assert(cur.where(col("k") === 3L).select("name").as[String].head() == "b1-3")
    assert(cur.where(col("k") === 4L).select("op").as[String].head() == "D")
    intercept[IllegalArgumentException] {
      BucketStore.read(spark, storeDir, at = Some(999L))
    }
  }

  test("purging a matview-managed store through StreamMatview keeps the view consistent") {
    import graft.ext.Changelog
    import graft.streaming.StreamMatview
    val storeDir = Files.createTempDirectory("graft_bkmvp_store").toString
    val aggDir = Files.createTempDirectory("graft_bkmvp_agg").toString
    StreamMatview.seed(spark.range(0, 30).select(
      col("id").as("k"), concat(lit("seg"), col("id") % 3).as("seg"),
      (col("id") * 10).as("cents"), lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, aggDir, "k", "op", Seq("seg"), "cents")
    StreamMatview.applyBatch(
      Seq((3L, "seg0", 999L, "U", 0L), (7L, "seg1", 0L, "D", 0L))
        .toDF("k", "seg", "cents", "op", "seq"),
      0L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    def canonView = StreamMatview.viewSnapshot(spark, aggDir)
      .select("seg", "n", "sum").as[(String, Long, Long)].collect().toSeq.sorted
    def canonRecompute = Changelog.aggSnapshot(
        StreamMerge.readStore(spark, storeDir).get, "op", Seq("seg"), "cents")
      .select("seg", "n", "sum").as[(String, Long, Long)].collect().toSeq.sorted
    assert(canonView == canonRecompute)
    // the erasure: purge keys 3 (just updated) and 12 through the
    // matview-aware op — the view must drop their contributions, the
    // bytes must be gone, and the batch watermarks must hold so the
    // stream resumes
    val stats = StreamMatview.purgeKeys(spark, storeDir, aggDir,
      Seq(3L, 12L).toDF("k"), "k", "op", Seq("seg"), "cents")
    assert(stats.purgedRows == 2)
    assert(canonView == canonRecompute,
      "view diverged from the recompute after the purge")
    assert(canonView.map(_._3).sum ==
      (0L until 30L).filterNot(Seq(3L, 7L, 12L).contains).map(_ * 10).sum)
    assert(allBytes(storeDir).where(col("k").isin(3L, 12L)).count() == 0)
    // stream resumes: batch 1 applies to both stores
    StreamMatview.applyBatch(
      Seq((12L, "seg0", 5L, "U", 1L)).toDF("k", "seg", "cents", "op", "seq"),
      1L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    assert(canonView == canonRecompute)
    assert(StreamMerge.snapshot(spark, storeDir, "op", Seq("seq"))
      .where(col("k") === 12L).select("cents").as[Long].head() == 5L)
  }

  test("rebucket migrates the store B->B': contents equal, writes re-prune at the new count, rerun no-ops") {
    val storeDir = Files.createTempDirectory("graft_bkrb_store").toString
    StreamMerge.seed(
      spark.range(0, 100).select(col("id").as("k"),
        concat(lit("seed-"), col("id")).as("name"),
        lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, "k", nBuckets = 4)
    StreamMerge.applyBatch(mergeBatchDf(Seq(3L, 7L), "b0", 0L), 0L, storeDir,
      "k", "op", Seq("seq"), retain = 2, nBuckets = 4)
    def canon = BucketStore.read(spark, storeDir).get
      .select("k", "name", "op", "seq").as[(Long, String, String, Long)]
      .collect().toSeq.sorted
    val before = canon
    val wmBefore = BucketStore.latestBatch(spark, storeDir)

    BucketStore.rebucket(spark, storeDir, "k", newBuckets = 8)
    val v = BucketStore.latestVersion(spark, storeDir).get
    val m = BucketStore.readManifest(spark, storeDir, v)
    assert(m.nBuckets == 8, "manifest must carry the migrated bucket count")
    assert(canon == before, "contents must be hash-equal across the migration")
    assert(BucketStore.latestBatch(spark, storeDir) == wmBefore,
      "a migration is a maintenance commit: the ingest watermark must hold")
    assert(m.owners.values.toSet == Set(v),
      "the migration version must own every bucket itself — carried " +
        "old-count owner entries would double-read rows")
    assert(m.owners.keySet.forall(b => b >= 0 && b < 8))

    // rerun (the crash-after-commit replay) is a no-op: no new version
    BucketStore.rebucket(spark, storeDir, "k", newBuckets = 8)
    assert(BucketStore.latestVersion(spark, storeDir).contains(v))

    // the stream resumes at the NEW count: a 1-key batch rewrites
    // exactly the one bucket its key hashes to under B'=8
    StreamMerge.applyBatch(mergeBatchDf(Seq(42L), "b1", 1L), 1L, storeDir,
      "k", "op", Seq("seq"), retain = 2, nBuckets = 4 /* manifest wins */)
    val v2 = BucketStore.latestVersion(spark, storeDir).get
    assert(BucketStore.readManifest(spark, storeDir, v2).nBuckets == 8)
    val expect = spark.range(42, 43)
      .select(pmod(xxhash64(col("id")), lit(8L))).as[Long].head()
    assert(bucketDirs(storeDir, v2) == Set(expect),
      "post-migration writes must prune at the migrated count")
    assert(BucketStore.read(spark, storeDir).get
      .where(col("k") === 42L).select("name").as[String].head() == "b1-42")
  }

  test("matview purge: the view delta reads ONLY the touched buckets, and the crash window redoes only the snapshot") {
    import graft.ext.Changelog
    import graft.streaming.StreamMatview
    val storeDir = Files.createTempDirectory("graft_bkmvd_store").toString
    val aggDir = Files.createTempDirectory("graft_bkmvd_agg").toString
    StreamMatview.seed(spark.range(0, 64).select(
      col("id").as("k"), concat(lit("seg"), col("id") % 4).as("seg"),
      (col("id") * 10).as("cents"), lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, aggDir, "k", "op", Seq("seg"), "cents")
    def canonView = StreamMatview.viewSnapshot(spark, aggDir)
      .select("seg", "n", "sum").as[(String, Long, Long)].collect().toSeq.sorted
    def canonRecompute = Changelog.aggSnapshot(
        StreamMerge.readStore(spark, storeDir).get, "op", Seq("seg"), "cents")
      .select("seg", "n", "sum").as[(String, Long, Long)].collect().toSeq.sorted

    // plan pin: the purge delta's parquet inputs are exactly the
    // buckets the key list hashes into — never the whole store
    val keys = Seq(5L, 9L).toDF("k")
    val (neg, touched, nKeys) = StreamMatview.purgeDelta(spark, storeDir, keys,
      "k", "op", Seq("seg"), "cents", "n", "sum")
    assert(nKeys == 2L, s"fused probe must count the distinct keys: $nKeys")
    val bucketFiles = neg.inputFiles.toIndexedSeq.filter(_.contains("__b="))
    assert(bucketFiles.nonEmpty)
    val bucketsRead = bucketFiles
      .map(f => "__b=(\\d+)".r.findFirstMatchIn(f).get.group(1).toLong).toSet
    assert(bucketsRead == touched,
      s"purge delta read buckets $bucketsRead, touched were $touched")
    assert(touched.size < 16,
      "fixture degenerate: the key list touched every bucket — the pin is vacuous")

    // CRASH WINDOW: the view-side subtract commits (with the intent
    // note), the snapshot purge never runs
    StreamMatview.purgeViewCommit(spark, storeDir, aggDir, keys, "k", "op",
      Seq("seg"), "cents", "n", "sum")
    assert(StreamMerge.readStore(spark, storeDir).get
      .where(col("k").isin(5L, 9L)).count() == 2,
      "crash-window precondition: the snapshot still holds the keys")
    // a DIFFERENT purge must refuse until the interrupted one completes
    val e = intercept[IllegalArgumentException] {
      StreamMatview.purgeKeys(spark, storeDir, aggDir, Seq(7L).toDF("k"),
        "k", "op", Seq("seg"), "cents")
    }
    assert(e.getMessage.contains("DIFFERENT key list"))
    // re-running the SAME purge redoes only the snapshot half: no
    // double subtract, fold == recompute
    StreamMatview.purgeKeys(spark, storeDir, aggDir, keys, "k", "op",
      Seq("seg"), "cents")
    assert(canonView == canonRecompute,
      "view diverged after the crash-window replay (double subtract?)")
    assert(canonView.map(_._3).sum ==
      (0L until 64L).filterNot(Seq(5L, 9L).contains).map(_ * 10).sum)
    // the protocol is now satisfied: a FRESH purge takes the normal
    // delta path and stays consistent
    StreamMatview.purgeKeys(spark, storeDir, aggDir, Seq(7L).toDF("k"),
      "k", "op", Seq("seg"), "cents")
    assert(canonView == canonRecompute)
  }

  test("a matview-managed snapshot store survives a rebucket: the view keeps folding at the migrated count") {
    import graft.ext.Changelog
    import graft.streaming.StreamMatview
    val storeDir = Files.createTempDirectory("graft_bkmvrb_store").toString
    val aggDir = Files.createTempDirectory("graft_bkmvrb_agg").toString
    StreamMatview.seed(spark.range(0, 40).select(
      col("id").as("k"), concat(lit("seg"), col("id") % 2).as("seg"),
      (col("id") * 10).as("cents"), lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, aggDir, "k", "op", Seq("seg"), "cents")
    StreamMatview.applyBatch(
      Seq((3L, "seg0", 999L, "U", 0L)).toDF("k", "seg", "cents", "op", "seq"),
      0L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    // maintenance: only the SNAPSHOT store migrates (the view store is
    // dim-sized, 1 bucket forever); the next trigger must probe and
    // fold at the migrated count with no caller reconfiguration
    BucketStore.rebucket(spark, storeDir, "k", newBuckets = 32)
    StreamMatview.applyBatch(
      Seq((7L, "seg1", 0L, "D", 1L), (41L, "seg0", 5L, "U", 1L))
        .toDF("k", "seg", "cents", "op", "seq"),
      1L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("seg", "n", "sum").as[(String, Long, Long)]
        .collect().toSeq.sorted
    assert(canon(StreamMatview.viewSnapshot(spark, aggDir)) ==
      canon(Changelog.aggSnapshot(
        StreamMerge.readStore(spark, storeDir).get, "op", Seq("seg"), "cents")),
      "view diverged from the recompute across the snapshot migration")
    val v = BucketStore.latestVersion(spark, storeDir).get
    assert(BucketStore.readManifest(spark, storeDir, v).nBuckets == 32)
  }

  test("minmax matview: folds track the recompute across boundary retractions, and erasure rebuilds consistently") {
    import graft.ext.Changelog
    import graft.streaming.StreamMatview
    val storeDir = Files.createTempDirectory("graft_bkmm_store").toString
    val aggDir = Files.createTempDirectory("graft_bkmm_agg").toString
    StreamMatview.seedMinMax(spark.range(0, 30).select(
      col("id").as("k"), concat(lit("seg"), col("id") % 3).as("seg"),
      (col("id") * 10).as("cents"), lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, aggDir, "k", "op", Seq("seg"), "cents")
    def canonView = StreamMatview.viewSnapshot(spark, aggDir)
      .select("seg", "n", "sum", "min", "max")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq.sorted
    def canonRecompute = Changelog.aggSnapshotMinMax(
        StreamMerge.readStore(spark, storeDir).get, "op", Seq("seg"), "cents")
      .select("seg", "n", "sum", "min", "max")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq.sorted
    assert(canonView == canonRecompute)
    // batch 0 deletes seg0's max holder (k=27, 270) — the boundary
    // retraction must recompute seg0 from the FULL store, not just
    // the touched buckets
    StreamMatview.applyBatchMinMax(
      Seq((27L, "seg0", 0L, "D", 0L), (31L, "seg1", 999L, "U", 0L))
        .toDF("k", "seg", "cents", "op", "seq"),
      0L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    assert(canonView == canonRecompute,
      "minmax fold diverged from the recompute after a boundary retraction")
    assert(canonView.find(_._1 == "seg0").get._5 == Some(240L),
      "seg0's max must retract 270 -> 240")
    assert(canonView.find(_._1 == "seg1").get._5 == Some(999L))
    // erasure: purge the new max holder; the rebuild must retract it
    val stats = StreamMatview.purgeKeysMinMax(spark, storeDir, aggDir,
      Seq(31L).toDF("k"), "k", "op", Seq("seg"), "cents")
    assert(stats.purgedRows == 1)
    assert(canonView == canonRecompute,
      "minmax view diverged after the erasure rebuild")
    assert(canonView.find(_._1 == "seg1").get._5 == Some(280L))
    assert(allBytes(storeDir).where(col("k") === 31L).count() == 0)
    // the stream resumes cleanly after the maintenance version
    StreamMatview.applyBatchMinMax(
      Seq((5L, "seg2", 1L, "U", 1L)).toDF("k", "seg", "cents", "op", "seq"),
      1L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    assert(canonView == canonRecompute)
    assert(canonView.find(_._1 == "seg2").get._4 == Some(1L),
      "seg2's min must adopt the post-purge update")
  }

  test("a batch that empties the view commits claimed-empty, never the stale pre-batch aggregate") {
    import graft.streaming.StreamMatview
    val storeDir = Files.createTempDirectory("graft_bkmve_store").toString
    val aggDir = Files.createTempDirectory("graft_bkmve_agg").toString
    StreamMatview.seed(
      Seq((1L, "seg0", 10L, "U", -1L), (2L, "seg1", 20L, "U", -1L))
        .toDF("k", "seg", "cents", "op", "seq"),
      storeDir, aggDir, "k", "op", Seq("seg"), "cents")
    // the batch tombstones EVERY live key: every dim's n reaches 0, so
    // the merged aggregate writes no rows — the commit must CLAIM the
    // bucket (EmptyOwner) or the manifest keeps the seed version as
    // owner and viewSnapshot silently serves the stale seed aggregate
    StreamMatview.applyBatch(
      Seq((1L, "seg0", 0L, "D", 0L), (2L, "seg1", 0L, "D", 0L))
        .toDF("k", "seg", "cents", "op", "seq"),
      0L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    assert(StreamMatview.viewSnapshot(spark, aggDir).count() == 0,
      "emptied view must read empty, not the stale pre-batch aggregate")
    // and the fold continues correctly from the claimed-empty state
    StreamMatview.applyBatch(
      Seq((9L, "seg2", 7L, "U", 1L)).toDF("k", "seg", "cents", "op", "seq"),
      1L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    assert(StreamMatview.viewSnapshot(spark, aggDir)
      .select("seg", "n", "sum").as[(String, Long, Long)].collect().toSeq ==
      Seq(("seg2", 1L, 7L)))
  }

  test("a seeded snapshot with an unseeded view fails loudly instead of folding from zero") {
    import graft.streaming.StreamMatview
    val storeDir = Files.createTempDirectory("graft_bkmvs_store").toString
    val aggDir = Files.createTempDirectory("graft_bkmvs_agg").toString
    // the snapshot store is seeded OUTSIDE StreamMatview.seed — the
    // view store has no version, and the empty-view fallback would
    // permanently miss the seed's contributions
    StreamMerge.seed(
      Seq((1L, "seg0", 10L, "U", -1L)).toDF("k", "seg", "cents", "op", "seq"),
      storeDir, "k")
    val e = intercept[IllegalArgumentException] {
      StreamMatview.applyBatch(
        Seq((2L, "seg0", 5L, "U", 0L)).toDF("k", "seg", "cents", "op", "seq"),
        0L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    }
    assert(e.getMessage.contains("StreamMatview.seed"))
  }

  test("purge is a maintenance commit: the batch watermark holds and the stream resumes") {
    val storeDir = Files.createTempDirectory("graft_bkpw_store").toString
    val nb = 4
    StreamMerge.seed(
      spark.range(0, 20).select(col("id").as("k"), lit("s").as("name"),
        lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, "k", nb)
    StreamMerge.applyBatch(mergeBatchDf(Seq(3L), "b0", 0L), 0L, storeDir,
      "k", "op", Seq("seq"), retain = 2, nBuckets = nb)
    BucketStore.purgeKeys(spark, storeDir, Seq(5L).toDF("k"), "k")
    // the purge advanced the VERSION but not the batch watermark:
    // batch 1 must apply normally — neither skipped ("already
    // applied") nor rejected by the reset guard
    assert(BucketStore.latestBatch(spark, storeDir).contains(0L))
    StreamMerge.applyBatch(mergeBatchDf(Seq(6L), "b1", 1L), 1L, storeDir,
      "k", "op", Seq("seq"), retain = 2, nBuckets = nb)
    assert(BucketStore.latestBatch(spark, storeDir).contains(1L))
    val snap = StreamMerge.snapshot(spark, storeDir, "op", Seq("seq"))
    assert(snap.where(col("k") === 6L).select("name").as[String].head() == "b1-6")
    assert(snap.where(col("k") === 5L).count() == 0)
    assert(snap.count() == 19)
    // and a true replay of batch 1 still skips
    StreamMerge.applyBatch(mergeBatchDf(Seq(6L), "GHOST", 1L), 1L, storeDir,
      "k", "op", Seq("seq"), retain = 2, nBuckets = nb)
    assert(StreamMerge.snapshot(spark, storeDir, "op", Seq("seq"))
      .where(col("k") === 6L).select("name").as[String].head() == "b1-6")
  }

  test("sketched-view purge: sketch pops replace the rebuild; the crash window blocks ordinary commits and redoes only the snapshot") {
    import graft.streaming.StreamMatview
    val storeDir = Files.createTempDirectory("graft_bksk_store").toString
    val aggDir = Files.createTempDirectory("graft_bksk_agg").toString
    StreamMatview.seedSketch(spark.range(0, 64).select(
      col("id").as("k"), concat(lit("seg"), col("id") % 4).as("seg"),
      (col("id") * 10).as("cents"), lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, aggDir, "k", "op", Seq("seg"), "cents", k = 4)
    def canonView = StreamMatview.viewSnapshotServed(spark, aggDir)
      .select("seg", "n", "sum", "min", "max")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq.sorted
    def canonRecompute = Changelog.aggSnapshotMinMax(
        StreamMerge.readStore(spark, storeDir).get, "op", Seq("seg"), "cents")
      .select("seg", "n", "sum", "min", "max")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq.sorted

    // normal purge: boundary holders of seg0 (60, 63 hold neither; 60
    // IS seg0's max holder) — an in-sketch pop, view == recompute
    StreamMatview.purgeKeysSketch(spark, storeDir, aggDir,
      Seq(60L, 5L).toDF("k"), "k", "op", Seq("seg"), "cents", k = 4)
    assert(canonView == canonRecompute,
      "sketched view diverged from the recompute after a normal purge")

    // CRASH WINDOW: the view-side pop commits (with the intent note),
    // the snapshot purge never runs
    StreamMatview.purgeViewCommitSketch(spark, storeDir, aggDir,
      Seq(8L, 12L).toDF("k"), "k", "op", Seq("seg"), "cents", 4,
      "n", "sum", "min", "max", 10000000L)
    assert(StreamMerge.readStore(spark, storeDir).get
      .where(col("k").isin(8L, 12L)).count() == 2,
      "crash-window precondition: the snapshot still holds the keys")
    // an ordinary view commit must REFUSE — it would erase the intent
    // note and the half-applied purge would never complete
    val eb = intercept[IllegalArgumentException] {
      StreamMatview.applyBatchSketch(
        Seq((200L, "seg0", 5L, "U", 0L)).toDF("k", "seg", "cents", "op", "seq"),
        0L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents", k = 4)
    }
    assert(eb.getMessage.contains("incomplete purge intent"))
    // a DIFFERENT purge must refuse too
    val ep = intercept[IllegalArgumentException] {
      StreamMatview.purgeKeysSketch(spark, storeDir, aggDir,
        Seq(14L).toDF("k"), "k", "op", Seq("seg"), "cents", k = 4)
    }
    assert(ep.getMessage.contains("DIFFERENT key list"))
    // re-running the SAME purge redoes only the snapshot half
    StreamMatview.purgeKeysSketch(spark, storeDir, aggDir,
      Seq(8L, 12L).toDF("k"), "k", "op", Seq("seg"), "cents", k = 4)
    assert(canonView == canonRecompute,
      "view diverged after the crash-window replay (double pop?)")
    // the protocol is satisfied: ordinary maintenance resumes, and a
    // DRAINING purge (every tracked min of seg1 at k=4: 1,9,13,17 —
    // with 5 already gone) rebuilds from the survivors
    StreamMatview.applyBatchSketch(
      Seq((300L, "seg1", 7L, "U", 0L)).toDF("k", "seg", "cents", "op", "seq"),
      0L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents", k = 4)
    assert(canonView == canonRecompute)
    StreamMatview.purgeKeysSketch(spark, storeDir, aggDir,
      Seq(1L, 9L, 13L, 17L, 300L).toDF("k"), "k", "op", Seq("seg"), "cents",
      k = 4)
    assert(canonView == canonRecompute,
      "view diverged after a draining purge (rebuild read the wrong rows?)")
  }

  test("min/max purge intent: a half-applied purgeKeysMinMax blocks ordinary commits until re-run to completion") {
    import graft.streaming.StreamMatview
    val storeDir = Files.createTempDirectory("graft_bkmm_store").toString
    val aggDir = Files.createTempDirectory("graft_bkmm_agg").toString
    StreamMatview.seedMinMax(spark.range(0, 48).select(
      col("id").as("k"), concat(lit("seg"), col("id") % 3).as("seg"),
      (col("id") * 10).as("cents"), lit("U").as("op"), lit(-1L).as("seq")),
      storeDir, aggDir, "k", "op", Seq("seg"), "cents")
    def canonView = StreamMatview.viewSnapshot(spark, aggDir)
      .select("seg", "n", "sum", "min", "max")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq.sorted
    def canonRecompute = Changelog.aggSnapshotMinMax(
        StreamMerge.readStore(spark, storeDir).get, "op", Seq("seg"), "cents")
      .select("seg", "n", "sum", "min", "max")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq.sorted
    val keys = Seq(6L, 47L).toDF("k") // 47 holds seg2's max — a retraction

    // simulate the crash: the intent note commits, the snapshot purge
    // lands, the view REBUILD never runs — the view still serves (and
    // derives) the erased keys' contributions
    val fp = StreamMatview.keyFingerprint(keys, "k")
    val av = BucketStore.latestVersion(spark, aggDir).get
    val ab = BucketStore.readManifest(spark, aggDir, av).batch
    BucketStore.writeVersion(StreamMatview.viewSnapshot(spark, aggDir),
      aggDir, av + 1L, col("seg"), nBuckets = 1, batch = Some(ab),
      claim = Set(0L), note = Some(s"purgemm:fp=$fp"))
    BucketStore.purgeKeys(spark, storeDir, keys, "k")
    assert(canonView != canonRecompute,
      "crash-window precondition: the stale view must still differ")
    // ordinary maintenance must refuse over the intent
    val eb = intercept[IllegalArgumentException] {
      StreamMatview.applyBatchMinMax(
        Seq((100L, "seg0", 5L, "U", 0L)).toDF("k", "seg", "cents", "op", "seq"),
        0L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    }
    assert(eb.getMessage.contains("incomplete min/max purge intent"))
    // a DIFFERENT purge refuses; the SAME one completes and clears
    val ep = intercept[IllegalArgumentException] {
      StreamMatview.purgeKeysMinMax(spark, storeDir, aggDir,
        Seq(9L).toDF("k"), "k", "op", Seq("seg"), "cents")
    }
    assert(ep.getMessage.contains("DIFFERENT key list"))
    StreamMatview.purgeKeysMinMax(spark, storeDir, aggDir, keys,
      "k", "op", Seq("seg"), "cents")
    assert(canonView == canonRecompute,
      "view must equal the recompute after the purge completes")
    // the note is cleared: ordinary maintenance resumes
    StreamMatview.applyBatchMinMax(
      Seq((100L, "seg0", 5L, "U", 0L)).toDF("k", "seg", "cents", "op", "seq"),
      0L, storeDir, aggDir, "k", "op", Seq("seq"), Seq("seg"), "cents")
    assert(canonView == canonRecompute)
  }
}
