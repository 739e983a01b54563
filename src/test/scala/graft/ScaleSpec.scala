package graft

import org.apache.spark.sql.functions._

/** Pins the scaled-dir convention (`"<base>@<k>"`, [[Tables.load]]) —
  * the harness behind the scale-proof bench. The contract: k disjoint
  * copies whose per-copy statistics match the base byte-for-byte
  * (copy 0 IS the base), with keys shifted consistently across tables
  * so joins scale exactly k×, text Caesar-rotated so copies are never
  * near-duplicates of each other, and embeddings rotated
  * norm-preservingly so no cosine ties appear. The DuckDB twin
  * (`scripts/scaled_views.py`) is pinned by running the full
  * compare gate on a scaled dir.
  */
class ScaleSpec extends SparkSpec {
  private val base = "/root/testdata/sf0.001"
  private val scaled = s"$base@3"

  test("scaled documents: 3x rows, disjoint ids, copy 0 identical, lengths preserved") {
    val b = Tables.documents(spark, base)
    val s = Tables.documents(spark, scaled)
    val nb = b.count()
    assert(s.count() === 3 * nb)
    assert(s.select("doc_id").distinct().count() === 3 * nb)
    // copy 0 is the base data untransformed
    assert(s.filter(col("doc_id") < 1000000000L).exceptAll(b).count() === 0)
    // Caesar rotation preserves every length; lang/source untouched
    val lb = b.agg(sum(length(col("text")))).head.getLong(0)
    assert(s.agg(sum(length(col("text")))).head.getLong(0) === 3 * lb)
    val langs = b.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Tables.documents(spark, scaled).groupBy("lang").count().collect()
      .foreach(r => assert(r.getLong(1) === 3 * langs(r.getString(0))))
  }

  test("scaled copies are not near-duplicates: cross-copy token spaces disjoint") {
    val s = Tables.documents(spark, scaled)
    val words = s.select((col("doc_id") / 1000000000L).cast("long").as("copy"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("[a-zA-Z]"))
    // any letter-bearing token appears in exactly one copy's vocabulary
    val shared = words.groupBy("w").agg(countDistinct("copy").as("n"))
      .filter(col("n") > 1).count()
    assert(shared === 0, "Caesar-rotated copies must not share letter tokens")
  }

  test("copies past @26 stay disjoint: affine block breaks the rotation period") {
    // a pure rotation has period 26 — copy 26 would be copy 0's text
    // verbatim and pair-family work would grow k² past @26. The affine
    // a=3 block keeps every cross-copy vocabulary disjoint at the @32
    // bench point (ScaleSpec runs it at sf0.001 where the check is cheap).
    val s = Tables.documents(spark, s"$base@32")
    val words = s.select((col("doc_id") / 1000000000L).cast("long").as("copy"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("[a-zA-Z]"))
    // Perfect disjointness is impossible past 26 copies (pairwise
    // everywhere-disagreeing permutations of 26 letters max out at 26 —
    // Latin-square rows), so the contract is the one pair-family
    // queries need: every MULTI-char token is unique to one copy (so
    // no shingle/minhash/simhash candidate ever crosses copies), and
    // the unavoidable residue is single-letter tokens on the <=2
    // letters where an a=1 map and an a=3 map agree, each shared by
    // exactly one (c, c+26) pair.
    val sharedMulti = words.filter(length(col("w")) >= 2)
      .groupBy("w").agg(countDistinct("copy").as("n"))
      .filter(col("n") > 1).count()
    assert(sharedMulti === 0, "multi-char tokens must be unique to one copy")
    val sharedSingle = words.filter(length(col("w")) === 1)
      .groupBy("w").agg(countDistinct("copy").as("n")).filter(col("n") > 1)
      .collect()
    assert(sharedSingle.forall(_.getLong(1) === 2),
      "a residual single-letter token may span at most one copy pair")
    // length/letter statistics are still invariant under the affine map
    val b = Tables.documents(spark, base)
    val lb = b.agg(sum(length(col("text")))).head.getLong(0)
    assert(s.agg(sum(length(col("text")))).head.getLong(0) === 32 * lb)
  }

  test("scaled embeddings: rotation preserves norms, ids disjoint") {
    val b = Tables.embeddings(spark, base)
    val s = Tables.embeddings(spark, scaled)
    assert(s.count() === 3 * b.count())
    val normOf = expr("aggregate(embedding, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")
    val nb = b.agg(sum(normOf)).head.getDouble(0)
    val ns = s.agg(sum(normOf)).head.getDouble(0)
    assert(math.abs(ns - 3 * nb) / (3 * nb) < 1e-9,
      s"rotation must preserve norms: base $nb scaled $ns")
    // rotation really happened: copy 1's vectors differ from copy 0's
    val c0 = b.select(col("embedding")).head.getSeq[Float](0)
    val c1 = s.filter(col("vec_id") === lit(1000000000L) + b.select(min("vec_id")).head.getLong(0))
      .select("embedding").head.getSeq[Float](0)
    assert(c0 !== c1, "copy 1 embedding must be rotated, not identical")
    assert(c0.sorted === c1.sorted, "rotation permutes, never alters, components")
  }

  test("embedding LSH occupancy contract: fixed planes go quadratic, scaled planes restore linear") {
    // in-bucket pair volume sum C(n_b, 2) is the self-join's work.
    // With planes fixed, occupancy n/2^P grows with the corpus and
    // volume grows ~k² for k× vectors; the deployment rule (add
    // ~log2 k planes per table) holds occupancy roughly constant and
    // volume ~linear. Pinned here so the BENCH_SCALE.md analysis of
    // ext_dedup_embedding's @32 growth stays measured, not asserted.
    import graft.ext.Similarity
    def pairVolume(dir: String, planes: Int): Long =
      Similarity.lshBuckets(Tables.embeddings(spark, dir), "vec_id", "embedding",
          nTables = 2, planesPerTable = planes)
        .groupBy("tbl", "bucket").count()
        .agg(sum(col("count") * (col("count") - 1) / 2).cast("long")).head.getLong(0)
    val v1 = pairVolume(base, 8)
    val v10fixed = pairVolume(s"$base@10", 8)
    val v10scaled = pairVolume(s"$base@10", 12) // +4 planes ≈ +log2(10)
    assert(v10fixed > 30L * v1,
      s"fixed planes must grow super-linearly for 10x vectors: $v1 -> $v10fixed")
    assert(v10scaled <= 10L * v1,
      s"+4 planes must hold candidate volume at-or-below linear: $v1 -> $v10scaled")
  }

  test("scaled facts join consistently: lineitem⋈orders scales exactly 3x") {
    val jb = Tables.lineitem(spark, base)
      .join(Tables.orders(spark, base), col("l_orderkey") === col("o_orderkey")).count()
    val js = Tables.lineitem(spark, scaled)
      .join(Tables.orders(spark, scaled), col("l_orderkey") === col("o_orderkey")).count()
    assert(js === 3 * jb, "orderkey shift must stay aligned across lineitem and orders")
  }

  test("dimension tables stay unscaled; plain dirs bypass the scaler") {
    assert(Tables.region(spark, scaled).count() === Tables.region(spark, base).count())
    assert(Tables.customer(spark, scaled).count() === Tables.customer(spark, base).count())
    // events: ids shift, timestamps don't (k× density per window)
    val s = Tables.events(spark, scaled)
    val b = Tables.events(spark, base)
    assert(s.count() === 3 * b.count())
    // compare epochs engine-side (unix_millis) rather than JVM-side
    // getTimestamp: robust to however the fixture writer encodes ts
    assert(s.agg(max(unix_millis(col("ts")))).head.getLong(0) ===
      b.agg(max(unix_millis(col("ts")))).head.getLong(0))
  }
}
