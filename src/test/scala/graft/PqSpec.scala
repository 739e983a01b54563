package graft

import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Product quantization: deterministic training, save/load
  * bit-identity, and ADC serving recall against the brute-force
  * ranking — the probe the gated row (ext_sim_pq_topk) pins.
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("pq codebooks train deterministically and round-trip through parquet") {
    val emb = Tables.embeddings(spark, sf)
    Similarity.PqIndex.clear()
    val a = Similarity.PqIndex.build(emb, "vec_id", "embedding",
      m = 8, ks = 16, dim = 64, iters = 3)
    Similarity.PqIndex.clear()
    val b = Similarity.PqIndex.build(emb, "vec_id", "embedding",
      m = 8, ks = 16, dim = 64, iters = 3)
    assert(a.books.map(_.map(_.toList).toList).toList ==
      b.books.map(_.map(_.toList).toList).toList,
      "two builds over the same corpus must be bit-identical")

    val dir = java.nio.file.Files.createTempDirectory("pq_idx").toString
    Similarity.PqIndex.save(spark, a, dir)
    val loaded = Similarity.PqIndex.load(spark, dir)
    assert(loaded.books.map(_.map(_.toList).toList).toList ==
      a.books.map(_.map(_.toList).toList).toList,
      "save->load must restore the codebooks bit-identically")
    assert(loaded.m == 8 && loaded.ks == 16 && loaded.subDim == 8)
  }

  test("shortlist+rerank top-10 recalls the brute-force top-10 at every fixture scale") {
    // the gated row's config (m=16, ks=64, rerank=8) and floor (0.80);
    // measured 1.0 / 1.0 / 0.97 at sf0.001 / 0.01 / 0.1. Raw ADC
    // WITHOUT the exact re-rank measures ~0.3 on these near-uniform
    // vectors (neighbor gaps sit inside the 8x16 reconstruction
    // error) — the two-stage shape is load-bearing, not an
    // optimization.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, dir)
      val queries = emb.where(col("vec_id") < 20)
      val index = Similarity.PqIndex.build(emb, "vec_id", "embedding",
        m = 16, ks = 64, dim = 64, iters = 3)
      val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id")
      val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding", k = 10,
        index, rerank = 8)
        .select("query_id", "neighbor_id")
      val nBf = bf.count()
      val nHits = bf.join(pq, Seq("query_id", "neighbor_id")).count()
      info(s"$dir: pq recall@10 = $nHits/$nBf = ${nHits.toDouble / nBf}")
      assert(nHits * 5 >= nBf * 4,
        s"$dir: recall ${nHits.toDouble / nBf} below 0.80")
    }
  }

  test("ADC scores approximate the true cosine within PQ reconstruction error") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where(col("vec_id") < 5)
    val index = Similarity.PqIndex.build(emb, "vec_id", "embedding",
      m = 8, ks = 16, dim = 64, iters = 3)
    val adc = Similarity.pqAdcScores(emb, queries, "vec_id", "embedding", index)
    val bfAll = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
      k = Int.MaxValue - 1)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    val maxErr = adc.join(bfAll, Seq("query_id", "neighbor_id"))
      .select(abs(col("score") - col("cos")).as("err"))
      .agg(max(col("err"))).head.getDouble(0)
    info(s"max |ADC - cosine| over all pairs: $maxErr")
    assert(maxErr < 0.35, s"ADC error $maxErr implausibly large for 8x16 codebooks")
  }

  test("ivfPqTopK with full probe and exhaustive rerank IS brute force; encode covers every vector once") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.where(col("vec_id") < 3)
    val coarse = Similarity.IvfIndex.build(emb, "vec_id", "embedding",
      k = 16, iters = 3)
    val index = Similarity.PqIndex.buildResidual(emb, "vec_id", "embedding",
      coarse, m = 16, ks = 64, dim = 64, iters = 3)
    // every vector lands in exactly one list with a full m-length,
    // in-range code word
    val n = emb.count()
    val enc = Similarity.ivfPqEncode(emb, "vec_id", "embedding", coarse, index)
    assert(enc.count() == n)
    val bad = enc.where(col("c") < 0 || col("c") >= 16 ||
        size(col("codes")) =!= 16 ||
        exists(col("codes"), x => x < 0 || x >= 64))
      .count()
    assert(bad == 0L, "malformed list id or code word")
    // with every list probed and the whole corpus reranked, the exact
    // second stage must reproduce brute force ROW FOR ROW (cos values
    // bit-equal: both sides are unitDot over the same normalized
    // frames) — quantization error can then only have reordered the
    // shortlist, which the exact rerank undoes
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val bf = rows(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 5))
    val ipq = rows(Similarity.ivfPqTopK(emb, queries,
      "vec_id", "embedding", k = 5, coarse, index,
      nprobe = 16, rerank = n.toInt))
    assert(ipq == bf, "exhaustive IVF-PQ must equal brute force exactly")
  }

  test("ivfPqTopK at the nprobe=4 serving config: IVF's own floor vs brute force, and ≤20% added loss vs plain IVF") {
    // the gated row's config (nlist=16, nprobe=4, m=16, ks=64,
    // rerank=16) and floors. The miss budget decomposes: routing loss
    // (true neighbor in an unprobed list — IVF's, bounded by
    // ext_sim_ivf_nprobe's 0.40 aggregate floor) and quantization
    // loss (true neighbor probed but outside the ADC shortlist —
    // PQ's own, measured against plain IVF at the SAME nprobe so the
    // routing loss cancels: ≥0.80 of what exact scoring finds in the
    // probed lists must survive ADC+rerank)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(spark, dir)
      val queries = emb.where(col("vec_id") < 20)
      val coarse = Similarity.IvfIndex.build(emb, "vec_id", "embedding",
        k = 16, iters = 3)
      val index = Similarity.PqIndex.buildResidual(emb, "vec_id", "embedding",
        coarse, m = 16, ks = 64, dim = 64, iters = 3)
      val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
        k = 10).select("query_id", "neighbor_id")
      val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 10, coarse.centers, nprobe = 4).select("query_id", "neighbor_id")
      val ipq = Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
        k = 10, coarse, index, nprobe = 4, rerank = 16)
        .select("query_id", "neighbor_id")
      val nBf = bf.count()
      val nIvf = ivf.count()
      val hitsBf = bf.join(ipq, Seq("query_id", "neighbor_id")).count()
      val hitsIvf = ivf.join(ipq, Seq("query_id", "neighbor_id")).count()
      info(s"$dir: ivfpq vs bf = $hitsBf/$nBf = ${hitsBf.toDouble / nBf}; " +
        s"vs ivf@4 = $hitsIvf/$nIvf = ${hitsIvf.toDouble / nIvf}")
      assert(hitsBf * 5 >= nBf * 2,
        s"$dir: recall vs brute force ${hitsBf.toDouble / nBf} below 0.40")
      assert(hitsIvf * 5 >= nIvf * 4,
        s"$dir: PQ stage keeps only ${hitsIvf.toDouble / nIvf} of IVF@4 (< 0.80)")
    }
  }

  test("native serving kernels are bit-equal to their HOF baselines; bad inputs fail loudly") {
    import spark.implicits._
    import graft.functions.{DotProductLong, LutSum}
    // deterministic pseudo-random fixtures (seeded off the row id)
    val rows = spark.range(200)
      .select(col("id"),
        transform(sequence(lit(0), lit(15)),
          j => pmod(col("id") * 31 + j * 17, lit(255)) - 127).as("a"),
        transform(sequence(lit(0), lit(15)),
          j => pmod(col("id") * 13 + j * 7, lit(255)) - 127).as("b"),
        transform(sequence(lit(0), lit(15)),
          j => (pmod(col("id") + j, lit(8))).cast("int")).as("codes"),
        transform(sequence(lit(0), lit(15)), j =>
          transform(sequence(lit(0), lit(7)),
            c => (col("id") * lit(0.001) + j * lit(0.01) + c * lit(0.1)))).as("lut"))
    // integer dot: native vs aggregate(zip_with(..)) — exact equality
    val dotDiff = rows.select(
        (DotProductLong.dot(col("a"), col("b")) -
          aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x)).as("d"))
      .agg(sum(abs(col("d")))).head.getLong(0)
    assert(dotDiff == 0L)
    // ADC lut sum: native vs zip_with/element_at/aggregate — BIT equal
    // (same left-to-right float order), not just within epsilon
    val lutDiff = rows.select(
        (LutSum.lutSum(col("codes"), col("lut")) ===
          aggregate(zip_with(col("codes"), col("lut"),
              (c, row) => element_at(row, c + 1)),
            lit(0d), (acc, x) => acc + x)).as("eq"))
      .where(!col("eq")).count()
    assert(lutDiff == 0L)
    // loud failures: dimension mismatch and out-of-table code (the
    // IllegalArgumentException may or may not arrive wrapped in a
    // SparkException depending on where codegen evaluates it)
    def root(t: Throwable): Throwable =
      if (t.getCause == null) t else root(t.getCause)
    val e1 = intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
        .select(DotProductLong.dot(col("a"), col("b"))).collect()
    }
    assert(root(e1).getMessage.contains("mismatched array lengths"))
    val e2 = intercept[Exception] {
      Seq((Seq(9), Seq(Seq(0.1, 0.2)))).toDF("codes", "lut")
        .select(LutSum.lutSum(col("codes"), col("lut"))).collect()
    }
    assert(root(e2).getMessage.contains("outside table"))
  }
}
