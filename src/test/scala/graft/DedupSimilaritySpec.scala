package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}
import graft.functions.DotProduct

/** Library-level specs for the dedup + similarity operators, on small
  * in-memory corpora where the expected answer is computable by hand
  * (complementing the DuckDB-oracle checks that run on the testdata).
  */
class DedupSimilaritySpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (2L, "the quick brown fox leaps over the lazy dog"), // near dup of 0
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "pack my box with five dozen liquor jugs"),     // exact dup of 3
      (5L, "completely different text about spark engines")
    ).toDF("doc_id", "text")
  }

  test("exactByFingerprint keeps the smallest id per duplicate set") {
    import spark.implicits._
    val kept = Dedup.exactByFingerprint(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 2L, 3L, 5L))
  }

  test("exact dropDuplicates census matches distinct text count") {
    assert(Dedup.exact(docs, Seq("text")).count() == 4)
  }

  test("incrementalExact keeps only batch content new to the store, min-id in batch") {
    import spark.implicits._
    val corpus = docs.where($"doc_id" <= 2) // texts of 0/1 (dup) and 2
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // already in corpus
      (11L, "pack my box with five dozen liquor jugs"),     // new to store...
      (12L, "pack my box with five dozen liquor jugs"),     // ...in-batch dup of 11
      (13L, "entirely new content never seen before")
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(batch, "doc_id", "text",
        Dedup.fingerprintStore(corpus, "text"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(11L, 13L))
    // rolling the store forward makes a re-ingest of the same batch empty
    val rolled = Dedup.fingerprintStore(corpus, "text")
      .union(Dedup.fingerprintStore(batch, "text")).distinct()
    assert(Dedup.incrementalExact(batch, "doc_id", "text", rolled).count() == 0)
  }

  test("incrementalExact treats null text as one content value (no per-batch re-admission)") {
    import spark.implicits._
    // the unbounded-horizon contract: once a null-text row is
    // accepted, its (null) fingerprint enters the store and every
    // later null-text arrival must be dropped — a plain === anti-join
    // never matches null=null and would re-admit it each batch
    val b1 = Seq((1L, Option("alpha")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("doc_id", "text")
    val empty = Dedup.fingerprintStore(b1.limit(0), "text")
    val kept1 = Dedup.incrementalExact(b1, "doc_id", "text", empty)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept1 == Seq(1L, 2L), s"in-batch null dedup must keep min id: $kept1")
    // roll the store forward with the accepted rows' fingerprints
    // (exactly what StreamIngest.applyBatch does) and re-offer null
    val rolled = empty.union(
      b1.where($"doc_id" <= 2).select(graft.ext.Hashing.h60($"text").as("fp")))
    val b2 = Seq((9L, Option.empty[String]), (10L, Option("beta")))
      .toDF("doc_id", "text")
    val kept2 = Dedup.incrementalExact(b2, "doc_id", "text", rolled)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept2 == Seq(10L),
      s"a store null fingerprint must drop later null-text arrivals: $kept2")
  }

  test("incrementalLshCandidates: batch-vs-store bucket collisions, cap skips, no batch-batch pairs") {
    import spark.implicits._
    // hand-built band relations: (doc_id, band, sig)
    val store = (Seq(
      (100L, 0, "a"), (101L, 0, "a"),          // small store bucket
      (102L, 1, "z")) ++                        // bucket untouched by batch
      (200L to 203L).map(i => (i, 2, "hot")))   // degenerate bucket (cap 3)
      .toDF("doc_id", "band", "sig")
    val batch = Seq(
      (10L, 0, "a"),   // collides with 100, 101
      (10L, 2, "hot"), // over-cap store bucket: skipped
      (11L, 0, "a"),   // also collides with 100, 101 — but NOT with 10
      (12L, 3, "q"))   // no store bucket
      .toDF("doc_id", "band", "sig")
    val got = Dedup.incrementalLshCandidates(batch, store, maxBucket = 3)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 100L), (10L, 101L), (11L, 100L), (11L, 101L)),
      s"got $got")
  }

  test("ngramJaccardOnCandidates agrees with the full pairwise join on given pairs") {
    import spark.implicits._
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", dfCap = 100)
      .as[(Long, Long, Long, Long)].collect().toSet
    val cands = Seq((0L, 1L), (0L, 2L), (3L, 4L), (0L, 5L)).toDF("doc_a", "doc_b")
    val sub = Dedup.ngramJaccardOnCandidates(docs, "doc_id", "text", cands, dfCap = 100)
      .as[(Long, Long, Long, Long)].collect().toSet
    // candidate-restricted results are exactly the full results on
    // those pairs; (0,5) shares no shingle and must not appear
    assert(sub == full.filter(p => Set((0L, 1L), (0L, 2L), (3L, 4L)).contains((p._1, p._2))))
    // exact dups share everything: inter == uni
    val d01 = sub.find(p => (p._1, p._2) == (0L, 1L)).get
    assert(d01._3 == d01._4)
  }

  test("simhash: identical docs get identical signatures, 60-bit width works") {
    import spark.implicits._
    for (bits <- Seq(16, 60)) {
      val sig = Dedup.simhash(docs, "doc_id", "text", bits)
        .as[(Long, Long)].collect().toMap
      assert(sig(0L) == sig(1L), s"exact dups must collide at $bits bits")
      assert(sig(3L) == sig(4L))
      // near-dup hamming distance strictly below the unrelated pair's
      val near = java.lang.Long.bitCount(sig(0L) ^ sig(2L))
      val far = java.lang.Long.bitCount(sig(0L) ^ sig(5L))
      assert(near < far, s"bits=$bits near=$near far=$far")
      if (bits == 60) assert(sig.values.exists(v => (v >>> 32) != 0L),
        "60-bit signatures should populate high bits")
    }
  }

  test("simhashNearPairs (multi-index bucketed) equals brute-force hamming filter") {
    import spark.implicits._
    for (maxDist <- Seq(3, 4)) {
      val bucketed = Dedup.simhashNearPairs(docs, "doc_id", "text",
        bits = 60, maxDist = maxDist)
        .select("doc_a", "doc_b", "dist").as[(Long, Long, Int)].collect().toSet
      val sigs = Dedup.simhash(docs, "doc_id", "text", 60)
        .as[(Long, Long)].collect().toMap
      val brute = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        d = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if d <= maxDist
      } yield (a, b, d)).toSet
      assert(bucketed == brute, s"maxDist=$maxDist")
      // exact dups must appear at distance 0
      assert(bucketed.contains((0L, 1L, 0)) && bucketed.contains((3L, 4L, 0)))
    }
  }

  test("lshDegenerateClusters and lshCandidatePairs partition the buckets at the cap") {
    import spark.implicits._
    // 6 docs, 2 exact-dup families -> every band bucket of the dup
    // family holds >= 2 docs; with cap 1 those become clusters and
    // pairwise candidates must be empty for them
    val bands = Dedup.lshBands(
      Dedup.minhashSignatures(Dedup.tokenHashes(docs, "doc_id", "text"), 8), 8, 4)
    val clusters = Dedup.lshDegenerateClusters(bands, maxBucket = 1)
      .as[(Int, String, Long, Long)].collect()
    val pairs = Dedup.lshCandidatePairs(bands, maxBucket = 1)
      .as[(Long, Long)].collect()
    // exact dups (0,1) and (3,4) share every band: with cap 1 their
    // buckets are clusters (rep = min id) and never pairwise
    assert(clusters.exists(c => c._3 == 0L && c._4 >= 2))
    assert(clusters.exists(c => c._3 == 3L && c._4 >= 2))
    assert(!pairs.contains((0L, 1L)) && !pairs.contains((3L, 4L)))
    // with a generous cap the same buckets are pairwise, not clusters
    assert(Dedup.lshDegenerateClusters(bands, maxBucket = 64).count() == 0)
    assert(Dedup.lshCandidatePairs(bands, maxBucket = 64)
      .as[(Long, Long)].collect().toSet.contains((0L, 1L)))
  }

  test("simhashNearPairs segment-bucket cap yields a subset; generous cap is exact") {
    import spark.implicits._
    val exact = Dedup.simhashNearPairs(docs, "doc_id", "text", 60, 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.simhashNearPairs(docs, "doc_id", "text", 60, 3, maxSegBucket = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(exact))
    val generous = Dedup.simhashNearPairs(docs, "doc_id", "text", 60, 3, maxSegBucket = 1000)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(generous == exact)
  }

  test("hamming column function matches Long.bitCount") {
    import spark.implicits._
    val r = Seq((0xF0L, 0x0FL)).toDF("a", "b")
      .select(Dedup.hamming(col("a"), col("b"))).as[Int].collect().head
    assert(r == 8)
  }

  test("connectedComponents labels every node with its component's min id") {
    import spark.implicits._
    // a 6-node path (worst case for plain propagation: diameter 5),
    // a triangle given only as two edges' closure input, a 2-cycle
    // duplicate edge, and reversed/duplicate orientations
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L), // path
      (2L, 7L), (7L, 4L),                                         // chain: class min 2
      (20L, 21L), (21L, 20L),                                     // duplicate both ways
      (30L, 31L)
    ).toDF("src", "dst")
    val got = Dedup.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val expected = Map(
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L, 15L -> 10L,
      2L -> 2L, 7L -> 2L, 4L -> 2L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(got == expected)
  }

  test("connectedComponents on an empty edge list is empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Dedup.connectedComponents(empty, "src", "dst").count() == 0)
  }

  test("incrementalSimhashCandidates finds hamming<=maxDist batch-vs-store pairs exactly") {
    import spark.implicits._
    // signature-level fixture (bits=8, maxDist=1 → 2 segments of 4
    // bits): store doc 1 = 0b00000000. Batch 10 differs in 1 bit
    // (admit), 11 in 2 bits both in ONE segment (other segment agrees
    // → candidate surfaces, then dist filter rejects), 12 differs in
    // 2 bits across BOTH segments (no segment agrees — never even a
    // candidate), 13 equals the store doc (dist 0, admit).
    val store = Seq((1L, 0x00L)).toDF("doc_id", "simhash")
    val batch = Seq((10L, 0x01L), (11L, 0x03L), (12L, 0x11L), (13L, 0x00L))
      .toDF("doc_id", "simhash")
    val got = Dedup.incrementalSimhashCandidates(batch, store,
        bits = 8, maxDist = 1)
      .select("doc_new", "doc_corpus", "dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((10L, 1L, 1), (13L, 1L, 0)))
  }

  test("keepCanonical keeps max quality per class, ties to min id, singletons kept") {
    import spark.implicits._
    // class {1,2,3} via a chain (1-2, 2-3): quality tie 9 between 2
    // and 3 → 2 survives (min id among max quality), 1's higher id
    // never matters; class {5,6}: 6 wins on quality alone; 4 is in no
    // pair and must survive as its own class of size 1
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L), (5L, 7L), (6L, 8L)
    ).toDF("doc_id", "n_chars")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = Dedup.keepCanonical(docs, "doc_id", "n_chars",
        edges, "doc_a", "doc_b")
      .select("cls", "doc_id", "n_chars", "class_size")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 2L, 9L, 3L), // survivor 2: quality 9, tie vs 3 → min id
      (4L, 4L, 1L, 1L), // singleton keeps itself
      (5L, 6L, 8L, 2L)))
  }

  test("keepCanonical on an empty edge list keeps every doc as its own class") {
    import spark.implicits._
    val docs = Seq((1L, 5L), (2L, 9L)).toDF("doc_id", "n_chars")
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.keepCanonical(docs, "doc_id", "n_chars",
        empty, "doc_a", "doc_b")
      .select("cls", "doc_id", "n_chars", "class_size")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 5L, 1L), (2L, 2L, 9L, 1L)))
  }

  test("componentDrops closes chains the per-pair doc_b policy leaves open") {
    import spark.implicits._
    // pairs (B,C) and (A,C): B is never a doc_b, so the doc_b policy
    // keeps {A, B}; the component policy keeps only the class min A
    val pairs = Seq((2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val compDrops = Dedup.componentDrops(pairs, "doc_a", "doc_b")
      .as[Long].collect().toSet
    val pairDrops = pairs.select($"doc_b").distinct().as[Long].collect().toSet
    assert(pairDrops == Set(3L))
    assert(compDrops == Set(2L, 3L))
  }

  test("DotProduct is bit-equal to the interpreted HOF formulation") {
    import spark.implicits._
    val vecs = Seq(
      (Array(0.1, -0.2, 0.37, 1e-9), Array(0.9, 0.41, -0.11, 2e7)),
      (Array(1.0, 2.0, 3.0, 4.0), Array(-4.0, 3.0, -2.0, 1.0))
    ).toDF("a", "b")
    val both = vecs.select(
      DotProduct.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
        lit(0.0d), (acc, v) => acc + v).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("DotProduct fails loudly on mismatched array lengths (both eval paths)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(DotProduct.dot(col("a"), col("b"))).collect()
    }
    def root(t: Throwable): Throwable = Option(t.getCause).map(root).getOrElse(t)
    assert(root(e).getMessage.contains("mismatched array lengths"))
    // interpreted path too
    val e2 = intercept[IllegalArgumentException] {
      graft.functions.DotProduct(
        org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
      ).eval(null)
    }
    assert(e2.getMessage.contains("mismatched array lengths"))
  }

  test("lshBands rejects k not divisible by rowsPerBand") {
    import spark.implicits._
    val sigs = Dedup.minhashSignatures(Dedup.tokenHashes(docs, "doc_id", "text"), 6)
    intercept[IllegalArgumentException] {
      Dedup.lshBands(sigs, 6, 4)
    }
  }

  test("PlanCache memoizes one persisted relation per semantic input; clear releases") {
    import graft.ext.PlanCache
    PlanCache.clear()
    // `docs` is a def: each call builds a NEW DataFrame with an equal
    // canonicalized plan — the cache must key semantically, not by ref
    val a = Dedup.cappedShingleHashes(docs, "doc_id", "text", 100)
    val b = Dedup.cappedShingleHashes(docs, "doc_id", "text", 100)
    assert(a eq b, "second call must reuse the memoized persisted relation")
    assert(PlanCache.size == 1)
    val c = Dedup.cappedShingleHashes(docs, "doc_id", "text", 50)
    assert(!(c eq a) && PlanCache.size == 2, "different dfCap is a different relation")
    PlanCache.clear()
    assert(PlanCache.size == 0)
  }

  test("lshNearPairs finds the near-dup clusters on a clustered corpus") {
    import spark.implicits._
    // two tight clusters + noise: vectors near e1, near e2, and random
    val dim = 64
    def vec(base: Int, jitter: Int): Array[Float] = {
      val a = Array.fill(dim)(0.001f * jitter)
      a(base) = 1.0f
      a
    }
    val rows = (0 until 6).map(i => (i.toLong, vec(0, i))) ++
      (6 until 12).map(i => (i.toLong, vec(1, i))) ++
      Seq((12L, Array.fill(dim)(0.5f)))
    val emb = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.lshNearPairs(emb, "vec_id", "embedding",
      minCos = 0.95, nTables = 4, planesPerTable = 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every reported pair must be within one cluster
    pairs.foreach { case (a, b) =>
      assert((a < 6 && b < 6) || (a >= 6 && a < 12 && b >= 6 && b < 12), s"($a,$b)")
    }
    // the clusters are near-identical: LSH must recover most pairs
    assert(pairs.size >= 10, s"found only ${pairs.size} of 30 cluster pairs")
  }

  test("ivfTopK with nprobe = k probes every list and equals bruteForceTopK exactly") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.where(col("vec_id") < 5)
    val centers = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 2)
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      centers, nprobe = 8)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
      .collect().toSet
    assert(ivf == bf)
  }

  test("IvfIndex save/load round-trips bit-identically and serves the same top-k") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val built = Similarity.IvfIndex(
      Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 2))
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.IvfIndex.save(spark, built, dir)
    val loaded = Similarity.IvfIndex.load(spark, dir)
    // bit-identical centers in the same order (assignment and probe
    // order depend on both)
    assert(loaded.centers.length == built.centers.length)
    built.centers.zip(loaded.centers).foreach { case (a, b) =>
      assert(a.size == b.size)
      a.zip(b).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y))
      }
    }
    val queries = emb.where(col("vec_id") < 3)
    def serve(ix: Similarity.IvfIndex) =
      Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        ix.centers, nprobe = 2)
        .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)]
        .collect().toSet
    assert(serve(loaded) == serve(built))
  }

  test("ivfTopK recovers cluster-mates on a clustered corpus with nprobe = 1") {
    import spark.implicits._
    val dim = 64
    def vec(base: Int, jitter: Int): Array[Float] = {
      val a = Array.fill(dim)(0.001f * jitter)
      a(base) = 1.0f
      a
    }
    val rows = (0 until 8).map(i => (i.toLong, vec(0, i))) ++
      (8 until 16).map(i => (i.toLong, vec(1, i)))
    val emb = rows.toDF("vec_id", "embedding")
    val centers = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 2, iters = 4)
    val top = Similarity.ivfTopK(emb, emb, "vec_id", "embedding", 3, centers, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top.nonEmpty)
    // with converged centroids and one probe, every neighbor comes
    // from the query's own cluster
    top.foreach { case (q, n) =>
      assert((q < 8) == (n < 8), s"cross-cluster neighbor ($q,$n)")
    }
  }

  test("saltedJoin on a skewed key equals the plain join") {
    import spark.implicits._
    import graft.ext.Skew
    // 10k rows, 90% on one hot key
    val big = (0L until 10000L)
      .map(i => (i, if (i % 10 == 0) s"k${i % 100}" else "hot"))
      .toDF("row_id", "key")
    val small = Seq(("hot", 1), ("k0", 2), ("k10", 3), ("k20", 4))
      .toDF("key", "payload")
    val plain = big.join(small, "key")
      .select("row_id", "payload").as[(Long, Int)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "key", salt = 16, distributeBy = "row_id")
      .select("row_id", "payload").as[(Long, Int)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("lshTopK ranks bucket-mates by cosine like bruteForceTopK where buckets allow") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.where(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
      nTables = 4, planesPerTable = 8)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    // every LSH hit scores exactly what brute force scored for that pair
    lsh.foreach { case (q, n, c) =>
      bf.get(q).flatMap(_.get(n)).foreach(bfc => assert(math.abs(bfc - c) < 1e-12))
    }
  }

  test("containmentPairs flags a quoted sub-span that Jaccard misses") {
    import spark.implicits._
    val big = (1 to 24).map(i => s"w$i").mkString(" ")
    val quote = (5 to 14).map(i => s"w$i").mkString(" ") // contiguous sub-span
    val df = Seq(
      (10L, big),
      (20L, quote),
      (30L, "totally unrelated content about something else entirely")
    ).toDF("doc_id", "text")
    graft.ext.PlanCache.clear()
    val pairs = Dedup.containmentPairs(df, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((10L, 20L)))
    val (_, _, inter, nA, nB) = pairs.head
    // every one of the quote's 8 trigram shingles appears in the big
    // doc: containment of the smaller = 1.0, while jaccard = 8/22
    assert(nB == 8 && inter == 8 && nA == 22)
    assert(inter * 10 >= math.min(nA, nB) * 8)      // containment gate fires
    assert(inter * 10 < (nA + nB - inter) * 8)      // a 0.8 jaccard gate would not
  }

  test("quantizeI8: floor(+0.5) rounding, clamping, null propagation") {
    import spark.implicits._
    val got = Seq(Seq(1.0f, -1.0f, 0.5f, -0.5f, 2.0f, -2.0f, 0.0f, 0.004f))
      .toDF("v").select(Similarity.quantizeI8(col("v")).as("q"))
      .as[Seq[Long]].head
    // 0.5*127+0.5 = 64.0 → 64; -0.5*127+0.5 = -63.0 → -63 (floor, not
    // round-half-even); ±2 clamps; 0.004*127+0.5 = 1.008 → 1
    assert(got == Seq(127L, -127L, 64L, -63L, 127L, -127L, 0L, 1L))
    val n = Seq(Option.empty[Seq[Float]]).toDF("v")
      .select(Similarity.quantizeI8(col("v")).as("q")).head
    assert(n.isNullAt(0))
  }

  test("duplicatedKgramSpans merges overlapping dup-gram intervals, splits past the k-gap") {
    import spark.implicits._
    // docs 0/1 share the 5-token run "a b c d e" (three overlapping
    // dup 3-grams each → ONE merged span per doc); doc 2 repeats its
    // 3-gram at gap exactly k (merge boundary → one span over the
    // whole doc); doc 7 repeats at gap k+1 (split → two spans);
    // doc 3 has no duplicated gram and must emit nothing.
    val docs = Seq(
      (0L, "a b c d e x y z"),
      (1L, "q w a b c d e r"),
      (2L, "m n o m n o"),
      (3L, "unique-tokens, only. here nothing shared!"),
      (7L, "p q r s p q r")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedKgramSpans(docs, "doc_id", "text", k = 3)
      .select("doc_id", "start_pos", "end_pos")
      .as[(Long, Int, Int)].collect().toSet
    assert(got == Set((0L, 0, 5), (1L, 2, 7), (2L, 0, 6), (7L, 0, 3), (7L, 4, 7)))
  }

  test("cutSpans drops exactly the span-covered tokens, keeps order, passes clean docs through") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e x y z"),
      (1L, "q w a b c d e r"),
      (2L, "m n o m n o"),
      (3L, "unique-tokens, only. here nothing shared!"),
      (7L, "p q r s p q r")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedKgramSpans(docs, "doc_id", "text", k = 3)
    val got = Dedup.cutSpans(docs, "doc_id", "text", spans)
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got == Set(
      (0L, 8, 3, "x y z"),
      (1L, 8, 3, "q w r"),
      (2L, 6, 0, ""),
      (3L, 6, 6, "unique tokens only here nothing shared"),
      (7L, 7, 1, "s")))
  }

  test("lshNearPairs maxBucket skips dense buckets, keeps sparse-bucket pairs") {
    import spark.implicits._
    // five identical vectors form a dense bucket in EVERY table
    // (C(5,2)=10 pairs); an antipodal near-dup pair lands in a
    // different bucket (opposite sign on every nonzero plane
    // projection). The cap must drop exactly the dense bucket's work.
    val e1 = Seq(1f) ++ Seq.fill(7)(0f)
    val negE1 = e1.map(-_)
    val emb = ((0L until 5L).map(i => (i, e1)) ++ Seq((10L, negE1), (11L, negE1)))
      .toDF("vec_id", "embedding")
    def pairs(cap: Int) =
      Similarity.lshNearPairs(emb, "vec_id", "embedding", minCos = 0.5,
          nTables = 2, planesPerTable = 4, dim = 8, maxBucket = cap)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs(Int.MaxValue).size == 11, "uncapped: all 10 dense pairs + the sparse pair")
    assert(pairs(3) == Set((10L, 11L)), "capped: dense bucket skipped, sparse pair kept")
  }

  test("quantizedTopK ranks by exact integer dot product, id tie-break") {
    import spark.implicits._
    // corpus engineered so quantized scores against query 0 are exact
    // ints with a tie between ids 2 and 3 (same vector) — id order wins
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(1.0f, 1.0f)),   // score 127*127 = 16129
      (2L, Seq(0.5f, 0.0f)),   // score 127*64 = 8128
      (3L, Seq(0.5f, 0.0f)),   // tie with 2
      (4L, Seq(-1.0f, 0.0f))   // score -16129
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizedTopK(emb, emb.where(col("vec_id") === 0),
        "vec_id", "embedding", k = 3)
      .select("rank", "neighbor_id", "score")
      .as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, 1L, 16129L), (2, 2L, 8128L), (3, 3L, 8128L)))
  }

  test("debounce drops within-gap repeats vs the previous EVENT, refresh included") {
    import java.sql.Timestamp
    import spark.implicits._
    def t(s: Int) = new Timestamp(s * 1000L)
    // key a, 10s gap: 5s drops (same content as 0s, within gap);
    // 6s keeps (different content); 9s keeps BECAUSE the compare is
    // against the previous EVENT — 6s with its other content — not
    // against the last kept c1 row; 30s keeps (gap 21s from 9s).
    // Key b is independent.
    val df = Seq(
      ("a", t(0), "c1", 1L), ("a", t(5), "c1", 2L), ("a", t(6), "c2", 3L),
      ("a", t(9), "c1", 4L), ("a", t(30), "c1", 5L),
      ("b", t(5), "c1", 6L))
      .toDF("k", "ts", "c", "id")
    val kept = Dedup.debounce(df, Seq("k"), "ts", Seq("c"), 10000L,
        tieCols = Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L))
  }

  test("debounce: gap strictly over the threshold keeps; equal gap drops") {
    import java.sql.Timestamp
    import spark.implicits._
    val df = Seq(
      ("a", new Timestamp(0L), "c", 1L),
      ("a", new Timestamp(10000L), "c", 2L),   // gap == 10s → drop
      ("a", new Timestamp(20001L), "c", 3L))   // gap 10.001s → keep
      .toDF("k", "ts", "c", "id")
    val kept = Dedup.debounce(df, Seq("k"), "ts", Seq("c"), 10000L,
        tieCols = Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("debounce null content equals null content (null-safe compare)") {
    import java.sql.Timestamp
    import spark.implicits._
    val df = Seq(
      ("a", new Timestamp(0L), Option.empty[String], 1L),
      ("a", new Timestamp(1000L), Option.empty[String], 2L))
      .toDF("k", "ts", "c", "id")
    val kept = Dedup.debounce(df, Seq("k"), "ts", Seq("c"), 10000L,
        tieCols = Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
