package graft

import org.apache.spark.sql.functions._

import graft.ext.Curation

/** Stage-by-stage spec for the end-to-end curation pipeline on a
  * corpus where every stage's attrition is computable by hand
  * (complementing the DuckDB oracle over the testdata corpus).
  */
class CurationSpec extends SparkSpec {

  // 32 distinct tokens, English stopwords up front: passes the lang
  // gate (en=5, others 0), the quality gate (32 tokens, ttr 10), and
  // is unique content.
  private val enStop = Seq("the", "a", "of", "and", "to")
  private val base = (enStop ++ (1 to 27).map("w" + _)).mkString(" ")
  // one mid-word substitution: token jaccard 31/33 (LSH catches it),
  // trigram-shingle jaccard 27/33 = 0.818 ≥ 0.8 (verification keeps it)
  private val nearDup = base.replace("w14", "zz")
  private val other = (enStop ++ (1 to 27).map("v" + _)).mkString(" ")

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, base),
      (1L, base),                            // exact dup of 0 → exact stage
      (2L, nearDup),                         // near dup of 0 → near-dedup
      (3L, "el la de que y " * 7),           // Spanish → lang gate
      (4L, "the a of and to quick"),         // 6 tokens → quality gate
      (5L, Seq.fill(40)("the").mkString(" ")), // ttr_decile 0 → quality gate
      (6L, other)                            // clean survivor
    ).toDF("doc_id", "text")
  }

  test("curate drops each doc at exactly the intended stage") {
    import spark.implicits._
    val c = Curation.curate(corpus, "doc_id", "text")
    assert(c.input.count() == 7)
    assert(c.langKept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 4L, 5L, 6L))
    assert(c.qualityKept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 6L))
    assert(c.exactKept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 2L, 6L))
    assert(c.nearDupPairs.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet == Set((0L, 2L)))
    assert(c.finalDocs.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 6L))
  }

  test("componentPolicy=true matches the pair policy on a chain-free corpus") {
    import spark.implicits._
    // this corpus's pair graph has a single edge (0,2), so the two
    // policies must agree exactly; the chain case where they diverge
    // is pinned by DedupSimilaritySpec's componentDrops test
    val c = Curation.curate(corpus, "doc_id", "text", componentPolicy = true)
    assert(c.finalDocs.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 6L))
  }

  test("qualitySurvivor keeps the best copy where the pair policy keeps the first") {
    import spark.implicits._
    // near-dup pair where the HIGHER id is the BETTER copy: `longer`
    // appends one token to base (33 tokens, shingle jaccard 30/31),
    // so the min-id pair policy drops it (doc_b side) while the
    // quality policy must keep it (more n_tokens) and drop doc 0
    val longer = base + " extra"
    val c2 = Seq((0L, base), (2L, longer), (6L, other)).toDF("doc_id", "text")
    val pair = Curation.curate(c2, "doc_id", "text")
    assert(pair.nearDupPairs.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet == Set((0L, 2L)))
    assert(pair.finalDocs.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 6L))
    val qual = Curation.curate(c2, "doc_id", "text", qualitySurvivor = true)
    assert(qual.finalDocs.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 6L))
  }

  test("qualitySurvivor breaks quality ties toward the min id") {
    import spark.implicits._
    // base and its equal-length near-dup tie on n_tokens (32 each):
    // the deterministic tie-break keeps the smaller id — identical
    // kept set to the pair policy on this corpus
    val qual = Curation.curate(corpus, "doc_id", "text", qualitySurvivor = true)
    assert(qual.finalDocs.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 6L))
  }

  test("near-dup verification threshold is exact rational arithmetic") {
    import spark.implicits._
    // shingle jaccard 27/33: passes at 4/5 (27·5 ≥ 33·4), fails at 5/6
    val strict = Curation.curate(corpus, "doc_id", "text",
      jaccardNum = 5, jaccardDen = 6)
    assert(strict.nearDupPairs.count() == 0)
    assert(strict.finalDocs.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 2L, 6L))
  }

  test("decontaminate drops exactly the train docs sharing an n-gram with eval") {
    import spark.implicits._
    val evalSet = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val train = Seq(
      // contains the eval 8-gram "alpha ... theta" inside a longer doc
      (1L, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
      // shares 7 consecutive tokens only — below the n=8 bar
      (2L, "alpha beta gamma delta epsilon zeta eta other words here"),
      (3L, "completely unrelated training document with its own words")
    ).toDF("doc_id", "text")
    val clean = Curation.decontaminate(train, "doc_id", "text", evalSet, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(clean == Seq(2L, 3L))
  }

  test("decontaminateBloom never false-negatives; sized sanely it equals exact") {
    import spark.implicits._
    // larger synthetic corpus: 200 train docs of which every 10th
    // embeds an eval 8-gram mid-document
    val evalSet = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val train = (0 until 200).map { i =>
      val filler = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
      val text =
        if (i % 10 == 0) s"lead alpha beta gamma delta epsilon zeta eta theta $filler"
        else if (i % 10 == 5) s"lead one two three four five six seven eight $filler"
        else filler
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val exact = Curation.decontaminate(train, "doc_id", "text", evalSet, "text")
      .select("doc_id").as[Long].collect().toSet
    val bloomed = Curation.decontaminateBloom(train, "doc_id", "text",
        evalSet, "text", expectedItems = 1000L, fpp = 1e-6)
      .select("doc_id").as[Long].collect().toSet
    // one-sided error: every exactly-contaminated doc is also dropped
    // by the bloom path (no false negatives)...
    assert(bloomed.subsetOf(exact))
    // ...and at fpp=1e-6 over ~2400 probed grams, over-drop is
    // overwhelmingly unlikely: the two paths agree exactly
    assert(bloomed == exact)
    // an undersized/sloppy filter may over-drop but must still never
    // keep a contaminated doc
    val sloppy = Curation.decontaminateBloom(train, "doc_id", "text",
        evalSet, "text", expectedItems = 10L, fpp = 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(sloppy.subsetOf(exact))
  }

  test("optional repetition gate drops phrase-boilerplate that unigram TTR passes") {
    import spark.implicits._
    // 8 distinct 4-word phrases, each repeated 3x consecutively: enough
    // distinct unigrams to pass TTR, but ~half the trigrams are repeats
    val phrases = (1 to 8).map(i => s"x${i}a x${i}b x${i}c x${i}d")
    val boiler = (enStop ++ phrases.flatMap(p => Seq(p, p, p))).mkString(" ")
    val docs = Seq((0L, base), (1L, boiler)).toDF("doc_id", "text")
    def survivors(maxRep: Int) =
      Curation.curate(docs, "doc_id", "text", maxRepDecile = maxRep)
        .exactKept.select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors(10) == Seq(0L, 1L), "gate off: both pass quality")
    assert(survivors(1) == Seq(0L), "gate on: boilerplate dropped")
  }

  test("repetitionStats separates boilerplate from fresh text") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(10)("buy now limited offer").mkString(" ")), // 4 words x10
      (2L, (1 to 40).map("w" + _).mkString(" "))                 // all distinct
    ).toDF("doc_id", "text")
    val r = graft.ext.TextStats.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 1: 38 trigrams, only 4 distinct patterns cycle; doc 2: all 38 distinct
    assert(r == Seq((1L, 38L, 4L), (2L, 38L, 38L)))
  }

  test("decontaminateEmbedding drops cosine-near train rows, keeps far and antipodal ones") {
    import spark.implicits._
    val e1 = Seq(1f) ++ Seq.fill(63)(0f)
    val e2 = Seq(0f, 1f) ++ Seq.fill(62)(0f)
    // id 1 is IDENTICAL to the eval vector (same bucket in every
    // table, cos 1 → dropped); id 2 is antipodal (cos −1 — below
    // threshold even though sign-LSH may co-bucket zeros); id 3 is
    // orthogonal (cos 0 → kept regardless of candidate generation)
    val train = Seq((1L, e1), (2L, e1.map(-_)), (3L, e2))
      .toDF("vec_id", "embedding")
    val ev = Seq((100L, e1)).toDF("vec_id", "embedding")
    val kept = Curation.decontaminateEmbedding(train, "vec_id", "embedding",
        ev, "vec_id", "embedding", minCos = 0.5)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("finalDocs carries the curated corpus columns (id, text, n_tokens)") {
    val out = Curation.curate(corpus, "doc_id", "text").finalDocs
    assert(out.columns.toSeq == Seq("doc_id", "text", "n_tokens"))
    assert(out.where(col("doc_id") === 0L).select("n_tokens")
      .head().getInt(0) == 32)
  }

  test("contaminationScore counts distinct-gram overlap per doc") {
    import spark.implicits._
    // 2-grams; doc 1 = "a b c" has grams {ab, bc}; eval = "b c d" has
    // {bc, cd} → 1 of 2 hit. doc 2 shares nothing. doc 3 is one token
    // (no full-width gram) → no row.
    val tr = Seq((1L, "a b c"), (2L, "x y z"), (3L, "a"))
      .toDF("doc_id", "text")
    val ev = Seq(Tuple1("b c d")).toDF("text")
    val out = Curation.contaminationScore(tr, "doc_id", "text", ev, "text",
        n = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L), (2L, 2L, 0L)))
  }

  test("contaminationScore: a fully-leaked doc scores n_hit == n_grams") {
    import spark.implicits._
    val tr = Seq((1L, "p q r s")).toDF("doc_id", "text")
    val ev = Seq(Tuple1("o p q r s t")).toDF("text")
    val out = Curation.contaminationScore(tr, "doc_id", "text", ev, "text",
        n = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((3L, 3L)))
  }

  test("kAnonymize keeps frequent combos (including null) and suppresses rare ones, rows unchanged") {
    import spark.implicits._
    // combo (a, x): 3 rows — kept at k=3; (a, y): 1 row — suppressed;
    // (null, x): 3 rows — kept ONLY if the join is null-safe;
    // (b, null): 1 row — suppressed
    val rows = Seq(
      (1L, Some("a"), Some("x")), (2L, Some("a"), Some("x")), (3L, Some("a"), Some("x")),
      (4L, Some("a"), Some("y")),
      (5L, None, Some("x")), (6L, None, Some("x")), (7L, None, Some("x")),
      (8L, Some("b"), None))
    val df = rows.toDF("id", "q1", "q2")
    val kept = Curation.kAnonymize(df, Seq("q1", "q2"), k = 3)
      .select("id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 2L, 3L, 5L, 6L, 7L),
      s"expected the two frequent combos (incl. the null one), got $kept")
    // schema passthrough: the operator filters, never reshapes
    assert(Curation.kAnonymize(df, Seq("q1", "q2"), k = 1).columns.toSeq
      == df.columns.toSeq)
    assert(Curation.kAnonymize(df, Seq("q1", "q2"), k = 1).count() == rows.size)
    // combo-cardinality guard: over-threshold fails loudly instead of
    // attempting an undeliverable broadcast (2 distinct frequent
    // combos survive k=3; cap at 1)
    val g = intercept[IllegalArgumentException] {
      Curation.kAnonymize(df, Seq("q1", "q2"), k = 3, maxBroadcastCombos = 1L)
        .count()
    }
    assert(g.getMessage.contains("coarsen"), g.getMessage)
  }

  test("kAnonymizeGeneralized pools rare values under 'other' and suppresses strictly less") {
    import spark.implicits._
    // lang=en × src=web: 3 rows — frequent, kept untouched;
    // lang=fr × three DISTINCT rare sources (1 row each): suppression-
    // only kills all 3, generalization pools them into (fr, other)=3 ≥ k;
    // lang=zh × one rare source (1 row): pooled (zh, other)=1 < k —
    // still suppressed even after coarsening
    val df = Seq(
      (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"),
      (4L, "fr", "s1"), (5L, "fr", "s2"), (6L, "fr", "s3"),
      (7L, "zh", "s9")).toDF("id", "lang", "source")
    val plain = Curation.kAnonymize(df, Seq("lang", "source"), k = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(plain == Seq(1L, 2L, 3L))
    val gen = Curation.kAnonymizeGeneralized(df, Seq("lang", "source"), k = 3)
    val got = gen.select("id", "source").as[(Long, String)].collect().sortBy(_._1).toSeq
    // strictly fewer suppressed; pooled rows carry the COARSENED value
    // (publishing the original rare value would re-identify them)
    assert(got == Seq((1L, "web"), (2L, "web"), (3L, "web"),
      (4L, "other"), (5L, "other"), (6L, "other")), s"got $got")
    assert(gen.columns.toSeq == df.columns.toSeq)
    // a rare NULL source coarsens and pools like any rare value
    val withNull = df.union(
      Seq((8L, "fr", Option.empty[String])).toDF("id", "lang", "source"))
    val gotNull = Curation.kAnonymizeGeneralized(withNull, Seq("lang", "source"), k = 3)
      .where($"lang" === "fr").select("id").as[Long].collect().sorted.toSeq
    assert(gotNull == Seq(4L, 5L, 6L, 8L), s"got $gotNull")
    // guard parity with kAnonymize: over-threshold combo cardinality
    // fails the loud pre-flight, not a mid-job broadcast OOM (the df
    // has 5 distinct (lang, source) combos; cap at 2)
    val g = intercept[IllegalArgumentException] {
      Curation.kAnonymizeGeneralized(df, Seq("lang", "source"), k = 3,
        maxBroadcastCombos = 2L).count()
    }
    assert(g.getMessage.contains("coarsen"), g.getMessage)
  }

  test("assignIds: contiguous 0..N-1 in key order, partition-count invariant, no global window") {
    import spark.implicits._
    // scrambled input order and a non-dense key space: ids must come
    // out dense and key-ordered whatever the layout
    val rnd = new scala.util.Random(7)
    val keys = rnd.shuffle((0 until 500).map(i => i.toLong * 3 + 1))
    val df = keys.map(k => (k, s"v$k")).toDF("k", "v").repartition(7)
    def mapping(partitions: Int): Seq[(Long, Long)] =
      Curation.assignIds(df, "k", partitions = partitions)
        .select("seq_id", "k").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val m8 = mapping(8)
    assert(m8.map(_._1) == (0L until 500L), "ids not contiguous 0..N-1")
    assert(m8.map(_._2) == keys.sorted, "ids do not follow key order")
    // partition-count invariance: the mapping is a function of the
    // DATA (unique keys), never of the physical layout
    assert(mapping(3) == m8)
    assert(mapping(1) == m8)
    // the scale contract: no single-partition global window anywhere
    val plan = Curation.assignIds(df, "k").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"assignIds must never plan a global window:\n$plan")
  }

  test("epochIngest: exact dups die on the rolling fp store, near-dups on the rolling band store, order pinned per epoch") {
    import spark.implicits._
    val fresh2 = (enStop ++ (1 to 27).map("u" + _)).mkString(" ")
    val otherNear = other.replace("v14", "zz") // near-dup of `other`, same margin as nearDup/base
    val standing = Seq((1L, base)).toDF("doc_id", "text")
    val e1 = Seq((10L, base),      // exact dup of the STANDING corpus
                 (11L, nearDup),   // near-dup of the standing corpus
                 (12L, other),     // fresh
                 (13L, other))     // in-batch exact dup of 12 (min-id keeps 12)
      .toDF("doc_id", "text")
    val e2 = Seq((20L, other),     // exact dup of a doc ACCEPTED IN EPOCH 1
                 (21L, otherNear), // near-dup of a doc accepted in epoch 1
                 (22L, fresh2))    // fresh
      .toDF("doc_id", "text")
    val all = standing.unionByName(e1).unionByName(e2)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    def n(df: org.apache.spark.sql.DataFrame) = df.as[Long].head()

    val fwd = Curation.epochIngest(standing, Seq(e1, e2), all,
      "doc_id", "text", cacheTag = "spec/epoch/fwd")
    assert(n(fwd(0).nBatch) == 4 && n(fwd(0).nExact) == 2,
      "epoch 1 exact pass must drop the store dup AND the in-batch dup")
    assert(ids(fwd(0).accepted) == Set(12L))
    assert(ids(fwd(1).accepted) == Set(22L),
      "epoch 2 must drop both the exact and the NEAR dup of an epoch-1 accept — the rolling stores")

    // reversed epochs accept a DIFFERENT corpus: greedy near-dedup is
    // arrival-order-dependent, which is exactly why the gateable
    // contract is per-epoch (StreamIngest scaladoc / commit ec32f9f)
    val rev = Curation.epochIngest(standing, Seq(e2, e1), all,
      "doc_id", "text", cacheTag = "spec/epoch/rev")
    // 20/21 are now only batch-internal near-dups: both survive by policy
    assert(ids(rev(0).accepted) == Set(20L, 21L, 22L))
    // ...and the whole of e1 dies against the grown corpus (also the
    // empty-accept epoch path: empty checkpoint, empty store roll)
    assert(ids(rev(1).accepted) == Set.empty[Long])
    assert(ids(fwd(1).accepted) != ids(rev(0).accepted))
  }
}
