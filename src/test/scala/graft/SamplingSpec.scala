package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ext.Sampling

/** Specs for deterministic hash sampling/splitting: membership is
  * recomputed independently with java MessageDigest (not Spark, not
  * DuckDB), so the library's bucket formula is pinned against a third
  * implementation.
  */
class SamplingSpec extends SparkSpec {

  private def refBucket(key: String, den: Int, salt: String = ""): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest((key + salt).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % den
  }

  private def ids = {
    import spark.implicits._
    spark.range(1000).toDF("id")
  }

  test("byHash keeps exactly the rows the reference md5 formula keeps") {
    import spark.implicits._
    val kept = Sampling.byHash(ids, col("id"), num = 100, den = 1000, salt = "s1")
      .select("id").as[Long].collect().toSet
    val expected = (0L until 1000L).filter(i =>
      refBucket(i.toString, 1000, "s1") < 100).toSet
    assert(kept == expected)
    assert(kept.nonEmpty && kept.size < 1000)
  }

  test("withSplit is disjoint, exhaustive, and matches reference buckets") {
    import spark.implicits._
    val sp = Sampling.withSplit(ids, col("id"), valPct = 10, testPct = 20)
    val byRow = sp.select(col("id"), col("split")).as[(Long, String)].collect()
    assert(byRow.length == 1000)
    byRow.foreach { case (i, s) =>
      val b = refBucket(i.toString, 100, "split")
      val exp = if (b < 10) "val" else if (b < 30) "test" else "train"
      assert(s == exp, s"id=$i bucket=$b")
    }
  }

  test("stratifiedKeep applies per-stratum rates with default fallback") {
    import spark.implicits._
    val df = spark.range(2000).toDF("id")
      .withColumn("src", when(col("id") % 2 === 0, "web").otherwise("books"))
    val kept = Sampling.stratified(df, col("id"), col("src"),
        Seq("web" -> 200), defaultPerMille = 1000)
      .select("id", "src").as[(Long, String)].collect()
    // every books row survives (default 1000‰); web rows only under 200‰
    assert(kept.count(_._2 == "books") == 1000)
    val keptWeb = kept.collect { case (i, "web") => i }.toSet
    val expWeb = (0L until 2000L by 2).filter(i =>
      refBucket(i.toString, 1000, "strat") < 200).toSet
    assert(keptWeb == expWeb)
  }

  test("reservoirPerStratum: exact k per stratum, growth displaces at most the new arrivals") {
    import spark.implicits._
    val base = spark.range(500).toDF("id")
      .withColumn("g", when(col("id") % 2 === 0, "a").otherwise("b"))
    def sample(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.reservoirPerStratum(df, Seq("g"), col("id"), k = 25)
        .select("id").as[Long].collect().toSet
    val s1 = sample(base)
    assert(s1.size == 50) // 25 per stratum, both strata full
    // deterministic under repartition/order changes
    assert(sample(base.repartition(13).orderBy(col("id").desc)) == s1)
    // corpus growth: old members stay unless displaced by a NEW row
    // with a smaller hash — never reshuffled among themselves
    val grown = base.union(spark.range(500, 600).toDF("id")
      .withColumn("g", when(col("id") % 2 === 0, "a").otherwise("b")))
    val s2 = sample(grown)
    assert(s2.size == 50)
    assert((s2 -- s1).forall(_ >= 500L))
    assert((s1 -- s2).size == (s2 -- s1).size)
  }

  test("weightedReservoirPerStratum: matches a naive hash-div-weight oracle; equal weights reduce to hash order") {
    import spark.implicits._
    val base = spark.range(1, 401).toDF("id")
      .withColumn("g", when(col("id") % 2 === 0, "a").otherwise("b"))
      .withColumn("w", (col("id") % 7 + 1).cast("long"))
    def md5h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val got = Sampling.weightedReservoirPerStratum(base, Seq("g"),
        col("id"), col("w"), k = 10)
      .select("id").as[Long].collect().toSet
    // naive in-memory replay of the integer priority
    val naive = (1L until 401L).map { id =>
      (if (id % 2 == 0) "a" else "b", id, md5h32(id.toString + "wres") / (id % 7 + 1))
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(10).map(_._2)
    }.toSet
    assert(got == naive, s"got ${got.toSeq.sorted}\nvs  ${naive.toSeq.sorted}")
    assert(got.size == 20)
    // deterministic under repartition/order changes
    val again = Sampling.weightedReservoirPerStratum(
        base.repartition(7).orderBy(col("id").desc), Seq("g"),
        col("id"), col("w"), k = 10)
      .select("id").as[Long].collect().toSet
    assert(again == got)
    // constant weight ⇒ priority is monotone in the hash ⇒ identical
    // membership to the unweighted reservoir at the same salt
    val equalW = Sampling.weightedReservoirPerStratum(
        base.withColumn("w", lit(1L)), Seq("g"), col("id"), col("w"), k = 10)
      .select("id").as[Long].collect().toSet
    val unweighted = Sampling.reservoirPerStratum(base, Seq("g"), col("id"),
        k = 10, salt = "wres")
      .select("id").as[Long].collect().toSet
    assert(equalW == unweighted)
  }

  test("packBins assigns docs to budget bins by prefix sum within each shard") {
    import spark.implicits._
    val docs = Seq(
      ("en", 1L, 60), ("en", 2L, 50), ("en", 3L, 40), ("en", 4L, 10),
      ("de", 5L, 90), ("de", 6L, 20)
    ).toDF("lang", "doc_id", "n_tokens")
    val bins = Sampling.packBins(docs, Seq("lang"), col("doc_id"),
        col("n_tokens"), budget = 100)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // en prefix-before: 0, 60, 110, 150 → bins 0, 0, 1, 1; de: 0, 90 → 0, 0
    assert(bins == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 0L, 6L -> 0L))
    intercept[IllegalArgumentException] {
      Sampling.packBins(docs, Seq.empty, col("doc_id"), col("n_tokens"), 100)
    }
  }

  test("tokenBudget keeps the hash-order prefix under budget; growth only evicts") {
    import spark.implicits._
    def refRank(i: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest((i.toString + "budget").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val base = spark.range(200).toDF("id")
      .withColumn("g", (col("id") % 2).cast("string"))
      .withColumn("toks", col("id") % 17 + 5)
    def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.tokenBudget(df, Seq("g"), col("id"), col("toks"), budget = 100)
        .select("id").as[Long].collect().toSet
    val k1 = kept(base)
    // reference: per group, walk ids by (md5 rank, id); keep while the
    // EXCLUSIVE token prefix is under budget
    val exp = (0L until 200L).groupBy(_ % 2).flatMap { case (_, ids) =>
      val ordered = ids.sortBy(i => (refRank(i), i))
      val prefix = ordered.scanLeft(0L)((acc, i) => acc + (i % 17 + 5)).init
      ordered.zip(prefix).collect { case (i, p) if p < 100 => i }
    }.toSet
    assert(k1 == exp)
    assert(k1.nonEmpty && k1.size < 200)
    // stable under growth: new rows only push tokens IN FRONT of old
    // rows, so an old row can be evicted but never newly admitted
    val grown = base.union(spark.range(200, 260).toDF("id")
      .withColumn("g", (col("id") % 2).cast("string"))
      .withColumn("toks", col("id") % 17 + 5))
    assert((kept(grown) & (0L until 200L).toSet).subsetOf(k1))
    intercept[IllegalArgumentException] {
      Sampling.tokenBudget(base, Seq.empty, col("id"), col("toks"), 100)
    }
  }

  test("temperedTokenBudget: isqrt shares, prefix membership, tail upsampled") {
    import spark.implicits._
    def refRank(i: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest((i.toString + "mix").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    // skewed strata: 'a' 100 rows, 'b' 9 → weights isqrt = 10 and 3,
    // so 'b' gets 3/13 ≈ 23% of the budget vs its 8% natural share
    val df = spark.range(100).toDF("id").withColumn("g", lit("a"))
      .union(spark.range(1000, 1009).toDF("id").withColumn("g", lit("b")))
      .withColumn("toks", lit(7L))
    val kept = Sampling.temperedTokenBudget(df, Seq("g"), col("id"),
        col("toks"), totalBudget = 130L)
      .select("id").as[Long].collect().toSet
    // reference: target_g = 130·w div 13; per group walk ids by
    // (md5 rank, id), keep while the exclusive 7-token prefix < target
    val groups = Map("a" -> (0L until 100L), "b" -> (1000L until 1009L))
    val weights = groups.map { case (g, ids) => g -> math.sqrt(ids.size).toLong }
    val wsum = weights.values.sum
    val exp = groups.flatMap { case (g, ids) =>
      val target = 130L * weights(g) / wsum
      ids.sortBy(i => (refRank(i), i)).zipWithIndex
        .collect { case (i, idx) if 7L * idx < target => i }
    }.toSet
    assert(kept == exp)
    // 'b' kept strictly more than its proportional share of the
    // admitted docs would be (23% of the budget vs 8% of the corpus)
    val bKept = kept.count(_ >= 1000L)
    assert(bKept.toDouble / kept.size > 9.0 / 109.0)
    assert(kept.size < 109)
    intercept[IllegalArgumentException] {
      Sampling.temperedTokenBudget(df, Seq.empty, col("id"), col("toks"), 100L)
    }
  }

  test("temperedRepeats: head stays at 1, tail factors are the exact ceil, epochs tag every repeat") {
    import spark.implicits._
    // 'a' 100 rows, 'b' 9: w = (10, 3), N = 109, Σw = 13
    // f_a = ceil(10·109 / (13·100)) = ceil(1090/1300) = 1
    // f_b = ceil(3·109 / (13·9)) = ceil(327/117) = 3
    val df = spark.range(100).toDF("id").withColumn("g", lit("a"))
      .union(spark.range(1000, 1009).toDF("id").withColumn("g", lit("b")))
    val out = Sampling.temperedRepeats(df, Seq("g"))
      .select("g", "id", "epoch")
      .as[(String, Long, Long)].collect()
    val byG = out.groupBy(_._1)
    assert(byG("a").size == 100 && byG("a").forall(_._3 == 0L))
    assert(byG("b").size == 27) // 9 rows × factor 3
    // each tail row appears exactly once per epoch 0,1,2
    (1000L until 1009L).foreach { id =>
      assert(byG("b").filter(_._2 == id).map(_._3).sorted.toSeq == Seq(0L, 1L, 2L))
    }
    intercept[IllegalArgumentException] {
      Sampling.temperedRepeats(df, Seq.empty)
    }
  }

  test("temperedTokenBudget weighByTokens: mass-based weights shift shares toward long-doc strata") {
    import spark.implicits._
    // 'a': 64 docs of 1 token (mass 64); 'b': 4 docs of 100 tokens
    // (mass 400). By COUNT, w = (8, 2) → b gets 2/10 of the budget;
    // by MASS, w = (8, 20) → b gets 20/28. Same corpus, opposite head.
    val df = spark.range(64).toDF("id").withColumn("g", lit("a"))
        .withColumn("toks", lit(1L))
      .union(spark.range(1000, 1004).toDF("id").withColumn("g", lit("b"))
        .withColumn("toks", lit(100L)))
    def keptTokens(byTokens: Boolean): Map[String, Long] =
      Sampling.temperedTokenBudget(df, Seq("g"), col("id"), col("toks"),
          totalBudget = 200L, weighByTokens = byTokens)
        .groupBy("g").agg(sum(col("toks")).as("t"))
        .as[(String, Long)].collect().toMap
    val byCount = keptTokens(byTokens = false)
    val byMass = keptTokens(byTokens = true)
    // count weights: target_b = 200·2 div 10 = 40 → 0 full docs of 100
    // survive beyond the always-kept first (prefix 0 < 40) → exactly 1
    assert(byCount("b") == 100L)
    // mass weights: target_b = 200·20 div 28 = 142 → first doc
    // (prefix 0) and second (prefix 100 < 142) survive
    assert(byMass("b") == 200L)
    assert(byMass.getOrElse("a", 0L) < byCount("a"))
  }

  test("temperedTokenBudget: a stratum whose integer share rounds to zero is dropped whole") {
    import spark.implicits._
    // budget 3 over weights (10, 3): target_a = 3·10 div 13 = 2,
    // target_b = 3·3 div 13 = 0 — integer shares are floor division,
    // so a stratum can price out entirely under a tiny budget; that
    // must surface as zero rows, never a negative-prefix artifact
    val df = spark.range(100).toDF("id").withColumn("g", lit("a"))
      .union(spark.range(1000, 1009).toDF("id").withColumn("g", lit("b")))
      .withColumn("toks", lit(1L))
    val kept = Sampling.temperedTokenBudget(df, Seq("g"), col("id"),
        col("toks"), totalBudget = 3L)
      .select("g").as[String].collect()
    assert(kept.count(_ == "a") == 2 && !kept.contains("b"))
  }

  test("curriculumBuckets: ntile remainder leads, strata independent, order respected") {
    import spark.implicits._
    // stratum 'a': 10 rows → ntile(4) sizes 3,3,2,2 with the extra
    // rows in the LEADING stages; 'b': 4 rows → one per stage
    val df = (0 until 10).map(i => ("a", i)).toDF("g", "v")
      .union(Seq(("b", 100), ("b", 101), ("b", 102), ("b", 103)).toDF("g", "v"))
    val got = Sampling.curriculumBuckets(df, Seq("g"), Seq(col("v")), 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val expA = Seq(0, 1, 2).map(("a", _, 1)) ++ Seq(3, 4, 5).map(("a", _, 2)) ++
      Seq(6, 7).map(("a", _, 3)) ++ Seq(8, 9).map(("a", _, 4))
    val expB = Seq(100, 101, 102, 103).zip(1 to 4).map { case (v, s) => ("b", v, s) }
    assert(got == (expA ++ expB).toSet)
    intercept[IllegalArgumentException] {
      Sampling.curriculumBuckets(df, Seq.empty, Seq(col("v")), 4)
    }
  }

  test("independent salts decorrelate decisions on the same key") {
    import spark.implicits._
    val both = ids.select(
        Sampling.hashBucket(col("id"), 100, "a").as("ba"),
        Sampling.hashBucket(col("id"), 100, "b").as("bb"))
      .as[(Long, Long)].collect()
    assert(both.exists { case (a, b) => a != b })
  }
}
