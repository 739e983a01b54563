package graft

import org.apache.spark.sql.functions._

import graft.ext.Stats

/** Specs for the quantile paths: the exact path against a hand
  * computation, and the sketched 100 TB path against the exact path.
  */
class StatsSpec extends SparkSpec {

  test("exact quantiles use type-7 linear interpolation") {
    import spark.implicits._
    // values 1..5 in one group: p50 = 3 exactly, p75 = (5-1)*0.75 = 4
    val df = (1 to 5).map(v => ("g", v)).toDF("g", "v")
    val r = Stats.quantiles(df, Seq("g"), col("v"), Seq(0.5, 0.75))
      .select("p50", "p75").head()
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 4.0)
    // 1..4: p50 interpolates halfway between 2 and 3
    val r2 = Stats.quantiles((1 to 4).map(v => ("g", v)).toDF("g", "v"),
      Seq("g"), col("v"), Seq(0.5)).select("p50").head()
    assert(r2.getDouble(0) == 2.5)
  }

  test("approx quantiles track the exact path on a skewed distribution") {
    import spark.implicits._
    val df = spark.range(10000).toDF("id")
      .withColumn("g", col("id") % 2)
      .withColumn("v", (col("id") * col("id")) % 997)
    val exact = Stats.quantiles(df, Seq("g"), col("v"), Seq(0.5, 0.99))
      .orderBy("g").collect()
    val approx = Stats.approxQuantiles(df, Seq("g"), col("v"), Seq(0.5, 0.99))
      .orderBy("g").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e.getDouble(1) - a.getLong(1)) <= 20.0,
        s"p50 exact=${e.getDouble(1)} approx=${a.getLong(1)}")
      assert(math.abs(e.getDouble(2) - a.getLong(2)) <= 20.0,
        s"p99 exact=${e.getDouble(2)} approx=${a.getLong(2)}")
    }
  }

  test("HLL sketch estimates track exact distinct counts within error bounds") {
    import spark.implicits._
    // 3 groups with known distinct cardinalities 100 / 1000 / 5000;
    // each value appears 3x so n_rows != n_distinct everywhere
    val df = spark.range(3 * (100 + 1000 + 5000)).toDF("i")
      .withColumn("j", col("i") % (100 + 1000 + 5000))
      .withColumn("g", when(col("j") < 100, "a")
        .when(col("j") < 1100, "b").otherwise("c"))
      .withColumn("v", col("j"))
    val exact = Stats.cardinality(df, Seq("g"), col("v"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exact.toSeq == Seq(("a", 300L, 100L), ("b", 3000L, 1000L), ("c", 15000L, 5000L)))
    val est = Stats.hllSketches(df, Seq("g"), col("v"))
      .select(col("g"), hll_sketch_estimate(col("sketch")).as("est"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1)))
    exact.zip(est).foreach { case ((g, _, ex), (g2, ap)) =>
      assert(g == g2)
      // lgK=12 → relative standard error ~1.6%; allow 3 sigma
      assert(math.abs(ap - ex) <= math.max(3, 0.05 * ex),
        s"group $g exact=$ex est=$ap")
    }
  }

  test("profile: completeness, distinct, bounds, and strlen per column in one pass") {
    import spark.implicits._
    val df = Seq((1L, Option("aa"), 10L), (2L, Option.empty[String], 25L),
      (3L, Option("bbbb"), 10L)).toDF("id", "s", "v")
    val p = Stats.profile(df, Seq("id", "s", "v")).orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(p.toSeq == Seq(
      ("id", 3L, 0L, 3L, 1L, 3L, 1L),
      ("s", 3L, 1L, 2L, -1L, -1L, 4L),
      ("v", 3L, 0L, 2L, 10L, 25L, 2L)))
  }

  test("profileApprox tracks the exact profile (the no-Expand 100 TB path)") {
    import spark.implicits._
    val df = spark.range(10000).toDF("id")
      .withColumn("m", col("id") % 321)
    val exact = Stats.profile(df, Seq("id", "m")).orderBy("column").collect()
    val approx = Stats.profileApprox(df, Seq("id", "m")).orderBy("column").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      // only n_distinct is estimated; every other field is exact
      assert(math.abs(e.getLong(3) - a.getLong(3)) <= 0.05 * e.getLong(3),
        s"${e.getString(0)}: exact=${e.getLong(3)} approx=${a.getLong(3)}")
      assert(Seq(1, 2, 4, 5, 6).forall(i => e.getLong(i) == a.getLong(i)))
    }
  }

  test("histogram bins by integral division; tail bucket absorbs overflow") {
    import spark.implicits._
    val df = Seq(0L, 99L, 100L, 250L, 799L, 5000L).map(("g", _)).toDF("g", "v")
    val h = Stats.histogram(df, Seq("g"), col("v"), width = 100, nBuckets = 8)
      .orderBy("bucket")
      .select("bucket", "bucket_lo", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(h.toSeq == Seq((0L, 0L, 2L), (1L, 100L, 1L), (2L, 200L, 1L),
      (7L, 700L, 2L)))
  }

  test("psi: zero on identical samples, hand-computed on a known shift, floor on empty buckets") {
    import spark.implicits._
    def df(vs: Seq[Int]) = vs.toDF("v")
    // identical distributions → every term is exactly 0
    val same = df(Seq(1, 1, 5, 12, 18))
    val z = Stats.psi(same, same, col("v"), width = 10, nBuckets = 2)
      .collect().head
    assert(z.getLong(0) == 0L && z.getLong(1) == 5L && z.getLong(2) == 5L)
    // expected 8:2 vs actual 5:5 across two buckets — reference is the
    // same formula computed independently with Math.log
    val e = df(Seq.fill(8)(1) ++ Seq.fill(2)(11))
    val a = df(Seq.fill(5)(1) ++ Seq.fill(5)(11))
    def term(p: Double, q: Double): Long =
      math.round((p - q) * math.log(p / q) * 1e9)
    val got = Stats.psi(e, a, col("v"), width = 10, nBuckets = 2)
      .collect().head.getLong(0)
    assert(got == term(0.8, 0.5) + term(0.2, 0.5))
    // a bucket empty on one side hits the 1e-6 floor instead of ±inf
    val e2 = df(Seq.fill(10)(1))
    val a2 = df(Seq.fill(5)(1) ++ Seq.fill(5)(11))
    val got2 = Stats.psi(e2, a2, col("v"), width = 10, nBuckets = 2)
      .collect().head.getLong(0)
    assert(got2 == term(1.0, 0.5) + term(1e-6, 0.5))
    assert(got2 > 0L)
  }

  test("ks: hand-computed rational distance, zero on identical samples, ties convention") {
    import spark.implicits._
    def df(vs: Seq[(String, Int)]) = vs.toDF("g", "v")
    // identical samples → ks_num = 0 exactly
    val s = df(Seq(("x", 1), ("x", 5), ("x", 9)))
    val z = Stats.ks(s, s, Seq("g"), col("v")).collect().head
    assert(z.getLong(1) == 0L && z.getLong(2) == 9L)
    // a = {1,2,3,4}, b = {3,4,5,6}: cumA·nb − cumB·na peaks at v=2
    // (2·4 − 0·4 = 8) and v=6 symmetric; D = 8/16 = 1/2
    val a = df(Seq(1, 2, 3, 4).map(("x", _)))
    val b = df(Seq(3, 4, 5, 6).map(("x", _)))
    val r = Stats.ks(a, b, Seq("g"), col("v")).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((8L, 16L, 4L, 4L)))
    // ties count wholly at their value: a = {1,1}, b = {1,2} →
    // at v=1 cumA=2, cumB=1 → |2·2 − 1·2| = 2; at v=2 |4 − 4| = 0
    val ta = df(Seq(("x", 1), ("x", 1)))
    val tb = df(Seq(("x", 1), ("x", 2)))
    val t = Stats.ks(ta, tb, Seq("g"), col("v")).collect().head
    assert((t.getLong(1), t.getLong(2)) == ((2L, 4L)))
    // strata are independent rows
    val m = Stats.ks(
      df(Seq(("x", 1), ("y", 1))), df(Seq(("x", 1), ("y", 9))),
      Seq("g"), col("v"))
    assert(m.count() == 2)
    intercept[IllegalArgumentException] {
      Stats.ks(a, b, Seq.empty, col("v"))
    }
  }

  test("rollingZOutliers: exclusive trailing frame, same-ms peers excluded, minN gate, null propagates") {
    import spark.implicits._
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    val rows = Seq(
      ("k", t(1), Some(10L), "warm1"),   // n=0 → false (minN)
      ("k", t(2), Some(10L), "warm2"),   // n=1 → false (minN)
      ("k", t(3), Some(10L), "flat"),    // frame {10,10}: dev=0 → false
      // two rows at the SAME second: A's frame is {10,10,10} — its
      // 1000-valued peer must be excluded, else varN3 balloons and
      // the 16 would NOT flag (9·varN3 = 26 462 700 ≫ dev² = 324)
      ("k", t(4), Some(16L), "spikeA"),
      ("k", t(4), Some(1000L), "spikeB"),
      ("k", t(5), None, "nullrow"),
      ("x", t(4), Some(99L), "otherkey") // keys independent: n=0 → false
    ).toDF("k", "ts", "c", "tag")
    val got = Stats.rollingZOutliers(rows, Seq("k"), "ts", col("c"),
        windowMs = 100000L, minN = 2)
      .select("tag", "is_outlier")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getBoolean(1))).toMap
    assert(got("warm1") == false && got("warm2") == false)
    assert(got("flat") == false)
    assert(got("spikeA") == true,
      "same-ms peer leaked into the trailing frame")
    assert(got("spikeB") == true) // 1000 vs {10,10,10}, sigma=0
    assert(got("nullrow") == null)
    assert(got("otherkey") == false)
    intercept[IllegalArgumentException] {
      Stats.rollingZOutliers(rows, Seq("k"), "ts", col("c"), 1000L, minN = 1)
    }
  }

  test("ks: a stratum present in only one sample yields the 0/0 no-evidence row") {
    import spark.implicits._
    val a = Seq(("x", 1), ("y", 5)).toDF("g", "v")
    val b = Seq(("x", 2)).toDF("g", "v")
    val rows = Stats.ks(a, b, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // y exists only in a: every cumB is 0 and n_b = 0, so both the
    // numerator (|cumA·0 − 0·nA|) and denominator collapse to 0 —
    // "no evidence", not a spurious max-drift verdict
    assert(rows("y") == ((0L, 0L, 1L, 0L)))
    assert(rows("x")._2 == 1L) // 1·1 denominator on the shared stratum
  }

  test("keySkew: max vs percentile of per-key counts exposes the hot key") {
    import spark.implicits._
    val df = (Seq.fill(10)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(2)("d")).toDF("k")
    val r = Stats.keySkew(df, col("k")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 16L, 10L)))
    assert(r.getLong(3) == 200L) // p50 of [2,2,2,10] = 2
    // p99 type-7: h = 0.99*3 = 2.97 → 2 + 0.97*(10-2) = 9.76
    assert(r.getLong(4) == 976L)
    val approx = Stats.keySkew(df, col("k"), approxTail = true).head()
    assert((approx.getLong(0), approx.getLong(2)) == ((4L, 10L)))
  }

  test("corrExact: ±1e6 on affine data, NULL on zero variance, per group") {
    import spark.implicits._
    val df = (1 to 100).flatMap { i =>
      Seq(("pos", i, 2 * i + 3), ("neg", i, -i), ("flat", i, 7))
    }.toDF("g", "x", "y")
    val r = Stats.corrExact(df, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("flat", "neg", "pos"))
    assert(r.forall(_.getLong(1) == 100L))
    assert(r(0).isNullAt(2), "zero variance must yield NULL, not NaN")
    assert(r(1).getLong(2) == -1000000L && r(2).getLong(2) == 1000000L)
  }

  test("count-min sketch: one-sided error, within eps*N of exact word counts") {
    import spark.implicits._
    val words = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "")
    val exact = words.groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val eps = 0.01
    val cms = Stats.countMin(words, "w", eps = eps)
    exact.foreach { case (w, c) =>
      val est = cms.estimateCount(w)
      assert(est >= c, s"$w: CMS must never under-count ($est < $c)")
      assert(est <= c + (eps * n).toLong,
        s"$w: $est exceeds $c + eps*N (${(eps * n).toLong})")
    }
    assert(cms.totalCount() == n)
  }

  test("zOutlierFlags matches a BigInt brute force on random grouped data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // heavy-tailed: mostly uniform noise plus rare spikes — uniform
    // alone never clears 3σ (max dev ≈ 1.73σ), leaving the test vacuous
    val rows = (1 to 600).map { i =>
      val c = if (i % 97 == 0) 50000L else (rnd.nextInt(2001) - 1000).toLong
      ("g" + (i % 3), i.toLong, c)
    }
    val got = Stats.zOutlierFlags(rows.toDF("g", "id", "c"), Seq("g"), col("c"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("id")) ->
        r.getAs[Boolean]("__is_outlier")).toMap
    val byG = rows.groupBy(_._1)
    val want = rows.map { case (g, id, c) =>
      val cs = byG(g).map(_._3.toLong)
      val (n, s, q) = (BigInt(cs.size), BigInt(cs.sum), cs.map(x => BigInt(x) * x).sum)
      val dev = n * c - s
      (g, id) -> (dev * dev > 9 * (n * q - s * s))
    }.toMap
    assert(got == want)
    assert(want.values.exists(identity), "fixture should contain some outlier")
    assert(!want.values.forall(identity))
  }

  test("zOutlierFlags: constant group (sigma = 0) flags nothing") {
    import spark.implicits._
    val df = (1 to 50).map(i => ("k", i.toLong, 42L)).toDF("g", "id", "c")
    val flags = Stats.zOutlierFlags(df, Seq("g"), col("c"))
      .agg(sum(when(col("__is_outlier"), 1L).otherwise(0L))).head().getLong(0)
    assert(flags == 0L)
  }

  test("zOutlierFlags preserves rows with a NULL group key and emits a clean schema") {
    import spark.implicits._
    val df = Seq((Some("k"), 1L, 10L), (None, 2L, 20L), (None, 3L, 30L))
      .toDF("g", "id", "c")
    val out = Stats.zOutlierFlags(df, Seq("g"), col("c"))
    // a flag-appending operator must not change the row count — the
    // null group is a group, not a discard
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("g", "id", "c", "__is_outlier"),
      s"no working columns may leak: ${out.columns.toSeq}")
  }

  test("zOutlierFlags moments use the NON-NULL population; null measures get null flags") {
    import spark.implicits._
    // 2 real values (10, 0) + 9 null rows in one group: all-rows n=11
    // would bias the moments (dev² 10000 > 9·(11·100−100)=9000 flags
    // 10 as an outlier); correct n=2 gives μ=5, σ=5 → 10 is at 1σ
    val rows = Seq((1L, Some(10L)), (2L, Some(0L))) ++
      (3L to 11L).map(i => (i, Option.empty[Long]))
    val df = rows.toDF("id", "v").withColumn("g", lit("k"))
    val out = Stats.zOutlierFlags(df, Seq("g"), col("v")).collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("__is_outlier"))) None
         else Some(r.getBoolean(r.fieldIndex("__is_outlier"))))).toMap
    assert(out(1L) == Some(false) && out(2L) == Some(false),
      s"non-null values judged against the non-null population: $out")
    (3L to 11L).foreach(i => assert(out(i).isEmpty, "null measure -> null flag"))
  }

  test("zOutlierFlags rejects inputs that already carry its reserved column names") {
    import spark.implicits._
    val df = Seq(("k", 1L)).toDF("g", "__is_outlier")
    val e = intercept[IllegalArgumentException] {
      Stats.zOutlierFlags(df, Seq("g"), col("__is_outlier"))
    }
    assert(e.getMessage.contains("__is_outlier"))
  }

  test("zOutlierFlags fails loudly on moment overflow instead of flagging NULL as non-outlier") {
    import spark.implicits._
    // values near Long.Max: Σx² overflows DECIMAL(38,0)'s product
    // precision headroom (x² ≈ 8.5e37 each, n·q product exceeds 38
    // digits). Under default ANSI the arithmetic throws; in a
    // non-ANSI session the products go NULL and the operator's guard
    // must raise rather than let when(__is_outlier,…) read NULL as
    // "not an outlier".
    val big = Seq(("k", Long.MaxValue / 2), ("k", Long.MaxValue / 2 - 1),
      ("k", Long.MaxValue / 3)).toDF("g", "v")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e = intercept[Exception] {
        Stats.zOutlierFlags(big, Seq("g"), col("v")).collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains("zOutlierFlags") || msgs.contains("overflow"),
        s"expected a loud overflow failure, got: $msgs")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }

  test("HLL sketches union losslessly: merged per-group sketches estimate the global distinct") {
    import spark.implicits._
    // overlapping groups: global distinct (2000) < sum of per-group
    // distincts (3000), so a union that double-counted would miss
    val df = spark.range(4000).toDF("i")
      .withColumn("g", when(col("i") % 2 === 0, "x").otherwise("y"))
      .withColumn("v", col("i") % 2000) // x sees even→..., both overlap
    val sketches = Stats.hllSketches(df, Seq("g"), col("v"))
    val merged = Stats.hllUnion(sketches).head()
    assert(merged.getLong(0) == 2)
    val globalExact = 2000.0
    assert(math.abs(merged.getLong(1) - globalExact) <= 0.05 * globalExact,
      s"merged estimate ${merged.getLong(1)} vs exact $globalExact")
  }

  test("joinCardinality predicts the exact join size, flags the hot key, skips nulls") {
    import spark.implicits._
    val a = Seq(Some(1L), Some(1L), Some(1L), Some(2L), Some(3L), None)
      .toDF("k")
    val b = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None).toDF("k")
    val r = Stats.joinCardinality(a, "k", b, "k").collect().head
    // products: key 1 → 3·2 = 6, key 2 → 1·1 = 1; keys 3, 9, null drop
    assert(r.getAs[Long]("join_rows") == 7L)
    assert(r.getAs[Long]("n_shared_keys") == 2L)
    assert(r.getAs[Long]("hot_key") == 1L)
    assert(r.getAs[Long]("hot_product") == 6L)
    // the prediction IS the realized inner-join size
    val real = a.where(col("k").isNotNull)
      .join(b.where(col("k").isNotNull), "k").count()
    assert(real == 7L)
  }

  test("joinCardinality hot-key product ties break to the larger key") {
    import spark.implicits._
    val a = Seq(1L, 2L).toDF("k")
    val r = Stats.joinCardinality(a, "k", a, "k").collect().head
    assert(r.getAs[Long]("hot_key") == 2L)
    assert(r.getAs[Long]("hot_product") == 1L)
  }

  test("checkConstraints: hand-counted violations per rule, nulls per contract") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a"), Some("x1")),
      (Some(1L), Some("b"), Some("x2")),   // dup id
      (None, Some("c"), None),             // null id; null code skips set+regex
      (Some(9L), Some("a"), Some("zz")))   // out of range; no digit
      .toDF("id", "cat", "code")
    val out = Stats.checkConstraints(df, Seq(
        Stats.Check.notNull("id"),
        Stats.Check.unique("id"),
        Stats.Check.inRange("id", 0L, 5L),
        Stats.Check.inSet("cat", Seq("a", "b")),
        Stats.Check.matches("code", "[0-9]")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val m = out
    assert(m("not_null:id") == (1L, 0))
    assert(m("unique:id") == (1L, 0))   // nulls excluded from uniqueness
    assert(m("range:id") == (1L, 0))    // null id not a range violation
    assert(m("in_set:cat") == (1L, 0))  // 'c'
    assert(m("matches:code") == (1L, 0)) // 'zz'; null code skipped
  }

  test("checkConstraints passes clean data and rejects duplicate rule names") {
    import spark.implicits._
    val df = Seq(Tuple1(1L), Tuple1(2L)).toDF("id")
    val out = Stats.checkConstraints(df,
        Seq(Stats.Check.notNull("id"), Stats.Check.unique("id")))
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(out.forall(_ == (0L, 1)))
    intercept[IllegalArgumentException] {
      Stats.checkConstraints(df,
        Seq(Stats.Check.notNull("id"), Stats.Check.notNull("id")))
    }
  }

  test("chiSquare matches the hand-computed 2x2 contingency statistic") {
    import spark.implicits._
    // cohort a: 30×x + 10×y; cohort b: 10×x + 30×y. Every expected
    // cell is 20, every (o−e)²/e term is 5 → chi2 = 4·5 = 20 exactly
    // (integer-representable, so the e9 rounding is exact too)
    val rows = Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(30)(("b", "y"))
    val df = rows.toDF("cohort", "cat")
    val r = Stats.chiSquare(df, col("cohort") === "a", col("cat"))
      .collect().head
    assert((r.getAs[Long]("chi2_e9"), r.getAs[Long]("dof"),
      r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) ==
      (20L * 1000000000L, 1L, 40L, 40L))
  }

  test("chiSquare on identical cohort distributions is exactly zero") {
    import spark.implicits._
    val rows = for { c <- Seq("a", "b"); cat <- Seq("x", "y", "z");
                     _ <- 1 to 7 } yield (c, cat)
    val r = Stats.chiSquare(rows.toDF("cohort", "cat"),
        col("cohort") === "a", col("cat"))
      .collect().head
    assert(r.getAs[Long]("chi2_e9") == 0L)
    assert(r.getAs[Long]("dof") == 2L)
  }
}
