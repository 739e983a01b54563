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
}
