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
}
