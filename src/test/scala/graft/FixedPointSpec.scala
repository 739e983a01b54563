package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the [[FixedPoint]] overflow contract (SURVEY §2.4 DQ9 scale
  * note): under Spark 4's default ANSI mode the fast long-cents path
  * fails loudly once a group's cents sum passes Long.MaxValue (it
  * wraps silently only if a caller disables ANSI), while
  * [[FixedPoint.sumCentsExact]] (DECIMAL(38,0) accumulation) stays
  * exact — the documented escape hatch for ~1e18-cent groups at
  * 100 TB.
  */
class FixedPointSpec extends SparkSpec {

  test("sumCents and sumCentsExact agree on in-range 2-decimal values") {
    import spark.implicits._
    val vals = Seq(0.01, 123.45, 99999.99, 0.0, 7.30, 1e9 + 0.25)
    val df = vals.map(("k", _)).toDF("k", "v")
    val row = df.groupBy("k").agg(
        FixedPoint.outCents(FixedPoint.sumCents(col("v"))).as("fast"),
        FixedPoint.outCents(FixedPoint.sumCentsExact(col("v"))).as("exact"))
      .head()
    val want = (BigDecimal(vals.map(v => math.round(v * 100)).sum) / 100).toDouble
    assert(row.getDouble(1) == want)
    assert(row.getDouble(2) == want)
  }

  test("near-Long.Max group: ANSI long cents fail loudly, DECIMAL(38,0) stays exact") {
    import spark.implicits._
    // 11 × 9e15 currency units = 9.9e18 cents > Long.MaxValue ≈ 9.22e18.
    // 9e15 and 9e17 are exactly representable doubles, so the cents
    // extraction itself is lossless — only the accumulation differs.
    val df = Seq.fill(11)(("k", 9.0e15)).toDF("k", "v")
    val exactCents = BigDecimal("9900000000000000000")
    assert(exactCents > BigDecimal(Long.MaxValue))

    // default ANSI mode: the fast path cannot diverge silently — it throws
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    // surfaces as SparkArithmeticException (extends ArithmeticException,
    // not SparkException), sometimes job-wrapped — match on the error class
    val e = intercept[Exception] {
      df.groupBy("k").agg(FixedPoint.sumCents(col("v")).as("fast")).collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.getMessage.contains("ARITHMETIC_OVERFLOW")))

    // the DECIMAL(38,0) path returns the true sum regardless of mode
    val exactRow = df.groupBy("k")
      .agg(FixedPoint.sumCentsExact(col("v")).as("exact")).head()
    assert(BigDecimal(exactRow.getDecimal(1)) == exactCents)

    // legacy non-ANSI sessions are the only silent-wrap regime — pin it
    // so the doc's warning stays truthful
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val wrapped = df.groupBy("k")
        .agg(FixedPoint.sumCents(col("v")).as("fast")).head().getLong(1)
      assert(wrapped < 0 && BigDecimal(wrapped) != exactCents,
        "non-ANSI two's-complement wrap goes negative here")
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }
}
