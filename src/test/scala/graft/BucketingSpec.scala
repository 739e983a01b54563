package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY §7.5 scale discipline;
  * prompt: "repartition()/bucketing for co-located joins"): writing
  * both join sides bucketed on the join key lets the sort-merge join
  * read matching buckets directly — NO shuffle exchange at query
  * time, which at 100 TB removes the dominant cost of a repeated
  * fact-to-fact join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero shuffle exchanges") {
    val sfDir = "/root/testdata/sf0.001"
    Tables.orders(spark, sfDir)
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bucketed")
    Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("customer_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the assertion is about bucketing,
      // not about a broadcast hiding the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"), "o_custkey")
      val n = joined.count()
      assert(n == Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir),
          col("o_custkey") === col("c_custkey")).count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free bucketed join, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
