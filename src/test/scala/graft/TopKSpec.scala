package graft

import graft.functions.TopK
import org.apache.spark.sql.functions._

/** The k-heap Aggregator against the window-rank formulation on
  * random, tie-heavy data — same rows, same order, every group.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topK equals window rank on tie-heavy random data") {
    val rnd = new scala.util.Random(11)
    // scores drawn from a tiny range so k-th-place ties are common —
    // the case where a sloppy comparator diverges from the window
    val rows = (1L to 2000L).map(i => ("g" + (i % 7), i, rnd.nextInt(20).toLong))
    val df = rows.toDF("g", "id", "score").repartition(8)
    val got = df.groupBy("g")
      .agg(TopK.topK(3)(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rk"),
        col("col.id").as("id"), col("col.score").as("score"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("g", "rk", "id", "score")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(want.size == 21, "7 groups x top-3")
  }

  test("topK with k larger than the group returns the whole group, ordered") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 9L)).toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(TopK.topK(10)(col("score"), col("id")).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.score"), col("e.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((9L, 2L), (5L, 1L)))
  }
}
