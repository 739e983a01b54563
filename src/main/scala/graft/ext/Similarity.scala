package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), north_star capability.
  *
  *  - Brute-force cosine top-k: the exactness baseline. Queries are
  *    broadcast; the corpus is scanned once; per-query top-k via a
  *    rank window. Cost O(|Q|·N·d) — fine for |Q| small at any N.
  *  - LSH-bucketed variant (the scale path): 8 deterministic random
  *    hyperplanes → 8-bit bucket; candidates = same bucket, so the
  *    corpus×corpus product never materializes. Recall traded for a
  *    ~2^8 cost reduction; multi-probe would recover recall.
  *
  * Dot products use `functions.aggregate`/`zip_with` (codegen'd
  * higher-order functions) — no UDF.
  */
object Similarity {

  /** cos(a,b) for two array<float/double> columns. Embeddings in the
    * testdata are L2-normalized, so the dot product IS the cosine, but
    * we normalize anyway for generality.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Exact brute-force top-k: for each row of `queries` (idCol, vecCol),
    * the k nearest corpus rows by cosine. Queries must be small enough
    * to broadcast (the usual ANN serving shape).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for (plane i,
    * dim j): md5-derived value in [-500, 500] / 500. Reproducible
    * across runs and engines — no RNG state.
    */
  private def planeComponent(i: Column, j: Column): Column =
    (Hashing.h32(concat(i.cast("string"), lit("_"), j.cast("string"))) % 1001 - 500)
      .cast("double") / 500.0

  /** Sign-random-projection bucket id (nPlanes bits) per row. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String, nPlanes: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val planes = broadcast(
      spark.range(nPlanes).select(col("id").cast("int").as("i"))
        .crossJoin(spark.range(64).select(col("id").cast("int").as("j")))
        .select(col("i"), col("j"), planeComponent(col("i"), col("j")).as("pc")))
    df.select(col(idCol).as("vid"), posexplode(col(vecCol)).as(Seq("j", "x")))
      .join(planes, "j")
      .groupBy("vid", "i").agg(sum(col("x") * col("pc")).as("proj"))
      .groupBy("vid")
      .agg(sum(when(col("proj") >= 0, expr("shiftleft(1, i)")).otherwise(0)).as("bucket"))
  }

  /** ANN top-k restricted to same-LSH-bucket candidates. Each bucket's
    * candidate set is joined co-partitioned on the bucket id — the
    * full cross product never forms.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int, nPlanes: Int = 8): DataFrame = {
    val cb = lshBuckets(corpus, idCol, vecCol, nPlanes)
    val qb = lshBuckets(queries, idCol, vecCol, nPlanes)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .join(qb.withColumnRenamed("vid", "query_id"), "query_id")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .join(cb.withColumnRenamed("vid", "neighbor_id"), "neighbor_id")
    val scored = q.join(c, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
