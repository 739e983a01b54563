package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.DotProduct.dot

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), north_star capability.
  *
  *  - Brute-force cosine top-k: the exactness baseline. Queries are
  *    broadcast; the corpus is scanned once; per-query top-k via a
  *    rank window. Cost O(|Q|·N·d) — fine for |Q| small at any N.
  *  - Banded multi-table sign-random-projection LSH (a scale path):
  *    T independent tables × P hyperplanes each (AND within a table,
  *    OR across tables — the classic LSH amplification). Candidates =
  *    pairs sharing a bucket in ANY table, so the corpus×corpus
  *    product never forms; recall rises with T, precision with P.
  *    Tune P ≈ log2(n) so expected random-collision candidates stay
  *    ~n per table at any corpus size; raise T (or multiprobe) for
  *    recall.
  *  - IVF (inverted file, the other scale path): k centroids trained
  *    by a distributed Lloyd's k-means; corpus rows are assigned to
  *    their nearest centroid (one pure-projection argmax over k
  *    native dot products), queries probe the `nprobe` nearest
  *    centroid lists. Candidate cost ≈ N·nprobe/k per query.
  *
  * The hyperplanes are deterministic (md5-derived, matching
  * [[Hashing.h32]]) and are baked into the plan as ARRAY LITERALS, so
  * bucket assignment is a pure whole-stage-codegen projection over the
  * vector column — no explode, no join, no aggregation, nothing
  * shuffles until the bucket-join itself. Dot products use
  * `zip_with`/`aggregate` (codegen'd higher-order functions) — no UDF.
  */
object Similarity {

  /** cos(a,b) for two array<float/double> columns. Embeddings in the
    * testdata are L2-normalized, so the dot product IS the cosine, but
    * we normalize anyway for generality.
    */
  def cosine(a: Column, b: Column): Column = {
    // cast to double FIRST: float32 products would round at ~1e-7 and
    // diverge from any double-math oracle near score thresholds
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / sqrt(dot(ad, ad)) / sqrt(dot(bd, bd))
  }

  /** (id, unit-norm double vector) projection of `df`: the norm is
    * computed once per row into a column, then divided out — pair
    * scoring downstream needs ONE dot product instead of three
    * (dot(a,b), dot(a,a), dot(b,b)), which matters because
    * higher-order-function lambdas evaluate interpreted, not
    * codegen'd: at millions of candidate pairs the two norm dots are
    * two thirds of the scoring CPU.
    */
  def normalized(df: DataFrame, idCol: String, vecCol: String,
                 outId: String, outVec: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as(outId), v.as("__v"))
      .withColumn("__nrm", sqrt(dot(col("__v"), col("__v"))))
      .select(col(outId),
        transform(col("__v"), x => x / col("__nrm")).as(outVec))
  }

  /** Dot product of two unit vectors = their cosine (native codegen'd
    * [[graft.functions.DotProduct]]).
    */
  def unitDot(a: Column, b: Column): Column = dot(a, b)

  /** Exact brute-force top-k: for each row of `queries` (idCol, vecCol),
    * the k nearest corpus rows by cosine. Queries must be small enough
    * to broadcast (the usual ANN serving shape).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(normalized(queries, idCol, vecCol, "query_id", "qv"))
    val c = normalized(corpus, idCol, vecCol, "neighbor_id", "cv")
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        unitDot(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** Int8-range quantization of a float embedding: q = clamp(
    * floor(x·127 + 0.5), −127, 127). `floor(+0.5)` instead of round —
    * round's half-even vs half-away conventions differ across engines,
    * floor does not; float→double widening and the double multiply are
    * IEEE-exact, so the quantized ints are bit-identical everywhere.
    * At 100 TB this is the storage/bandwidth path: vectors written
    * once as 1-byte-per-dim columns are 4× smaller to scan, and all
    * downstream scoring is exact integer arithmetic (no float noise,
    * no cross-engine threshold games).
    */
  def quantizeI8(vec: Column): Column =
    transform(vec, x =>
      greatest(lit(-127L), least(lit(127L),
        floor(x.cast("double") * 127d + 0.5d))))

  /** Exact integer dot product of two quantized vectors — the native
    * codegen'd [[graft.functions.DotProductLong]] (the interpreted HOF
    * `aggregate(zip_with(..))` form it replaced is the differential
    * baseline in DedupSimilaritySpec). Overflow-free by construction:
    * |q| ≤ 127, so dim·127² ≤ 2^24 for any dim ≤ 1024.
    */
  def quantizedDot(a: Column, b: Column): Column =
    graft.functions.DotProductLong.dot(a, b)

  /** Brute-force top-k in the quantized domain: [[bruteForceTopK]]'s
    * shape (broadcast queries, one corpus scan, per-query rank window)
    * over [[quantizeI8]] vectors and [[quantizedDot]] scores. Integer
    * scores make the FULL ranking deterministic (ties broken by
    * neighbor id) — the listing itself is engine-portable, not just a
    * margin-cleared projection of it. In a stored pipeline the corpus
    * side reads pre-quantized vectors; quantizing in the scan here
    * keeps the operator self-contained against float inputs.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      quantizeI8(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantizeI8(col(vecCol)).as("cv"))
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        quantizedDot(col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Deterministic pseudo-random hyperplane component for (global
    * plane i, dim j): md5-derived value in [-1, 1], identical to the
    * SQL `(CAST('0x' || substr(md5(i || '_' || j), 1, 8) AS BIGINT)
    * % 1001 - 500) / 500.0` — reproducible across runs and engines.
    * Computed driver-side so planes become plan literals.
    */
  def planeComponent(i: Int, j: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${i}_$j".getBytes("UTF-8"))
    val hex = digest.take(4).map(b => f"${b & 0xff}%02x").mkString
    ((java.lang.Long.parseLong(hex, 16) % 1001L) - 500L).toDouble / 500.0
  }

  /** Bucket id (P sign bits) of `vecCol` under table `t`'s planes
    * (global plane indices t*P .. t*P+P-1) — a pure projection.
    */
  def bucketExpr(vecCol: Column, t: Int, planesPerTable: Int, dim: Int): Column =
    (0 until planesPerTable).map { p =>
      val plane = (0 until dim).map(j => planeComponent(t * planesPerTable + p, j))
      val proj = dot(vecCol.cast("array<double>"), typedlit(plane))
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** One row per (vector, table): (vid, tbl, bucket). The explode is
    * over a T-element literal-built array — row count ×T, but each row
    * is 24 bytes; the vectors themselves are not duplicated.
    */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
                 nTables: Int = 4, planesPerTable: Int = 12, dim: Int = 64): DataFrame = {
    val tb = array((0 until nTables).map(t =>
      struct(lit(t).as("tbl"), bucketExpr(col(vecCol), t, planesPerTable, dim).as("bucket"))): _*)
    df.select(col(idCol).as("vid"), explode(tb).as("tb"))
      .select(col("vid"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  /** Near-duplicate pairs: distinct (a < b) sharing a bucket in ANY
    * table, scored and filtered at `minCos`. The join is
    * co-partitioned on (tbl, bucket); the distinct collapses pairs
    * found by several tables before any cosine is computed.
    *
    * Scale contract: in-bucket pair count grows QUADRATICALLY with
    * bucket occupancy, and occupancy is n / 2^planesPerTable — with
    * planes held fixed, doubling the corpus quadruples the self-join
    * (measured: 32× corpus → ~48× wall at 8 planes, BENCH_SCALE.md).
    * A deployment holds occupancy constant by adding ~log2(growth)
    * planes per table, and bounds the worst case with `maxBucket`:
    * buckets larger than the cap (dense regions where pairwise
    * near-dup output is itself quadratic and useless) are skipped
    * here, the same cap-and-surface contract as the text path's
    * [[Dedup.lshCandidatePairs]] / [[Dedup.lshDegenerateClusters]] —
    * cluster-level dedup handles those regions at O(cluster).
    */
  def lshNearPairs(df: DataFrame, idCol: String, vecCol: String, minCos: Double,
                   nTables: Int = 4, planesPerTable: Int = 12, dim: Int = 64,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    // buckets and unit vectors each feed two consumers (self-join
    // sides / both pair ends) — persist via PlanCache so the
    // projection runs once per input AND repeated calls reuse one
    // relation instead of leaking a new cached copy each time
    val b0 = PlanCache.cached(s"lshBuckets/$idCol/$vecCol/$nTables/$planesPerTable/$dim", df)(
      lshBuckets(_, idCol, vecCol, nTables, planesPerTable, dim))
    val b = if (maxBucket == Int.MaxValue) b0 else {
      val ok = b0.groupBy("tbl", "bucket").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") <= maxBucket).select("tbl", "bucket")
      b0.join(ok, Seq("tbl", "bucket"))
    }
    val v = PlanCache.cached(s"unitVecs/$idCol/$vecCol", df)(
      normalized(_, idCol, vecCol, "__id", "__v"))
    val va = v.select(col("__id").as("__ida"), col("__v").as("__va"))
    val vb = v.select(col("__id").as("__idb"), col("__v").as("__vb"))
    val cand = b.as("x")
      .join(b.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.vid") < col("y.vid"))
      .select(col("x.vid").as("doc_a"), col("y.vid").as("doc_b"))
      .distinct()
    cand
      .join(va, col("doc_a") === col("__ida"))
      .join(vb, col("doc_b") === col("__idb"))
      .select(col("doc_a"), col("doc_b"), unitDot(col("__va"), col("__vb")).as("cos"))
      // threshold on the 9-dp-quantized score: engines differ in the
      // last ulps of a double cosine (summation order), so a raw
      // `cos >= t` flips membership for scores within ~1e-15 of t;
      // rounding to 1e-9 first (both engines, same rule) makes the
      // comparison deterministic across engines
      .where(round(col("cos"), 9) >= minCos)
  }

  // ----- IVF --------------------------------------------------------

  /** A built IVF index: k unit centroids (k×dim doubles — driver-side
    * by design, the only data an IVF index needs beyond the corpus
    * itself). Build once, query many times — the ANN serving shape; a
    * production pipeline would persist `centers` alongside the corpus.
    */
  final case class IvfIndex(centers: Array[Seq[Double]]) {
    def k: Int = centers.length
  }

  object IvfIndex {
    private val memo = scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), IvfIndex]

    /** Build (or reuse) the index for `corpus`: memoized on the
      * corpus's canonicalized plan + build params, so repeated query
      * construction over the same table trains Lloyd's k-means once.
      * `clear()` drops the memo (e.g. after the corpus is rewritten).
      */
    def build(corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, iters: Int = 5): IvfIndex = {
      // canonicalized plan OBJECT, not text — see PlanCache.cached
      val key = (corpus.queryExecution.analyzed.canonicalized,
        s"$idCol/$vecCol/$k/$iters")
      memo.getOrElseUpdate(key,
        IvfIndex(kmeansCentroids(corpus, idCol, vecCol, k, iters)))
    }

    def clear(): Unit = memo.clear()

    /** Persist an index as one parquet row per centroid
      * `(centroid_id, center)` — the build-once/serve-many shape:
      * training happens in the corpus-write pipeline, serving jobs
      * [[load]] the (k×dim, trivially small) table instead of
      * re-running Lloyd's over the corpus.
      */
    def save(spark: org.apache.spark.sql.SparkSession, index: IvfIndex,
             path: String): Unit = {
      import spark.implicits._
      index.centers.zipWithIndex
        .map { case (c, i) => (i, c) }.toSeq
        .toDF("centroid_id", "center")
        .repartition(1)
        .write.mode("overwrite").parquet(path)
    }

    /** Load an index written by [[save]]; centroid order restored from
      * centroid_id, so the loaded index is bit-identical to the saved
      * one (list assignment and probe order depend on it).
      */
    def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex =
      IvfIndex(spark.read.parquet(path)
        .orderBy("centroid_id").select("center")
        .collect()
        .map(_.getSeq[Double](0)))

    /** Committed index versions under `indexDir`, ascending — a
      * version counts iff the parquet write's own `_SUCCESS` marker
      * landed (a crashed publish is invisible).
      */
    def versions(spark: org.apache.spark.sql.SparkSession,
                 indexDir: String): Seq[Long] =
      IndexVersions.versions(spark, indexDir)

    /** The serving index: the highest committed version under
      * `indexDir`. Readers bind here, so a retrain in flight (or a
      * crashed one) is invisible until its version COMMITS — the old
      * index keeps serving all through the retrain.
      */
    def loadLatest(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String): IvfIndex =
      load(spark, IndexVersions.latestPath(spark, indexDir))

    /** Periodic COMPACTION of a serving index — the recall-restoring
      * half of the maintenance story whose ingest half is
      * assignment-append against frozen centroids: retrain on the
      * CURRENT corpus (standing + every appended delta) and publish
      * the result as the next version under `indexDir`. The swap is
      * the `_SUCCESS` commit of the new version dir: [[loadLatest]]
      * readers see the old index until that instant and the new one
      * after, with no partially-written state reachable in between
      * (a crash mid-write leaves an uncommitted dir a re-run
      * overwrites). Versions older than the newest `retain` are
      * dropped AFTER the publish — size retain above the longest
      * in-flight serving job, exactly the [[graft.streaming
      * .BucketStore.vacuum]] contract.
      *
      * Cost: one k-means over the corpus (the same build the index
      * was born from — retraining is scheduled compaction, never an
      * ingest-path cost) plus a k×dim write.
      */
    def retrainPublish(corpus: DataFrame, idCol: String, vecCol: String,
                       k: Int, iters: Int, indexDir: String,
                       retain: Int = 2): IvfIndex = {
      val spark = corpus.sparkSession
      val idx = build(corpus, idCol, vecCol, k, iters)
      IndexVersions.publish(spark, indexDir, retain)(p => save(spark, idx, p))
      idx
    }
  }

  /** Version-dir bookkeeping shared by [[IvfIndex]]'s and
    * [[PqIndex]]'s publish/serve lifecycle: `v<N>` dirs committed by
    * the parquet write's own `_SUCCESS`, readers bound to the highest
    * committed N, versions older than `retain` vacuumed after a
    * publish.
    */
  private object IndexVersions {
    private val VersionName = "^v(\\d+)$".r

    def versions(spark: org.apache.spark.sql.SparkSession,
                 indexDir: String): Seq[Long] = {
      val root = new org.apache.hadoop.fs.Path(indexDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(root)) Seq.empty
      else fs.listStatus(root).toIndexedSeq.filter(_.isDirectory)
        .flatMap(s => s.getPath.getName match {
          case VersionName(n) if fs.exists(
            new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")) =>
              Some(n.toLong)
          case _ => None
        }).sorted
    }

    def publish(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                retain: Int)(write: String => Unit): Unit = {
      require(retain >= 1,
        s"retain=$retain: must keep at least the version just published")
      val next = versions(spark, indexDir).lastOption.map(_ + 1L).getOrElse(0L)
      write(s"$indexDir/v$next")
      val root = new org.apache.hadoop.fs.Path(indexDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      versions(spark, indexDir).dropRight(retain).foreach(v =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"v$v"), true))
    }

    def latestPath(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String): String = {
      val vs = versions(spark, indexDir)
      require(vs.nonEmpty, s"no committed index version under $indexDir")
      s"$indexDir/v${vs.last}"
    }
  }

  /** `array(dot(v, c0), ..., dot(v, ck-1))` for unit-vector column `v`
    * against literal unit centroids — each element is a native
    * codegen'd dot product.
    */
  private def centroidDots(v: Column, centers: Seq[Seq[Double]]): Column =
    array(centers.map(c => dot(v, typedlit(c))): _*)

  /** 0-based index of the nearest (max-cosine) centroid. */
  private def nearestCentroid(v: Column, centers: Seq[Seq[Double]]): Column = {
    val dots = centroidDots(v, centers)
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  /** Distributed Lloyd's k-means over unit vectors, deterministic:
    * initial centers are the k rows with the smallest md5-hash of
    * their id (a seedless pseudo-random but reproducible pick); each
    * iteration assigns every row to its max-dot centroid (pure
    * projection, no shuffle) and recomputes per-dimension means with
    * one posexplode + groupBy. Centers (k×dim doubles) collect to the
    * driver each iteration — tiny at any corpus size; the O(N·k·d)
    * assignment work stays on the executors.
    *
    * Determinism is real, not assumed: the per-dimension mean is an
    * EXACT DECIMAL(38,18) sum divided once — a double `avg` would
    * merge partial sums in shuffle-arrival order, and double addition
    * is non-associative, so centers could drift a ulp between runs
    * and flip a borderline assignment (cascading through iterations
    * into different lists — precisely what a recall-floor oracle row
    * must not depend on). Unit-vector components are ≤1, so the
    * 18-fraction-digit truncation per value is itself deterministic
    * and the sum cannot overflow 38 digits below ~1e20 rows/cluster.
    */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 5): Array[Seq[Double]] = {
    // shared via PlanCache with lshNearPairs' unit-vector relation
    // (same tag ⇒ same persisted data when run over the same corpus);
    // an explicit unpersist here would drop the shared cache out from
    // under concurrent consumers — release is PlanCache.clear()
    val v = PlanCache.cached(s"unitVecs/$idCol/$vecCol", df)(
      normalized(_, idCol, vecCol, "__id", "__v"))
    def unit(c: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }
    var centers: Array[Seq[Double]] = v
      .orderBy(Hashing.h32(concat(lit("ivf_"), col("__id").cast("string"))), col("__id"))
      .limit(k).select("__v").collect()
      .map(_.getSeq[Double](0))
    for (_ <- 1 to iters) {
      val assigned = v.select(col("__v"),
        nearestCentroid(col("__v"), centers.toSeq).as("c"))
      val D = org.apache.spark.sql.types.DecimalType(38, 18)
      val means = assigned
        .select(col("c"), posexplode(col("__v")).as(Seq("j", "x")))
        .groupBy("c", "j")
        .agg((sum(col("x").cast(D)) / count(lit(1))).cast("double").as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      val dim = centers.head.size
      centers = centers.zipWithIndex.map { case (old, ci) =>
        if (means.contains((ci, 0))) unit((0 until dim).map(j => means((ci, j))))
        else old // empty cluster keeps its previous center
      }
    }
    centers
  }

  /** Per-list membership census of an IVF index over a corpus: one
    * row per NONEMPTY centroid list with its size — the layout-health
    * probe behind the post-retrain skew gate. Hot-list skew is the
    * IVF production failure retrain exists to fix: a list N× the mean
    * defeats the nprobe-bounded scan cost (every query probing that
    * centroid ranks N× the expected candidates), so the census runs
    * right after [[IvfIndex.retrainPublish]], while the layout is
    * supposed to be at its healthiest. One assignment projection
    * (native codegen'd centroid dots) + one k-bounded aggregation;
    * the corpus is scanned once and never shuffled beyond k rows.
    */
  def ivfListCensus(corpus: DataFrame, idCol: String, vecCol: String,
                    centers: Array[Seq[Double]]): DataFrame =
    normalized(corpus, idCol, vecCol, "__id", "__v")
      .select(nearestCentroid(col("__v"), centers.toSeq).as("centroid_id"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n"))

  /** IVF ANN top-k: corpus rows live in their nearest-centroid list;
    * each query probes its `nprobe` nearest lists and ranks those
    * candidates exactly. The probe-list expansion is a slice of the
    * sorted (dot, centroid) struct array — all expression-level.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              centers: Array[Seq[Double]], nprobe: Int = 4): DataFrame = {
    val cs = centers.toSeq
    val cv = normalized(corpus, idCol, vecCol, "neighbor_id", "cv")
      .withColumn("c", nearestCentroid(col("cv"), cs))
    val qn = normalized(queries, idCol, vecCol, "query_id", "qv")
    // struct(d, i) sorts by d first; sort desc and keep nprobe indices
    val probes = slice(
      sort_array(
        zip_with(centroidDots(col("qv"), cs),
          sequence(lit(0), lit(cs.size - 1)),
          (d, i) => struct(d.as("d"), i.as("i"))),
        asc = false),
      1, nprobe)
    val qb = qn.select(col("query_id"), col("qv"),
      explode(probes).as("p")).select(col("query_id"), col("qv"), col("p.i").as("c"))
    val scored = qb.join(cv, "c")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        unitDot(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** (__id, __c, __r): each unit vector's nearest coarse centroid and
    * its residual v − c — the relation IVF-PQ trains on and encodes.
    * One expression-level projection (native codegen'd centroid dots,
    * then an element-wise zip_with against the centroid literal
    * selected by list id) — no shuffle, no kernel.
    */
  private def ivfResiduals(corpus: DataFrame, idCol: String, vecCol: String,
                           centers: Array[Seq[Double]]): DataFrame = {
    val centLit = typedlit(centers.toSeq)
    normalized(corpus, idCol, vecCol, "__id", "__v")
      .withColumn("__c", nearestCentroid(col("__v"), centers.toSeq))
      .withColumn("__r", zip_with(col("__v"),
        element_at(centLit, col("__c") + 1), (x, c) => x - c))
  }

  // ----- Product quantization (PQ) -----------------------------------

  /** A trained PQ codebook set: `m` subspaces × `ks` centroids of
    * dim/m doubles each — like [[IvfIndex]], driver-side by design
    * (m·ks·dim/m = ks·dim doubles total, corpus-size-independent).
    *
    * PQ is the scan-bandwidth scale path the int8 path can't reach:
    * a dim-64 float corpus stored as m=8 one-byte codes is 32× fewer
    * bytes than float32 (vs 4× for int8), and ADC scoring is m table
    * lookups per candidate instead of dim multiplies. At 100 TB of
    * embeddings the encoded corpus is what a serving scan reads;
    * codebooks ride along as plan literals.
    */
  final case class PqIndex(books: Array[Array[Seq[Double]]]) {
    def m: Int = books.length
    def ks: Int = books.head.length
    def subDim: Int = books.head.head.size
  }

  object PqIndex {
    private val memo = scala.collection.concurrent.TrieMap
      .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), PqIndex]

    /** Train (or reuse) PQ codebooks for `corpus`: unit-normalize,
      * split each vector into `m` equal subvectors, and run an
      * independent deterministic L2 Lloyd's per subspace (ks
      * centroids each) — all `m` subspaces JOINTLY, so an iteration
      * is ONE assignment-and-mean job over the cached subvector
      * relation instead of m sequential per-subspace jobs (the
      * per-subspace loop measured ~100 driver-latency-bound jobs at
      * m=16, iters=3; joint training is 1 + iters). Seeds are the
      * ks smallest-md5 rows' slices — the same rows every subspace,
      * identical to what the per-subspace ordering picks, so the
      * trained books are bit-identical to independent training.
      * Memoized on the corpus's canonicalized plan + params — the
      * build-once/serve-many shape, like [[IvfIndex.build]]. Same
      * determinism contract as [[kmeansCentroids]]: exact
      * DECIMAL(38,18) means, first-index argmin tie break.
      */
    def build(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int, ks: Int, dim: Int, iters: Int = 3): PqIndex = {
      require(dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
      val key = (corpus.queryExecution.analyzed.canonicalized,
        s"$idCol/$vecCol/$m/$ks/$dim/$iters")
      memo.getOrElseUpdate(key, {
        val v = PlanCache.cached(s"unitVecs/$idCol/$vecCol", corpus)(
          normalized(_, idCol, vecCol, "__id", "__v"))
        trainOn(v, s"pqSubs/$idCol/$vecCol/$m/$dim", m, ks, dim, iters)
      })
    }

    /** Train (or reuse) codebooks for the COARSE RESIDUALS of
      * `corpus` against an IVF index — the IVF-PQ composition's
      * second stage. The trained geometry is v − c(v) (NOT
      * re-normalized: residuals are small off-center displacements,
      * and re-normalizing them would quantize a different vector than
      * the one ADC reconstructs). Residual books are much tighter
      * than whole-vector books at equal bits — every list's vectors
      * share the same centroid offset, so the books only need to
      * cover the within-list spread — which is why IVF-PQ is the
      * standard 100 TB serving shape rather than either part alone.
      * Memoized like [[build]], with the coarse centers folded into
      * the key (retrained centers ⇒ different residuals ⇒ retrain).
      */
    def buildResidual(corpus: DataFrame, idCol: String, vecCol: String,
                      coarse: IvfIndex, m: Int, ks: Int, dim: Int,
                      iters: Int = 3): PqIndex = {
      require(dim % m == 0, s"dim=$dim must split into m=$m equal subspaces")
      val ck = coarse.centers.toSeq.hashCode
      val key = (corpus.queryExecution.analyzed.canonicalized,
        s"$idCol/$vecCol/$m/$ks/$dim/$iters/resid$ck")
      memo.getOrElseUpdate(key, {
        val r = PlanCache.cached(s"ivfResid/$idCol/$vecCol/$ck", corpus)(
          ivfResiduals(_, idCol, vecCol, coarse.centers)
            .select(col("__id"), col("__r").as("__v")))
        trainOn(r, s"pqResidSubs/$idCol/$vecCol/$m/$dim/$ck", m, ks, dim, iters)
      })
    }

    /** The Lloyd's training core over an ALREADY-PREPARED
      * (__id, __v) frame — shared by [[build]] (unit vectors) and
      * [[buildResidual]] (raw residuals). Same determinism contract
      * throughout: md5-ordered seeds, DECIMAL(38,18) means,
      * first-index argmin tie break.
      */
    private def trainOn(v: DataFrame, subsTag: String,
                        m: Int, ks: Int, dim: Int, iters: Int): PqIndex = {
        val subDim = dim / m
        // ONE cached subvector relation feeds every iteration:
        // (id, sub index, subvector) — m·N small rows, scanned once
        val subs = PlanCache.cached(subsTag, v) { vv =>
          val parts = (0 until m).map(s =>
            struct(lit(s).as("mi"),
              slice(col("__v"), s * subDim + 1, subDim).as("sub")))
          vv.select(col("__id"), explode(array(parts: _*)).as("p"))
            .select(col("__id"), col("p.mi").as("mi"), col("p.sub").as("sub"))
        }
        val seeds = v
          .orderBy(Hashing.h32(concat(lit("pq_"), col("__id").cast("string"))),
            col("__id"))
          .limit(ks).select("__v").collect().map(_.getSeq[Double](0))
        var books: Array[Array[Seq[Double]]] = Array.tabulate(m) { mi =>
          seeds.map(s => s.slice(mi * subDim, (mi + 1) * subDim)) }
        val D = org.apache.spark.sql.types.DecimalType(38, 18)
        for (_ <- 1 to iters) {
          // per-subspace assignment as a 16-way union of small
          // filter+project branches over the cached relation (keeps
          // each codegen unit small — a 16-branch CASE of 64 dot
          // products each would blow the generated-method limit),
          // then ONE mean aggregation across all (mi, c, j)
          val assigned = (0 until m).map { mi =>
            subs.where(col("mi") === mi).select(col("mi"), col("sub"),
              nearestL2(col("sub"), books(mi).toSeq).as("c"))
          }.reduce(_.unionByName(_))
          val means = assigned
            .select(col("mi"), col("c"), posexplode(col("sub")).as(Seq("j", "x")))
            .groupBy("mi", "c", "j")
            .agg((sum(col("x").cast(D)) / count(lit(1))).cast("double").as("mn"))
            .collect()
            .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
            .toMap
          books = books.zipWithIndex.map { case (book, mi) =>
            book.zipWithIndex.map { case (old, ci) =>
              if (means.contains((mi, ci, 0)))
                (0 until subDim).map(j => means((mi, ci, j))): Seq[Double]
              else old // empty cluster keeps its previous center
            }
          }
        }
        PqIndex(books)
    }

    def clear(): Unit = memo.clear()

    /** Persist codebooks as one parquet row per (subspace, centroid) —
      * the same build-once/serve-many contract as [[IvfIndex.save]].
      */
    def save(spark: org.apache.spark.sql.SparkSession, index: PqIndex,
             path: String): Unit = {
      import spark.implicits._
      index.books.zipWithIndex.flatMap { case (book, mi) =>
        book.zipWithIndex.map { case (c, ci) => (mi, ci, c) }
      }.toSeq.toDF("m", "centroid_id", "center")
        .repartition(1)
        .write.mode("overwrite").parquet(path)
    }

    /** Load codebooks written by [[save]]; (m, centroid_id) order
      * restored, so the loaded index is bit-identical to the saved one
      * (code assignment depends on it).
      */
    def load(spark: org.apache.spark.sql.SparkSession, path: String): PqIndex = {
      val rows = spark.read.parquet(path)
        .orderBy("m", "centroid_id")
        .select("m", "center")
        .collect()
      PqIndex(rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map(_._2.map(_.getSeq[Double](1))).toArray)
    }

    /** Committed codebook versions — same [[IndexVersions]] lifecycle
      * as [[IvfIndex.versions]].
      */
    def versions(spark: org.apache.spark.sql.SparkSession,
                 indexDir: String): Seq[Long] =
      IndexVersions.versions(spark, indexDir)

    /** The serving codebooks: the highest committed version — the old
      * books keep serving all through a retrain.
      */
    def loadLatest(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String): PqIndex =
      load(spark, IndexVersions.latestPath(spark, indexDir))

    /** Periodic codebook COMPACTION — [[IvfIndex.retrainPublish]]'s PQ
      * sibling, with one extra cost the swap must price in: new books
      * invalidate every stored CODE, so the publish schedules a full
      * corpus re-encode (m nearest-centroid lookups per vector — at
      * 100 TB the dominating half of the compaction, which is exactly
      * why ingest absorbs deltas against FROZEN books and retrain is
      * scheduled, never per-arrival). Serving jobs re-encode from the
      * published books' plan literals, so the swap is still just the
      * version commit.
      */
    def retrainPublish(corpus: DataFrame, idCol: String, vecCol: String,
                       m: Int, ks: Int, dim: Int, iters: Int,
                       indexDir: String, retain: Int = 2): PqIndex = {
      val spark = corpus.sparkSession
      val idx = build(corpus, idCol, vecCol, m, ks, dim, iters)
      IndexVersions.publish(spark, indexDir, retain)(p => save(spark, idx, p))
      idx
    }
  }

  /** `array(||v-c0||², ..., ||v-ck-1||²)` against literal centroids,
    * expanded as dot(v,v) − 2·dot(v,c) + c·c so each element is one
    * native dot product plus constants.
    */
  private def l2Dists(v: Column, centers: Seq[Seq[Double]]): Column = {
    val vv = dot(v, v)
    array(centers.map { c =>
      val cc = c.map(x => x * x).sum
      vv - lit(2d) * dot(v, typedlit(c)) + lit(cc)
    }: _*)
  }

  /** 0-based index of the nearest (min-L2) centroid; ties break to
    * the first index (array_position returns the FIRST match).
    */
  private def nearestL2(v: Column, centers: Seq[Seq[Double]]): Column = {
    val dists = l2Dists(v, centers)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** PQ-encode a corpus: (id, codes array<int> of length m) — each
    * code the min-L2 centroid of that subspace. The argmin kernel
    * runs as a mapPartitions closure over the codebook arrays, NOT as
    * a literal-expression forest: the expression form (m·ks = 1024
    * literal dot products) measured ~7 s of per-run ANALYSIS/codegen
    * at ANY corpus size — pure planning cost, data-independent —
    * while the closure plans in milliseconds and executes the same
    * arithmetic. Summation order and the strict-< first-index tie
    * break replicate the expression semantics exactly (dist =
    * dot(v,v) − 2·dot(v,c) + dot(c,c), each dot left-to-right), so
    * the codes are bit-identical to the expression version's. The
    * encoded relation is what a 100 TB pipeline PERSISTS — m bytes
    * per vector instead of 4·dim.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               index: PqIndex): DataFrame = {
    val subDim = index.subDim
    val m = index.m
    val books = index.books.map(_.map(_.toArray))
    val v = normalized(corpus, idCol, vecCol, "__id", "__v")
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("neighbor_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("codes",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType, containsNull = false),
        nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    v.mapPartitions { it =>
      it.map { r =>
        org.apache.spark.sql.Row(r.getLong(0),
          pqCodesOf(r.getSeq[Double](1), books, m, subDim).toSeq)
      }
    }(encoder)
  }

  /** The per-vector code argmin shared by [[pqEncode]] and
    * [[ivfPqEncode]]'s kernels. Summation order (vv, then the
    * interleaved d/cc accumulation, dist = vv − 2d + cc) and the
    * strict-< first-index tie break replicate the literal-expression
    * semantics exactly — the codes are bit-identical to the
    * expression version's (see [[pqEncode]]'s doc for why the kernel
    * form exists at all).
    */
  private def pqCodesOf(vec: Seq[Double], books: Array[Array[Array[Double]]],
                        m: Int, subDim: Int): Array[Int] = {
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val book = books(mi)
      val off = mi * subDim
      var vv = 0.0
      var j = 0
      while (j < subDim) { val x = vec(off + j); vv += x * x; j += 1 }
      var best = 0
      var bestD = Double.PositiveInfinity
      var ci = 0
      while (ci < book.length) {
        val c = book(ci)
        var d = 0.0; var cc = 0.0; var jj = 0
        while (jj < subDim) {
          d += vec(off + jj) * c(jj); cc += c(jj) * c(jj); jj += 1
        }
        val dist = vv - 2.0 * d + cc
        if (dist < bestD) { bestD = dist; best = ci }
        ci += 1
      }
      codes(mi) = best
      mi += 1
    }
    codes
  }

  /** (query_id, lut) where lut[mi][ci] = dot(q_sub_mi, book_mi[ci]) —
    * the per-query ADC lookup tables, shared by [[pqAdcScores]] (whole-
    * vector books) and [[ivfPqTopK]] (residual books: for the inner-
    * product metric the SAME plain-query table against residual books
    * yields dot(q, r), no query residual needed — dot is linear, so
    * dot(q, v) = dot(q, c) + dot(q, r) and the centroid term is the
    * probe constant). A mapPartitions kernel for the same reason as
    * [[pqEncode]]: the literal-expression form costs seconds of
    * planning per run; the closure computes the identical
    * left-to-right dot products.
    */
  private def lutFrame(qn: DataFrame, index: PqIndex): DataFrame = {
    val subDim = index.subDim
    val m = index.m
    val books = index.books.map(_.map(_.toArray))
    val lutSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("lut",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false),
          containsNull = false),
        nullable = false)))
    val lutEncoder = org.apache.spark.sql.Encoders.row(lutSchema)
    qn.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val vec = r.getSeq[Double](1)
        val lut = Array.tabulate(m) { mi =>
          val off = mi * subDim
          val book = books(mi)
          Array.tabulate(book.length) { ci =>
            val c = book(ci)
            var d = 0.0; var j = 0
            while (j < subDim) { d += vec(off + j) * c(j); j += 1 }
            d
          }.toSeq
        }.toSeq
        org.apache.spark.sql.Row(id, lut)
      }
    }(lutEncoder)
  }

  /** ADC-scored (query, neighbor, score) pairs: queries stay exact;
    * each query precomputes its [[lutFrame]] lookup tables, and a
    * candidate's approximate cosine is m table lookups summed — never
    * a full dim-wide multiply against the corpus. The corpus side
    * reads only the m-byte codes; in a stored pipeline [[pqEncode]]'s
    * output is the scanned relation and the raw vectors never leave
    * cold storage.
    */
  def pqAdcScores(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String,
                  index: PqIndex): DataFrame = {
    val encoded = pqEncode(corpus, idCol, vecCol, index)
    val qn = normalized(queries, idCol, vecCol, "query_id", "qv")
    val q = broadcast(lutFrame(qn, index))
    // scoring is the native codegen'd LutSum gather loop — the HOF
    // zip_with/element_at/aggregate form paid interpreted-lambda cost
    // on every (query, candidate) pair and is kept as the differential
    // baseline in PqSpec
    q.crossJoin(encoded)
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.LutSum.lutSum(col("codes"), col("lut")).as("score"))
  }

  /** PQ ANN top-k: ADC shortlist + exact re-rank — the standard
    * two-stage serving shape. Stage 1 ranks the whole corpus by the
    * m-lookup ADC score and keeps `rerank·k` candidates per query
    * (the bandwidth-bound pass, reads codes only); stage 2 joins the
    * true vectors back FOR THE SHORTLIST ONLY and re-ranks those
    * exactly. Quantization error then only costs recall when a true
    * neighbor falls outside the shortlist entirely, not whenever two
    * close neighbors' ADC scores swap — which is the difference
    * between ~0.3 and ~0.9 recall on near-uniform unit vectors whose
    * neighbor gaps sit inside the reconstruction error.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int,
             index: PqIndex, rerank: Int = 8): DataFrame = {
    val adc = pqAdcScores(corpus, queries, idCol, vecCol, index)
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    val shortlist = adc.withColumn("r0", row_number().over(w))
      .where(col("r0") <= k * rerank)
      .select("query_id", "neighbor_id")
    val qv = normalized(queries, idCol, vecCol, "query_id", "qv")
    val cv = normalized(corpus, idCol, vecCol, "neighbor_id", "cv")
    val exact = shortlist
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        unitDot(col("qv"), col("cv")).as("cos"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w2)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** IVF-PQ corpus encoding: (neighbor_id, c, codes) — each vector in
    * its nearest coarse list with the PQ codes of its RESIDUAL
    * against that list's centroid ([[PqIndex.buildResidual]]'s
    * geometry). This is what a 100 TB deployment PERSISTS, clustered
    * by list: a serving scan reads only the probed lists' m-byte code
    * rows (partition pruning on c), the double vectors stay in cold
    * storage. One projection + one kernel pass — no shuffle.
    */
  def ivfPqEncode(corpus: DataFrame, idCol: String, vecCol: String,
                  coarse: IvfIndex, index: PqIndex): DataFrame = {
    val subDim = index.subDim
    val m = index.m
    val books = index.books.map(_.map(_.toArray))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("neighbor_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("codes",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType, containsNull = false),
        nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    ivfResiduals(corpus, idCol, vecCol, coarse.centers)
      .select(col("__id"), col("__c"), col("__r"))
      .mapPartitions { it =>
        it.map { r =>
          org.apache.spark.sql.Row(r.getLong(0), r.getInt(1),
            pqCodesOf(r.getSeq[Double](2), books, m, subDim).toSeq)
        }
      }(encoder)
  }

  /** IVF-PQ ANN top-k — the composition of the two index families
    * into the standard large-scale serving shape (coarse quantizer
    * bounds the SCAN, product quantizer bounds the BYTES): each query
    * probes its `nprobe` nearest coarse lists, ADC-scores only those
    * lists' residual codes as dot(q, c) + Σ lut[code] (the centroid
    * term is the probe constant — [[lutFrame]]'s linearity note), and
    * exactly re-ranks a `rerank·k` shortlist like [[pqTopK]]. Against
    * either part alone: vs flat PQ the ADC scan drops from N to
    * N·nprobe/k_coarse candidates; vs flat IVF the scanned candidate
    * rows shrink ~32× (m bytes vs dim doubles) and score in m lookups
    * instead of dim multiplies. Skew contract is IVF's: hot-list size
    * (gated post-retrain by the list-skew census).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int,
                coarse: IvfIndex, index: PqIndex,
                nprobe: Int = 4, rerank: Int = 16): DataFrame = {
    val cs = coarse.centers.toSeq
    val enc = ivfPqEncode(corpus, idCol, vecCol, coarse, index)
    val qn = normalized(queries, idCol, vecCol, "query_id", "qv")
    // nprobe nearest lists per query, carrying dot(q, c) as the
    // per-list ADC constant — same probe expression as [[ivfTopK]]
    val probes = slice(
      sort_array(
        zip_with(centroidDots(col("qv"), cs),
          sequence(lit(0), lit(cs.size - 1)),
          (d, i) => struct(d.as("d"), i.as("i"))),
        asc = false),
      1, nprobe)
    val qp = qn.select(col("query_id"), explode(probes).as("p"))
      .select(col("query_id"), col("p.i").as("c"), col("p.d").as("cdot"))
    val q = broadcast(qp.join(lutFrame(qn, index), "query_id"))
    val adc = q.join(enc, "c")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("cdot") +
          graft.functions.LutSum.lutSum(col("codes"), col("lut"))).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    val shortlist = adc.withColumn("r0", row_number().over(w))
      .where(col("r0") <= k * rerank)
      .select("query_id", "neighbor_id")
    val qv = normalized(queries, idCol, vecCol, "query_id", "qv")
    val cv = normalized(corpus, idCol, vecCol, "neighbor_id", "cv")
    val exact = shortlist
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        unitDot(col("qv"), col("cv")).as("cos"))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w2)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** ANN top-k restricted to candidates sharing an LSH bucket with the
    * query in any table. Candidate (query, neighbor) pairs are
    * deduplicated across tables before scoring; vectors are joined
    * back by id so only 16-byte id pairs flow through the candidate
    * dedup shuffle.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nTables: Int = 4, planesPerTable: Int = 12, dim: Int = 64): DataFrame = {
    val cb = lshBuckets(corpus, idCol, vecCol, nTables, planesPerTable, dim)
      .withColumnRenamed("vid", "neighbor_id")
    val qb = lshBuckets(queries, idCol, vecCol, nTables, planesPerTable, dim)
      .withColumnRenamed("vid", "query_id")
    val cand = qb.join(cb, Seq("tbl", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val qv = normalized(queries, idCol, vecCol, "query_id", "qv")
    val cv = normalized(corpus, idCol, vecCol, "neighbor_id", "cv")
    val scored = cand.join(qv, "query_id").join(cv, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        unitDot(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }
}
