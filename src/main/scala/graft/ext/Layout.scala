package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan
  * pruning. A 100 TB table is read through its file/row-group min-max
  * stats — a single sort key prunes one predicate dimension and
  * scatters every other, while a Z-order (Morton) interleave gives
  * every interleaved dimension locality, so a box predicate touches
  * O(box volume) files instead of all of them. This is the layout
  * trick behind Delta/Iceberg OPTIMIZE ZORDER, here as a plain
  * column expression + range-partitioned write usable on any parquet
  * table.
  */
object Layout {

  /** Morton (Z-order) interleave of two non-negative integer columns,
    * `bits` low bits each → a single long with x's bit i at position
    * 2i and y's at 2i+1. Pure codegen'd bit arithmetic (2·bits
    * shift/mask terms, no UDF); values must be in [0, 2^bits).
    */
  def morton2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits must be in [1, 31]")
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _) // disjoint bit positions: + ≡ bitwise OR
  }

  /** Write `df` z-ordered on two integer dimensions: range-partition
    * by the Morton code into `nFiles` files, each internally sorted by
    * it — so consecutive z-ranges (= spatial boxes) land in few files
    * and parquet min-max stats prune the rest. The z column itself is
    * not persisted; the DIMENSION columns carry the stats the reader
    * prunes on.
    */
  def writeZOrdered(df: DataFrame, outDir: String, xCol: String, yCol: String,
                    bits: Int, nFiles: Int): Unit =
    zOrderPlan(df, xCol, yCol, bits, nFiles)
      .write.mode("overwrite").parquet(outDir)

  /** The planned (pre-write) frame of [[writeZOrdered]], exposed so
    * the layout's plan shape is pinnable: ONE range-partitioning
    * exchange on the Morton code (the sampling pass is the range
    * partitioner's, not an extra job of ours) and a partition-LOCAL
    * sort — never a global sort, whose single ordered shuffle would
    * serialize a 100 TB rewrite through one task wave.
    */
  def zOrderPlan(df: DataFrame, xCol: String, yCol: String,
                 bits: Int, nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles=$nFiles must be positive")
    df.withColumn("__z", morton2(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Data-file census of a parquet directory: (n_files, total_bytes),
    * counting data files only — hidden names (`_`/`.` prefixes) are
    * skipped at EVERY path level, not just the leaf, so `_temporary/`
    * leftovers from a crashed writer and `_spark_metadata/` streaming
    * sink logs (exactly the aged-ingest shapes [[compact]] targets)
    * never inflate the census Spark's own reader would ignore. Pure
    * driver-side filesystem metadata — one recursive listing,
    * O(files), no Spark job; at 100 TB this is a namenode/object-store
    * LIST, the same call every table-format maintenance job starts
    * with.
    */
  def census(spark: SparkSession, dir: String): (Long, Long) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def hidden(name: String) = name.startsWith("_") || name.startsWith(".")
    var n = 0L
    var bytes = 0L
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { s =>
        if (!hidden(s.getPath.getName)) {
          if (s.isDirectory) walk(s.getPath)
          else { n += 1; bytes += s.getLen }
        }
      }
    walk(root)
    (n, bytes)
  }

  private def fileCountFor(bytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes=$targetBytes must be positive")
    math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
  }

  /** File count [[compact]] will bin-pack `dir` into for a target
    * file size: ceil(current data bytes / targetBytes), floored at 1.
    * Exposed so callers (and the gated census row) can pin the
    * contract without re-deriving it.
    */
  def compactFileCount(spark: SparkSession, dir: String, targetBytes: Long): Int =
    fileCountFor(census(spark, dir)._2, targetBytes)

  /** The planned (pre-write) frame of [[compact]]: read the aged
    * directory and range-partition it into [[compactFileCount]]
    * partitions on `sortCols`, each internally sorted — so the
    * rewritten files carry pairwise-DISJOINT `sortCols` min-max
    * spans and a reader's predicate pruning works exactly as it did
    * before compaction (the whole point of compacting carefully: a
    * plain `coalesce` rewrite would interleave ranges and destroy
    * the stats).
    *
    * Scale shape: ONE range-partitioning exchange (the sampling pass
    * is the range partitioner's) + a partition-LOCAL sort — the same
    * never-a-global-sort discipline as [[zOrderPlan]]; a 100 TB
    * compaction is one shuffle wave wide. Sizing note: the range
    * partitioner balances ROWS, so output files land near
    * `targetBytes` in proportion to how uniform row widths are —
    * the right contract for a corpus of similar documents; heavily
    * mixed-width corpora should compact per width stratum.
    */
  def compactPlan(spark: SparkSession, dir: String, sortCols: Seq[String],
                  targetBytes: Long): DataFrame =
    planFor(spark, dir, sortCols, compactFileCount(spark, dir, targetBytes))

  private def planFor(spark: SparkSession, dir: String, sortCols: Seq[String],
                      nFiles: Int): DataFrame = {
    require(sortCols.nonEmpty, "compact needs sort columns (pruning stats " +
      "are per-sort-key; an unsorted compaction is just coalesce)")
    spark.read.parquet(dir)
      .repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
  }

  /** Compact an aged multi-file parquet directory into ~`targetBytes`
    * files at `outDir`, preserving `sortCols` order (globally range-
    * partitioned, locally sorted — min-max pruning stats survive).
    * THE most common 100 TB lake-maintenance job: streaming ingest
    * and incremental merges leave thousands of small files whose
    * per-file open/footer cost dominates scans; this rewrites them
    * into scan-sized files in one shuffle. Returns
    * (files_before, files_after).
    */
  def compact(spark: SparkSession, dir: String, outDir: String,
              sortCols: Seq[String], targetBytes: Long): (Long, Long) = {
    // one LIST serves both the before-count and the sizing (a 100 TB
    // directory listing is not free; don't repeat it per derived number)
    val (before, bytes) = census(spark, dir)
    planFor(spark, dir, sortCols, fileCountFor(bytes, targetBytes))
      .write.mode("overwrite").parquet(outDir)
    val (after, _) = census(spark, outDir)
    (before, after)
  }
}
