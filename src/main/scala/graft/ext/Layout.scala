package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
}
