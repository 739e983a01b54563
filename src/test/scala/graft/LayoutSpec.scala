package graft

import graft.ext.Layout
import org.apache.spark.sql.functions._

/** Morton coding pinned against a bit-twiddling reference, and the
  * property z-ordering exists for: a box predicate over a z-ordered
  * layout touches a fraction of the files a dimension-blind layout
  * spreads it across.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("morton2 equals the reference interleave on random coordinates") {
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.morton2(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y, 16), s"($x, $y)")
    }
    // canonical small cases: (1,0)→1, (0,1)→2, (1,1)→3, (2,3)→14
    assert(mortonRef(2, 3, 2) == 14L)
  }

  test("box query over z-ordered files touches fewer files than an id-sorted layout") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"),
        (col("user_id") % 64).cast("long").as("x"),
        (col("event_id") % 64).cast("long").as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_zord").toString
    val pDir = java.nio.file.Files.createTempDirectory("graft_plain").toString
    Layout.writeZOrdered(ev, zDir, "x", "y", bits = 6, nFiles = 16)
    // dimension-blind baseline: same file count, clustered by row id
    ev.repartitionByRange(16, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(pDir)
    // a 4-aligned 4×4 box = one contiguous z-range of 16 cells
    def filesTouched(dir: String): Long = {
      val hits = spark.read.parquet(dir)
        .where(col("x").between(16, 19) && col("y").between(32, 35))
      val n = hits.count()
      assert(n > 0, "box must match some events or the comparison is vacuous")
      hits.select(input_file_name()).distinct().count()
    }
    val (zf, pf) = (filesTouched(zDir), filesTouched(pDir))
    assert(zf < pf,
      s"z-ordered layout touched $zf files vs $pf — no locality win")
    assert(zf <= 3, s"an aligned 16-cell z-range should span ≤3 of 16 files, got $zf")
  }
}
