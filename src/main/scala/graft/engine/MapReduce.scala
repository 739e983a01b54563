package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The MR-parity API — the reference's entire extensibility surface
  * (SURVEY.md §2.3.10) re-expressed on Datasets.
  *
  * Reference shapes:
  *  - Map:    `func(filename, contents string) []mr.KeyValue`
  *    (/root/reference/src/mrapps/wc.go:19, loaded src/main/mrworker.go:32-49)
  *  - Reduce: `func(key string, values []string) string`
  *    (/root/reference/src/mrapps/wc.go:37)
  *
  * Differences that matter at 100 TB:
  *  - `ReduceF` receives an Iterator, not an in-RAM slice — the
  *    reference buffers every group in memory
  *    (src/mr/worker.go:145-156); Spark's sort-based `mapGroups`
  *    streams and spills.
  *  - The shuffle is Spark's binary spillable exchange, not JSON
  *    files on shared NFS (src/mr/worker.go:81-100).
  *  - The map→reduce phase barrier, straggler re-execution (10 s
  *    requeue, src/mr/coordinator.go:114-138), idempotent commit and
  *    atomic output publish are all inherited from Spark's scheduler,
  *    task retry, and FileOutputCommitter — zero user code (SURVEY §4).
  */
object MapReduce {
  /** One input record in, zero-or-more KV pairs out — a UDTF. */
  type MapF = (String, String) => Iterator[(String, String)]

  /** All values of one key in (streaming), one value out — a UDAF over
    * pre-grouped input.
    */
  type ReduceF = (String, Iterator[String]) => String

  /** Whole-file scan (E1): one record = (fileName, entireContents),
    * exactly the reference's map-task granularity
    * (src/mr/worker.go:59-71, src/mr/coordinator.go:154-162).
    */
  def wholeFiles(spark: SparkSession, inputs: Seq[String]): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(inputs: _*)
      .select(input_file_name().as("file"), col("value"))
      .as[(String, String)]
      .map { case (file, contents) =>
        // basename, matching the reference's os.Args filenames
        (file.substring(file.lastIndexOf('/') + 1), contents)
      }
  }

  /** The full job as a Dataset: scan → flatMap(mapF) → shuffle on key →
    * per-key reduce. The groupByKey exchange IS the reference's
    * map/reduce phase barrier (E10).
    */
  def result(spark: SparkSession, inputs: Seq[String],
             mapF: MapF, reduceF: ReduceF): Dataset[(String, String)] = {
    import spark.implicits._
    wholeFiles(spark, inputs)
      .flatMap { case (file, contents) => mapF(file, contents) }
      .groupByKey(_._1)
      .mapGroups { (key, rows) => (key, reduceF(key, rows.map(_._2))) }
  }

  /** Run a job end-to-end to a partitioned text sink (E9): lines of
    * `key value` (src/mr/worker.go:161 "%v %v\n"), `nReduce` output
    * partitions (≡ mr-out-<r> files), atomic commit via Spark's
    * FileOutputCommitter (≡ tmp+rename, src/mr/worker.go:139,165).
    */
  def run(spark: SparkSession, inputs: Seq[String], nReduce: Int,
          mapF: MapF, reduceF: ReduceF, outDir: String): Unit = {
    import spark.implicits._
    result(spark, inputs, mapF, reduceF)
      .repartition(nReduce, col("_1"))
      .select(concat_ws(" ", col("_1"), col("_2")))
      .write.mode("overwrite").text(outDir)
  }
}

/** Single-threaded in-process twin of the reference's sequential
  * runner (/root/reference/src/main/mrsequential.go:25-87) — the
  * semantic oracle for the differential tests (SURVEY §5.1).
  */
object SequentialOracle {
  def run(inputs: Seq[(String, String)],
          mapF: MapReduce.MapF, reduceF: MapReduce.ReduceF): Seq[(String, String)] = {
    val intermediate = inputs.flatMap { case (f, c) => mapF(f, c) } // scan+flatMap+union
    intermediate
      .sortBy(_._1)                                                // global sort (:59)
      .groupBy(_._1)                                               // run-scan grouping (:68-77)
      .toSeq.sortBy(_._1)
      .map { case (k, kvs) => (k, reduceF(k, kvs.iterator.map(_._2))) }
  }
}
