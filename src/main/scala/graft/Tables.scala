package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loaders for the driver-generated star schema (TESTDATA.md,
  * FIXTURES.md §B). One table per parquet file under the sf dir.
  *
  * Scale notes (100 TB design): these are plain `spark.read.parquet`
  * scans — column pruning and predicate pushdown reach the parquet
  * reader via Catalyst, so every downstream query only pays for the
  * columns/rows it touches. Nothing here collects to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Measured negative result (round 4), kept so it isn't re-tried:
    * every sf0.1 fixture file is a single parquet row group, so each
    * scan plans as ONE task and all map-side compute runs on one core
    * until the first exchange. An adaptive
    * `repartition(defaultParallelism)` fan-out of documents/embeddings
    * was A/B-profiled at sf0.1 and LOST on every affected query
    * (langid 0.24→0.37 s, exact_rows 0.33→1.09 s, fingerprint
    * 0.59→0.99 s, embedding 0.77→1.14 s): the round-robin exchange
    * (determinism sort + serialize/deserialize of the text bytes +
    * an extra stage wave) costs more than the freed parallelism,
    * because the per-row CPU sinks are already fused codegen
    * expressions. At production scale the problem vanishes on its
    * own — multi-GB tables split into ≥ parallelism row groups.
    */

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader only surfaces as a nanosecond LONG (via
    * `spark.sql.legacy.parquet.nanosAsLong`). We normalize to Spark's
    * native microsecond TimestampType so all downstream window/trunc
    * logic is standard. DuckDB reads the same file as µs TIMESTAMP, so
    * the two engines agree after this normalization.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      // set once per session (the graft mains set it at session build;
      // this fallback covers ad-hoc sessions) — re-setting the same
      // value would be racy-looking under concurrent query planning
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path)
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // integer division: ns epochs (~1.7e18) exceed double's 2^53
          // exact range, so `/ 1000` via double would be off by ~µs
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ => raw // engine already surfaced a native timestamp
      }
    } else spark.read.parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
