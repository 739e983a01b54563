package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Key-hash-BUCKETED versioned store — the shared layout under
  * [[StreamMerge]] (snapshot store) and [[StreamIngest]] (fingerprint
  * store), built so a microbatch rewrites ONLY the buckets its keys
  * touch instead of the whole store. The flat predecessor layout
  * (`v<id>/` holding the full store parquet) had the right COMPUTE
  * plan — the store never shuffles — but O(store) write amplification
  * per trigger: at a 100 TB snapshot store with a minutes-level
  * trigger the job never keeps up. Here a trigger's I/O is
  * O(touched buckets) ≈ O(batch keys × store/B), and untouched
  * buckets are carried by REFERENCE.
  *
  * Layout (one writer per storeDir, as before):
  * {{{
  *   storeDir/v<id>/data/__b=<k>/            buckets REWRITTEN by version <id>
  *   storeDir/v<id>/manifest                 bucket -> owning version (all buckets)
  *   storeDir/v<id>/_SUCCESS                 commit marker, written LAST
  * }}}
  *
  * The manifest is the version's complete bucket map: buckets the
  * batch touched point at this version's own `data/`, untouched
  * buckets point at the version that last rewrote them (transitively
  * back to the seed). It also records the bucket COUNT — fixed for
  * the store's lifetime, since a key's bucket must be stable across
  * versions — and the store SCHEMA (so an empty store still reads
  * with its declared shape, and so additive schema evolution can
  * null-backfill buckets written before a column existed).
  *
  * Cost accounting, measured at fixture scale: the layout adds one
  * touched-bucket probe JOB ([[touchedBuckets]] — single-pass
  * collect_set, no row exchange) and one bucket-repartition stage per
  * trigger, ~0.4 s/trigger of pure job-launch floor on the 8-batch
  * gated replays (5.4 → 8.9 s; the data is tiny there). That floor
  * is flat per trigger while the rewrite it replaces is O(store):
  * the crossover is store ≈ batch × B/(B−1) — a few batches in, and
  * six orders of magnitude at a 100 TB store with minutes-level
  * triggers.
  *
  * Commit discipline (same self-describing-directory contract the
  * flat layout had): a version exists iff `v<id>/_SUCCESS` exists,
  * and that marker is written strictly after the data AND the
  * manifest — a crash anywhere below it leaves an invisible partial
  * dir that the replayed batch deletes and rewrites; a crash between
  * the marker and the streaming offset log is the replay-skip case
  * ([[replaySkip]]). Versions are vacuumed only when NO retained
  * manifest references their buckets, so a seed version that still
  * owns cold buckets outlives `retain` by design (its superseded
  * buckets are the compaction story — [[graft.ext.Layout.compact]]
  * per bucket dir).
  */
object BucketStore {

  /** Default bucket count. Sizing note for real deployments: buckets
    * are the write-amplification unit (a 1-key batch rewrites
    * store/B bytes), so size B so store/B is a comfortable rewrite
    * (e.g. a 100 TB store wants B in the thousands, not 16 — the
    * fixture default keeps per-bucket file counts sane at test
    * scale).
    */
  val DefaultBuckets = 16

  private[streaming] val BucketCol = "__b"

  /** The stable bucket of a key — pmod of the 64-bit hash, never
    * null (a null key hashes to the seed), identical on every
    * version of the store.
    */
  def bucketOf(key: Column, nBuckets: Int): Column =
    pmod(xxhash64(key), lit(nBuckets.toLong))

  /** The distinct buckets `df`'s keys hash into — the driver-side
    * probe that decides which store buckets a batch must read and
    * rewrite. ONE single-pass job: collect_set partial-aggregates
    * per partition (at most `nBuckets` values each) into one reduce
    * row — no exchange of data rows, where a distinct().collect()
    * would shuffle the projection across the full shuffle-partition
    * fan-out first.
    */
  def touchedBuckets(df: DataFrame, key: Column, nBuckets: Int): Set[Long] =
    df.agg(collect_set(bucketOf(key, nBuckets)).as("__tb"))
      .head.getSeq[Long](0).toSet

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private[streaming] def versionDir(storeDir: String, id: Long) =
    s"$storeDir/v$id"

  private val VersionName = "^v(-?\\d+)$".r
  private val BucketName = s"^${BucketCol}=(\\d+)$$".r

  /** Committed version ids under `storeDir` (a version counts iff its
    * `_SUCCESS` marker exists), ascending. Driver-side metadata
    * listing, O(retained versions).
    */
  def versions(spark: SparkSession, storeDir: String): Seq[Long] = {
    val (fs, p) = fsOf(spark, storeDir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toIndexedSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case VersionName(id)
          if fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")) =>
            Some(id.toLong)
        case _ => None
      }).sorted
  }

  /** Latest committed version id, or None for an empty store. */
  def latestVersion(spark: SparkSession, storeDir: String): Option[Long] =
    versions(spark, storeDir).lastOption

  /** A committed version's bucket map: the fixed bucket count, the
    * store schema as of that version, and bucket -> owning version.
    */
  final case class Manifest(nBuckets: Int, schema: StructType,
                            owners: Map[Long, Long])

  def readManifest(spark: SparkSession, storeDir: String, id: Long): Manifest = {
    val (fs, _) = fsOf(spark, storeDir)
    val p = new org.apache.hadoop.fs.Path(versionDir(storeDir, id), "manifest")
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toIndexedSeq
      finally in.close()
    val kv = lines.takeWhile(_.contains('=')).map { l =>
      val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
    }.toMap
    val owners = lines.dropWhile(_.contains('=')).filter(_.nonEmpty).map { l =>
      val Array(b, v) = l.split("\t", 2); b.toLong -> v.toLong
    }.toMap
    Manifest(kv("buckets").toInt,
      org.apache.spark.sql.types.DataType.fromJson(kv("schema"))
        .asInstanceOf[StructType],
      owners)
  }

  private def writeManifest(spark: SparkSession, storeDir: String, id: Long,
                            m: Manifest): Unit = {
    val (fs, _) = fsOf(spark, storeDir)
    val p = new org.apache.hadoop.fs.Path(versionDir(storeDir, id), "manifest")
    val out = fs.create(p, true)
    try {
      val txt = s"buckets=${m.nBuckets}\nschema=${m.schema.json}\n" +
        m.owners.toSeq.sorted.map { case (b, v) => s"$b\t$v" }.mkString("\n")
      out.write(txt.getBytes("UTF-8"))
    } finally out.close()
  }

  private def emptyOf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Read the current store — all buckets, or `only` the named ones
    * (the touched-bucket subset a merge needs: a key can only match
    * rows in its own bucket, so the untouched 100 TB never enters the
    * plan at all). None for a store with no committed version; an
    * empty frame of the store schema when the selected buckets hold
    * no data.
    */
  def read(spark: SparkSession, storeDir: String,
           only: Option[Set[Long]] = None): Option[DataFrame] =
    latestVersion(spark, storeDir).map { v =>
      val m = readManifest(spark, storeDir, v)
      val owners = only.fold(m.owners)(sel => m.owners.filter(kv => sel(kv._1)))
      val paths = owners.toSeq.sorted.map { case (b, owner) =>
        s"${versionDir(storeDir, owner)}/data/$BucketCol=$b"
      }
      if (paths.isEmpty) emptyOf(spark, m.schema)
      // read under the manifest's EXPLICIT schema: the parquet reader
      // null-fills columns a file lacks, so buckets written before an
      // additive evolution read back widened with zero extra work —
      // where option("mergeSchema") would re-read EVERY footer of
      // every bucket file on every call (measured 2-3x the whole
      // continuous-merge replay at fixture scale)
      else spark.read.schema(m.schema).parquet(paths: _*)
    }

  /** Bucket -> data directory of the current store version (the
    * maintenance surface: per-bucket compaction rewrites one of these
    * dirs in place).
    */
  def bucketPaths(spark: SparkSession, storeDir: String): Map[Long, String] = {
    val v = latestVersion(spark, storeDir).getOrElse(
      throw new IllegalStateException(s"no committed store version under $storeDir"))
    readManifest(spark, storeDir, v).owners.map { case (b, owner) =>
      b -> s"${versionDir(storeDir, owner)}/data/$BucketCol=$b"
    }
  }

  /** Commit `df` as version `id`: write its rows partitioned by
    * `bucketOf(key)`, merge the bucket map (buckets actually written
    * take owner `id`, the rest keep their previous owner), then the
    * marker. `df` must hold the COMPLETE new content of every bucket
    * it touches — for a merge that is `mergeBatch(touched-buckets
    * read, batch)`. Deletes any uncommitted leftover of `id` first
    * (the replay-overwrite window).
    */
  def writeVersion(df: DataFrame, storeDir: String, id: Long, key: Column,
                   nBuckets: Int): Unit = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets must be positive")
    val spark = df.sparkSession
    require(!df.columns.contains(BucketCol),
      s"column name $BucketCol is reserved by the bucket layout")
    val (fs, _) = fsOf(spark, storeDir)
    val vdir = new org.apache.hadoop.fs.Path(versionDir(storeDir, id))
    fs.delete(vdir, true) // replay of an uncommitted attempt
    val prev = latestVersion(spark, storeDir)
      .map(readManifest(spark, storeDir, _))
    prev.foreach(m => require(m.nBuckets == nBuckets,
      s"store $storeDir was created with ${m.nBuckets} buckets; a key's " +
        s"bucket must be stable for the store's lifetime (got $nBuckets)"))
    val dataDir = s"${versionDir(storeDir, id)}/data"
    // repartition ON THE BUCKET before the partitioned write: without
    // it every upstream task splits its rows across every bucket dir
    // it touches — O(shuffle partitions × buckets) files per version,
    // whose footers every subsequent read then pays for (measured
    // 2-3x the continuous replay at fixture scale). One exchange of
    // the touched-bucket content buys one file per bucket per
    // version — the compact layout a table format's write bin-packing
    // produces, and the shape per-bucket maintenance compaction
    // ([[bucketPaths]]) wants to keep.
    df.withColumn(BucketCol, bucketOf(key, nBuckets))
      .repartition(col(BucketCol))
      .write.partitionBy(BucketCol).parquet(dataDir)
    val written = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir))
      .toIndexedSeq.filter(_.isDirectory)
      .flatMap(s => BucketName.findFirstMatchIn(s.getPath.getName)
        .map(_.group(1).toLong))
    val owners = prev.map(_.owners).getOrElse(Map.empty[Long, Long]) ++
      written.map(_ -> id)
    writeManifest(spark, storeDir, id, Manifest(nBuckets, df.schema, owners))
    fs.create(new org.apache.hadoop.fs.Path(vdir, "_SUCCESS"), true).close()
  }

  /** Drop version dirs that are neither among the newest `retain`
    * versions nor referenced by any of their manifests. A version
    * still OWNING buckets for a retained manifest survives however
    * old it is (deleting it would tear data out from under the
    * current store); a version fully superseded is garbage.
    */
  def vacuum(spark: SparkSession, storeDir: String, retain: Int): Unit = {
    val vs = versions(spark, storeDir)
    val retained = vs.takeRight(retain)
    val referenced = retained.toSet ++
      retained.flatMap(v => readManifest(spark, storeDir, v).owners.values)
    val (fs, _) = fsOf(spark, storeDir)
    vs.filterNot(referenced).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(versionDir(storeDir, v)), true)
    }
  }
}
