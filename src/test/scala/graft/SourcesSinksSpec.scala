package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY §2.3.1): the engine reads parquet
  * natively (Tables); this spec pins the CSV / JSON / text connector
  * surface with write→read roundtrips, including schema fidelity and
  * partitioned output.
  */
class SourcesSinksSpec extends SparkSpec {

  private def sample = Tables.documents(spark, "/root/testdata/sf0.001")
    .select("doc_id", "lang", "n_chars").orderBy("doc_id").limit(50)

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv roundtrip preserves rows and values (header + inferSchema)") {
    import spark.implicits._
    val dir = tmp("graft_csv")
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
      .select(col("doc_id").cast("long"), col("lang"), col("n_chars").cast("long"))
    assert(back.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq ==
      sample.as[(Long, String, Long)].collect().toSeq)
  }

  test("json-lines roundtrip preserves rows and schema") {
    import spark.implicits._
    val dir = tmp("graft_json")
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    assert(back.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq ==
      sample.as[(Long, String, Long)].collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("graft_part")
    Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).where(col("lang") === "en")
    // partition pruning: the physical plan's scanned partitions carry
    // only lang=en directories
    val scanned = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(one.count() ==
      Tables.documents(spark, "/root/testdata/sf0.001").where(col("lang") === "en").count())
    assert(scanned.contains("lang"), "expected partition filter in scan")
  }

  test("orc roundtrip preserves rows and schema; predicate pushes to the scan") {
    import spark.implicits._
    val dir = tmp("graft_orc")
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).select("doc_id", "lang", "n_chars")
    assert(back.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq ==
      sample.as[(Long, String, Long)].collect().toSeq)
    // ORC supports predicate pushdown like parquet: the filter must
    // reach the scan, not evaluate post-scan only
    val filtered = spark.read.orc(dir).where(col("n_chars") > 100)
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [") && scan.contains("n_chars"),
      s"expected n_chars filter pushed to the ORC scan, got: $scan")
  }

  test("text sink + wholetext source roundtrip (the MR parity path)") {
    import spark.implicits._
    val dir = tmp("graft_text")
    Seq("alpha beta", "gamma").toDF("value").coalesce(1)
      .write.mode("overwrite").text(dir)
    val back = spark.read.option("wholetext", "true").text(dir)
      .as[String].collect().head
    assert(back.split("\n").toSet == Set("alpha beta", "gamma"))
  }

  test("exportShards: hive-partitioned layout, sorted files, run-to-run determinism") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text")
    val d1 = tmp("graft_shards1"); val d2 = tmp("graft_shards2")
    graft.ext.Curation.exportShards(docs, d1, Seq("lang"), "doc_id", shardsPerPart = 2)
    graft.ext.Curation.exportShards(docs, d2, Seq("lang"), "doc_id", shardsPerPart = 2)
    // layout: one dir per lang value, ≤ shardsPerPart files each
    val langs = new java.io.File(d1).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(langs.nonEmpty && langs.forall(_.matches("lang=\\w+")))
    langs.foreach { l =>
      val files = new java.io.File(s"$d1/$l").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length <= 2, s"$l has ${files.length} files > shardsPerPart")
    }
    // every row survives, values intact
    val back = spark.read.parquet(d1)
    assert(back.count() == docs.count())
    assert(back.select(sum(col("doc_id"))).head().getLong(0) ==
      docs.select(sum(col("doc_id"))).head().getLong(0))
    // determinism: the same corpus exports the same per-file row sets
    // and order (file NAMES embed task ids; compare contents)
    def contents(dir: String): Map[String, Seq[Long]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("lang="))
        .flatMap { ld =>
          ld.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
            val ids = spark.read.parquet(f.getAbsolutePath)
              .select("doc_id").as[Long].collect().toSeq
            s"${ld.getName}/${ids.headOption.getOrElse(-1L)}" -> ids
          }
        }.toMap
    assert(contents(d1) == contents(d2))
    // in-file ordering: sorted by the key
    contents(d1).values.foreach(ids => assert(ids == ids.sorted))
  }

  test("json source surfaces corrupt records permissively and can be made to fail fast") {
    import spark.implicits._
    val dir = tmp("graft_corrupt")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.json"),
      """{"id": 1, "v": "ok"}
        |{"id": 2 "v": "missing comma"}
        |{"id": 3, "v": "ok2"}""".stripMargin.getBytes)
    // PERMISSIVE (default): bad line lands in _corrupt_record, good
    // rows survive — the posture a 100 TB ingest wants (quarantine,
    // don't abort); explicit schema because schema inference would
    // also have to guess the corrupt column
    val schema = "id LONG, v STRING, _corrupt_record STRING"
    // Spark refuses corrupt-record-only filters over the raw files
    // (the reparse couldn't reproduce the column) — materialize first,
    // exactly what a quarantine step does anyway
    val rows = spark.read.schema(schema).json(dir).cache()
    try {
      assert(rows.where(col("_corrupt_record").isNotNull).count() == 1)
      assert(rows.where(col("id").isNotNull).count() == 2)
    } finally rows.unpersist()
    // FAILFAST: the same file aborts the read — the posture a
    // correctness gate wants
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema("id LONG, v STRING").option("mode", "FAILFAST")
        .json(dir).collect()
    }
    assert(ex.getMessage.contains("FAILFAST")
      || Option(ex.getCause).exists(_.getMessage.contains("Malformed")))
  }

  test("binaryFile source ingests opaque media files into the multimodal pipeline") {
    import java.nio.file.{Files, Paths}
    val dir = tmp("graft_bin")
    Files.createDirectories(Paths.get(dir))
    val payloads = Map(
      "a.img" -> Array.tabulate(300)(_.toByte),
      "b.img" -> Array.tabulate(17)(i => (i * 3).toByte))
    payloads.foreach { case (name, bytes) =>
      Files.write(Paths.get(dir, name), bytes)
    }
    // the real-world ingestion path for image/audio blobs: one row per
    // file with (path, modificationTime, length, content)
    val media = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.img").load(dir)
    assert(media.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val byName = media.collect().map { r =>
      val p = r.getAs[String]("path")
      p.substring(p.lastIndexOf('/') + 1) ->
        (r.getAs[Long]("length"), r.getAs[Array[Byte]]("content"))
    }.toMap
    assert(byName.keySet == payloads.keySet)
    payloads.foreach { case (name, bytes) =>
      assert(byName(name)._1 == bytes.length.toLong)
      assert(java.util.Arrays.equals(byName(name)._2, bytes),
        s"$name content must round-trip byte-exact")
    }
    // downstream: the binary column feeds the REAL javax.imageio
    // decoder — these fixture blobs are NOT images, so the quarantine
    // contract applies: NULL dims, never an exception or a lost row
    val meta = graft.ext.Multimodal.decodeImageMeta(
      media.select(
        org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.hash(col("path"))).cast("long").as("media_id"),
        org.apache.spark.sql.functions.lit("image").as("media_type"),
        col("content").as("payload")))
    assert(meta.count() == 2)
    assert(meta.collect().forall(r =>
      r.isNullAt(r.fieldIndex("width")) && r.getAs[Long]("n_bytes") > 0))
  }
}
