package graft.queries

import graft.Tables
import graft.ext.{Hashing, PlanCache}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Source family: non-parquet ingestion under the DuckDB gate. The
  * spec-level coverage (SourcesSinksSpec's permissive / failfast /
  * quarantine cases) proves the reader OPTIONS behave; these rows
  * prove the full ingest CONTRACT — schema-on-read, malformed-record
  * quarantine, and byte-exact content fidelity through the
  * encode/decode round trip — against an oracle computed
  * INDEPENDENTLY from the parquet source of truth (the fixture is
  * derived from `documents`, so the oracle never needs to parse the
  * serialized files: if the census and the md5-fingerprint checksums
  * match, the serialize→parse loop was lossless and the corrupt
  * lines were quarantined rather than silently dropped or admitted).
  *
  * Fixture prep is [[PlanCache.artifact]]-memoized per (tag, input
  * plan) — written once per scale dir per session, exactly like the
  * streaming rows' source dirs. Corrupt lines are INJECTED (one per
  * doc_id % 50 == 0, alongside all valid lines, in separate part
  * files so a malformed line can never swallow a valid one), making
  * the quarantine count fixture-derivable on the oracle side.
  *
  * 100 TB shape: both readers are plain distributed file scans —
  * line-splittable text, schema supplied (no inference pass over the
  * data), PERMISSIVE parse with a corrupt-record column instead of a
  * job-killing failfast — the configuration a production ingest of
  * third-party dumps actually runs. The census is one map-side parse
  * + one lang-bounded aggregate.
  */
object ExtSourceQueries {

  private val P = 1000000007L

  private def readSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("source", StringType), StructField("text", StringType),
    StructField("_corrupt", StringType)))

  /** Census of a parsed ingest: per-lang counts + id/fingerprint
    * checksums over the CLEAN rows, one `__corrupt` row pinning the
    * quarantine count. ONE groupBy pass with the quarantine folded in
    * as a group — both because one scan is the right shape and
    * because Spark refuses a plan whose only referenced column is the
    * internal corrupt-record column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which a
    * separate quarantine-count branch would be.
    */
  private def census(parsed: org.apache.spark.sql.DataFrame) =
    parsed.groupBy(when(col("_corrupt").isNotNull, lit("__corrupt"))
        .otherwise(col("lang")).as("lang"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("_corrupt").isNull, col("doc_id"))), lit(-1L))
          .as("id_checksum"),
        coalesce(sum(when(col("_corrupt").isNull,
          Hashing.h60(col("text")) % P)), lit(-1L)).as("fp_checksum"))
      .orderBy("lang")

  private val oracleCensus =
    """SELECT lang, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
              CAST(SUM(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)
                       % 1000000007) AS BIGINT) AS fp_checksum
       FROM documents GROUP BY lang
       UNION ALL
       SELECT '__corrupt',
              (SELECT COUNT(*) FROM documents WHERE doc_id % 50 = 0),
              CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
       ORDER BY lang"""

  val all: Seq[Declared] = Seq(

    // JSONL ingest: every document serialized as one JSON line
    // (to_json), plus one truncated-JSON line per doc_id % 50 == 0.
    // schema-on-read + PERMISSIVE + columnNameOfCorruptRecord — the
    // corrupt lines land in quarantine with the raw line preserved,
    // every valid line round-trips byte-exactly (fp_checksum).
    Declared(
      "ext_source_jsonl",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dir = PlanCache.artifact("source/jsonl/mod50", docs) { dd =>
          val p = java.nio.file.Files
            .createTempDirectory("graft_src_jsonl").toString
          dd.select(to_json(struct(col("doc_id"), col("lang"),
            col("source"), col("text"))).as("value"))
            .write.mode("overwrite").text(p)
          // corrupt lines in their own part files: truncated objects
          dd.where(col("doc_id") % 50 === 0)
            .select(concat(lit("{\"doc_id\":"), col("doc_id").cast("string"),
              lit(",\"lang\":")).as("value"))
            .write.mode("append").text(p)
          p
        }
        census(s.read.schema(readSchema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(dir))
      },
      Some(oracleCensus)),

    // CSV ingest: headerless CSV (schema supplied — no per-file
    // header handling, no inference pass), plus one type-corrupt line
    // per doc_id % 50 == 0 (non-numeric doc_id — a single-line
    // corruption that cannot swallow neighbors the way an
    // unterminated quote would). Same census, same oracle: the CSV
    // quoting/escaping round trip must be lossless and the malformed
    // lines quarantined.
    Declared(
      "ext_source_csv",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dir = PlanCache.artifact("source/csv/mod50", docs) { dd =>
          val p = java.nio.file.Files
            .createTempDirectory("graft_src_csv").toString
          dd.select(col("doc_id"), col("lang"), col("source"), col("text"))
            .write.mode("overwrite").csv(p)
          dd.where(col("doc_id") % 50 === 0)
            .select(concat(lit("x"), col("doc_id").cast("string"),
              lit(",zz,bad,corrupt line")).as("value"))
            .write.mode("append").text(p)
          p
        }
        census(s.read.schema(readSchema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .csv(dir))
      },
      Some(oracleCensus)),

    // ORC ingest: the third-party COLUMNAR interchange case (no
    // line-corruption surface — the format is self-describing and
    // block-checksummed; a torn file fails loudly rather than
    // quarantining). The contract under the gate is round-trip
    // fidelity: the documents table written as ORC and read back must
    // census identically to the parquet source of truth, fingerprints
    // included. 100 TB shape: a splittable columnar scan with column
    // pruning and predicate pushdown, same as parquet — the census
    // reads (doc_id, lang, text) only.
    Declared(
      "ext_source_orc",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dir = PlanCache.artifact("source/orc", docs) { dd =>
          val p = java.nio.file.Files
            .createTempDirectory("graft_src_orc").toString
          dd.select(col("doc_id"), col("lang"), col("source"), col("text"))
            .write.mode("overwrite").orc(p)
          p
        }
        s.read.orc(dir)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum(col("doc_id")).as("id_checksum"),
            sum(Hashing.h60(col("text")) % P).as("fp_checksum"))
          .orderBy("lang")
      },
      Some("""SELECT lang, COUNT(*) AS n,
                     CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
                     CAST(SUM(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)
                              % 1000000007) AS BIGINT) AS fp_checksum
              FROM documents GROUP BY lang ORDER BY lang"""))
  )
}
