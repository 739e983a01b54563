package graft.queries

import graft.Tables
import graft.ext.{Changelog, Hashing}
import org.apache.spark.sql.functions._

/** Corpus-versioning family: CDC merge, snapshot diff, SCD-2
  * history, time travel — the [[graft.ext.Changelog]] rows, split out
  * of ExtPipelineQueries (round 12, mechanical — blocks moved
  * verbatim) to keep the per-family registries under the ~900-line
  * ceiling. The streaming twin (`ext_stream_merge`) lives with the
  * other replay-gated rows in [[ExtStreamQueries]].
  */
object ExtVersionQueries {

  val all: Seq[Declared] = Seq(

    // CDC merge ([[Changelog.applyLog]]): a changelog derived from
    // the events stream (key = user_id + 1450, so the log spans
    // updates to existing customers AND inserts past the snapshot's
    // key range; latest 'error' event ⇒ delete) applied to the
    // customer snapshot. Latest-per-key is max_by over the (ts,
    // event_id) seq — partial-aggregated map-side, so a
    // million-change hot key collapses before the exchange — and the
    // snapshot crosses exactly one anti-join. The full merged table
    // is the gated output (balances as cents), so insert, update,
    // delete, and passthrough rows are all pinned by value.
    Declared(
      "ext_pipeline_merge",
      (s, d) => {
        val snap = Tables.customer(s, d)
        val k = col("user_id") + 1450
        val log = Tables.events(s, d).select(
          k.as("c_custkey"),
          concat(lit("u"), k.cast("string")).as("c_name"),
          (k % 25).cast("int").as("c_nationkey"),
          col("value").as("c_acctbal"),
          col("event_type").as("c_mktsegment"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          col("ts"), col("event_id"))
        Changelog.applyLog(snap, log, "c_custkey", "op", Seq("ts", "event_id"))
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            round(col("c_acctbal") * 100).cast("long").as("bal_cents"),
            col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("""WITH log AS (
                SELECT user_id + 1450 AS k,
                       'u' || CAST(user_id + 1450 AS VARCHAR) AS c_name,
                       CAST((user_id + 1450) % 25 AS INTEGER) AS c_nationkey,
                       value AS c_acctbal, event_type AS c_mktsegment,
                       CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                       ts, event_id
                FROM events),
              latest AS (
                SELECT k, c_name, c_nationkey, c_acctbal, c_mktsegment, op FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                    ORDER BY ts DESC, event_id DESC) AS rn FROM log)
                WHERE rn = 1),
              merged AS (
                SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
                       c.c_mktsegment
                FROM customer c ANTI JOIN latest l ON c.c_custkey = l.k
                UNION ALL
                SELECT k, c_name, c_nationkey, c_acctbal, c_mktsegment
                FROM latest WHERE op <> 'D')
              SELECT c_custkey, c_name, c_nationkey,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
                     c_mktsegment
              FROM merged ORDER BY c_custkey""")),

    // Snapshot diff ([[Changelog.diff]]): version B of the documents
    // corpus is a deterministic perturbation of version A (doc_id %
    // 13 removed, % 7 text-modified, % 11 re-added under shifted
    // ids), and the diff labels every key added / removed / changed /
    // unchanged. Rows compare by 8-byte content fingerprints computed
    // map-side — the one shuffle carries (key, fp) pairs, never text;
    // the full labeled table is the gated output.
    Declared(
      "ext_pipeline_snapshot_diff",
      (s, d) => {
        val a = Tables.documents(s, d).select("doc_id", "text")
        val b = a.where(col("doc_id") % 13 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
          .unionByName(a.where(col("doc_id") % 11 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
        Changelog.diff(a, b, "doc_id", Hashing.h60(col("text")))
          .orderBy("doc_id")
      },
      Some("""WITH a AS (SELECT doc_id, text FROM documents),
              b AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
                FROM documents WHERE doc_id % 13 <> 0
                UNION ALL
                SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 11 = 0),
              fa AS (SELECT doc_id, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS f FROM a),
              fb AS (SELECT doc_id, CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS f FROM b)
              SELECT COALESCE(fa.doc_id, fb.doc_id) AS doc_id,
                     CASE WHEN fa.f IS NULL THEN 'added'
                          WHEN fb.f IS NULL THEN 'removed'
                          WHEN fa.f = fb.f THEN 'unchanged'
                          ELSE 'changed' END AS status
              FROM fa FULL OUTER JOIN fb ON fa.doc_id = fb.doc_id
              ORDER BY doc_id""")),


    // SCD-type-2 history ([[Changelog.scd2]]) of the same events
    // changelog ext_pipeline_merge applies: every non-delete entry
    // becomes a version row valid [its ts, next entry's ts), deletes
    // close without opening, null valid_to = current. The full
    // history table is the gated output — validity chaining,
    // delete-closure, and the current flag are all pinned by value
    // (applyLog ≡ this history filtered to is_current, which makes
    // the two rows mutual audits).
    Declared(
      "ext_pipeline_scd2",
      (s, d) => {
        val log = Tables.events(s, d).select(
          col("user_id").as("k"), col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"),
          col("event_type"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"))
        Changelog.scd2(log, "k", "op", Seq("ts", "event_id"), "ts")
          .select(col("k"), col("event_id"), col("cents"), col("event_type"),
            date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("vf"),
            date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("vt"),
            col("is_current").cast("int").as("cur"))
          .orderBy("event_id")
      },
      Some("""WITH log AS (
                SELECT user_id AS k, event_id, ts,
                       CAST(round(value * 100) AS BIGINT) AS cents, event_type,
                       CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
                FROM events),
              v AS (
                SELECT *, LEAD(ts) OVER (PARTITION BY k ORDER BY ts, event_id) AS vto
                FROM log)
              SELECT k, event_id, cents, event_type,
                     strftime(ts, '%Y-%m-%d %H:%M:%S') AS vf,
                     strftime(vto, '%Y-%m-%d %H:%M:%S') AS vt,
                     CASE WHEN vto IS NULL THEN 1 ELSE 0 END AS cur
              FROM v WHERE op <> 'D' ORDER BY event_id""")),

    // Time travel ([[Changelog.asOf]]): the snapshot visible at
    // 2024-01-16T00:00Z, read straight off the same SCD-2 history as
    // ext_pipeline_scd2 with ONE map-side interval filter — no join,
    // no window. Keys whose last pre-instant entry was a delete must
    // be absent (the delete capped the previous version's valid_to);
    // per-type counts plus id/cents checksums pin exactly which
    // version of every key the instant sees.
    Declared(
      "ext_pipeline_time_travel",
      (s, d) => {
        val log = Tables.events(s, d).select(
          col("user_id").as("k"), col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"),
          col("event_type"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"))
        val hist = Changelog.scd2(log, "k", "op", Seq("ts", "event_id"), "ts")
        Changelog.asOf(hist, to_timestamp(lit("2024-01-16 00:00:00")))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_keys"),
            sum(col("k")).as("key_checksum"),
            sum(col("event_id")).as("version_checksum"),
            sum(col("cents")).as("cents_checksum"))
          .orderBy("event_type")
      },
      Some("""WITH log AS (
                SELECT user_id AS k, event_id, ts,
                       CAST(round(value * 100) AS BIGINT) AS cents, event_type,
                       CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
                FROM events),
              v AS (
                SELECT *, LEAD(ts) OVER (PARTITION BY k ORDER BY ts, event_id) AS vto
                FROM log),
              snap AS (
                SELECT * FROM v
                WHERE op <> 'D'
                  AND ts <= TIMESTAMP '2024-01-16 00:00:00'
                  AND (vto IS NULL OR TIMESTAMP '2024-01-16 00:00:00' < vto))
              SELECT event_type, COUNT(*) AS n_keys,
                     CAST(SUM(k) AS BIGINT) AS key_checksum,
                     CAST(SUM(event_id) AS BIGINT) AS version_checksum,
                     CAST(SUM(cents) AS BIGINT) AS cents_checksum
              FROM snap GROUP BY 1 ORDER BY event_type"""))
  )
}
