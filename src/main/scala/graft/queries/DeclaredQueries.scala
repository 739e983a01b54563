package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared query: a Spark DataFrame program plus (when
  * SQL-expressible) the equivalent DuckDB SQL the driver runs as the
  * correctness oracle (SURVEY.md §2.4, BASELINE.md t2 gate).
  */
final case class Declared(
    name: String,
    df: (SparkSession, String) => DataFrame,
    sql: Option[String])

/** Exact 2-decimal fixed-point aggregation as integer "cents".
  *
  * The money/quantity columns are 2-decimal fixed-point by
  * construction, but Spark's `sum(DECIMAL)` runs ~20× slower than an
  * integer sum (per-row Decimal boxing in the agg buffer). Summing
  * `round(x*100)::long` instead is exactly equal — each value is the
  * nearest double to a 2-decimal number, so x*100 is within 1e-9 of
  * an integer and `round` recovers it losslessly — and stays inside
  * codegen'd long arithmetic. Emission divides back and rounds, same
  * formula on the DuckDB twin.
  *
  * 100 TB note: the long cents sum overflows past Long.MaxValue ≈
  * 9.2e18 cents ≈ 9.2e16 currency units per group. DQ9-shaped groups
  * at 100 TB TPC-H scale reach ~1e18 cents: inside the range but only
  * ~8× headroom, not "orders of magnitude". Under Spark 4's default
  * ANSI mode (this library never disables it) overflow FAILS LOUDLY
  * (ARITHMETIC_OVERFLOW) — no silent divergence from the
  * HUGEINT-promoting DuckDB oracle is possible. Only a session run
  * with spark.sql.ansi.enabled=false wraps silently; never combine
  * that with this path. When per-group sums can approach ~1e18
  * cents, use [[sumCentsExact]] (DECIMAL(38,0) accumulation —
  * overflow-proof, ~20× slower). Both behaviors are pinned by
  * FixedPointSpec.
  */
private[queries] object FixedPoint {
  /** Long-cents SUM of a 2-decimal fixed-point double column.
    * DuckDB twin: `SUM(CAST(round(x*100) AS BIGINT))`.
    */
  def sumCents(c: Column): Column = sum(round(c * 100).cast("long"))

  /** Overflow-proof fallback: cents accumulated in DECIMAL(38,0).
    * Same values as [[sumCents]] while the long path is in range;
    * required once per-group sums approach ~1e18 cents (see object
    * doc). DuckDB twin: `SUM(CAST(round(x*100) AS HUGEINT))`.
    */
  def sumCentsExact(c: Column): Column =
    sum(round(c * 100).cast(org.apache.spark.sql.types.DecimalType(38, 0)))

  /** Emit a cents sum as the canonical rounded double.
    * DuckDB twin: `ROUND(CAST(s AS DOUBLE)/100.0, 2)`.
    */
  def outCents(c: Column): Column = round(c.cast("double") / 100.0, 2)
}

/** DQ1–DQ16 — the declared query inventory of SURVEY.md §2.4.
  *
  * Canonicalization protocol (shared with the DuckDB oracle):
  *  - every query carries a total ORDER BY;
  *  - aggregates over doubles go through CAST(x AS DECIMAL(18,2));
  *  - averages are SUM/COUNT over exact integers in double, ROUND(..,2);
  *  - timestamps are emitted as 'yyyy-MM-dd HH:mm:ss' strings in UTC;
  *  - BIGINT-typed sums are cast explicitly on the DuckDB side (DuckDB
  *    SUM(BIGINT) returns HUGEINT, which pandas would coerce lossily).
  *
  * Scale notes are inline per query; the common ones: dimension joins
  * are broadcast, aggregations rely on Catalyst's partial/final split
  * (map-side combine), and all scans prune columns + push predicates
  * into the parquet reader.
  */
object DeclaredQueries {
  private val Dec = DecimalType(18, 2)
  private def dec(c: Column): Column = c.cast(Dec)

  /** Output canonicalization for decimal aggregates: the aggregation
    * stays exact in DECIMAL, but the *emitted* column is
    * round(cast(x as double), 2) — on both engines — because the
    * driver's oracle materializes DuckDB decimals as float64 (pandas),
    * so a raw DECIMAL column stringifies differently on trailing
    * zeros ('104997.90' vs '104997.9') and fails the hash gate.
    */
  private def outDec(c: Column): Column = round(c.cast("double"), 2)

  /** Exact fixed-point(2) SUM at integer speed (see [[FixedPoint]]). */
  private def sumCents(c: Column): Column = FixedPoint.sumCents(c)
  private def outCents(c: Column): Column = FixedPoint.outCents(c)

  /** wc.go tokenizer analogue, engine-neutral ASCII class (SURVEY §7.4):
    * split on runs of non-letters, drop empty tokens.
    * Reference: /root/reference/src/mrapps/wc.go:19-32.
    */
  def tokens(text: Column): Column = split(text, "[^a-zA-Z]+")

  val all: Seq[Declared] = Seq(
    // DQ1 — scan + count (E1; wc.go:37-40 count semantics).
    Declared(
      "dq01_count",
      (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM lineitem")),

    // DQ2 — word count (src/mrapps/wc.go:19-40). flatMap→groupBy.count;
    // Catalyst does partial aggregation map-side, unlike the reference,
    // which ships one KV per word occurrence across the shuffle.
    Declared(
      "dq02_wordcount",
      (s, d) =>
        Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("word"))
          .where(col("word") =!= "")
          .groupBy("word").agg(count(lit(1)).as("c"))
          .orderBy("word"),
      Some("""SELECT w AS word, COUNT(*) AS c
              FROM (SELECT unnest(string_split_regex(text, '[^a-zA-Z]+')) AS w
                    FROM documents)
              WHERE w <> '' GROUP BY w ORDER BY word""")),

    // DQ3 — inverted index, doc-frequency form (src/mrapps/indexer.go:20-39):
    // per-document DISTINCT words (array_distinct before the explode —
    // map-side, equivalent to a global distinct on (doc_id, word) but
    // with no exchange), then doc counts per word.
    Declared(
      "dq03_inverted_index",
      (s, d) =>
        Tables.documents(s, d)
          .select(explode(array_distinct(tokens(col("text")))).as("word"))
          .where(col("word") =!= "")
          .groupBy("word").agg(count(lit(1)).as("n_docs"))
          .orderBy("word"),
      Some("""SELECT w AS word, COUNT(*) AS n_docs
              FROM (SELECT DISTINCT doc_id,
                           unnest(string_split_regex(text, '[^a-zA-Z]+')) AS w
                    FROM documents)
              WHERE w <> '' GROUP BY w ORDER BY word""")),

    // DQ4 — predicate filter (distributed grep; SURVEY §2.3.2). The LIKE
    // pushes down to the parquet scan as a string-contains filter.
    Declared(
      "dq04_grep",
      (s, d) =>
        Tables.documents(s, d)
          .where(col("text").contains("join"))
          .select("doc_id", "lang")
          .orderBy("doc_id"),
      Some("SELECT doc_id, lang FROM documents WHERE text LIKE '%join%' ORDER BY doc_id")),

    // DQ5 — global sort + top-k (E6; mrsequential.go:59). Spark plans
    // TakeOrderedAndProject: per-partition top-100 then a single merge —
    // no global sort materializes even at 100 TB.
    Declared(
      "dq05_topk",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            outDec(dec(col("l_extendedprice"))).as("price"))
          .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100),
      Some("""SELECT l_orderkey, l_linenumber,
                     ROUND(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS price
              FROM lineitem
              ORDER BY price DESC, l_orderkey, l_linenumber LIMIT 100""")),

    // DQ6 — multi-source UNION ALL (coordinator.go:154-162).
    Declared(
      "dq06_union",
      (s, d) => {
        val o = Tables.orders(s, d).agg(count(lit(1)).as("n"))
          .select(lit("orders").as("src"), col("n"))
        val l = Tables.lineitem(s, d).agg(count(lit(1)).as("n"))
          .select(lit("lineitem").as("src"), col("n"))
        o.union(l).orderBy("src")
      },
      Some("""SELECT src, n FROM (
                SELECT 'orders' AS src, COUNT(*) AS n FROM orders
                UNION ALL
                SELECT 'lineitem', COUNT(*) FROM lineitem) ORDER BY src""")),

    // DQ7 — deterministic sorted-multiset aggregation
    // (src/mrapps/crash.go:45-55, indexer.go:36-39): values sorted then
    // space-joined. Groups here are bounded (suppliers per nation), so
    // collect_list is safe; unbounded groups would use the streaming
    // variant in ext/.
    Declared(
      "dq07_sorted_multiset",
      (s, d) =>
        Tables.supplier(s, d)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"),
            array_join(array_sort(collect_list(col("s_name"))), " ").as("names"))
          .orderBy("s_nationkey"),
      Some("""SELECT s_nationkey, COUNT(*) AS n,
                     string_agg(s_name, ' ' ORDER BY s_name) AS names
              FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // DQ8 — group-by count per key (src/mrapps/early_exit.go:19-36).
    Declared(
      "dq08_group_count",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("event_type").agg(count(lit(1)).as("n"))
          .orderBy("event_type"),
      Some("SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type")),

    // DQ9 — multi-column numeric aggregation (generalized reduce, E8).
    // Sums run as exact long "cents" ([[FixedPoint]]), not DECIMAL.
    Declared(
      "dq09_numeric_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(outCents(sumCents(col("l_quantity"))).as("sum_qty"),
            outCents(sumCents(col("l_extendedprice"))).as("sum_price"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
                     ROUND(CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0, 2) AS sum_qty,
                     ROUND(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0, 2) AS sum_price,
                     COUNT(*) AS n
              FROM lineitem GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // DQ10 — equi-join fact→dims + agg (SURVEY §2.3.3). customer and
    // nation are dimension tables: broadcast both so the 100 TB orders
    // fact never shuffles for the join; only the final small groupBy
    // exchanges data.
    Declared(
      "dq10_join_agg",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val customer = broadcast(Tables.customer(s, d).select("c_custkey", "c_nationkey"))
        val nation = broadcast(Tables.nation(s, d).select("n_nationkey", "n_name"))
        orders
          .join(customer, col("o_custkey") === col("c_custkey"))
          .join(nation, col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_orders"), outDec(sum(dec(col("o_totalprice")))).as("rev"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, COUNT(*) AS n_orders,
                     ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS rev
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // DQ11 — anti join (SURVEY §2.3.3): customers with no orders.
    // left_anti against a broadcast of the distinct keys; at 100 TB the
    // distinct() shrinks the build side before the broadcast.
    Declared(
      "dq11_anti_join",
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d).select("o_custkey").distinct(),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM customer
              WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""")),

    // DQ12 — exact dedup census (north_star). Distinct counted over
    // md5(text), not the text itself, so the shuffle ships 32-byte
    // digests instead of full document bytes (identical answer short
    // of an md5 collision); both engines compute md5 bit-equal.
    Declared(
      "dq12_exact_dedup",
      (s, d) =>
        Tables.documents(s, d)
          .agg(count(lit(1)).as("docs"), countDistinct(md5(col("text"))).as("uniq_text")),
      Some("SELECT COUNT(*) AS docs, COUNT(DISTINCT md5(text)) AS uniq_text FROM documents")),

    // DQ13 — text stats per group (north_star). avg emitted as exact
    // integer SUM/COUNT in double then ROUND — engine-order-independent.
    Declared(
      "dq13_text_stats",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
            round(sum(col("n_chars")).cast("double") / count(lit(1)), 2).as("avg_chars"))
          .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n,
                     CAST(SUM(n_chars) AS BIGINT) AS chars,
                     ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars
              FROM documents GROUP BY lang ORDER BY lang""")),

    // DQ14 — event-time tumbling window, batch-checkable (SURVEY §2.3.9).
    // Emitted as a string to be precision-neutral across engines; the
    // Structured Streaming twin is
    // [[graft.streaming.StreamingQueries.tumblingWindow]], for which
    // this batch query is the correctness oracle (StreamingSpec).
    Declared(
      "dq14_tumbling_window",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("h"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), outDec(sum(dec(col("value")))).as("v"))
          .orderBy("h", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
                     event_type, COUNT(*) AS n,
                     ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS v
              FROM events GROUP BY h, event_type ORDER BY h, event_type""")),

    // DQ15 — ranking window function (SURVEY §2.3.5): top-3 customers by
    // balance per market segment.
    Declared(
      "dq15_window_rank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(dec(col("c_acctbal")).desc, col("c_custkey"))
        Tables.customer(s, d)
          .select(col("c_mktsegment"), col("c_custkey"),
            row_number().over(w).as("rk"))
          .where(col("rk") <= 3)
          .select("c_mktsegment", "c_custkey")
          .orderBy("c_mktsegment", "c_custkey")
      },
      Some("""SELECT c_mktsegment, c_custkey FROM (
                SELECT c_mktsegment, c_custkey,
                       ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                         ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey) AS rk
                FROM customer)
              WHERE rk <= 3 ORDER BY c_mktsegment, c_custkey""")),

    // DQ16 — JSON scalar function (SURVEY §2.3.8).
    Declared(
      "dq16_json_extract",
      (s, d) =>
        Tables.events(s, d)
          .select((get_json_object(col("props"), "$.k").cast("bigint") % 10).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket"),
      Some("""SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS bucket,
                     COUNT(*) AS n
              FROM events GROUP BY bucket ORDER BY bucket"""))
  )
}
