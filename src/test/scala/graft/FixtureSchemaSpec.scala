package graft

import org.apache.spark.sql.functions._

/** Fixture-schema canary (round 9, VERDICT r8 item #3).
  *
  * The driver regenerates `/root/testdata` between rounds and has
  * already changed physical encodings once (2026-08-12: `events.ts`
  * parquet TIMESTAMP(NANOS) → tz-less `timestamp[us]`), which broke 5
  * queries and 7 tests in ways that pointed everywhere except the
  * loader. This spec pins the EXACT Spark-side schema each table
  * surfaces after `Tables.load` normalization, so the next
  * oracle-side writer drift reds ONE obvious test with a readable
  * diff instead of scattering analysis errors across suites.
  *
  * Expectations encode current, deliberate reality:
  *  - `events.ts` is normalized to instant `timestamp` (LTZ) by
  *    `Tables.loadPlain`, whichever encoding the writer used.
  *  - `o_orderdate` / `l_shipdate` surface as `timestamp_ntz`
  *    (tz-less parquet, no loader normalization — every green query
  *    over them is NTZ-safe; if this line reds, the writer moved
  *    again and the loader arm may need widening).
  */
class FixtureSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  for (t <- Tables.names)
    test(s"$t surfaces the pinned post-load schema") {
      val got = Tables.load(spark, dir, t).schema.fields
        .map(f => f.name -> f.dataType.simpleString).toSeq
      assert(got === expected(t),
        s"fixture writer drift on `$t` — update Tables normalization " +
          "and/or this canary deliberately")
    }

  test("events.ts supports instant arithmetic (unix_millis analyzes)") {
    // the exact r8 failure mode: TIMESTAMP_NTZ reaching unix_millis
    // threw DATATYPE_MISMATCH at analysis in 5 queries at once
    val ms = Tables.events(spark, dir)
      .agg(max(unix_millis(col("ts")))).head.getLong(0)
    assert(ms > 0L)
  }

  test("a non-UTC session reads the same events epochs as the UTC session") {
    // the loader's NTZ→instant cast is pinned to UTC explicitly
    // (Tables.normalizeEventsTs), NOT to the session zone: a library
    // consumer running e.g. a New York session must read the same
    // epochs the graft UTC mains read — a session-zone-dependent cast
    // would silently shift every timestamp by the zone offset
    // (5×3600×1e6 µs here), corrupting joins/windows with no error.
    // newSession() shares the SparkContext but carries its own SQL
    // conf, so the shared UTC session is untouched.
    def sig(s: org.apache.spark.sql.SparkSession): (Long, Long) = {
      val r = Tables.events(s, dir)
        .agg(count(lit(1)), sum(unix_micros(col("ts")) % 1000000007L))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val nySession = spark.newSession()
    nySession.conf.set("spark.sql.session.timeZone", "America/New_York")
    nySession.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val utc = sig(spark)
    val ny = sig(nySession)
    assert(ny == utc,
      s"session-timezone-dependent epoch read: UTC=$utc NY=$ny")
  }
}
