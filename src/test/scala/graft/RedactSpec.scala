package graft

import graft.ext.TextStats
import org.apache.spark.sql.functions._

/** PII redaction and URL-domain census ([[graft.ext.TextStats]]):
  * hand-computed expectations on crafted rows, including the boundary
  * cases the cross-engine oracle leans on (leading-digit quads, no-TLD
  * "emails", threshold-length digit runs, scheme-less hosts).
  */
class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("redact replaces emails, dotted quads, and long digit runs in rule order") {
    val out = Seq(
      "mail a.b@x.org and ip 10.0.0.1 and acct 123456789 done")
      .toDF("t").select(TextStats.redact(col("t")).as("r"))
      .head.getString(0)
    assert(out == "mail <EMAIL> and ip <IP> and acct <NUM> done")
  }

  test("redact boundary cases: backtracked quad, no-TLD, 8-digit run survive intact") {
    val out = Seq("x 1234.5.6.7 a@b 12345678 v1.2.3 end")
      .toDF("t").select(TextStats.redact(col("t")).as("r"))
      .head.getString(0)
    // leftmost quad in "1234.5.6.7" starts at the '2' (no 4-group match
    // starts at the '1'); "a@b" has no TLD dot; 8 digits is one short
    assert(out == "x 1<IP> a@b 12345678 v1.2.3 end")
  }

  test("redact order: email digits are consumed before the digit-run rule sees them") {
    val out = Seq("user123456789@ex.org 123456789")
      .toDF("t").select(TextStats.redact(col("t")).as("r"))
      .head.getString(0)
    assert(out == "<EMAIL> <NUM>")
  }

  test("redactStats counts match replacements per rule; null text propagates null") {
    val df = Seq(
      (1L, Some("a@b.co c@d.org 1.2.3.4 999888777 12345678")),
      (2L, Some("clean text, nothing to scrub")),
      (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val rows = TextStats.redactStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(rows(0).getInt(rows(0).fieldIndex("n_email")) == 2)
    assert(rows(0).getInt(rows(0).fieldIndex("n_ipv4")) == 1)
    assert(rows(0).getInt(rows(0).fieldIndex("n_number")) == 1)
    assert(rows(0).getString(rows(0).fieldIndex("redacted"))
      == "<EMAIL> <EMAIL> <IP> <NUM> 12345678")
    assert(rows(1).getInt(rows(1).fieldIndex("n_email")) == 0)
    assert(rows(1).getString(rows(1).fieldIndex("redacted"))
      == "clean text, nothing to scrub")
    assert(rows(2).isNullAt(rows(2).fieldIndex("n_email")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("redacted")))
  }

  test("urlDomains: per-domain url and distinct-doc counts; no scheme-less matches") {
    val df = Seq(
      (1L, "see https://a.example.org/p/1 and https://a.example.org/p/2"),
      (2L, "see https://a.example.org/x plus http://cdn.example.net/y?z=1"),
      (3L, "bare www.nope.com only"))
      .toDF("doc_id", "text")
    val got = TextStats.urlDomains(df, "doc_id", "text")
      .orderBy("domain")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a.example.org", 3L, 2L),
      ("cdn.example.net", 1L, 1L)))
  }

  test("urlDomains plan: extract+explode is map-side, one aggregation exchange") {
    val df = Seq((1L, "x https://d.example.org/p y")).toDF("doc_id", "text")
    val plan = TextStats.urlDomains(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // distinct-doc count forces one Expand+shuffle on domain — but
    // never a join or a second scan of the text
    assert(!plan.contains("Join"), plan)
  }

  test("canonicalUrl: each rewrite rule, kept-param order, non-URL passthrough") {
    val cases = Seq(
      // scheme+host lowercase, www and default port stripped,
      // trailing slash and fragment dropped
      ("HTTPS://WWW.Ex.ORG:443/A/b/#frag", "https://ex.org/A/b"),
      ("http://ex.org:80/", "http://ex.org"),
      // tracking params go, others stay in their original order
      ("https://ex.org/p?utm_source=a&b=2&gclid=z&a=1", "https://ex.org/p?b=2&a=1"),
      ("https://ex.org/p?utm_source=a&fbclid=x", "https://ex.org/p"),
      // path case is preserved; only scheme/host fold
      ("https://EX.org/CaSe", "https://ex.org/CaSe"),
      // host-only and root-slash collapse to the same key
      ("https://ex.org", "https://ex.org"),
      ("https://ex.org/", "https://ex.org"),
      // not a URL → unchanged, never nulled
      ("plain text", "plain text"),
      ("www.ex.org/no-scheme", "www.ex.org/no-scheme"))
    val got = cases.map(_._1).toDF("u")
      .select(TextStats.canonicalUrl(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2),
      cases.map(_._1).zip(got).mkString("\n"))
  }
}
