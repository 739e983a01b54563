package graft

import graft.ext.{Curation, Search}
import org.apache.spark.sql.functions._

/** Search (TF-IDF / BM25) and chunking, pinned against hand-computed
  * values on corpora small enough to verify by eye — the driver's
  * DuckDB gate covers the full-corpus differential; these pin the
  * FORMULAS (smoothing, association order, tie-breaks, boundaries).
  */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian"),
    (4L, "")).toDF("doc_id", "text")

  test("termFrequencies counts occurrences, drops empty tokens") {
    val tf = Search.termFrequencies(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tf == Map(
      (1L, "apple") -> 2L, (1L, "banana") -> 1L,
      (2L, "banana") -> 1L, (2L, "cherry") -> 1L,
      (3L, "cherry") -> 3L, (3L, "durian") -> 1L))
  }

  test("tfIdf matches the hand formula tf * ln((N+1)/(df+1))") {
    val rows = Search.tfIdf(corpus, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Long]("n_docs"),
          r.getAs[Double]("tfidf"))).toMap
    // N = 4 docs (the empty doc counts toward N, has no terms)
    val (tf, df, n, s) = rows((1L, "apple"))
    assert(tf == 2L && df == 1L && n == 4L)
    assert(s == 2.0 * math.log(5.0 / 2.0))
    val (tfC, dfC, _, sC) = rows((3L, "cherry"))
    assert(tfC == 3L && dfC == 2L)
    assert(sC == 3.0 * math.log(5.0 / 3.0))
  }

  test("topTerms ranks by score desc then term asc, exactly k rows") {
    // doc 3: cherry (tf 3, df 2) beats durian (tf 1, df 1)?
    //   cherry: 3·ln(5/3) ≈ 1.532; durian: 1·ln(5/2) ≈ 0.916 → cherry first
    val top = Search.topTerms(corpus, "doc_id", "text", k = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap
    assert(top(3L) == "cherry")
    // doc 2: banana and cherry both tf 1, df 2 — identical scores, term
    // ascending breaks the tie deterministically
    assert(top(2L) == "banana")
  }

  test("bm25 matches the hand formula with fixed-order partial sums") {
    val res = Search.bm25(corpus, "doc_id", "text",
        Seq("banana", "cherry"), k1 = 1.5, b = 0.75)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_matched"), r.getAs[Double]("score"))).toMap
    // corpus: N=4, dl = (3, 2, 4, 0), avgdl = 9/4 = 2.25
    val N = 4.0; val avgdl = 9.0 / 4.0
    def idf(df: Double) = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
    def s(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * 2.5) / (tf + 1.5 * (0.25 + 0.75 * dl / avgdl))
    // banana df=2, cherry df=2
    assert(res(1L)._1 == 1L)
    assert(res(1L)._2 == s(1, 2, 3))
    assert(res(2L)._1 == 2L)
    assert(res(2L)._2 == s(1, 2, 2) + s(1, 2, 2)) // banana + cherry, fixed order
    assert(res(3L)._1 == 1L)
    assert(res(3L)._2 == s(3, 2, 4))
    assert(!res.contains(4L), "doc with no query terms must not appear")
  }

  test("search emits a contiguous pinned rank") {
    val out = Search.search(corpus, "doc_id", "text",
      Seq("banana", "cherry"), k = 2, k1 = 1.5, b = 0.75).collect()
    assert(out.map(_.getAs[Int]("rk")).toSeq == Seq(1, 2))
    // doc 2 matches both terms → highest score
    assert(out.head.getAs[Long]("doc_id") == 2L)
  }

  test("pmiPairs ranks by hand-computed PMI; minDf prunes hapax terms") {
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "z q"))
      .toDF("doc_id", "text")
    // df: x=3, y=2, z=2, q=1 (dropped by minDf=2); N=4
    // PMI(x,y) = ln(4·2/(3·2)) > 0 > PMI(x,z) = ln(4·1/(3·2))
    val out = Search.pmiPairs(docs, "doc_id", "text", k = 10, minDf = 2)
      .collect()
      .map(r => (r.getAs[Int]("rk"), r.getAs[String]("t1"),
        r.getAs[String]("t2"), r.getAs[Long]("c_ab")))
    assert(out.toSeq == Seq((1, "x", "y", 2L), (2, "x", "z", 1L)),
      s"got ${out.toSeq}")
  }

  test("chunk covers every token once per stride lattice, tail chunk short") {
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" ")), // 10 tokens
      (2L, "a b c"),                         // 3 tokens
      (3L, "")).toDF("doc_id", "text")       // split("") = [""] → 1 token
    val out = Curation.chunk(docs, "doc_id", "text", width = 4, stride = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx")) ->
        (r.getAs[Int]("start"), r.getAs[Int]("chunk_len"))).toMap
    // doc 1: starts 0,3,6,9 → lens 4,4,4,1
    assert(out((1L, 0)) == (0, 4) && out((1L, 1)) == (3, 4))
    assert(out((1L, 2)) == (6, 4) && out((1L, 3)) == (9, 1))
    // doc 2: n=3 → only start 0 (the next lattice point 3 is not < 3)
    assert(out((2L, 0)) == (0, 3))
    assert(!out.contains((2L, 1)))
    // empty text still yields one 1-token chunk (split('') = [''])
    assert(out((3L, 0)) == (0, 1))
    assert(out.size == 6)
  }

  test("chunk rejects invalid width/stride") {
    intercept[IllegalArgumentException] {
      Curation.chunk(corpus, "doc_id", "text", width = 4, stride = 5)
    }
    intercept[IllegalArgumentException] {
      Curation.chunk(corpus, "doc_id", "text", width = 0, stride = 1)
    }
  }
}
