package graft

import org.apache.spark.sql.functions._

import graft.ext.{Bpe, PlanCache}

/** BPE training vs a naive in-memory reference: the fold-based merge
  * must be greedy leftmost non-overlapping (the `a a a` run case is
  * the one implementations get wrong), and the full training loop
  * must reproduce the reference's merge sequence and final symbol
  * table on a corpus with engineered ties and overlaps.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy-leftmost merge of one pair in one word. */
  private def naiveMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** Reference trainer: argmax pair by (count desc, pair asc). */
  private def naiveTrain(words: Map[String, Long], steps: Int)
      : (List[(String, String, Long)], Map[List[String], Long]) = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, f) => w.split("").toList -> f }
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    var step = 0
    var done = false
    while (step < steps && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((a, b, c))
        vocab = vocab.toSeq.map { case (syms, f) => naiveMerge(syms, a, b) -> f }
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
      step += 1
    }
    (merges.toList, vocab)
  }

  test("applyMerge is greedy leftmost: runs merge alternate positions, disjoint matches all merge") {
    val vocab = Seq(
      ("aaa", "a a a", 1L), ("aaaa", "a a a a", 1L),
      ("aaaaa", "a a a a a", 1L), ("abab", "a b a b", 1L),
      ("xaab", "x a a b", 1L))
      .toDF("word", "sym", "freq")
    val got = Bpe.applyMerge(vocab, Bpe.Merge("a", "a", 0L))
      .select("word", "sym").as[(String, String)].collect().toMap
    assert(got("aaa") == "aa a")
    assert(got("aaaa") == "aa aa")
    assert(got("aaaaa") == "aa aa a")
    assert(got("abab") == "a b a b")
    assert(got("xaab") == "x aa b")
  }

  test("train reproduces the naive reference: merge sequence, counts, and final symbol table") {
    // corpus with ties (broken by pair order), overlapping runs, and
    // multi-step interactions (early merges feed later pair counts)
    val docs = Seq(
      "the theme there the then", "aaa aaaa banana bananas",
      "low lower lowest low low", "the banana aaa there",
      "Ignore UPPER and 42 tokens", "newer new newest new")
      .toDF("text")
    val words = docs.as[String].collect()
      .flatMap(_.split("\\s+")).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val (wantMerges, wantVocab) = naiveTrain(words, steps = 10)

    PlanCache.clear()
    val got = Bpe.train(docs, "text", steps = 10, cacheTag = "bpe/spec10")
    assert(got.merges.map(m => (m.left, m.right, m.count)) == wantMerges,
      s"merge sequences diverged:\n${got.merges}\nvs\n$wantMerges")
    val gotVocab = got.vocab.select("sym", "freq").as[(String, Long)]
      .collect().toMap
    val want = wantVocab.map { case (syms, f) => syms.mkString(" ") -> f }
    assert(gotVocab == want,
      s"final symbol tables diverged:\n$gotVocab\nvs\n$want")
    // and the trained vocab still sums to the corpus word occurrences
    assert(gotVocab.values.sum == words.values.sum)
  }
}
