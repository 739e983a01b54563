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

  // ---- batched training (the production O(merges/m)-round variant) ----

  private def pairCountsOf(vocab: Map[List[String], Long])
      : Map[(String, String), Long] = {
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    vocab.foreach { case (syms, f) =>
      syms.zip(syms.drop(1)).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + f
      }
    }
    counts.toMap
  }

  /** Reference batched selection: locally-maximal pairs (no
    * conflicting pair outranks them) under (count desc, pair asc),
    * capped at m. Conflict = shared symbol among {left, right,
    * left+right}.
    */
  private def naiveSelectBatch(vocab: Map[List[String], Long], m: Int)
      : List[(String, String, Long)] = {
    val counts = pairCountsOf(vocab).toList
    def syms(p: (String, String)) = Set(p._1, p._2, p._1 + p._2)
    def pri(e: ((String, String), Long)) = (-e._2, e._1._1, e._1._2)
    val ord = Ordering[(Long, String, String)]
    counts.filter { x =>
      !counts.exists(y => y._1 != x._1 &&
        syms(y._1).intersect(syms(x._1)).nonEmpty && ord.lt(pri(y), pri(x)))
    }.sortBy(pri).take(m).map { case ((a, b), c) => (a, b, c) }
  }

  private def naiveTrainBatched(words: Map[String, Long], rounds: Int, m: Int)
      : (List[(Int, Int, String, String, Long)], Map[List[String], Long]) = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, f) => w.split("").toList -> f }
    val merges =
      scala.collection.mutable.ListBuffer.empty[(Int, Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val batch = naiveSelectBatch(vocab, m)
      if (batch.isEmpty) done = true
      else {
        merges ++= batch.zipWithIndex.map { case ((a, b, c), i) =>
          (r, i + 1, a, b, c)
        }
        // disjoint merges commute: sequential application in batch
        // order is THE batch semantics
        batch.foreach { case (a, b, _) =>
          vocab = vocab.toSeq
            .map { case (syms, f) => naiveMerge(syms, a, b) -> f }
            .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        }
      }
      r += 1
    }
    (merges.toList, vocab)
  }

  private val batchedCorpus = Seq(
    "the theme there the then", "aaa aaaa banana bananas",
    "low lower lowest low low", "the banana aaa there",
    "Ignore UPPER and 42 tokens", "newer new newest new")

  test("applyMerges folds a disjoint batch exactly like sequential single merges") {
    val vocab = Seq(
      ("aaab", "a a a b", 2L), ("xyxy", "x y x y", 1L),
      ("bxya", "b x y a", 3L), ("aaxy", "a a x y", 1L))
      .toDF("word", "sym", "freq")
    val batch = Seq(Bpe.Merge("a", "a", 0L), Bpe.Merge("x", "y", 0L))
    val got = Bpe.applyMerges(vocab, batch)
      .select("word", "sym").as[(String, String)].collect().toMap
    val seq1 = Bpe.applyMerge(Bpe.applyMerge(vocab, batch(0)), batch(1))
      .select("word", "sym").as[(String, String)].collect().toMap
    val seq2 = Bpe.applyMerge(Bpe.applyMerge(vocab, batch(1)), batch(0))
      .select("word", "sym").as[(String, String)].collect().toMap
    assert(got == seq1 && got == seq2,
      "disjoint merges must commute and equal the combined fold")
    assert(got("aaab") == "aa a b")
    assert(got("xyxy") == "xy xy")
    assert(got("aaxy") == "aa xy")
  }

  test("trainBatched reproduces the naive locally-maximal reference, rounds collapse") {
    val docs = batchedCorpus.toDF("text")
    val words = docs.as[String].collect()
      .flatMap(_.split("\\s+")).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val (wantMerges, wantVocab) = naiveTrainBatched(words, rounds = 3, m = 4)

    PlanCache.clear()
    val got = Bpe.trainBatched(docs, "text", rounds = 3, maxPerRound = 4,
      cacheTag = "bpeb/spec34")
    assert(got.merges.map(b =>
      (b.round, b.rank, b.merge.left, b.merge.right, b.merge.count)) ==
      wantMerges,
      s"batched merge sequences diverged:\n${got.merges}\nvs\n$wantMerges")
    val gotVocab = got.vocab.select("sym", "freq").as[(String, Long)]
      .collect().toMap
    assert(gotVocab == wantVocab.map { case (s, f) => s.mkString(" ") -> f })
    // the round-count collapse that clears the sequential bottleneck:
    // 3 batched rounds bank at least 8 merges (8 sequential rounds'
    // worth) on this corpus
    assert(got.merges.size >= 8,
      s"expected >= 8 merges in 3 rounds, got ${got.merges.size}")
  }

  test("trainBatched at maxPerRound=1 is train's sequential policy merge for merge") {
    val docs = batchedCorpus.toDF("text")
    PlanCache.clear()
    val seqT = Bpe.train(docs, "text", steps = 6, cacheTag = "bpe/eq6")
    val batT = Bpe.trainBatched(docs, "text", rounds = 6, maxPerRound = 1,
      cacheTag = "bpeb/eq6")
    assert(batT.merges.map(_.merge) == seqT.merges,
      "m=1 batched selection must equal the sequential argmax policy")
    val a = seqT.vocab.select("sym", "freq").as[(String, Long)].collect().toMap
    val b = batT.vocab.select("sym", "freq").as[(String, Long)].collect().toMap
    assert(a == b)
  }
}
