package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING — the "build the tokenizer from
  * the corpus" half that [[TextStats]]' BPE-ish token counting
  * presupposes. Classic byte-pair encoding (Sennrich et al. 2016):
  * iteratively merge the most frequent adjacent symbol pair, greedy
  * leftmost within each word.
  *
  * The 100 TB shape is the whole point: the corpus is touched ONCE
  * ([[wordFreq]] — one map-side-partial shuffle to the word-frequency
  * table), and every training iteration runs on the VOCABULARY, which
  * Heaps' law bounds at millions of rows regardless of corpus bytes.
  * Per step: one pair-explode + aggregate over the vocab (map-side
  * partials, pair cardinality ≤ vocab substring mass), one 1-row
  * argmax collect (a bounded driver artifact, memoized), and one
  * map-side fold rewrite of the symbol strings. Step lineage is
  * pinned flat by [[PlanCache.checkpointed]] leaves keyed on (tag,
  * step, corpus plan) — the [[Graph.kCore]] discipline. `steps` is a
  * fixed unroll; production tokenizers run tens of thousands of
  * merges by batching the top-m PAIRWISE-DISJOINT merges per round
  * (disjoint merges commute, so a batch is order-safe) — same
  * per-round machinery, fewer rounds; single-merge rounds are the
  * oracle-replayable contract gated here.
  *
  * Determinism contract: ties on pair count break by (left, right)
  * symbol order; training is restricted to ASCII-lowercase words
  * (`^[a-z]+$`) so character splitting is engine-portable (Java regex
  * splits UTF-16 code units where RE2 splits code points — on
  * [a-z]+ they agree). No end-of-word marker: plain in-word BPE, the
  * mechanics are identical with one.
  */
object Bpe {

  /** One training step's outcome: the merged pair and its count at
    * the time of merging.
    */
  final case class Merge(left: String, right: String, count: Long)

  /** The trained artifact: the ordered merge list plus the final
    * vocabulary (`word`, space-joined `sym` sequence, `freq`).
    */
  final case class Trained(merges: Seq[Merge], vocab: DataFrame)

  /** ASCII-lowercase word frequencies of the corpus — the ONE pass
    * over corpus bytes. One shuffle, partial-aggregated map-side.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequence of a word: its characters joined by
    * ' ' (symbols never contain spaces, so ' ' is a safe delimiter
    * for the whole training run).
    */
  def charSymbols(word: Column): Column =
    array_join(filter(split(word, ""), x => x =!= ""), " ")

  /** Adjacent-pair frequencies of the current vocabulary: each
    * adjacent position of each word contributes the word's corpus
    * frequency. Vocab-bounded explode + one aggregate; the corpus is
    * not involved.
    */
  def pairCounts(vocab: DataFrame): DataFrame = {
    val l = split(col("sym"), " ")
    vocab.select(col("freq"),
        slice(l, lit(1), size(l) - 1).as("la"),
        slice(l, lit(2), size(l) - 1).as("lb"))
      .select(col("freq"), explode(arrays_zip(col("la"), col("lb"))).as("pr"))
      .select(col("pr.la").as("left"), col("pr.lb").as("right"), col("freq"))
      .groupBy("left", "right").agg(sum(col("freq")).as("cnt"))
  }

  /** The most frequent pair, ties broken by (left, right) — None when
    * no word has two symbols left. One 1-row collect.
    */
  def bestPair(vocab: DataFrame): Option[Merge] =
    pairCounts(vocab)
      .orderBy(col("cnt").desc, col("left"), col("right"))
      .limit(1).collect().headOption
      .map(r => Merge(r.getString(0), r.getString(1), r.getLong(2)))

  /** Apply one merge greedy-LEFTMOST to every word: a Catalyst
    * higher-order-function fold over the symbol array (HOF lambdas
    * evaluate INTERPRETED, not codegen'd — same engine fact the
    * DotProduct kernel exists for; here the work is vocab-bounded and
    * map-side, so interpretation is never the hot path) — merge when
    * the accumulator's last symbol is `left` and the next is `right`,
    * else append. The fold IS the greedy semantics: in a run of
    * overlapping candidates (`a a a` under (a,a)) the merged symbol
    * `aa` no longer equals `a`, so alternate positions merge — exactly
    * leftmost non-overlapping. Pure map-side; no shuffle.
    */
  def applyMerge(vocab: DataFrame, m: Merge): DataFrame = {
    val merged = m.left + m.right
    vocab.withColumn("sym", array_join(
      aggregate(split(col("sym"), " "),
        array().cast("array<string>"),
        (acc, x) =>
          when(size(acc) > 0 &&
              element_at(acc, -1) === lit(m.left) && x === lit(m.right),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
            .otherwise(concat(acc, array(x)))),
      " "))
  }

  /** Train `steps` merges on the corpus. Stops early if the vocabulary
    * runs out of adjacent pairs. Steps are memoized per (cacheTag,
    * corpus plan): the argmax collects ride [[PlanCache.artifact]] and
    * the vocab states are checkpointed leaves, so re-executions of a
    * query built on the result re-run nothing.
    */
  def train(docs: DataFrame, textCol: String, steps: Int,
            cacheTag: String = "bpe"): Trained = {
    require(steps >= 1, s"steps=$steps: need at least one merge")
    var vocab = PlanCache.checkpointed(s"$cacheTag/$textCol/v0", docs) { d =>
      wordFreq(d, textCol).withColumn("sym", charSymbols(col("word")))
    }
    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var i = 1
    var exhausted = false
    while (i <= steps && !exhausted) {
      val prev = vocab
      PlanCache.artifact(s"$cacheTag/$textCol/best$i", docs)(_ =>
        bestPair(prev)) match {
        case Some(m) =>
          merges += m
          vocab = PlanCache.checkpointed(s"$cacheTag/$textCol/v$i", docs)(_ =>
            applyMerge(prev, m))
        case None => exhausted = true
      }
      i += 1
    }
    Trained(merges.toList, vocab)
  }

  /** One batched round's outcome: the merges applied together, each
    * with its in-round priority rank.
    */
  final case class BatchMerge(round: Int, rank: Int, merge: Merge)

  /** The batched-training artifact: every applied merge in (round,
    * rank) order plus the final vocabulary.
    */
  final case class TrainedBatched(merges: Seq[BatchMerge], vocab: DataFrame)

  /** Two pairs CONFLICT when they share any symbol — left, right, or
    * the merged token either would create. Pairwise-disjoint merges
    * commute: a merge only consumes its own (left, right) adjacencies
    * and only creates adjacencies involving its own merged token, so
    * no disjoint rule's match sites are created or destroyed by
    * applying another — one combined rewrite equals any sequential
    * order.
    */
  private def pairSymbols(left: Column, right: Column): Column =
    array(left, right, concat(left, right))

  /** The round's merge batch: the LOCALLY-MAXIMAL pairs — those no
    * conflicting pair outranks under the (count desc, left, right)
    * priority — capped at the `m` best. Locally-maximal pairs are
    * pairwise disjoint by construction (of two conflicting pairs, the
    * lower-priority one is dominated), and the globally best pair is
    * always selected, so every round makes progress and `m = 1`
    * degenerates to exactly [[bestPair]]'s sequential policy.
    *
    * Shape: dominance is a symbol EQUI-join of the vocab-bounded pair
    * table against itself (explode each pair into its ≤3 symbols, hash
    * join on the symbol — never a quadratic pair×pair cross), then one
    * anti-join and a top-m collect (≤ m rows, a bounded driver
    * artifact).
    */
  def selectBatch(vocab: DataFrame, m: Int): Seq[Merge] = {
    require(m >= 1, s"m=$m: need at least one merge per round")
    val pc = pairCounts(vocab)
    val sy = pc.select(col("left"), col("right"), col("cnt"),
      explode(pairSymbols(col("left"), col("right"))).as("__sym"))
    val dominators = sy.select(col("left").as("__yl"), col("right").as("__yr"),
      col("cnt").as("__ycnt"), col("__sym").as("__ysym"))
    val dominated = sy.join(dominators,
        col("__sym") === col("__ysym") &&
          !(col("left") === col("__yl") && col("right") === col("__yr")) &&
          (col("__ycnt") > col("cnt") ||
            (col("__ycnt") === col("cnt") &&
              (col("__yl") < col("left") ||
                (col("__yl") === col("left") && col("__yr") < col("right"))))),
        "left_semi")
      .select("left", "right").distinct()
    pc.join(dominated, Seq("left", "right"), "left_anti")
      .orderBy(col("cnt").desc, col("left"), col("right"))
      .limit(m).collect().toIndexedSeq
      .map(r => Merge(r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** Apply a PAIRWISE-DISJOINT merge batch in one greedy-leftmost fold
    * — [[applyMerge]]'s multi-rule twin. At each step the (previous
    * symbol, next symbol) key is looked up in the rule map
    * (try_element_at: null on miss — plain element_at throws under
    * ANSI); disjointness means at most one rule can ever match a given
    * adjacency, so the combined fold is exactly the sequential
    * application of each rule in any order. One map-side rewrite for
    * the whole batch; no shuffle.
    */
  def applyMerges(vocab: DataFrame, ms: Seq[Merge]): DataFrame = {
    require(ms.nonEmpty, "applyMerges needs at least one merge")
    // symbols never contain ' ' (the training-run delimiter), so
    // "left right" is a collision-free map key
    val rules = map(ms.flatMap(m =>
      Seq(lit(m.left + " " + m.right), lit(m.left + m.right))): _*)
    vocab.withColumn("sym", array_join(
      aggregate(split(col("sym"), " "),
        array().cast("array<string>"),
        (acc, x) => {
          val hit = try_element_at(rules,
            concat(element_at(acc, -1), lit(" "), x))
          when(size(acc) > 0 && hit.isNotNull,
            concat(slice(acc, lit(1), size(acc) - 1), array(hit)))
            .otherwise(concat(acc, array(x)))
        }),
      " "))
  }

  /** Train up to `rounds × maxPerRound` merges in `rounds` BATCHED
    * rounds — the production-scale variant of [[train]]. [[train]]'s
    * strictly-sequential loop pays one driver-coordinated round per
    * merge: at a production tokenizer's 30k–50k merges that is 30k+
    * sequential job rounds regardless of cluster size. Here each round
    * selects the top-`maxPerRound` locally-maximal (hence pairwise-
    * disjoint, hence order-safe — [[selectBatch]]) pairs and applies
    * them in ONE vocab rewrite, collapsing the round count by up to
    * `maxPerRound`× while staying exactly deterministic and
    * oracle-replayable; rounds degrade toward single-merge only when
    * every top pair overlaps every other. `maxPerRound = 1` reproduces
    * [[train]]'s sequential policy merge for merge.
    *
    * Same per-round machinery and memoization discipline as [[train]]:
    * the corpus is scanned once, every round is vocab-bounded, the
    * batch selection is a ≤ maxPerRound-row driver artifact, and vocab
    * states are checkpointed leaves.
    */
  def trainBatched(docs: DataFrame, textCol: String, rounds: Int,
                   maxPerRound: Int,
                   cacheTag: String = "bpeb"): TrainedBatched = {
    require(rounds >= 1, s"rounds=$rounds: need at least one round")
    require(maxPerRound >= 1, s"maxPerRound=$maxPerRound: need at least one")
    // v0 (raw word frequencies) is selection-independent — shareable
    // across maxPerRound values; every later selection and vocab state
    // depends on m from round 1 (unlike sequential train, whose
    // per-step selections are prefix-stable), so m is part of the
    // cache key — two trainBatched calls in one session with the same
    // cacheTag but different m must never alias. `rounds` needs no key
    // slot: for a fixed m the per-round states are prefix-stable.
    var vocab = PlanCache.checkpointed(s"$cacheTag/$textCol/v0", docs) { d =>
      wordFreq(d, textCol).withColumn("sym", charSymbols(col("word")))
    }
    val merges = scala.collection.mutable.ListBuffer.empty[BatchMerge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val prev = vocab
      val batch = PlanCache.artifact(
        s"$cacheTag/$textCol/m$maxPerRound/sel$r", docs)(_ =>
        selectBatch(prev, maxPerRound))
      if (batch.isEmpty) exhausted = true
      else {
        merges ++= batch.zipWithIndex.map { case (m, i) =>
          BatchMerge(r, i + 1, m)
        }
        vocab = PlanCache.checkpointed(
          s"$cacheTag/$textCol/m$maxPerRound/v$r", docs)(_ =>
          applyMerges(prev, batch))
      }
      r += 1
    }
    TrainedBatched(merges.toList, vocab)
  }
}
