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

  /** Apply one merge greedy-LEFTMOST to every word: a codegen'd fold
    * over the symbol array — merge when the accumulator's last symbol
    * is `left` and the next is `right`, else append. The fold IS the
    * greedy semantics: in a run of overlapping candidates (`a a a`
    * under (a,a)) the merged symbol `aa` no longer equals `a`, so
    * alternate positions merge — exactly leftmost non-overlapping.
    * Pure map-side; no shuffle.
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
}
