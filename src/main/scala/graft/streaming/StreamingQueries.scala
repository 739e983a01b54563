package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming slice (SURVEY §7.5): streaming twins of the
  * batch declared queries, written as pure DataFrame→DataFrame
  * transforms so they bind to any source — `spark.readStream` in
  * production, `MemoryStream` in the differential specs
  * (StreamingSpec), where the batch query is the correctness oracle.
  *
  * Scale notes: state is bounded by the watermark (tumbling windows
  * older than watermark are evicted); the aggregation is the standard
  * partial/final streaming agg, so each microbatch shuffles one row
  * per (window, key) — not per event.
  */
object StreamingQueries {
  private val Dec = DecimalType(18, 2)

  /** Streaming twin of DQ14: event-time tumbling-window counts/sums
    * with a watermark bounding state. In append mode a window emits
    * exactly once, when the watermark passes its end; the emitted rows
    * match the batch DQ14 aggregation of the same events.
    */
  def tumblingWindow(events: DataFrame, every: String = "1 hour",
                     watermark: String = "30 minutes"): DataFrame =
    slidingWindow(events, every, every, watermark)

  /** Sliding (overlapping) event-time windows: each event lands in
    * width/slide windows — same state story as tumbling (windows
    * evict once the watermark passes their end), with state and
    * per-batch shuffle rows multiplied by the overlap factor; the
    * window-struct generate itself is map-side. Streaming twin of
    * the batch ext_rel_sliding_window query.
    */
  def slidingWindow(events: DataFrame, width: String, slide: String,
                    watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(Dec)).cast("double"), 2).as("v"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
        col("event_type"), col("n"), col("v"))

  /** Streaming twin of DQ2/wc: incremental word count over a line
    * stream; running per-word counts live in the state store.
    */
  def wordCount(lines: DataFrame, textCol: String = "value"): DataFrame =
    lines
      .select(explode(split(col(textCol), "[^a-zA-Z]+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("c"))

  /** Streaming exact dedup — the training-data ingest shape: keep the
    * first arrival per key, drop duplicates that land within the
    * watermark delay of it. `dropDuplicatesWithinWatermark` (not plain
    * `dropDuplicates`) so per-key state is EVICTED once the watermark
    * passes its expiry — bounded state regardless of stream length,
    * which a key-only dropDuplicates cannot guarantee (it would keep
    * every key forever unless the event-time column itself were part
    * of the key). Duplicates separated by more than the watermark
    * delay are re-admitted — the streaming contract; cross-epoch
    * dedup belongs to the batch operators ([[graft.ext.Dedup]]).
    */
  def dedupByKey(events: DataFrame, keys: Seq[String], tsCol: String = "ts",
                 watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream–stream interval join — the streaming twin of
    * [[graft.ext.TimeJoin.rangeJoin]]: pairs (l, r) with equal `keys`
    * and `r.ts - l.ts` in `[lowerMs, upperMs)`. Both sides carry
    * watermarks, and the time-range condition bounds how long either
    * side's rows are buffered: a left row can stop waiting once the
    * watermark passes `l.ts + upperMs`, a right row once it passes
    * `r.ts - lowerMs` — so state is O(rate × window), not O(stream).
    * Columns are prefix-disambiguated like the batch operator.
    *
    * `joinType` "left_outer" keeps left rows that never matched:
    * Spark null-pads and emits such a row when the watermark proves no
    * future right row can still land in its interval (passes
    * `l.ts + upperMs`) — the streaming twin of a batch left join, with
    * the same bounded state. The time-range bound on BOTH sides is
    * exactly what makes the outer variant legal (an unbounded-buffer
    * outer join could never declare a row unmatched).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   lowerMs: Long, upperMs: Long,
                   watermark: String = "30 minutes",
                   lPrefix: String = "l_", rPrefix: String = "r_",
                   joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one equi-key " +
      "(same contract as the batch twin TimeJoin.rangeJoin)")
    require(upperMs > lowerMs, s"empty range [$lowerMs, $upperMs)")
    require(Set("inner", "left_outer").contains(joinType),
      s"joinType=$joinType: stream-stream interval joins support inner and left_outer")
    val l = left.select(left.columns.toIndexedSeq.map(c => col(c).as(lPrefix + c)): _*)
      .withWatermark(lPrefix + leftTs, watermark)
    val r = right.select(right.columns.toIndexedSeq.map(c => col(c).as(rPrefix + c)): _*)
      .withWatermark(rPrefix + rightTs, watermark)
    val lts = col(lPrefix + leftTs)
    val rts = col(rPrefix + rightTs)
    val keyCond = keys.map(k => col(lPrefix + k) === col(rPrefix + k))
      .reduce(_ && _)
    l.join(r, keyCond &&
      rts >= lts + expr(s"INTERVAL $lowerMs MILLISECONDS") &&
      rts < lts + expr(s"INTERVAL $upperMs MILLISECONDS"), joinType)
  }

  /** Stream–static enrichment: the event stream joined to a static
    * dimension on `keys` (left join — events with no dimension row
    * survive with nulls, they must not silently vanish from a
    * pipeline). Spark re-plans the static side per microbatch, so a
    * small dimension broadcasts (the planner's size estimate /
    * autoBroadcastJoinThreshold decides — deliberately NOT a forced
    * broadcast hint, which would collect a tens-of-GB dimension to
    * the driver every microbatch and die on the 8 GB broadcast
    * ceiling; same restraint as [[incrementalDedup]]'s store join)
    * and a refreshed dimension table is picked up on the next
    * batch — the standard streaming enrichment shape; no state, no
    * watermark needed.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "enrich needs at least one join key")
    stream.join(dim, keys, "left")
  }

  /** Streaming ingest dedup: the streaming twin of
    * [[graft.ext.Dedup.incrementalExact]]. Each document of the
    * stream is fingerprinted map-side (60-bit content hash, the same
    * [[graft.ext.Hashing.h60]] the batch store uses), anti-joined
    * against the static corpus fingerprint STORE (content already in
    * the corpus is dropped), then deduplicated against rows seen
    * earlier IN the stream via watermark-bounded state — so a
    * duplicate arriving in a later microbatch is still dropped, and
    * state for fingerprints older than the watermark is released
    * instead of growing with the stream.
    *
    * No join-strategy hint on the store, deliberately: Spark
    * re-plans the static side per microbatch, so a small store
    * broadcasts and a 100 TB-corpus store (~0.3% of corpus bytes)
    * falls back to a shuffled equi-join of the 8-byte column — the
    * batch path's exact scale shape.
    *
    * Survivor policy: FIRST ARRIVAL per fingerprint (the only policy
    * a stream can implement without buffering the watermark window);
    * the batch twin keeps min-id. The kept fingerprint SET is
    * identical — differential specs compare that invariant.
    */
  def incrementalDedup(stream: DataFrame, store: DataFrame,
                       textCol: String = "text", tsCol: String = "ts",
                       watermark: String = "30 minutes"): DataFrame = {
    val fp = graft.ext.Hashing.h60(col(textCol))
    stream.withColumn("__fp", fp)
      .withWatermark(tsCol, watermark)
      .join(store, col("__fp") === store("fp"), "left_anti")
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }
}
