package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus versioning: apply a keyed changelog to a snapshot (CDC
  * merge / upsert) and diff two snapshot versions — the operators an
  * incrementally-maintained training corpus needs between full
  * rebuilds. Nothing here is reference-derived (the reference
  * regenerates outputs whole, `/root/reference/src/mr/worker.go`);
  * both are standard warehouse semantics re-expressed Spark-first.
  */
object Changelog {

  /** Merge a changelog into a snapshot: for each key, the log's
    * LATEST entry (by `seqCols`, compared lexicographically) wins —
    * an `op == deleteOp` entry removes the key, anything else
    * replaces (or inserts) the row's payload; keys the log never
    * touches pass through from the snapshot.
    *
    * Contract: `log` carries every non-key column of `snapshot`
    * (the post-image payload) plus `opCol` and `seqCols`; the seq
    * tuple is UNIQUE per key (a commit timestamp + a change id) and
    * non-null — ties would make "latest" arbitrary per run.
    *
    * Scale shape: latest-per-key is `groupBy(key).agg(max_by(payload,
    * seq))`, which partial-aggregates MAP-SIDE — a key changed a
    * million times in the log collapses before the exchange (the
    * window row_number formulation would serialize all million into
    * one sorted partition; see [[Dedup.incrementalExact]]'s trade-off
    * note for the same fork). The snapshot crosses ONE anti-join on
    * the key; with a typical log (≪ snapshot), the reduced latest
    * relation broadcasts under AQE and the 100 TB snapshot never
    * shuffles at all. The union is shuffle-free. The latest relation
    * feeds BOTH the anti-join keys and the union payload, so it is
    * [[PlanCache]]-pinned (keyed on the log plan + every shaping
    * parameter) rather than having the log scanned and collapsed
    * twice.
    */
  def applyLog(snapshot: DataFrame, log: DataFrame, keyCol: String,
               opCol: String, seqCols: Seq[String],
               deleteOp: String = "D"): DataFrame = {
    require(seqCols.nonEmpty, "applyLog needs at least one seq column")
    val payload = snapshot.columns.toIndexedSeq.filterNot(_ == keyCol)
    payload.foreach(c => require(log.columns.contains(c),
      s"log is missing snapshot payload column $c"))
    val carried = payload :+ opCol
    val tag = (Seq("changelog/latest", keyCol, opCol, deleteOp) ++
      seqCols ++ payload).mkString("/")
    val latest = PlanCache.cached(tag, log)(
      _.groupBy(col(keyCol))
        .agg(max_by(struct(carried.map(col): _*),
          struct(seqCols.toIndexedSeq.map(col): _*)).as("__m"))
        .select(col(keyCol) +: carried.map(c => col(s"__m.$c").as(c)): _*))
    val untouched = snapshot.join(latest.select(keyCol), Seq(keyCol), "left_anti")
    untouched.unionByName(
      latest.where(col(opCol) =!= deleteOp).drop(opCol))
  }

  /** Merge one changelog BATCH into a standing keyed STORE — the
    * incremental step behind [[graft.streaming.StreamMerge]]'s
    * continuous upsert. Unlike [[applyLog]] (which produces the final
    * snapshot), the store is the full changelog-shaped relation — key,
    * payload, `opCol`, `seqCols` — with exactly one row per key:
    * each key's highest-seq entry seen so far, INCLUDING delete
    * tombstones. Keeping tombstones (with their seq) is what makes
    * the merge order-independent and idempotent:
    *
    *  - a late, lower-seq entry for a deleted key loses to the
    *    tombstone instead of resurrecting it;
    *  - re-applying any batch (the restart-replay case) re-offers
    *    entries the store already absorbed at equal-or-higher seq —
    *    a no-op by the max_by;
    *  - batches may arrive in ANY interleaving: the result is always
    *    latest-per-key over everything offered, i.e.
    *    `mergeBatch(mergeBatch(s, b1), b2) ≡ latest(s ∪ b1 ∪ b2)`.
    *
    * The serving snapshot is `store.where(op =!= deleteOp).drop(op,
    * seq...)` — read-side tombstone elision, compaction's job to
    * physically drop (a tombstone may be discarded once every replica
    * of the log below its seq is retired).
    *
    * Scale shape: the batch collapses to latest-per-key map-side
    * (same max_by as [[applyLog]]); the 100 TB store then crosses ONE
    * key anti-join (broadcast under AQE for a typical batch ≪ store —
    * the store itself never shuffles), and only the TOUCHED store
    * rows (semi-join, batch-key-sized) re-enter the max_by against
    * the batch's winners. Same seq contract as [[applyLog]]: the
    * seqCols tuple is unique and non-null per entry.
    *
    * SCHEMA EVOLUTION is additive-only: a batch whose schema is a
    * SUPERSET of the store's (new columns appended mid-stream — the
    * way real lakes evolve) is accepted — the store side is
    * null-backfilled and the merged store adopts the wider schema —
    * while a batch MISSING a store column (narrowing) or carrying a
    * DRIFTED type on a shared column name fails loudly: silently
    * union-coercing `seq: long` against `seq: string` (or dropping a
    * payload column) would corrupt every later version. Column names
    * `__bk`/`__m` are reserved (join/agg temporaries).
    *
    * BROADCAST GUARD: the two store-side joins are "the store never
    * shuffles" only while the batch-keys side BROADCASTS, so the hint
    * is forced explicitly (never left to a size estimate AQE might
    * get wrong — an estimate above `autoBroadcastJoinThreshold` would
    * silently degrade to sort-merge-joining the 100 TB store). What a
    * forced hint cannot bound is driver/executor memory: a
    * pathological batch with more distinct keys than fit in one
    * broadcast would OOM instead, so `maxBroadcastKeys` (> 0) counts
    * the batch's distinct keys first — one cheap job over the (small,
    * typically persisted) batch side — and fails with "split the
    * batch" before building an undeliverable broadcast. 0 disables
    * the pre-count for callers that bound batch size upstream.
    */
  def mergeBatch(store: DataFrame, batch: DataFrame, keyCol: String,
                 opCol: String, seqCols: Seq[String],
                 maxBroadcastKeys: Long = 10000000L): DataFrame = {
    require(seqCols.nonEmpty, "mergeBatch needs at least one seq column")
    val storeCols = store.columns.toIndexedSeq
    val batchCols = batch.columns.toIndexedSeq
    val narrowed = storeCols.filterNot(batchCols.contains)
    require(narrowed.isEmpty,
      s"batch narrows the store schema (missing: ${narrowed.mkString(",")}) — " +
        "evolution is additive-only: a batch may ADD columns, never drop them")
    val storeTypes = store.schema.fields.map(f => f.name -> f.dataType).toMap
    val drifted = batch.schema.fields
      .filter(f => storeTypes.get(f.name).exists(_ != f.dataType))
    require(drifted.isEmpty,
      "store/batch column types drifted: " + drifted.map(f =>
        s"${f.name} (store ${storeTypes(f.name).simpleString} vs " +
          s"batch ${f.dataType.simpleString})").mkString(", "))
    // store order first, new batch columns appended — the widened
    // schema every later version (and reader) sees
    val cols = storeCols ++ batchCols.filterNot(storeCols.contains)
    Seq("__bk", "__m").foreach(t => require(!cols.contains(t),
      s"column name $t is reserved by mergeBatch's join/agg temporaries"))
    val batchTypes = batch.schema.fields.map(f => f.name -> f.dataType).toMap
    val widened = cols.filterNot(storeCols.contains)
      .foldLeft(store)((d, c) => d.withColumn(c, lit(null).cast(batchTypes(c))))
    val carried = cols.filterNot(_ == keyCol)
    def latest(df: DataFrame): DataFrame =
      df.groupBy(col(keyCol))
        .agg(max_by(struct(carried.map(col): _*),
          struct(seqCols.toIndexedSeq.map(col): _*)).as("__m"))
        .select(col(keyCol) +: carried.map(c => col(s"__m.$c").as(c)): _*)
    val bl = latest(batch.select(cols.map(col): _*))
    if (maxBroadcastKeys > 0)
      require(bl.limit(math.min(maxBroadcastKeys + 1, Int.MaxValue).toInt)
        .count() <= maxBroadcastKeys,
        s"batch has more than $maxBroadcastKeys distinct keys — too large to " +
          "broadcast against the store; split the batch (or raise maxBroadcastKeys)")
    // NULL-SAFE key comparison (<=>): groupBy already treats null as
    // one key, but a plain equi anti-join would KEEP the store's
    // null-key row (null never equals null in a join) while the
    // max_by branch independently emits the batch's null-key winner —
    // two rows for one key, compounding every batch. <=> is still an
    // equi-join key (hash-joinable; the plan pin holds), so null
    // behaves as an ordinary key end to end.
    val bk = broadcast(bl.select(col(keyCol).as("__bk")))
    val untouched = widened.join(bk, col(keyCol) <=> col("__bk"), "left_anti")
    val touched = widened.join(bk, col(keyCol) <=> col("__bk"), "left_semi")
    untouched.unionByName(latest(touched.unionByName(bl)))
      .select(cols.map(col): _*)
  }

  /** Recompute a dimensional (count, sum) aggregate from a
    * changelog-shaped store — the BASE CASE and the audit twin of the
    * incremental [[aggDelta]]/[[mergeAggDelta]] maintenance: seed the
    * materialized aggregate with this over the initial store, then
    * fold deltas; at any point the folded aggregate must equal this
    * recompute over the current store. One full scan + one
    * dim-bounded exchange — what the incremental path exists to
    * avoid paying per batch.
    */
  def aggSnapshot(store: DataFrame, opCol: String, dims: Seq[String],
                  valCol: String, deleteOp: String = "D",
                  nCol: String = "n", sumCol: String = "sum"): DataFrame =
    // SUM0, not SQL SUM: a dimension whose live rows all carry null
    // values reads 0, never null. Plain SUM would break the
    // telescoping contract — deleting the only non-null row leaves
    // the fold at sum=0 (arithmetic cancellation) while a bare
    // recompute would say null; defining the maintained statistic as
    // null-as-zero makes fold and recompute agree on every reachable
    // state. Oracle twins must COALESCE(SUM(x), 0) the same way.
    store.where(col(opCol) =!= deleteOp)
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as(nCol),
        coalesce(sum(col(valCol)), lit(0L).cast(store.schema(valCol).dataType))
          .as(sumCol))

  /** Per-dimension aggregate DELTA of one changelog batch against the
    * standing key store — incremental materialized-view maintenance.
    * Returns `(dims..., nCol, sumCol)` where the values are the
    * CHANGE the batch causes in `aggSnapshot(store)`: fold it into
    * the maintained aggregate with [[mergeAggDelta]] alongside the
    * [[mergeBatch]] that folds the batch into the store (delta first,
    * against the PRE-batch store).
    *
    * Construction: the batch collapses to latest-per-key exactly as
    * [[mergeBatch]] does; for its keys, the post-merge winner is
    * `latest(storeTouched ∪ batchLatest)` and the pre-image is the
    * store's current row — the delta is `+winner − pre` over the
    * non-deleted rows, grouped by `dims`. Because the winner is the
    * same max_by [[mergeBatch]] commits, the fold TELESCOPES: after
    * any sequence of batches the maintained aggregate equals the full
    * recompute, and a re-delivered batch's delta is exactly ZERO
    * (its entries all lose the max_by at equal seq — the same
    * property that makes mergeBatch idempotent), so crash-replay
    * cannot double-count.
    *
    * Only self-maintainable aggregates live here (count/sum — avg
    * derives); min/max under deletes need a per-dim recompute by
    * construction. Exactness discipline: pass an integer `valCol`
    * (cents, not dollars) when the maintained view is gated by hash.
    *
    * 100 TB shape: the store is touched ONLY via a broadcast semi-join
    * on the batch's keys (with [[mergeBatch]]'s bucketed store
    * underneath, only the touched buckets are even read), every
    * aggregation partial-aggregates map-side, and the output is
    * dim-cardinality-sized. The corpus is never rescanned — that is
    * the entire point.
    */
  /** The shared incremental core of [[aggDelta]] and
    * [[mergeAggMinMax]]: collapse the batch to latest-per-key, guard
    * and broadcast its key list, and return (broadcast keys, the
    * store's PRE-image rows for those keys, the post-merge WINNER
    * rows — the same max_by [[mergeBatch]] commits). All three
    * relations are batch-key-sized; the store enters only through the
    * one broadcast semi-join.
    */
  private def preWinner(store: DataFrame, batch: DataFrame, keyCol: String,
                        opCol: String, seqCols: Seq[String],
                        dims: Seq[String], valCol: String,
                        maxBroadcastKeys: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    require(seqCols.nonEmpty, "view maintenance needs at least one seq column")
    require(dims.nonEmpty, "view maintenance needs at least one dimension column")
    val needed = (keyCol +: opCol +: seqCols) ++ dims :+ valCol
    needed.foreach(c => require(store.columns.contains(c) &&
      batch.columns.contains(c), s"store/batch missing column $c"))
    Seq("__bk", "__m", "__w").foreach(t => require(!needed.contains(t),
      s"column name $t is reserved by view-maintenance temporaries"))
    // project BOTH sides to the columns the maintenance needs — the
    // store side drops its payload before the semi-join, and an
    // additive schema evolution elsewhere in the row is invisible here
    val proj = needed.distinct.map(col)
    val carried = needed.distinct.filterNot(_ == keyCol)
    def latest(df: DataFrame): DataFrame =
      df.groupBy(col(keyCol))
        .agg(max_by(struct(carried.map(col): _*),
          struct(seqCols.toIndexedSeq.map(col): _*)).as("__m"))
        .select(col(keyCol) +: carried.map(c => col(s"__m.$c").as(c)): _*)
    val bl = latest(batch.select(proj: _*))
    if (maxBroadcastKeys > 0)
      require(bl.limit(math.min(maxBroadcastKeys + 1, Int.MaxValue).toInt)
        .count() <= maxBroadcastKeys,
        s"batch has more than $maxBroadcastKeys distinct keys — too large to " +
          "broadcast against the store; split the batch (or raise maxBroadcastKeys)")
    val bk = broadcast(bl.select(col(keyCol).as("__bk")))
    val pre = store.select(proj: _*)
      .join(bk, col(keyCol) <=> col("__bk"), "left_semi")
    val winner = latest(pre.unionByName(bl))
    (bk, pre, winner)
  }

  def aggDelta(store: DataFrame, batch: DataFrame, keyCol: String,
               opCol: String, seqCols: Seq[String], dims: Seq[String],
               valCol: String, deleteOp: String = "D",
               nCol: String = "n", sumCol: String = "sum",
               maxBroadcastKeys: Long = 10000000L): DataFrame = {
    val (_, pre, winner) = preWinner(store, batch, keyCol, opCol, seqCols,
      dims, valCol, maxBroadcastKeys)
    val live = (df: DataFrame, sign: Int) =>
      df.where(col(opCol) =!= deleteOp)
        .select((dims.map(col) :+ lit(sign.toLong).as("__w") :+
          (col(valCol) * sign).as(valCol)): _*)
    // same SUM0 convention as [[aggSnapshot]] — an all-null
    // contribution set deltas the sum by 0, not to null
    live(winner, 1).unionByName(live(pre, -1))
      .groupBy(dims.map(col): _*)
      .agg(sum(col("__w")).as(nCol),
        coalesce(sum(col(valCol)),
          lit(0L).cast(store.schema(valCol).dataType)).as(sumCol))
  }

  /** Fold an [[aggDelta]] into the maintained aggregate: union and
    * re-aggregate (both relations are dim-cardinality-sized), dropping
    * dimensions whose live row count reached zero. Null dims group as
    * ordinary values on both sides — no join, so no null-key
    * mismatch to guard.
    */
  def mergeAggDelta(agg: DataFrame, delta: DataFrame, dims: Seq[String],
                    nCol: String = "n", sumCol: String = "sum"): DataFrame =
    agg.unionByName(delta)
      .groupBy(dims.map(col): _*)
      .agg(sum(col(nCol)).as(nCol),
        coalesce(sum(col(sumCol)),
          lit(0L).cast(agg.schema(sumCol).dataType)).as(sumCol))
      .where(col(nCol) =!= 0)

  /** [[aggSnapshot]] widened with MIN/MAX — the full recompute (seed
    * and audit twin) for views maintained by [[mergeAggMinMax]].
    * min/max are null iff the dimension's live values are all null
    * (MIN/MAX skip nulls on both engines), so no SUM0-style coalesce.
    */
  def aggSnapshotMinMax(store: DataFrame, opCol: String, dims: Seq[String],
                        valCol: String, deleteOp: String = "D",
                        nCol: String = "n", sumCol: String = "sum",
                        minCol: String = "min", maxCol: String = "max")
      : DataFrame =
    store.where(col(opCol) =!= deleteOp)
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as(nCol),
        coalesce(sum(col(valCol)), lit(0L).cast(store.schema(valCol).dataType))
          .as(sumCol),
        min(col(valCol)).as(minCol),
        max(col(valCol)).as(maxCol))

  /** Fold one changelog batch into a (count, sum, MIN, MAX) maintained
    * aggregate — the NON-self-maintainable extension of
    * [[aggDelta]]+[[mergeAggDelta]]. count/sum telescope exactly as
    * there; min/max cannot (a delete or downward update of the row
    * holding the boundary needs other rows to answer), so the fold
    * splits per dimension:
    *
    *  - dims whose LEAVING pre-image values never touch the current
    *    boundary fold self-maintainably: min' = least(min, entering
    *    min), max' = greatest(max, entering max) — batch-sized work,
    *    store untouched beyond [[preWinner]]'s one semi-join;
    *  - dims where a leaving value TIES the current min or max
    *    RECOMPUTE min/max from the post-batch live rows of those dims
    *    only — detected exactly (boundary test against the maintained
    *    view, dim-cardinality-sized join), recomputed from
    *    `(store ∖ batch keys) ∪ winners` restricted to the affected
    *    dims.
    *
    * The recompute is the operator's honest cost: the store is
    * bucketed by KEY, so an affected dim's rows live everywhere and
    * the recompute is a dim-filtered full scan — O(store rows in
    * affected dims) once per batch that actually retracts a boundary,
    * not per batch. (Cheapening it further needs a per-dim top-k
    * value sketch; out of scope here.) Re-delivered batches may
    * trigger a spurious recompute (their pre == winner includes the
    * boundary) but land on identical values — the fold stays
    * idempotent, and `fold == aggSnapshotMinMax(post-store)` holds
    * after every batch (the gated contract).
    *
    * `agg` is the CURRENT maintained view `(dims..., n, sum, min,
    * max)` (seed with [[aggSnapshotMinMax]]); `store` is the
    * PRE-batch store, same as [[aggDelta]]. Returns the new view,
    * dims with no remaining live rows dropped.
    *
    * Shape (mirrors [[mergeAggSketch]]'s, round 16): ONE signed-union
    * exchange computes the n/sum telescoping delta AND the per-dim
    * leaving/entering min/max bounds (the previous shape paid three
    * batch-sized groupBy exchanges — delta, leaving, entering — whose
    * winner subtrees re-executed per reference); a second dim-bounded
    * union+groupBy folds that against the view state (n/sum
    * arithmetic = [[mergeAggDelta]] verbatim), and the boundary test
    * becomes a column over the folded row. The fold is EAGER: the
    * dim-bounded state checkpoints inside the call, the retraction
    * test is a cheap action over it, and ONLY a fold with at least
    * one retracted boundary builds (or references) the recompute
    * branch — the common no-retraction commit carries NO store scan
    * in its plan at all, with no reliance on AQE's empty-relation
    * propagation (so callers may run it AQE-free), and callers need
    * no lineage truncation of their own across folds.
    *
    * `recomputeStore` splits the two store roles for bucketed layouts:
    * the pre-image probe only ever matches the batch's keys, so a
    * caller on a [[graft.streaming.BucketStore]] passes the
    * TOUCHED-BUCKET read as `store` — but an affected dim's OTHER rows
    * live in every bucket, so the boundary recompute must read the
    * FULL store (pass it here; defaults to `store` for unbucketed
    * callers). It is referenced lazily — a no-retraction fold never
    * executes it (PlanShapeSpec pins this with a poisoned source).
    */
  def mergeAggMinMax(agg: DataFrame, store: DataFrame, batch: DataFrame,
                     keyCol: String, opCol: String, seqCols: Seq[String],
                     dims: Seq[String], valCol: String,
                     deleteOp: String = "D",
                     nCol: String = "n", sumCol: String = "sum",
                     minCol: String = "min", maxCol: String = "max",
                     maxBroadcastKeys: Long = 10000000L,
                     recomputeStore: Option[DataFrame] = None): DataFrame = {
    Seq("__lmn", "__lmx", "__emn", "__emx", "__rc", "__rmn", "__rmx", "__dk")
      .foreach(t => require(!dims.contains(t),
        s"column name $t is reserved by mergeAggMinMax's temporaries"))
    val (bk, pre, winner) = preWinner(store, batch, keyCol, opCol, seqCols,
      dims, valCol, maxBroadcastKeys)
    val vt = store.schema(valCol).dataType
    // view-side joins key on the dim tuple as ONE struct column:
    // struct equality is null-safe field-wise (a null dim is an
    // ordinary group on both engines — same convention as
    // mergeAggDelta's union+groupBy), and the join stays a plain
    // hash-joinable equi-join
    val dk = struct(dims.map(col): _*).as("__dk")
    def live(df: DataFrame): DataFrame =
      df.where(col(opCol) =!= deleteOp)
        .select(dk, col(valCol))
    // ONE exchange: tag live winner rows +1 and live pre-image rows
    // −1; a single groupBy computes the signed count/sum delta AND
    // the per-side min/max bounds (a when() with no otherwise is null
    // on the other side's rows and on null values, and MIN/MAX skip
    // nulls — exactly the old per-side aggregations)
    val signed = (df: DataFrame, sign: Int) =>
      df.where(col(opCol) =!= deleteOp)
        .select((dims.map(col) :+ col(valCol) :+ lit(sign).as("__sgn")): _*)
    val fused = signed(winner, 1).unionByName(signed(pre, -1))
      .groupBy(dims.map(col): _*)
      .agg(sum(col("__sgn").cast("long")).as(nCol),
        coalesce(sum(col(valCol) * col("__sgn")), lit(0L).cast(vt)).as(sumCol),
        min(when(col("__sgn") === -1, col(valCol))).as("__lmn"),
        max(when(col("__sgn") === -1, col(valCol))).as("__lmx"),
        min(when(col("__sgn") === 1, col(valCol))).as("__emn"),
        max(when(col("__sgn") === 1, col(valCol))).as("__emx"))
    // fold against the view state through one dim-bounded
    // union+groupBy (same single-consumption shape as
    // [[foldSketchState]]: each side contributes at most one row per
    // dim, so the null-skipping MAX is pure selection), then the
    // boundary test is a COLUMN: does any leaving live value tie the
    // dim's current min/max? (leaving values are store rows, so <=/>=
    // is equality in disguise; null comparisons coalesce to false —
    // the old inner-join + where dropped them the same way)
    val nullV = lit(null).cast(vt)
    val aggSide = agg.select((dims.map(col) :+ col(nCol) :+ col(sumCol) :+
      col(minCol) :+ col(maxCol) :+ nullV.as("__lmn") :+ nullV.as("__lmx") :+
      nullV.as("__emn") :+ nullV.as("__emx")): _*)
    val fusedSide = fused.select((dims.map(col) :+ col(nCol) :+ col(sumCol) :+
      nullV.as(minCol) :+ nullV.as(maxCol) :+ col("__lmn") :+ col("__lmx") :+
      col("__emn") :+ col("__emx")): _*)
    val folded = aggSide.unionByName(fusedSide)
      .groupBy(dims.map(col): _*)
      .agg(sum(col(nCol)).as(nCol),
        coalesce(sum(col(sumCol)),
          lit(0L).cast(agg.schema(sumCol).dataType)).as(sumCol),
        max(col(minCol)).as(minCol), max(col(maxCol)).as(maxCol),
        max(col("__lmn")).as("__lmn"), max(col("__lmx")).as("__lmx"),
        max(col("__emn")).as("__emn"), max(col("__emx")).as("__emx"))
      .where(col(nCol) =!= 0)
      .withColumn("__rc", coalesce(
        col("__lmn") <= col(minCol) || col("__lmx") >= col(maxCol),
        lit(false)))
      .withColumn("__dk", struct(dims.map(col): _*))
    val rstore = recomputeStore.getOrElse(store)
    ((keyCol +: opCol +: dims) :+ valCol).foreach(c =>
      require(rstore.columns.contains(c),
        s"recomputeStore missing column $c"))
    require(!rstore.columns.contains("__bk"),
      "column name __bk is reserved by mergeAggMinMax's key anti-join")
    // The fold state is dim-bounded — CHECKPOINT it eagerly so the
    // retraction test below is a cheap action and the common
    // no-retraction path's committed plan carries NO recompute branch
    // (and no store scan) at all. Same discipline as [[sketchStep]].
    val foldedCk = folded.localCheckpoint(true)
    val rcd = foldedCk.where(col("__rc")).select("__dk")
    if (rcd.isEmpty)
      // assemble: least/greatest SKIP nulls, so an untouched dim
      // keeps (min, max) and a new dim takes the entering bounds
      return foldedCk.select((dims.map(col) :+ col(nCol) :+ col(sumCol) :+
        least(col(minCol), col("__emn")).as(minCol) :+
        greatest(col(maxCol), col("__emx")).as(maxCol)): _*)
    // the retraction path: recompute EXACTLY the affected dims from
    // the post-batch live rows — untouched keys straight from the
    // (full) store (anti-join on the broadcast key list), touched
    // keys from the winners
    val recomputed = live(rstore.join(bk, col(keyCol) <=> col("__bk"),
        "left_anti"))
      .unionByName(live(winner))
      .join(rcd.hint("broadcast"), Seq("__dk"), "left_semi")
      .groupBy(col("__dk"))
      .agg(min(col(valCol)).as("__rmn"), max(col(valCol)).as("__rmx"))
    foldedCk.join(recomputed, Seq("__dk"), "left")
      .select((dims.map(col) :+ col(nCol) :+ col(sumCol) :+
        when(col("__rc"), col("__rmn"))
          .otherwise(least(col(minCol), col("__emn"))).as(minCol) :+
        when(col("__rc"), col("__rmx"))
          .otherwise(greatest(col(maxCol), col("__emx"))).as(maxCol)): _*)
  }

  /** Reserved sketch-state column names of the SKETCHED min/max view
    * ([[aggSnapshotSketch]]/[[mergeAggSketch]]): the k smallest live
    * values (sorted ascending), the k largest (sorted ascending,
    * served from the tail), and the two coverage thresholds — null
    * when the sketch is COMPLETE (covers every live non-null value of
    * its side), else the value beyond which live values are untracked.
    */
  val SketchCols: Seq[String] = Seq("__mns", "__mxs", "__mnt", "__mxt")

  private def kSmallestLargest(live: DataFrame, dkCol: String,
                               valCol: String, k: Int): DataFrame = {
    // two windows per dim over the (affected) live rows — the rebuild
    // shuffle; per-dim depth is the skew contract, same class as scd2
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(dkCol)).orderBy(col(valCol).asc)
    val wDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(dkCol)).orderBy(col(valCol).desc)
    val nn = live.where(col(valCol).isNotNull)
    val smallest = nn.withColumn("__rn", row_number().over(wAsc))
      .where(col("__rn") <= k + 1) // k+1: the (k+1)th proves truncation
      .groupBy(col(dkCol))
      .agg(sort_array(collect_list(col(valCol))).as("__sl"),
        count(lit(1)).as("__sn"))
    val largest = nn.withColumn("__rn", row_number().over(wDesc))
      .where(col("__rn") <= k + 1)
      .groupBy(col(dkCol))
      .agg(sort_array(collect_list(col(valCol))).as("__ll"),
        count(lit(1)).as("__ln"))
    smallest.join(largest, Seq(dkCol))
      .select(col(dkCol),
        slice(col("__sl"), 1, k).as("__mns"),
        // largest: k+1 collected ascending; keep the LAST k
        when(col("__ln") > k, slice(col("__ll"), 2, k))
          .otherwise(col("__ll")).as("__mxs"),
        when(col("__sn") > k, element_at(col("__sl"), k)).as("__mnt"),
        when(col("__ln") > k, element_at(col("__ll"), 2)).as("__mxt"))
  }

  /** [[aggSnapshotMinMax]] widened with a PER-DIM TOP-K VALUE SKETCH —
    * the seed and audit twin of [[mergeAggSketch]]. The sketch holds
    * each dim's k smallest and k largest live values, so the fold can
    * absorb up to k boundary deletions per side before it ever has to
    * rescan the store: the [[mergeAggMinMax]] design recomputes on ANY
    * retraction of a boundary-tying value; here retraction is an O(1)
    * array pop and the recompute fires only when a side's sketch
    * DRAINS while untracked live values remain. Serving min/max read
    * from the sketch ends; n/sum are the usual SUM0 aggregates.
    */
  def aggSnapshotSketch(store: DataFrame, opCol: String, dims: Seq[String],
                        valCol: String, k: Int, deleteOp: String = "D",
                        nCol: String = "n", sumCol: String = "sum",
                        minCol: String = "min", maxCol: String = "max")
      : DataFrame = {
    require(k >= 1, s"sketch k=$k must be positive")
    val live = store.where(col(opCol) =!= deleteOp)
      .select(struct(dims.map(col): _*).as("__dk"), col(valCol))
    val ns = store.where(col(opCol) =!= deleteOp)
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as(nCol),
        coalesce(sum(col(valCol)), lit(0L).cast(store.schema(valCol).dataType))
          .as(sumCol))
      .withColumn("__dk", struct(dims.map(col): _*))
    val sk = kSmallestLargest(live, "__dk", valCol, k)
    ns.join(sk, Seq("__dk"), "left")
      .select((dims.map(col) :+ col(nCol) :+ col(sumCol) :+
        serveMin(store.schema(valCol).dataType).as(minCol) :+
        serveMax(store.schema(valCol).dataType).as(maxCol) :+
        coalesce(col("__mns"),
          array().cast(s"array<${store.schema(valCol).dataType.sql}>"))
          .as("__mns") :+
        coalesce(col("__mxs"),
          array().cast(s"array<${store.schema(valCol).dataType.sql}>"))
          .as("__mxs") :+
        col("__mnt") :+ col("__mxt")): _*)
  }

  // serving ends of the sketch (ANSI: element_at on an empty array
  // throws, so guard on size)
  private def serveMin(dt: org.apache.spark.sql.types.DataType): Column =
    when(size(col("__mns")) > 0, element_at(col("__mns"), 1))
      .otherwise(lit(null).cast(dt))
  private def serveMax(dt: org.apache.spark.sql.types.DataType): Column =
    when(size(col("__mxs")) > 0, element_at(col("__mxs"), -1))
      .otherwise(lit(null).cast(dt))

  /** Remove each element of `xs` from sorted array `acc` ONCE
    * (multiset difference) — the retraction pop. Interpreted HOF fold
    * over two ≤(k + batch)-sized arrays on dim-bounded rows.
    */
  private def multisetDiff(acc0: Column, xs: Column): Column =
    aggregate(xs, acc0, (acc, x) => {
      val p = array_position(acc, x)
      when(p > 0,
        concat(slice(acc, lit(1), (p - 1).cast("int")),
          slice(acc, (p + 1).cast("int"), size(acc))))
        .otherwise(acc)
    })

  /** Fold one changelog batch into a SKETCHED (count, sum, min, max)
    * view — [[mergeAggMinMax]] with the recompute made RARE instead of
    * per-retraction. Per dim and per side:
    *
    *  - leaving live values pop out of the sketch (multiset diff —
    *    a leaver beyond the coverage threshold is simply absent);
    *  - entering live values within coverage splice in (an enterer
    *    beyond a TRUNCATED threshold is untracked by construction —
    *    it can never be the boundary while covered values remain);
    *  - the sketch re-truncates to k, tightening the threshold;
    *  - ONLY a side whose sketch drains empty while untracked live
    *    values remain (threshold non-null, n > 0) REBUILDS from the
    *    post-batch live rows of that dim — k boundary deletions per
    *    side, minimum, between rebuilds.
    *
    * Correctness invariant (property-tested): the sketch is always a
    * sub-multiset of the dim's live values containing every live
    * value within its threshold, so the served end equals the true
    * min/max whenever the sketch is non-empty, and
    * `fold == aggSnapshotSketch(post-store)` on (dims, n, sum, min,
    * max) after every batch. Same `recomputeStore`, broadcast, and
    * EAGER contracts as [[mergeAggMinMax]] — the dim-bounded state
    * checkpoints inside the call (the common no-drain result carries
    * no rebuild branch and no growing lineage, so callers need no
    * truncation of their own).
    */
  def mergeAggSketch(agg: DataFrame, store: DataFrame, batch: DataFrame,
                     keyCol: String, opCol: String, seqCols: Seq[String],
                     dims: Seq[String], valCol: String, k: Int,
                     deleteOp: String = "D",
                     nCol: String = "n", sumCol: String = "sum",
                     minCol: String = "min", maxCol: String = "max",
                     maxBroadcastKeys: Long = 10000000L,
                     recomputeStore: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"sketch k=$k must be positive")
    (SketchCols ++ Seq("__lv", "__ev", "__dk", "__rs")).foreach(t =>
      require(!dims.contains(t),
        s"column name $t is reserved by mergeAggSketch's state/temporaries"))
    SketchCols.foreach(c => require(agg.columns.contains(c),
      s"agg is missing sketch-state column $c — seed the view with " +
        "aggSnapshotSketch, not aggSnapshotMinMax"))
    val (bk, pre, winner) = preWinner(store, batch, keyCol, opCol, seqCols,
      dims, valCol, maxBroadcastKeys)
    val vt = store.schema(valCol).dataType
    val dk = struct(dims.map(col): _*).as("__dk")
    def live(df: DataFrame): DataFrame =
      df.where(col(opCol) =!= deleteOp).select(dk, col(valCol))
    // ONE exchange computes the n/sum telescoping delta AND the
    // per-dim leaving/entering live-value arrays: tag each live
    // pre-image row −1 and each live winner row +1, then a single
    // groupBy aggregates the signed count/sum while collect_list's
    // null-skipping splits the value arrays by side (a when() with no
    // otherwise is null on the other side's rows and on null values —
    // exactly the old per-side `.where(isNotNull)` filters). The
    // previous shape paid three batch-sized exchanges (delta, leaving,
    // entering) plus two extra view-side joins for the same numbers.
    val signed = (df: DataFrame, sign: Int) =>
      df.where(col(opCol) =!= deleteOp)
        .select((dims.map(col) :+ col(valCol) :+ lit(sign).as("__sgn")): _*)
    val fused = signed(winner, 1).unionByName(signed(pre, -1))
      .groupBy(dims.map(col): _*)
      .agg(sum(col("__sgn").cast("long")).as(nCol),
        coalesce(sum(col(valCol) * col("__sgn")), lit(0L).cast(vt)).as(sumCol),
        sort_array(collect_list(when(col("__sgn") === -1, col(valCol))))
          .as("__lv"),
        sort_array(collect_list(when(col("__sgn") === 1, col(valCol))))
          .as("__ev"))
    sketchStep(foldSketchState(agg, fused, dims, nCol, sumCol, vt),
      () => {
        val rstore = recomputeStore.getOrElse(store)
        ((keyCol +: opCol +: dims) :+ valCol).foreach(c =>
          require(rstore.columns.contains(c),
            s"recomputeStore missing column $c"))
        require(!rstore.columns.contains("__bk"),
          "column name __bk is reserved by mergeAggSketch's key anti-join")
        live(rstore.join(bk, col(keyCol) <=> col("__bk"), "left_anti"))
          .unionByName(live(winner))
      },
      dims, valCol, vt, k, nCol, sumCol, minCol, maxCol)
  }

  /** Fold the maintained view's (n, sum) + sketch state with a
    * caller's `fused` delta frame (n/sum delta + leaving/entering
    * value arrays, one row per touched dim) in ONE union + groupBy —
    * the single consumption of `fused`. The n/sum arithmetic is
    * [[mergeAggDelta]]'s verbatim (same union coercion, same SUM0
    * fallback, same n≠0 drop); the sketch state and the value arrays
    * ride the same exchange as null-on-the-other-side columns picked
    * out by null-skipping MAX (each side contributes at most one row
    * per dim, so MAX is pure selection, never comparison). The
    * previous shape LEFT-joined the (n, sum) fold with the prior
    * sketch and with `fused`'s arrays — two joins whose broadcast
    * builds re-executed the fused subtree (column pruning specializes
    * the two references, so exchange reuse never fired): one full
    * batch+touched-store pass per trigger for nothing.
    */
  private def foldSketchState(agg: DataFrame, fused: DataFrame,
                              dims: Seq[String], nCol: String, sumCol: String,
                              vt: org.apache.spark.sql.types.DataType)
      : DataFrame = {
    val nullArr = lit(null).cast(s"array<${vt.sql}>")
    val nullV = lit(null).cast(vt)
    val aggSide = agg.select((dims.map(col) :+ col(nCol) :+ col(sumCol) :+
      col("__mns") :+ col("__mxs") :+ col("__mnt") :+ col("__mxt") :+
      nullArr.as("__lv") :+ nullArr.as("__ev")): _*)
    val fusedSide = fused.select((dims.map(col) :+ col(nCol) :+ col(sumCol) :+
      nullArr.as("__mns") :+ nullArr.as("__mxs") :+ nullV.as("__mnt") :+
      nullV.as("__mxt") :+ col("__lv") :+ col("__ev")): _*)
    aggSide.unionByName(fusedSide)
      .groupBy(dims.map(col): _*)
      .agg(sum(col(nCol)).as(nCol),
        coalesce(sum(col(sumCol)),
          lit(0L).cast(agg.schema(sumCol).dataType)).as(sumCol),
        max(col("__mns")).as("__mns"), max(col("__mxs")).as("__mxs"),
        max(col("__mnt")).as("__mnt"), max(col("__mxt")).as("__mxt"),
        max(col("__lv")).as("__lv"), max(col("__ev")).as("__ev"))
      .where(col(nCol) =!= 0)
      .withColumn("__dk", struct(dims.map(col): _*))
  }

  /** Shared sketch-state stepping of [[mergeAggSketch]] and
    * [[purgeAggSketch]]: take the [[foldSketchState]] frame (folded
    * n/sum + prior sketch + the per-dim leaving/entering live-value
    * arrays, all out of one exchange), pop leavers (multiset diff),
    * splice coverable enterers, re-truncate to k, and — only for dims
    * whose sketch side DRAINS while untracked live values remain —
    * rebuild from `postLive()` (the POST-state live rows of the
    * store, built lazily: the common no-drain path checkpoints before
    * the drain test and never references it, so its committed plan
    * carries no store scan at all).
    */
  private def sketchStep(foldedState: DataFrame,
                         postLive: () => DataFrame,
                         dims: Seq[String], valCol: String,
                         vt: org.apache.spark.sql.types.DataType, k: Int,
                         nCol: String, sumCol: String,
                         minCol: String, maxCol: String): DataFrame = {
    val emptyArr = array().cast(s"array<${vt.sql}>")
    val folded = foldedState
      .withColumn("__mns", coalesce(col("__mns"), emptyArr))
      .withColumn("__mxs", coalesce(col("__mxs"), emptyArr))
      .withColumn("__lv", coalesce(col("__lv"), emptyArr))
      .withColumn("__ev", coalesce(col("__ev"), emptyArr))
    // min side: pop leavers, splice coverable enterers, retruncate.
    // Candidates land in their own columns FIRST — deriving state in
    // one chained withColumn pass would re-resolve the candidate
    // expression against the already-updated sketch column.
    val mnCand = sort_array(concat(
      multisetDiff(col("__mns"), col("__lv")),
      when(col("__mnt").isNull, col("__ev"))
        .otherwise(filter(col("__ev"), v => v <= col("__mnt")))))
    // max side mirrored (arrays ascending; the tail is the boundary)
    val mxCand = sort_array(concat(
      multisetDiff(col("__mxs"), col("__lv")),
      when(col("__mxt").isNull, col("__ev"))
        .otherwise(filter(col("__ev"), v => v >= col("__mxt")))))
    val stepped = folded
      .withColumn("__mnc", mnCand)
      .withColumn("__mxc", mxCand)
      .select((dims.map(col) :+ col("__dk") :+ col(nCol) :+ col(sumCol) :+
        when(size(col("__mnc")) > k, slice(col("__mnc"), 1, k))
          .otherwise(col("__mnc")).as("__mns") :+
        when(size(col("__mnc")) > k, element_at(col("__mnc"), k))
          .otherwise(col("__mnt")).as("__mnt") :+
        when(size(col("__mxc")) > k,
          slice(col("__mxc"), (size(col("__mxc")) - k + 1).cast("int"), lit(k)))
          .otherwise(col("__mxc")).as("__mxs") :+
        when(size(col("__mxc")) > k,
          element_at(col("__mxc"), (size(col("__mxc")) - k + 1).cast("int")))
          .otherwise(col("__mxt")).as("__mxt")): _*)
      // a side drains when its sketch is empty but untracked live
      // values remain (threshold says truncated, n says rows exist)
      .withColumn("__rs",
        (size(col("__mns")) === 0 && col("__mnt").isNotNull) ||
          (size(col("__mxs")) === 0 && col("__mxt").isNotNull))
    // The fold state is dim-bounded — CHECKPOINT it eagerly so (a) the
    // drain test below is a cheap action, (b) the common no-drain path
    // carries NO rebuild branch in its plan at all, and (c) the rare
    // drain path reads the state once instead of recomputing the whole
    // fold subtree as the rebuild branch's second input. This makes
    // mergeAggSketch EAGER (it runs the fold when called) — the shape
    // every maintenance caller has anyway, and the reason the returned
    // frame needs no further lineage truncation across folds.
    val steppedCk = stepped.localCheckpoint(true)
    def assemble(df: DataFrame): DataFrame =
      df.select((dims.map(col) :+ col(nCol) :+ col(sumCol) :+
        serveMin(vt).as(minCol) :+ serveMax(vt).as(maxCol) :+
        col("__mns") :+ col("__mxs") :+ col("__mnt") :+ col("__mxt")): _*)
    val rebuildDims = steppedCk.where(col("__rs")).select("__dk")
    if (rebuildDims.isEmpty) return assemble(steppedCk)
    // the rare path: REBUILD the drained dims' sketches from the
    // post-state live rows of those dims only
    val drainedLive = postLive()
      .join(rebuildDims.hint("broadcast"), Seq("__dk"), "left_semi")
    val rebuilt = kSmallestLargest(drainedLive, "__dk", valCol, k)
      .select(col("__dk"), col("__mns").as("__rmns"),
        col("__mxs").as("__rmxs"), col("__mnt").as("__rmnt"),
        col("__mxt").as("__rmxt"))
    assemble(steppedCk.join(rebuilt, Seq("__dk"), "left")
      .withColumn("__mns",
        when(col("__rs"), coalesce(col("__rmns"), emptyArr))
          .otherwise(col("__mns")))
      .withColumn("__mxs",
        when(col("__rs"), coalesce(col("__rmxs"), emptyArr))
          .otherwise(col("__mxs")))
      .withColumn("__mnt", when(col("__rs"), col("__rmnt"))
        .otherwise(col("__mnt")))
      .withColumn("__mxt", when(col("__rs"), col("__rmxt"))
        .otherwise(col("__mxt"))))
  }

  /** Subtract a PURGED key list's live contributions from a SKETCHED
    * (count, sum, min, max) view — the erasure twin of
    * [[mergeAggSketch]], sharing its [[sketchStep]]: the purged keys'
    * live values POP out of each dim's sketch (an O(1) boundary
    * retraction, where the plain min/max view pays a full recompute
    * per erasure), n/sum subtract as the usual delta, and only a dim
    * whose sketch side DRAINS while untracked live values remain
    * rebuilds — from the store's SURVIVING rows (`recomputeStore`
    * anti-joined with the purged keys), which makes the call correct
    * VIEW-FIRST against the PRE-purge store: the crash-recoverable
    * protocol of [[graft.streaming.StreamMatview.purgeKeys]] extends
    * to min/max views unchanged.
    *
    * `store` may be the touched-buckets read (the pre-image probe only
    * ever matches the purged keys); `recomputeStore` must be the FULL
    * store for the same reason as [[mergeAggMinMax]]'s — a drained
    * dim's surviving rows live in every bucket. A dim purged empty
    * drops from the view (n reaches 0). Like [[mergeAggSketch]] this
    * is EAGER: the dim-bounded state checkpoints inside the call, so
    * the common no-drain path's plan carries no store scan at all.
    */
  def purgeAggSketch(agg: DataFrame, store: DataFrame, keys: DataFrame,
                     keyCol: String, opCol: String, dims: Seq[String],
                     valCol: String, k: Int, deleteOp: String = "D",
                     nCol: String = "n", sumCol: String = "sum",
                     minCol: String = "min", maxCol: String = "max",
                     maxBroadcastKeys: Long = 10000000L,
                     recomputeStore: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"sketch k=$k must be positive")
    (SketchCols ++ Seq("__lv", "__ev", "__dk", "__rs", "__bk")).foreach(t =>
      require(!dims.contains(t),
        s"column name $t is reserved by purgeAggSketch's state/temporaries"))
    SketchCols.foreach(c => require(agg.columns.contains(c),
      s"agg is missing sketch-state column $c — seed the view with " +
        "aggSnapshotSketch, not aggSnapshotMinMax"))
    val needed = (keyCol +: opCol +: dims) :+ valCol
    needed.foreach(c => require(store.columns.contains(c),
      s"store missing column $c"))
    val kdf = keys.select(col(keyCol).as("__bk")).distinct()
    if (maxBroadcastKeys > 0)
      require(kdf.limit(math.min(maxBroadcastKeys + 1, Int.MaxValue).toInt)
        .count() <= maxBroadcastKeys,
        s"purge has more than $maxBroadcastKeys distinct keys — too large to " +
          "broadcast against the store; split the purge (or raise maxBroadcastKeys)")
    val bk = broadcast(kdf)
    val vt = store.schema(valCol).dataType
    val dk = struct(dims.map(col): _*).as("__dk")
    def live(df: DataFrame): DataFrame =
      df.where(col(opCol) =!= deleteOp).select(dk, col(valCol))
    // pre-images: the purged keys' current store rows — the ONLY store
    // access of the common path, one broadcast semi-join (with a
    // bucketed store underneath, touched buckets only)
    val pre = store.select(needed.distinct.map(col): _*)
      .join(bk, col(keyCol) <=> col("__bk"), "left_semi")
    // ONE exchange, same fusion as [[mergeAggSketch]]: the negated
    // n/sum delta (SUM0 convention as aggDelta; the sum keeps its
    // natural widened type — mergeAggDelta's union coerces, never a
    // narrowing cast) and the leaving-value arrays come out of a
    // single groupBy over the purged pre-images. A purge only removes
    // rows, so the entering side is a constant empty array.
    val fused = pre.where(col(opCol) =!= deleteOp)
      .groupBy(dims.map(col): _*)
      .agg((count(lit(1)) * -1).as(nCol),
        (coalesce(sum(col(valCol)), lit(0L).cast(vt)) * -1).as(sumCol),
        sort_array(collect_list(col(valCol))).as("__lv"))
      .withColumn("__ev", array().cast(s"array<${vt.sql}>"))
    sketchStep(foldSketchState(agg, fused, dims, nCol, sumCol, vt),
      () => {
        val rstore = recomputeStore.getOrElse(store)
        needed.foreach(c => require(rstore.columns.contains(c),
          s"recomputeStore missing column $c"))
        require(!rstore.columns.contains("__bk"),
          "column name __bk is reserved by purgeAggSketch's key anti-join")
        live(rstore.join(bk, col(keyCol) <=> col("__bk"), "left_anti"))
      },
      dims, valCol, vt, k, nCol, sumCol, minCol, maxCol)
  }

  /** Expand a changelog into SCD-type-2 history: one VERSION row per
    * non-delete log entry, valid over [`validFrom`, `validTo`) —
    * `validFrom` is the entry's own `tsCol`, `validTo` the NEXT
    * entry's (any op, so a delete closes the last version without
    * opening one), null `validTo` marks the key's current version
    * (`currentCol`); a key whose last entry is a delete has no
    * current row. The point-in-time lookup this enables ("which
    * corpus rows were live when this checkpoint trained?") is the
    * audit twin of [[applyLog]]'s latest-state merge — applyLog's
    * output equals this history filtered to `currentCol`.
    *
    * Same seq contract as [[applyLog]]: the `seqCols` tuple is unique
    * and non-null per key. Unlike applyLog there is NO aggregation to
    * push map-side — every version row is output, so the one shuffle
    * carries the full log partitioned by key, and a single window
    * sort serves the lead(). A key's whole history lands in one
    * partition by construction; history depth per key is the skew
    * contract (same class as [[TimeJoin.sessionize]]'s per-key
    * ordering).
    */
  def scd2(log: DataFrame, keyCol: String, opCol: String,
           seqCols: Seq[String], tsCol: String, deleteOp: String = "D",
           validFrom: String = "valid_from", validTo: String = "valid_to",
           currentCol: String = "is_current"): DataFrame = {
    require(seqCols.nonEmpty, "scd2 needs at least one seq column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(seqCols.toIndexedSeq.map(col): _*)
    log.withColumn(validTo, lead(col(tsCol), 1).over(w))
      .where(col(opCol) =!= deleteOp)
      .withColumn(currentCol, col(validTo).isNull)
      .withColumnRenamed(tsCol, validFrom)
      .drop(opCol)
  }

  /** Time-travel read over an [[scd2]] history: the version of each
    * key visible at instant `ts` — `valid_from ≤ ts < valid_to` (open
    * end; a null valid_to is the current version). Deleted keys are
    * absent by construction: [[scd2]] computes each version's
    * valid_to from the NEXT log entry — including a delete — before
    * dropping the delete rows, so a key deleted before `ts` has no
    * admissible interval.
    *
    * Pure map-side filter — time travel over 100 TB of history costs
    * one pruned scan (lay the history out by valid_from and partition
    * pruning does the rest), never a join or a window.
    */
  def asOf(history: DataFrame, ts: Column,
           validFrom: String = "valid_from",
           validTo: String = "valid_to"): DataFrame =
    history.where(col(validFrom) <= ts &&
      (col(validTo).isNull || ts < col(validTo)))

  /** Diff two snapshot versions by key: one row per key present in
    * either side, `status` ∈ added (only in `b`) / removed (only in
    * `a`) / changed / unchanged. `contentFp` is a fingerprint
    * expression over each side's own columns (e.g.
    * `Hashing.h60(col("text"))`) — equality of fingerprints is the
    * "unchanged" test, so rows compare by an 8-byte value and the
    * content itself NEVER crosses the exchange: the full-outer join
    * shuffles (key, fp) pairs only, the same
    * fingerprints-not-payload discipline as
    * [[Dedup.exactByFingerprint]]. One shuffle total, both sides
    * map-side-hashed.
    */
  def diff(a: DataFrame, b: DataFrame, keyCol: String,
           contentFp: Column, statusCol: String = "status"): DataFrame = {
    val fa = a.select(col(keyCol).as("__k"), contentFp.as("__fa"))
    val fb = b.select(col(keyCol).as("__k"), contentFp.as("__fb"))
    fa.join(fb, Seq("__k"), "full_outer")
      .select(col("__k").as(keyCol),
        when(col("__fa").isNull, lit("added"))
          .when(col("__fb").isNull, lit("removed"))
          .when(col("__fa") === col("__fb"), lit("unchanged"))
          .otherwise(lit("changed")).as(statusCol))
  }
}
