package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark lacks as built-ins: as-of join and banded
  * range join. Both are expressed as compositions of equi-shuffle +
  * window/filter primitives, so Catalyst plans them with ordinary
  * hash exchanges — no non-equi join (which Spark executes as
  * BroadcastNestedLoopJoin, an |L|×|R| scan per key at worst).
  *
  * Timestamp contract: ts columns must be INSTANT timestamps
  * (TimestampType). A TIMESTAMP_NTZ column fails loudly at analysis
  * (`unix_millis` rejects it) rather than being silently
  * reinterpreted — normalize tz-less sources at load, as
  * [[graft.Tables]] does for the fixture tables. (The keyless-join
  * optimizer rewrite [[graft.plans.BandedRangeJoinRule]] does accept
  * NTZ, because there it only generates band candidates and keeps
  * the user's own predicate as the exact filter.)
  *
  * Scale shapes (the reason these are worth a dedicated operator):
  *
  *  - [[asofJoin]]: ONE hash shuffle of each side on the equi-keys,
  *    one in-partition sort of the unioned rows, one streaming window
  *    pass. Cost O((|L|+|R|) log p) per partition, zero row
  *    amplification — at 100 TB this is the only as-of shape that
  *    works; a per-key range probe or nested-loop join amplifies by
  *    the per-key right cardinality.
  *  - [[rangeJoin]]: right rows land in ONE time band of width equal
  *    to the window length; each left row probes the ≤2 bands its
  *    window can intersect. The join is a plain equi-join on
  *    (keys, band); the exact predicate filters band false-candidates.
  *    Output work ∝ true matches + candidates in adjacent bands,
  *    never |L|×|R| per key.
  */
object TimeJoin {

  /** As-of join: for each left row, the single nearest right row with
    * the same `keys` and right time at-or-before (backward, default)
    * or at-or-after (`forward = true`) the left time. Left rows with
    * no admissible right row survive with null payload (left-join
    * semantics). `inclusive = false` makes an equal timestamp
    * inadmissible (strictly-before/after semantics).
    *
    * Implementation: both sides union into one relation tagged by
    * side, hash-partitioned by `keys` and sorted by (time, side); a
    * running `last(right-payload, ignoreNulls)` window then carries
    * the most recent right row forward onto each left row. The right
    * payload rides as ONE struct (null on left rows), so a null FIELD
    * inside a matched right row cannot tear — the window skips whole
    * unmatched rows, never individual columns.
    *
    * Determinism: when several right rows share (keys, time), the
    * surviving one is the last in the (time, side) sort, which is not
    * defined between them — supply right rows unique per (keys, time)
    * (dedupe upstream with max_by) for fully deterministic output,
    * the same contract DuckDB's ASOF JOIN arbitrates silently.
    *
    * Output: every left column unchanged, plus each `payload` column
    * from the matched right row as `prefix + name` (null if no match).
    * Key column names must match across the two sides.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               prefix: String = "asof_", forward: Boolean = false,
               inclusive: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equi-key")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val rStruct = struct(payload.toIndexedSeq.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val lPart = left.select(
      keys.toIndexedSeq.map(col) ++ Seq(
        col(leftTs).as("__t"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val rPart = right.select(
      keys.toIndexedSeq.map(col) ++ Seq(
        col(rightTs).as("__t"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)
      // join semantics: a null key or null timestamp matches nothing
      // (the window would otherwise treat NULL as a real partition
      // value and nulls-first/last ordering would slot a null-ts row
      // where it carries or receives matches). Dropping such RIGHT
      // rows suffices for the right side; left rows survive unmatched
      // under the left-join contract.
      .where((keys.map(col(_).isNotNull) :+ col("__t").isNotNull).reduce(_ && _))
    // at an equal timestamp the right row is admissible iff
    // `inclusive`: sort it before (inclusive) or after (strict) the
    // left row so the running window has/hasn't seen it
    val sideOrder = if (inclusive) col("__side").asc else col("__side").desc
    val tOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keys.toIndexedSeq.map(col): _*)
      .orderBy(tOrder, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPart.unionByName(rPart)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        // key columns come from the union's TOP LEVEL (identical to
        // the struct fields on left rows by construction): they keep
        // the attribute chain from the window's hash partitioning, so
        // a downstream groupBy/join on the keys reuses this exchange
        // instead of re-shuffling — a struct-field extraction would
        // sever the partitioning info
        left.columns.toIndexedSeq.map(c =>
          (if (keys.contains(c)) col(c) else col("__l").getField(c)).as(c)) ++
          // a left row with a null timestamp admits nothing (any
          // comparison against NULL is false in a join) — mask its
          // carried payload rather than letting null-ordering pick an
          // arbitrary "nearest" row for it
          payload.map(p =>
            when(col("__t").isNotNull, col("__m").getField(p))
              .as(prefix + p)): _*)
  }

  /** Batch gap-based sessionization: appends a per-key ordinal
    * `session_id` (1-based), where a new session starts when the gap
    * to the previous event exceeds `gapMs` (a gap of EXACTLY gapMs
    * stays in-session — mirrors the streaming
    * [[graft.streaming.Sessionize]] contract). One hash shuffle on
    * the keys and one in-partition sort serve both window passes
    * (lag + running sum share the partitioning/ordering), so the cost
    * at any scale is that of a single windowed scan. Rows with a null
    * timestamp sort first and join the first session — filter them
    * upstream if they are noise.
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 gapMs: Long, out: String = "session_id"): DataFrame = {
    require(gapMs > 0, s"gapMs=$gapMs must be positive")
    val w = Window.partitionBy(keys.toIndexedSeq.map(col): _*).orderBy(col(tsCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prev.isNull || unix_millis(col(tsCol)) - unix_millis(prev) > gapMs, 1L)
      .otherwise(0L)
    df.withColumn(out,
      sum(newSession).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** First-order state-transition matrix of an event stream: for each
    * entity (`keys`), order its events by `tsCol` (then `tieCols` —
    * supply tie columns that make the order total, or equal-ts
    * transitions count in an arbitrary but fixed order) and count
    * every consecutive (previous `stateCol`, current `stateCol`)
    * pair, plus how many distinct entities produced each pair — the
    * Markov-chain census behind journey analysis ("what follows
    * signup?") and sequence-model sanity checks. Each entity's first
    * event has no predecessor and contributes no pair.
    *
    * Scale shape: ONE hash shuffle on the keys + in-partition sort
    * serves the lag (per-entity event count is the skew contract,
    * same as [[sessionize]]); the pair census then partial-aggregates
    * map-side into a |states|² -bounded groupBy, and the distinct-
    * entity count rides the same aggregation as a two-phase distinct.
    */
  def transitions(df: DataFrame, keys: Seq[String], tsCol: String,
                  stateCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "transitions needs at least one key column")
    val w = Window.partitionBy(keys.toIndexedSeq.map(col): _*)
      .orderBy((tsCol +: tieCols).toIndexedSeq.map(col): _*)
    df.withColumn("__from", lag(col(stateCol), 1).over(w))
      .where(col("__from").isNotNull)
      .groupBy(col("__from").as("from_state"), col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(keys.head, keys.tail: _*).as("n_keys"))
  }

  /** Exact floor-division band of a millisecond epoch column —
    * integer arithmetic only: the subtraction makes the numerator
    * exactly divisible, and `div` (IntegralDivide) keeps the quotient
    * in long arithmetic end to end. `Column./` would be DOUBLE
    * division — the numerator itself rounds above 2^53 (Spark
    * timestamps reach ~9.2e15 ms), mis-banding far-range epochs.
    * Truncating toward zero is safe only BECAUSE of the pmod
    * subtraction; on a raw negative numerator it would mis-band.
    */
  private def band(ms: Column, width: Long): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal => CatLit}
    val exact = ms - pmod(ms, lit(width))
    ColumnShim.column(
      IntegralDivide(ColumnShim.expression(exact), CatLit(width)))
  }

  /** Banded range join: all (left, right) row pairs with equal `keys`
    * and `rightTs - leftTs` in `[lowerMs, upperMs)` — e.g.
    * `(-7200000, 0)` = "right events in the two hours before left".
    * Output columns are both sides' in full, disambiguated as
    * `lPrefix + name` / `rPrefix + name`.
    *
    * `joinType` "left" keeps left rows with no right row in range,
    * null-padded — the batch twin of the streaming left-outer interval
    * join. Because each left row probes ≤2 band rows, "unmatched"
    * must mean "no band row matched", which needs a per-row identity:
    *
    *  - pass `leftIdCol = Some(c)` naming a column of `left` that is
    *    UNIQUE and NON-NULL per row (an event id, a doc id): the
    *    anti-join runs on it directly — fully lazy,
    *    lineage-recoverable, NO materialization. This is the 100 TB
    *    path. Null ids fail loudly at runtime (a null key never
    *    matches an anti-join, so a matched null-id row would emit
    *    twice — once joined, once padded); duplicate ids are the
    *    caller's contract (not checkable without an extra aggregate):
    *    a duplicated id whose twin matches would have its unmatched
    *    row silently dropped.
    *  - with no `leftIdCol`, the left side is tagged with
    *    monotonically_increasing_id and pinned via a LAZY
    *    localCheckpoint (ids are only layout-deterministic, so they
    *    must be frozen to agree between the match branch and the anti
    *    branch under AQE re-planning). The pin materializes the full
    *    left relation at FIRST execution (not at construction) to
    *    executor-local storage, and the result is not
    *    lineage-recoverable past executor loss — convenient for
    *    ad-hoc use, wrong for huge left sides.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTs: String, rightTs: String,
                lowerMs: Long, upperMs: Long,
                lPrefix: String = "l_", rPrefix: String = "r_",
                joinType: String = "inner",
                leftIdCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "rangeJoin needs at least one equi-key")
    require(upperMs > lowerMs, s"empty range [$lowerMs, $upperMs)")
    require(Set("inner", "left").contains(joinType),
      s"joinType=$joinType: rangeJoin supports inner and left")
    leftIdCol.foreach(c => require(left.columns.contains(c),
      s"leftIdCol=$c is not a column of the left side"))
    val width = upperMs - lowerMs
    val l0raw = left.select(left.columns.toIndexedSeq.map(c => col(c).as(lPrefix + c)): _*)
    val lid = leftIdCol.map(lPrefix + _).getOrElse("__lid")
    // loud null-id guard (outer + natural-key path only): a null key
    // never matches the anti-join, so a matched null-id row would be
    // BOTH joined and null-padded — corrupt output, not an edge case
    val l0 = if (joinType == "left" && leftIdCol.isDefined)
      l0raw.withColumn(lid,
        when(col(lid).isNull, raise_error(lit(
          s"rangeJoin leftIdCol=${leftIdCol.get} must be non-null")))
          .otherwise(col(lid)))
    else l0raw
    val l = if (joinType == "inner" || leftIdCol.isDefined) l0
            else l0.withColumn("__lid", monotonically_increasing_id())
              .localCheckpoint(eager = false)
    val r = right.select(right.columns.toIndexedSeq.map(c => col(c).as(rPrefix + c)): _*)
    val lms = unix_millis(col(lPrefix + leftTs))
    val rms = unix_millis(col(rPrefix + rightTs))
    // each right row is banded once; each left row probes the bands
    // its window intersects (≤2 of them since width == window length,
    // so the explode amplifies the SMALL side of the time predicate
    // by at most 2 — not a shuffle-size hazard)
    val lb = l.withColumn("__lband",
      explode(sequence(band(lms + lit(lowerMs), width),
        band(lms + lit(upperMs - 1), width))))
    val rb = r.withColumn("__rband", band(rms, width))
    val keyCond = keys.map(k => col(lPrefix + k) === col(rPrefix + k))
      .reduce(_ && _)
    val inner = lb.join(rb, keyCond && col("__lband") === col("__rband") &&
        rms >= lms + lit(lowerMs) && rms < lms + lit(upperMs))
      .drop("__lband", "__rband")
    if (joinType == "inner") inner
    else {
      val matched = inner.select(lid).distinct()
      val unmatched = l.join(matched, Seq(lid), "left_anti")
      val rNulls = r.schema.fields.toIndexedSeq.map(f =>
        lit(null).cast(f.dataType).as(f.name))
      // explicit order: the using-column anti-join reorders `lid` to
      // the front, so a bare col("*") would misalign the union
      val lCols = l.columns.toIndexedSeq.map(col)
      val padded = unmatched.select(lCols ++ rNulls: _*)
      val joined = inner.select(lCols ++ r.columns.toIndexedSeq.map(col): _*)
      if (leftIdCol.isDefined) joined.union(padded)
      else joined.union(padded).drop("__lid")
    }
  }

  /** Per-row trailing event-time window: a WindowSpec over rows of
    * the same `keys` with timestamps in the CLOSED interval
    * [t − widthMs, t] of each row's own t — the rolling-feature
    * frame ("this user's last hour of activity, as of each event").
    * Ordering is `unix_micros`, so the range bound is exact integer
    * microsecond arithmetic (a double ordering key would misplace
    * far-range epochs), and equal-timestamp peers are ALL in frame
    * on both engines (RANGE frames close over peers — no tie
    * ambiguity to pin away). DuckDB twin:
    * `RANGE BETWEEN INTERVAL .. PRECEDING AND CURRENT ROW` over a
    * timestamp ORDER BY, whose interval bound is closed the same way.
    *
    * Scale shape: one hash shuffle on the keys and one in-partition
    * sort serve every aggregate attached to the spec. COST CAVEAT
    * (measured, not theoretical): Spark's sliding frame maintains its
    * row buffer with a two-pointer pass but RE-EVALUATES every
    * attached aggregate over the whole buffer each time the buffer
    * changes — there is no retraction — so the total cost is
    * O(rows × frame), fine for the per-entity frames this spec is
    * for (a user's trailing hour is a handful of rows) but a blow-up
    * when few keys hold dense frames (236 s for 5 keys × ~1300-row
    * frames, [[graft.ext.Stats.rollingZOutliers]]'s history). For
    * count/sum-shaped moments at that density, use the running-frame
    * DIFFERENCE formulation rollingZOutliers switched to; min/max
    * have no subtraction trick and genuinely need the bounded frame.
    * Per-key row count is the skew contract, as with any keyed
    * window.
    */
  def trailingWindow(keys: Seq[String], tsCol: String,
                     widthMs: Long): org.apache.spark.sql.expressions.WindowSpec = {
    require(widthMs > 0, s"widthMs=$widthMs must be positive")
    Window.partitionBy(keys.toIndexedSeq.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-widthMs * 1000L, 0L)
  }

  /** Fixed-grid resampling with gap fill: aggregate `df` per
    * (`keyCols`, `everySeconds`-wide epoch bucket), then densify each
    * key's series to EVERY bucket between its first and last — gap
    * buckets appear with null aggregates (callers coalesce to their
    * fill values; the lib cannot know what "zero" means per agg).
    * The bucket lands in `bucketCol` as epoch SECONDS (a long):
    * integer grid arithmetic is exact and engine-portable, and the
    * caller formats for display. Sub-second parts cannot move a row
    * across a bucket edge (buckets are whole-second multiples).
    *
    * Scale shape: the ONE full shuffle is the aggregation itself
    * (map-side partial combine on (key, bucket)); everything after
    * runs on the aggregated relation — the span extremes are a
    * second, much smaller agg, and the grid explode emits exactly
    * O(keys × span/every) rows. That product is the contract to
    * watch: a single key spanning years at a 1-second grid densifies
    * to tens of millions of rows BY DESIGN (gap fill means
    * materializing the gaps) — pick `everySeconds` against the span,
    * not against the row count. The aggregated relation feeds BOTH
    * the span branch and the join, so it is [[PlanCache]]-pinned
    * (keyed on the input plan + every shaping parameter) rather than
    * scanned twice; the final left join pairs two post-agg
    * relations, and AQE picks a broadcast when either fits.
    */
  def resample(df: DataFrame, keyCols: Seq[String], tsCol: String,
               everySeconds: Long, aggs: Seq[Column],
               bucketCol: String = "bucket_s",
               cacheTag: String = "timejoin/resample"): DataFrame = {
    require(everySeconds > 0, s"everySeconds=$everySeconds must be positive")
    require(aggs.nonEmpty, "resample needs at least one aggregate")
    val keys = keyCols.toIndexedSeq.map(col)
    // integer floor-div end to end (see band's doc for why not `/`);
    // DuckDB twin: (epoch_us(ts) // (every*1000000)) * every
    val b = (band(unix_millis(col(tsCol)), everySeconds * 1000L) *
      everySeconds).as(bucketCol)
    val aggedTag = (Seq(cacheTag, tsCol, everySeconds.toString, bucketCol) ++
      keyCols ++ aggs.map(_.toString)).mkString("/")
    val agged = PlanCache.cached(aggedTag, df)(
      _.groupBy(keys :+ b: _*).agg(aggs.head, aggs.tail: _*))
    val span = agged.groupBy(keys: _*)
      .agg(min(bucketCol).as("__lo"), max(bucketCol).as("__hi"))
    val grid = span.select(keys :+
      explode(sequence(col("__lo"), col("__hi"), lit(everySeconds)))
        .as(bucketCol): _*)
    grid.join(agged, keyCols :+ bucketCol, "left")
  }
}
