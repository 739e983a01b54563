package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time sessionization with custom state — the
  * `flatMapGroupsWithState` slice of the streaming surface (SURVEY
  * §2.3.9 / prompt: "KeyValueGroupedDataset.mapGroupsWithState /
  * flatMapGroupsWithState for custom state").
  *
  * A session for a key is a maximal run of events where consecutive
  * gaps are ≤ `gapMs`. Semantics are ORDER-INDEPENDENT: state holds
  * every session not yet releasable, and a session is emitted
  * (append mode) only once the event-time watermark passes its
  * end + gap — at that point no admissible event (Spark drops rows
  * below the watermark) can extend or bridge it, so late,
  * out-of-order, and cross-batch events all land correctly:
  * an earlier-than-state event extends a session backward or opens
  * its own, and an event falling between two open sessions merges
  * them (counts add). State per key is O(open sessions), bounded by
  * the watermark delay / gap ratio, evicted on emission.
  */
object Sessionize {

  case class Ev(key: String, ts: Timestamp)
  case class SessState(start: Long, end: Long, n: Long)
  case class SessList(sessions: List[SessState])
  case class Session(key: String, start: Timestamp, end: Timestamp, n_events: Long)

  /** Coalesce sessions (any order) into maximal runs: sort by start,
    * then fold, merging a session into the previous run when its
    * start is within `gapMs` of the run's end (event counts add).
    * Exposed for the spec's direct property checks.
    */
  private[graft] def mergeAll(ss: Seq[SessState], gapMs: Long): List[SessState] =
    ss.sortBy(s => (s.start, s.end)).foldLeft(List.empty[SessState]) { (acc, s) =>
      acc match {
        case h :: t if s.start - h.end <= gapMs =>
          SessState(h.start, math.max(h.end, s.end), h.n + s.n) :: t
        case _ => s :: acc
      }
    }.reverse

  /** Per-group state transition, shared by the data and timeout
    * paths (`rows` is empty on timeout): fold incoming events into
    * the session set as singleton sessions, re-merge, then release
    * every session the watermark has sealed (end + gap < watermark —
    * no admissible future event can reach it).
    */
  def update(gapMs: Long)(
      key: String, rows: Iterator[Ev], state: GroupState[SessList]): Iterator[Session] = {
    val existing = state.getOption.map(_.sessions).getOrElse(Nil)
    val incoming = rows.map(e => SessState(e.ts.getTime, e.ts.getTime, 1L)).toList
    val merged = mergeAll(existing ++ incoming, gapMs)
    val wm = state.getCurrentWatermarkMs()
    val (closed, open) = merged.partition(_.end + gapMs < wm)
    if (open.nonEmpty) {
      state.update(SessList(open))
      // fire when the watermark passes the earliest possible close;
      // must be strictly above the current watermark
      val fireAt = open.map(_.end + gapMs).min + 1
      state.setTimeoutTimestamp(math.max(fireAt, wm + 1))
    } else {
      state.remove()
    }
    closed.sortBy(_.start)
      .map(s => Session(key, new Timestamp(s.start), new Timestamp(s.end), s.n))
      .iterator
  }

  /** Streaming sessionize: `events` must have (key: string,
    * ts: timestamp) columns. Returns watermark-sealed sessions
    * (append mode).
    *
    * `ts` must be an INSTANT timestamp (TimestampType). TIMESTAMP_NTZ
    * is rejected loudly here because the state handler extracts
    * epochs (`ts.getTime`) — Spark 4's encoder would otherwise
    * resolve the NTZ deserializer silently, reinterpreting wall-clock
    * values as session-zone instants, which shifts every epoch under
    * a non-UTC session. Normalize first (as `Tables.loadPlain` does).
    * `intervalJoin` deliberately has no such guard: it only compares
    * same-encoding timestamps against each other, which is
    * tz-invariant.
    */
  def sessions(events: Dataset[_], gapMs: Long,
               watermark: String = "30 minutes"): Dataset[Session] = {
    val tsType = events.toDF().schema("ts").dataType
    require(tsType == org.apache.spark.sql.types.TimestampType,
      s"sessions: `ts` must be an instant TIMESTAMP, got ${tsType.simpleString} " +
        "— normalize (e.g. cast under an explicit zone) before sessionizing")
    implicit val evEnc = Encoders.product[Ev]
    implicit val sessEnc = Encoders.product[Session]
    implicit val stEnc = Encoders.product[SessList]
    implicit val strEnc = Encoders.STRING
    val fn = update(gapMs) _
    events.toDF()
      .withWatermark("ts", watermark)
      .select(col("key"), col("ts"))
      .as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Batch oracle: the same session semantics as a plain fold, for
    * differential tests.
    */
  def sessionizeSeq(evs: Seq[(String, Long)], gapMs: Long): Seq[(String, Long, Long, Long)] =
    evs.groupBy(_._1).toSeq.flatMap { case (key, rows) =>
      val ts = rows.map(_._2).sorted
      val out = scala.collection.mutable.ListBuffer.empty[(String, Long, Long, Long)]
      var start = ts.head
      var end = ts.head
      var n = 1L
      ts.tail.foreach { t =>
        if (t - end <= gapMs) { end = math.max(end, t); n += 1 }
        else { out += ((key, start, end, n)); start = t; end = t; n = 1 }
      }
      out += ((key, start, end, n))
      out.toSeq
    }
}
