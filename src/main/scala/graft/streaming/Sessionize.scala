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
  * gaps are ≤ `gapMs`. A session closes (and is emitted, append mode)
  * when the event-time watermark passes its end + gap — the state per
  * open session is three longs, evicted on close, so state size is
  * O(active keys) regardless of stream length.
  */
object Sessionize {

  case class Ev(key: String, ts: Timestamp)
  case class SessState(start: Long, end: Long, n: Long)
  case class Session(key: String, start: Timestamp, end: Timestamp, n_events: Long)

  /** Per-group state transition. Events inside one microbatch are
    * sorted; sessions that close inside the batch are emitted
    * immediately, the trailing open session is kept in state with an
    * event-time timeout at end + gap.
    */
  def update(gapMs: Long)(
      key: String, rows: Iterator[Ev], state: GroupState[SessState]): Iterator[Session] = {
    def emit(s: SessState): Session =
      Session(key, new Timestamp(s.start), new Timestamp(s.end), s.n)

    if (state.hasTimedOut) {
      val out = state.getOption.map(emit).iterator
      state.remove()
      out
    } else {
      var closed = List.empty[Session]
      var cur = state.getOption
      rows.toArray.map(e => (e.key, e.ts.getTime)).sortBy(_._2).foreach { case (_, t) =>
        cur match {
          case Some(s) if t - s.end <= gapMs =>
            cur = Some(SessState(s.start, math.max(s.end, t), s.n + 1))
          case Some(s) =>
            closed ::= emit(s)
            cur = Some(SessState(t, t, 1))
          case None =>
            cur = Some(SessState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end + gapMs)
      }
      closed.reverseIterator
    }
  }

  /** Streaming sessionize: `events` must have (key: string,
    * ts: timestamp) columns. Returns closed sessions (append mode).
    */
  def sessions(events: Dataset[_], gapMs: Long,
               watermark: String = "30 minutes"): Dataset[Session] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val sessEnc = Encoders.product[Session]
    implicit val stEnc = Encoders.product[SessState]
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
