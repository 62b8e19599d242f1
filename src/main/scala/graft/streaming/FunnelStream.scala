package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.pipeline.TimeSeries.funnel]]: per-key funnel
  * progress as `flatMapGroupsWithState` state (current step + its time —
  * O(steps) per key). The batch funnel's min-chain is the greedy
  * "earliest step-i event at or after step i-1", which a chronological
  * stream reproduces by construction: fold events in event-time order,
  * advance the state whenever the NEXT step's type arrives at-or-after
  * the current step's time. A row is emitted every time a key advances,
  * so the sink's last row per key is the live funnel position.
  */
object FunnelStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class FunnelState(step: Int, times: List[Long])
  case class Advance(user_id: Long, step: Int, ts_us: Long)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def streaming(events: Dataset[Ev], steps: Seq[String]): Dataset[Advance] = {
    require(steps.nonEmpty)
    import events.sparkSession.implicits._
    val stepSeq = steps.toList
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Advance](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[FunnelState]) =>
          // tie-break equal timestamps by FUNNEL position, not name: an
          // equal-ts pair (step-i event, step-i+1 event) must fold in
          // funnel order or the later step's event is consumed unseen
          // while the batch min-chain (ts >= prev, equality included)
          // would have matched it
          val sorted = it.toSeq.sortBy(e =>
            (micros(e.ts), stepSeq.indexOf(e.event_type) match {
              case -1 => Int.MaxValue
              case i  => i
            }))
          var s = state.getOption.getOrElse(FunnelState(0, Nil))
          val out = scala.collection.mutable.ArrayBuffer.empty[Advance]
          sorted.foreach { e =>
            if (s.step < stepSeq.length && e.event_type == stepSeq(s.step) &&
              (s.times.isEmpty || micros(e.ts) >= s.times.head)) {
              s = FunnelState(s.step + 1, micros(e.ts) :: s.times)
              out += Advance(user, s.step, micros(e.ts))
            }
          }
          state.update(s)
          out.iterator
      }
  }
}
