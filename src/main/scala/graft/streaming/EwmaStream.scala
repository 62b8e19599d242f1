package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.pipeline.TimeSeries.ewma]]: the per-key EWMA
  * recurrence carried across micro-batches as `mapGroupsWithState` state —
  * the same KeyValueGroupedDataset custom-state path [[Sessionize]] uses.
  * State is O(1) per key (the running accumulator), so key cardinality —
  * not event volume — bounds the state store.
  *
  * Within a micro-batch events fold in (event-time, tie) order; across
  * batches the fold continues from state. With chronological batches the
  * emitted values equal the batch fold bit-for-bit (spec-pinned). A
  * cross-batch LATE event folds at arrival position — the recurrence is
  * order-sensitive by definition, so out-of-order delivery shifts
  * subsequent values; feed the stream through a watermark-sorted stage
  * first if exact replay under disorder matters.
  */
object EwmaStream {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      value: Double)
  case class EwmaState(acc: Double, have: Boolean)
  case class Out(key: Long, tie: Long, ewma_micro: Long)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def streaming(events: Dataset[Ev], alpha: Double): Dataset[Out] = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[EwmaState]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var s = state.getOption.getOrElse(EwmaState(0.0, have = false))
          val out = sorted.map { e =>
            val acc =
              if (!s.have) e.value else alpha * e.value + (1 - alpha) * s.acc
            s = EwmaState(acc, have = true)
            Out(user, e.event_id, math.floor(acc * 1000000 + 0.5).toLong)
          }
          state.update(s)
          out.iterator
      }
  }
}
