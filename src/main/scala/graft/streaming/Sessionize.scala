package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization with an inactivity gap — batch and stateful-stream
  * forms of the same semantics.
  *
  * Batch: pure window expressions (lag → gap flag → cumulative session id →
  * one groupBy). Streaming: `flatMapGroupsWithState` keeps one open session
  * per user as state, emits a session whenever the gap closes it — the
  * KeyValueGroupedDataset custom-state path for data that outlives a
  * micro-batch.
  */
object Sessionize {

  /** (user_id, session_id, session_start, session_end, n_events, sum_value)
    * — session_id is the 0-based per-user session ordinal. */
  def batch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // own every parquet timestamp encoding, not just the one the current
    // fixture happens to use — NTZ would reject the gap arithmetic below
    val ev = graft.io.Tables.normalizeTs(events, "ts")
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    ev
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new",
        // integer-microsecond diff (exact; unix_timestamp would truncate
        // to seconds and disagree with the oracle's epoch() on borderline
        // gaps, TIMESTAMP→DOUBLE casts are NTZ-hostile in Spark 4)
        when(col("__prev").isNull, 0)
          .when(unix_micros(col("ts")) - unix_micros(col("__prev")) >
            gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), sum("value").as("sum_value"))
  }

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class OpenSession(start: java.sql.Timestamp, last: java.sql.Timestamp,
      n: Long, sum: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Microsecond-precision epoch (Timestamp.getTime alone truncates the
    * sub-millisecond part that the fixtures carry). floorDiv keeps
    * pre-epoch timestamps correct — `/` truncates toward zero and would be
    * off by a second with the wrong sign before 1970. */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming form: emits each session once its gap closes (the session
    * still open when the stream ends stays in state — the next batch or a
    * timeout flushes it). Events inside one micro-batch are sorted by event
    * time before folding; state carries the open session across batches.
    */
  def streaming(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          val sorted = it.toSeq.sortBy(e => micros(e.ts))
          var open = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          sorted.foreach { e =>
            open match {
              case Some(s) if micros(e.ts) - micros(s.last) <= gapUs =>
                // a late event (earlier than state's last, e.g. cross-batch
                // disorder) must not move `last` backward — keep the max so
                // subsequent gap checks stay monotonic; symmetrically it may
                // precede the open session's start, so keep the min there or
                // the emitted session_start could postdate its earliest event
                // (disagreeing with the batch form on the same data)
                val last = if (micros(e.ts) > micros(s.last)) e.ts else s.last
                val start = if (micros(e.ts) < micros(s.start)) e.ts else s.start
                open = Some(OpenSession(start, last, s.n + 1, s.sum + e.value))
              case Some(s) =>
                closed += Session(user, s.start, s.last, s.n, s.sum)
                open = Some(OpenSession(e.ts, e.ts, 1, e.value))
              case None =>
                open = Some(OpenSession(e.ts, e.ts, 1, e.value))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
  }
}
