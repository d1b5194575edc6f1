package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Durations

/** Stateful event-time sessionization over Structured Streaming — the custom
  * per-key state machine the reference cannot express (its "streaming" is an
  * out-of-core batch engine, SURVEY §2.10); this is the 100 TB/day superset:
  * `flatMapGroupsWithState` with event-time timeout emits one row per closed
  * session (gap-based), with per-key state bounded by the open session only.
  */
object Sessionize {

  case class Event(userId: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class Session(userId: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
                     nEvents: Long, sumValue: Double)

  /** Batch twin of [[sessions]] — the same gap-based session semantics as a
    * DECLARATIVE window composition (boundary where the per-user gap
    * exceeds `gap`, session id = running boundary count, then one grouped
    * aggregate): ONE shuffle on the user key, no state machine, fully
    * SQL-expressible — the oracle face (q72), and the backfill path a
    * pipeline pairs with the streaming face.
    *
    * `tieCols`: deterministic secondary ordering for rows sharing a
    * (user, ts). Session MEMBERSHIP only depends on it when timestamps tie
    * exactly at a gap boundary — the lag pass and the running-sum pass are
    * separate window evaluations, and without a total order they may place
    * tied rows on different sides of the boundary (ADVICE r11). Pass a
    * unique event id whenever the source can carry duplicate timestamps. */
  def sessionsBatch(df: org.apache.spark.sql.DataFrame, userCol: String,
                    tsCol: String, valueCol: String, gap: String,
                    tieCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gapUs = Durations.parseMicros(gap)
    val w = Window.partitionBy(col(userCol))
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(us, 1).over(w)
    val brk = when(prev.isNull || us - prev > gapUs, 1L).otherwise(0L)
    df.withColumn("__brk", brk)
      .withColumn("session_id",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("sum_value"))
  }

  /** Close a session after `gap` of event-time silence per user. */
  def sessions(events: Dataset[Event], gap: String, watermarkDelay: String = "10 minutes")
              (implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapMs = Durations.parseMicros(gap) / 1000L

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum))
      } else {
        var closed = List.empty[Session]
        var cur = state.getOption
        rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.sum + e.value))
            case Some(s) =>
              closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
