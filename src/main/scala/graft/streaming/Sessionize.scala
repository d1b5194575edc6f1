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
object Sessionize extends Serializable {

  case class Event(userId: Long, ts: Timestamp, value: Double)
  /** Per-key state: event-time bounds in MICROSECONDS (the engine's
    * timestamp resolution — ms-truncated arithmetic would disagree with
    * the batch face's epoch_us gap test on sub-ms boundaries) and the
    * value sum in 1e-4 FIXED POINT (the engine's DECIMAL(18,4) value
    * convention), so the emitted double is order-independent and bitwise
    * equal to the batch face's exact decimal sum. */
  case class SessionState(start: Long, end: Long, n: Long, sumQ: Long)
  case class Session(userId: Long, sessionStart: Timestamp, sessionEnd: Timestamp,
                     nEvents: Long, sumValue: Double)

  private def micros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }
  private def quant(v: Double): Long = math.rint(v * 10000.0).toLong

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
    val gapUs = Durations.parseMicros(gap)

    def emit(userId: Long, s: SessionState): Session =
      Session(userId, tsOf(s.start), tsOf(s.end), s.n, s.sumQ / 10000.0)

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(emit(userId, s))
      } else {
        var closed = List.empty[Session]
        var cur = state.getOption
        rows.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
          val t = micros(e.ts)
          cur match {
            case Some(s) if t - s.end <= gapUs =>
              cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.sumQ + quant(e.value)))
            case Some(s) =>
              closed ::= emit(userId, s)
              cur = Some(SessionState(t, t, 1, quant(e.value)))
            case None =>
              cur = Some(SessionState(t, t, 1, quant(e.value)))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // timeout is millisecond-granular: CEIL past the µs deadline so a
          // timeout can never fire before end+gap
          state.setTimeoutTimestamp(Math.floorDiv(s.end + gapUs + 999L, 1000L))
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
