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
  /** Full per-key state: `pending` buffers (µs, quantized-value) events not
    * yet FINAL — an event is final only once the watermark passes its
    * timestamp, because any not-yet-arrived event must carry
    * ts >= watermark, so nothing can still sort before it. Folding only
    * finalized events (in timestamp order) into the open session makes the
    * machine correct under out-of-order arrival ACROSS micro-batches — the
    * normal state of a distributed ingest, where files/partitions reach the
    * source in arbitrary order within the watermark delay. */
  case class SessBuf(pending: Seq[(Long, Long)], open: Option[SessionState])
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

    // Watermark-buffered fold (data and timeout invocations share it):
    //  1. incoming events join the pending buffer;
    //  2. events with ts < watermark are FINAL (no future event can sort
    //     before them) — fold them, timestamp-sorted, through the gap rule;
    //  3. the open session closes once the watermark passes end + gap
    //     (every pending/future event then has ts >= wm > end + gap);
    //  4. the event-time timeout re-wakes the key when the watermark next
    //     passes either the oldest pending event or the close deadline.
    // State is bounded by the watermark delay (pending) + one open session.
    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessBuf]): Iterator[Session] = {
      val prev = state.getOption.getOrElse(SessBuf(Nil, None))
      // getCurrentWatermarkMs() returns 0 when NO watermark exists yet
      // (first batch); treating that as real would finalize/close/late-drop
      // around pre-epoch (negative-µs) events — model "unset" as -∞.
      // KNOWN LIMIT (ADVICE r12): a LEGITIMATE zero watermark (event times
      // within the delay of epoch) is indistinguishable from unset at this
      // API, so epoch-adjacent sessions close only once the watermark first
      // advances past 0 — correct but delayed; a stream whose event times
      // never exceed the delay past epoch is out of contract (see
      // AsofStream for the same note).
      val wmMs = state.getCurrentWatermarkMs()
      val wmUs = if (wmMs == 0L) Long.MinValue else wmMs * 1000L
      // Late-arrival policy: an incoming event OLDER than the watermark is
      // dropped. Spark 4's FlatMapGroupsWithStateExec already pre-filters
      // such rows (verified empirically), but the invariant is load-bearing
      // here — a late event folded into the open session would merge across
      // an arbitrarily large gap (t - end is negative, trivially <= gap) or
      // mint a duplicate session after its true session emitted — so the
      // operator enforces it itself rather than relying on exec-version
      // behavior. Events in `pending` are NOT late: they arrived >= the
      // watermark of their batch and finalize once the watermark passes.
      val incoming = rows.map(e => (micros(e.ts), quant(e.value)))
        .filter(_._1 >= wmUs).toVector
      val (fin, pend) = (prev.pending ++ incoming).partition(_._1 < wmUs)
      var open = prev.open
      val closed = Vector.newBuilder[Session]
      fin.sorted.foreach { case (t, qv) =>
        open match {
          case Some(s) if t - s.end <= gapUs =>
            open = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
              s.n + 1, s.sumQ + qv))
          case Some(s) =>
            closed += emit(userId, s)
            open = Some(SessionState(t, t, 1, qv))
          case None =>
            open = Some(SessionState(t, t, 1, qv))
        }
      }
      open match {
        case Some(s) if wmUs > s.end + gapUs =>
          closed += emit(userId, s); open = None
        case _ => ()
      }
      if (pend.isEmpty && open.isEmpty) state.remove()
      else {
        state.update(SessBuf(pend, open))
        // strictly past the µs deadline, CEILed to the ms granularity of
        // GroupState timeouts, so a wake can never fire before the
        // watermark has actually passed the deadline
        val deadlineUs = (open.map(_.end + gapUs).toSeq ++ pend.map(_._1)).min + 1L
        // clamp to positive ms (GroupState requires it; pre-epoch events
        // would otherwise produce a non-positive timeout)
        state.setTimeoutTimestamp(math.max(1L, Math.floorDiv(deadlineUs + 999L, 1000L)))
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
