package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Continuous (event-time) as-of join — the streaming twin of
  * `graft.operators.AsofJoin` (backward strategy), and a superset of the
  * reference's batch-only surface (its "streaming" is out-of-core batch,
  * SURVEY §2.10).
  *
  * Semantics: for every left event at time t, emit the left row joined with
  * the LATEST right row at rt <= t within the same `by` key — exactly batch
  * backward as-of — emitted once the watermark guarantees the match is
  * final (no right event that could change it can still arrive).
  *
  * Scale/state design (`flatMapGroupsWithState`, the pattern the brief
  * prescribes for custom streaming state):
  *  - state per key = pending lefts (not yet past the watermark) + the
  *    right-side frontier: rights newer than the watermark plus ONE
  *    finalized right (the newest older-than-watermark one — the only old
  *    right a future left can still match, since any future left has
  *    t >= watermark and prefers newer rights). Everything else is evicted
  *    → state is bounded by in-flight lateness, not stream length.
  *  - event-time timeout fires on watermark advance so pending lefts flush
  *    even when their key receives no further traffic.
  */
object AsofStream {

  /** Per-key state (public: the kryo encoder requires a public class). */
  case class Buf(lefts: Vector[(Long, Seq[Any])], rights: Vector[(Long, Seq[Any])])

  def asofStream(left: DataFrame, right: DataFrame,
                 leftOn: String, rightOn: String,
                 by: Seq[(String, String)],
                 watermark: String = "10 minutes",
                 strategy: graft.operators.AsofJoin.Strategy =
                   graft.operators.AsofJoin.Backward,
                 tolerance: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    val byL = by.map(_._1)
    val isBackward = strategy == graft.operators.AsofJoin.Backward
    require(isBackward || strategy == graft.operators.AsofJoin.Forward,
      "asofStream supports backward and forward strategies (nearest needs both directions final — join two streams via the batch definition instead)")
    // an unbounded FORWARD match can never finalize a null (a matching
    // right may arrive arbitrarily later), so the streaming face requires
    // the wait to be bounded
    require(isBackward || tolerance.nonEmpty,
      "forward asofStream requires a tolerance: an unbounded forward wait cannot finalize in a stream")
    val tolUs: Option[Long] =
      tolerance.map(graft.functions.Durations.parseMicros)

    // normalize to (by..., __t, __side, __lpay, __rpay) and union
    val lPayCols = left.columns.toSeq
    val rPayCols = right.columns.filterNot(c => c == rightOn || by.map(_._2).contains(c)).toSeq
    val leftNames = left.columns.toSet
    val outName: Map[String, String] =
      rPayCols.map(c => c -> (if (leftNames.contains(c)) s"${c}_right" else c)).toMap

    val lPrep = left.select(
      (byL.map(col) :+ col(leftOn).cast("timestamp").as("__t") :+ lit(1).as("__side") :+
        struct(lPayCols.map(col).toIndexedSeq: _*).as("__lpay") :+
        lit(null).cast(StructType(rPayCols.map(c => right.schema(c)))).as("__rpay")).toIndexedSeq: _*)
    val rPrep = right.select(
      (by.map { case (lb, rb) => col(rb).as(lb) } :+
        col(rightOn).cast("timestamp").as("__t") :+ lit(0).as("__side") :+
        lit(null).cast(lPrep.schema("__lpay").dataType).as("__lpay") :+
        struct(rPayCols.map(col).toIndexedSeq: _*).as("__rpay")).toIndexedSeq: _*)
    val unioned = lPrep.unionByName(rPrep).withWatermark("__t", watermark)

    val keySchema = StructType(byL.map(n => unioned.schema(n)))
    val outSchema = StructType(
      left.schema.fields ++ rPayCols.map(c => right.schema(c).copy(name = outName(c), nullable = true)))
    val keyEnc: Encoder[Row] = RowEncoder.encoderFor(keySchema)
    val outEnc: Encoder[Row] = RowEncoder.encoderFor(outSchema)
    val bufEnc: Encoder[Buf] = org.apache.spark.sql.Encoders.kryo[Buf]

    val byIdx = byL.map(unioned.schema.fieldIndex)
    val tIdx = unioned.schema.fieldIndex("__t")
    val sideIdx = unioned.schema.fieldIndex("__side")
    val lIdx = unioned.schema.fieldIndex("__lpay")
    val rIdx = unioned.schema.fieldIndex("__rpay")
    val nRight = rPayCols.length

    def us(r: Row): Long = {
      val ts = r.getAs[java.sql.Timestamp](tIdx)
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }

    unioned
      .groupByKey(r => Row.fromSeq(byIdx.map(r.get)))(keyEnc)
      .flatMapGroupsWithState[Buf, Row](OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Row, it: Iterator[Row], state: GroupState[Buf]) =>
          var buf = state.getOption.getOrElse(Buf(Vector.empty, Vector.empty))
          it.foreach { r =>
            val t = us(r)
            if (r.getInt(sideIdx) == 1)
              buf = buf.copy(lefts = buf.lefts :+ (t -> r.getStruct(lIdx).toSeq))
            else
              buf = buf.copy(rights = buf.rights :+ (t -> r.getStruct(rIdx).toSeq))
          }
          // getCurrentWatermarkMs() returns 0 when NO watermark exists yet
          // (first batch); treating that as a real watermark would finalize
          // pre-epoch (negative-µs) events prematurely — model "unset" as -∞.
          // KNOWN LIMIT (ADVICE r12): the GroupState API cannot distinguish
          // "unset" from a LEGITIMATE zero watermark (max event time still
          // within the delay of 1970-01-01T00:00Z), so for epoch-adjacent
          // event times finalization waits until the watermark first
          // advances past 0 — results stay correct (append-mode rows are
          // only delayed), but a stream whose event times NEVER exceed the
          // delay past epoch will not flush; such data is out of contract
          // for the streaming faces (shift the epoch upstream).
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = if (wmMs == 0L) Long.MinValue else wmMs * 1000L
          val sortedRights = buf.rights.sortBy(_._1)
          // earliest right in [t, t + tol] — the forward candidate; shared
          // by the emission and timeout-deadline paths so they can't drift
          def fwdCandidate(t: Long) = {
            val tol = tolUs.get
            sortedRights.dropWhile(_._1 < t).headOption.filter(_._1 <= t + tol)
          }
          val out: Vector[Row] =
            if (isBackward) {
              // a left at t is final once wm > t: late rights (rt < wm) are
              // dropped by the watermark, surviving future rights have
              // rt >= wm > t
              val (ready, pending) = buf.lefts.partition(_._1 < wmUs)
              val o = ready.sortBy(_._1).map { case (t, lvals) =>
                val m = sortedRights.takeWhile(_._1 <= t).lastOption
                  .filter { case (rt, _) => tolUs.forall(t - rt <= _) }
                Row.fromSeq(lvals ++ m.map(_._2).getOrElse(Seq.fill[Any](nRight)(null)))
              }
              // evict finalized rights except the newest one (frontier carry)
              val (young, old) = sortedRights.partition(_._1 >= wmUs)
              buf = Buf(pending, (old.lastOption.toVector ++ young))
              o
            } else {
              // FORWARD: match = earliest right in [t, t + tol]. Final when
              // either the watermark passed the whole window (wm > t + tol:
              // every future right has rt >= wm, outside it → the null or
              // the in-window candidate can no longer change) or the
              // earliest candidate sits strictly below the watermark (no
              // future right can arrive earlier than wm and beat it).
              val tol = tolUs.get
              val (ready, pending) = buf.lefts.partition { case (t, _) =>
                // no overflow: event times are µs magnitudes, tol a duration
                wmUs != Long.MinValue &&
                  (wmUs > t + tol || fwdCandidate(t).exists(_._1 < wmUs))
              }
              val o = ready.sortBy(_._1).map { case (t, lvals) =>
                Row.fromSeq(lvals ++ fwdCandidate(t).map(_._2)
                  .getOrElse(Seq.fill[Any](nRight)(null)))
              }
              // a right is useless once no pending or FUTURE left (t >= wm)
              // can reach it: evict rt < min(wm, oldest pending left)
              val keepFrom = math.min(wmUs,
                pending.map(_._1).minOption.getOrElse(Long.MaxValue))
              buf = Buf(pending, sortedRights.dropWhile(_._1 < keepFrom))
              o
            }
          if (buf.lefts.isEmpty && buf.rights.isEmpty) state.remove()
          else {
            state.update(buf)
            // GroupState timeouts must be positive ms; clamp (wm may be
            // "unset" = -∞, deadlines may be pre-epoch)
            if (isBackward)
              // flush pending lefts on the next watermark advance
              state.setTimeoutTimestamp(math.max(1L, wmMs + 1L))
            else {
              // wake when the watermark can next finalize something: the
              // earliest per-left deadline (its candidate's rt, else the
              // end of its window), or — with no pending lefts — the oldest
              // buffered right (so the key self-evicts instead of holding
              // state forever)
              val tol = tolUs.get
              val deadlines =
                buf.lefts.map { case (t, _) => fwdCandidate(t).map(_._1).getOrElse(t + tol) } ++
                  (if (buf.lefts.isEmpty) buf.rights.map(_._1).take(1) else Vector.empty)
              val dUs = deadlines.min + 1L
              state.setTimeoutTimestamp(math.max(math.max(1L,
                Math.floorDiv(dUs + 999L, 1000L)), wmMs + 1L))
            }
          }
          out.iterator
      }(bufEnc, outEnc)
      .toDF()
  }
}
