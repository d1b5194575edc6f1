package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Durations

/** Time-window batch aggregation — the reference's `group_by_dynamic`
  * (reference: native_shim/src/lazy.rs:186-273; C# builder
  * Polars.CSharp/LazyGroupByBuilder.cs:44-108; semantics fixture
  * Polars.CSharp.Tests/TimeSeriesTests.cs:8-46 — 30-min tumble over 10-min
  * points [10:00,10:30) → sums {3,12}).
  *
  * Maps onto Spark's `window()` expression: windowDuration ≡ period,
  * slideDuration ≡ every, startTime ≡ offset — fully distributed, one shuffle
  * on (keys, window). Spark windows are [start, end) ≡ Polars ClosedWindow::
  * Left (the reference default); Right/Both/None are derived by nudging the
  * time column ∓1µs before assignment (timestamps are µs-resolution, so the
  * nudge is exact).
  *
  * Label semantics (Polars Label::Left/Right/DataPoint): Left keeps
  * window.start as the group key (default), Right keeps window.end;
  * includeBoundaries adds `_lower_boundary`/`_upper_boundary`.
  */
object DynamicGroupBy {

  sealed trait Closed
  case object ClosedLeft extends Closed
  case object ClosedRight extends Closed
  case object ClosedBoth extends Closed
  case object ClosedNone extends Closed

  sealed trait Label
  case object LabelLeft extends Label
  case object LabelRight extends Label
  /** Label each group with its first (minimum) data point's time. */
  case object LabelDataPoint extends Label

  /** StartBy (lazy.rs window StartBy): WindowBound aligns the grid to the
    * epoch (+offset); Weekday(d) aligns window starts to that weekday
    * (1=Monday..7=Sunday) — meaningful for weekly ("1w") grids. The epoch
    * 1970-01-01 is a Thursday, so Monday alignment shifts the grid by +4d. */
  sealed trait StartBy
  case object WindowBound extends StartBy
  final case class Weekday(isoDay: Int) extends StartBy {
    require(isoDay >= 1 && isoDay <= 7, "isoDay in 1..7 (Mon..Sun)")
  }
  /** Align the grid to the first data point (Polars StartBy::DataPoint).
    * Requires one min() pre-pass over the time column — the same eager step
    * the reference performs. */
  case object DataPoint extends StartBy

  def apply(df: DataFrame, timeCol: String,
            every: String, period: Option[String] = None, offset: Option[String] = None,
            by: Seq[String] = Seq.empty,
            closed: Closed = ClosedLeft,
            label: Label = LabelLeft,
            includeBoundaries: Boolean = false,
            startBy: StartBy = WindowBound)
           (aggs: Column*): DataFrame = {

    val everyUs = Durations.parseMicros(every)
    val periodUs = period.map(Durations.parseMicros).getOrElse(everyUs)
    val dayUs = 86400000000L
    val startByUs = startBy match {
      case WindowBound => 0L
      // epoch day 0 = Thursday (ISO 4); shift grid so windows start on isoDay
      case Weekday(d) => ((d - 4 + 7) % 7).toLong * dayUs
      case DataPoint =>
        val minT = df.agg(org.apache.spark.sql.functions.min(
          unix_micros(col(timeCol).cast("timestamp")))).collect()(0)
        if (minT.isNullAt(0)) 0L
        else {
          val m = minT.getLong(0) % everyUs
          if (m < 0) m + everyUs else m
        }
    }
    val offsetUs = offset.map(Durations.parseMicros).getOrElse(0L) + startByUs

    // closed-bound handling: Spark assigns t ∈ [start, end).
    //  Left  (reference default): native.
    //  Right ((start, end]): assign by t−1µs (timestamps are µs-resolution,
    //        so the nudge is exact).
    //  Both  ([start, end]): grid-boundary points belong to TWO windows —
    //        explode each such row into both assignments (tumbling only).
    //  None  ((start, end)): grid-boundary points belong to NO window —
    //        drop them from their left-assigned window (tumbling only).
    val t = col(timeCol).cast("timestamp")
    val u = unix_micros(t)
    val onBoundary = ((u - lit(offsetUs)) % lit(everyUs)) === 0
    if ((closed == ClosedBoth || closed == ClosedNone) && periodUs != everyUs)
      throw new IllegalArgumentException(
        "closed=Both/None is defined for tumbling windows (period == every)")

    val prepared = closed match {
      case ClosedLeft => df.withColumn("__assign_t", t)
      case ClosedRight => df.withColumn("__assign_t", timestamp_micros(u - lit(1L)))
      case ClosedBoth =>
        // boundary rows assign to both [t, ...) and (..., t]
        df.withColumn("__assign_t",
            explode(when(onBoundary, array(t, timestamp_micros(u - lit(1L))))
              .otherwise(array(t))))
      case ClosedNone =>
        df.filter(!onBoundary).withColumn("__assign_t", t)
    }

    val win = window(col("__assign_t"),
      Durations.microsToSparkInterval(periodUs),
      Durations.microsToSparkInterval(everyUs),
      Durations.microsToSparkInterval(offsetUs))

    val allAggs =
      if (label == LabelDataPoint) min(col(timeCol)).as("__first_t") +: aggs else aggs
    val grouped = prepared
      .withColumn("__w", win)
      .groupBy((col("__w") +: by.map(col)).toIndexedSeq: _*)
      .agg(allAggs.head, allAggs.tail.toIndexedSeq: _*)

    val labelCol = label match {
      case LabelLeft => col("__w.start").as(timeCol)
      case LabelRight => col("__w.end").as(timeCol)
      case LabelDataPoint => col("__first_t").as(timeCol)
    }
    val bounds =
      if (includeBoundaries)
        Seq(col("__w.start").as("_lower_boundary"), col("__w.end").as("_upper_boundary"))
      else Seq.empty

    val aggNames = grouped.columns
      .filterNot(c => c == "__w" || c == "__first_t" || by.contains(c)).map(col).toSeq
    grouped.select((labelCol +: (bounds ++ by.map(col) ++ aggNames)).toIndexedSeq: _*)
  }
}
