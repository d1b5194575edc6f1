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
    * NOTE: semantically requires an eager `min(timeCol)` pre-pass (the
    * reference anchors on the first sample too) — one extra full scan of the
    * time column before the windowed aggregation. At scale, `.cache()` the
    * input first if you use DataPoint anchoring, so the scan is paid once.
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

    if (Durations.isCalendar(every))
      return applyCalendar(df, timeCol, every, period, offset, by, closed, label,
        includeBoundaries, startBy)(aggs: _*)

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
    //  Left  (reference default): native window().
    //  Right ((start, end]): assign by t−1µs (timestamps are µs-resolution,
    //        so the nudge is exact), native window().
    //  Both  ([start, end]) / None ((start, end)): boundary membership can't
    //        be expressed by a nudge alone for sliding grids — switch to
    //        explicit grid-index math: explode each row into its candidate
    //        window indexes and filter by the inclusive/exclusive bounds.
    //        Tumbling grids degenerate to ≤2 candidates; codegen throughout.
    val t = col(timeCol).cast("timestamp")
    val u = unix_micros(t)

    closed match {
      case ClosedLeft | ClosedRight =>
        val assignT = if (closed == ClosedLeft) t else timestamp_micros(u - lit(1L))
        val win = window(assignT,
          Durations.microsToSparkInterval(periodUs),
          Durations.microsToSparkInterval(everyUs),
          Durations.microsToSparkInterval(offsetUs))
        finish(df.withColumn("__w", win), timeCol, by, label, includeBoundaries)(aggs: _*)

      case ClosedBoth | ClosedNone =>
        val uAdj = u - lit(offsetUs)
        def fd(a: Column, b: Long): Column = ((a - pmod(a, lit(b))) / lit(b)).cast("long")
        // largest window index whose start admits this row
        val hi = if (closed == ClosedBoth) fd(uAdj, everyUs) else fd(uAdj - lit(1L), everyUs)
        val nW = (periodUs / everyUs).toInt + 1
        val endOk =
          if (closed == ClosedBoth) (idx: Column) => uAdj <= idx * lit(everyUs) + lit(periodUs)
          else (idx: Column) => uAdj < idx * lit(everyUs) + lit(periodUs)
        val withIdx = df
          .withColumn("__idx", explode(transform(sequence(lit(0), lit(nW - 1)), k => hi - k)))
          .filter(endOk(col("__idx")))
        val prepared = withIdx.withColumn("__w", struct(
            timestamp_micros(col("__idx") * lit(everyUs) + lit(offsetUs)).as("start"),
            timestamp_micros(col("__idx") * lit(everyUs) + lit(offsetUs) + lit(periodUs)).as("end")))
          .drop("__idx")
        finish(prepared, timeCol, by, label, includeBoundaries)(aggs: _*)
    }
  }

  /** Calendar-true month grids — `every`/`period` in whole months
    * (`"1mo"`, `"1q"`, `"1y"`): windows start on real month boundaries
    * (Feb is 28/29 days, not a 30-day approximation), matching Polars'
    * calendar-aware group_by_dynamic (lazy.rs:186-273 with month `every`).
    *
    * Membership is decided by comparing against the window's REAL boundary
    * instants (computed with clamped month-adds), not by a nudge trick:
    * each row explodes into its ≤ ⌈period/every⌉+2 candidate window indexes
    * around the month-arithmetic guess and keeps those whose
    * [start, end) / (start, end] / [start, end] / (start, end) bound —
    * per `closed` — contains it. That one mechanism supports the full
    * closed matrix, sliding grids, and both anchors: `start_by=WindowBound`
    * (epoch month grid) and `start_by=DataPoint` (grid anchored at the
    * first sample's instant, day-of-month clamped forward, same eager min
    * pre-pass as the fixed path). All codegen'd month arithmetic, no UDFs,
    * same single shuffle on (keys, window).
    */
  private def applyCalendar(df: DataFrame, timeCol: String,
                            every: String, period: Option[String], offset: Option[String],
                            by: Seq[String],
                            closed: Closed, label: Label,
                            includeBoundaries: Boolean, startBy: StartBy)
                           (aggs: Column*): DataFrame = {
    val (everyMo, everyUsPart) = Durations.parseMonthsAndMicros(every)
    require(everyUsPart == 0L && everyMo > 0,
      s"calendar 'every' must be whole positive months (1mo/1q/1y...), got '$every'")
    val (periodMo, periodUsPart) = period.map(Durations.parseMonthsAndMicros).getOrElse((everyMo, 0L))
    require(periodUsPart == 0L && periodMo > 0,
      s"calendar 'period' must be whole positive months, got '$period'")
    val (offMo, offUs) = offset.map(Durations.parseMonthsAndMicros).getOrElse((0L, 0L))

    val t = col(timeCol).cast("timestamp")
    val u = unix_micros(t)
    def mse(ts: Column): Column = (year(ts) - lit(1970)) * lit(12) + (month(ts) - lit(1))
    // Column./ is double division; the numerator is exactly divisible, so the
    // int cast is exact (pmod keeps pre-anchor rows correct: floor, not trunc)
    def floorDiv(a: Column, b: Long): Column = ((a - pmod(a, lit(b))) / lit(b)).cast("int")

    // grid anchor: epoch month grid, or the first data point's instant
    // (eager min pre-pass — the same step the reference performs)
    val (anchorDate: java.time.LocalDate, anchorTod: Long) = startBy match {
      case WindowBound => (java.time.LocalDate.of(1970, 1, 1), 0L)
      case DataPoint =>
        val row = df.agg(min(unix_micros(t))).collect()(0)
        if (row.isNullAt(0)) (java.time.LocalDate.of(1970, 1, 1), 0L)
        else {
          val us = row.getLong(0)
          val ldt = java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
          (ldt.toLocalDate, us - ldt.toLocalDate.toEpochDay * 86400000000L)
        }
      case Weekday(_) => throw new IllegalArgumentException(
        "start_by=Weekday is a weekly-grid concept; calendar month grids use WindowBound or DataPoint")
    }
    val anchorMse = (anchorDate.getYear - 1970) * 12 + (anchorDate.getMonthValue - 1)
    val anchor = to_date(lit(anchorDate.toString))

    def boundary(totalMonths: Column): Column =
      timestamp_micros(unix_micros(add_months(anchor, totalMonths.cast("int")).cast("timestamp"))
        + lit(anchorTod + offUs))

    // candidate window indexes around the month-arithmetic guess; the exact
    // boundary compare below settles day/time-of-month and clamping effects
    val mA = mse(t) - lit(anchorMse) - lit(offMo)
    val kGuess = floorDiv(mA, everyMo)
    val nW = ((periodMo + everyMo - 1) / everyMo).toInt
    val withIdx = df.withColumn("__idx",
      explode(transform(sequence(lit(-1), lit(nW)), i => kGuess - i)))
    val s = boundary(col("__idx") * lit(everyMo) + lit(offMo))
    val e = boundary(col("__idx") * lit(everyMo) + lit(offMo) + lit(periodMo))
    val member = closed match {
      case ClosedLeft  => s <= t && t < e
      case ClosedRight => s < t && t <= e
      case ClosedBoth  => s <= t && t <= e
      case ClosedNone  => s < t && t < e
    }
    val prepared = withIdx.filter(member)
      .withColumn("__w", struct(s.as("start"), e.as("end")))
      .drop("__idx")

    finish(prepared, timeCol, by, label, includeBoundaries)(aggs: _*)
  }

  /** Shared tail: group on (__w, by), apply label + boundary selection. */
  private def finish(prepared: DataFrame, timeCol: String, by: Seq[String],
                     label: Label, includeBoundaries: Boolean)(aggs: Column*): DataFrame = {
    val allAggs =
      if (label == LabelDataPoint) min(col(timeCol)).as("__first_t") +: aggs else aggs
    val grouped = prepared
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
