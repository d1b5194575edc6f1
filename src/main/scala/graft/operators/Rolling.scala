package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.functions.Durations

/** Rolling windows — fixed-size (`rolling_mean(window_size="3i")`) and
  * time-based (`rolling_mean_by(window_size="1h", by=time, closed)`)
  * (reference: native_shim/src/expr.rs:102-191 — parse at 103-109/151-167,
  * applications at 272-280; test Polars.FSharp.Tests/ComplexTests.fs:419).
  *
  * Fixed windows → `rowsBetween(-(n-1), 0)`; time windows → `rangeBetween`
  * over the µs-cast time column. Polars `closed` ∈ {left,right,both,none}
  * maps to exact integer-µs range bounds (default for rolling_*_by is Right:
  * (t-window, t]). `min_periods` wraps the aggregate in a count guard.
  */
object Rolling {

  sealed trait Closed
  case object Left extends Closed
  case object Right extends Closed
  case object Both extends Closed
  case object NoneC extends Closed

  /** Window spec for a fixed row-count rolling window ordered by `order`. */
  def fixedSpec(windowSize: String, order: Seq[Column], partitionBy: Seq[Column] = Seq.empty): WindowSpec = {
    val n = Durations.parseRows(windowSize)
    base(partitionBy).orderBy(order.toIndexedSeq: _*).rowsBetween(-(n - 1), 0)
  }

  /** Window spec for a time-based rolling window on µs-resolution `timeCol`. */
  def timeSpec(windowSize: String, timeCol: Column, partitionBy: Seq[Column] = Seq.empty,
               closed: Closed = Right): WindowSpec = {
    val us = Durations.parseMicros(windowSize)
    val (lo, hi) = closed match {
      case Right => (-(us - 1), 0L)  // (t-w, t]
      case Both  => (-us, 0L)        // [t-w, t]
      case Left  => (-us, -1L)       // [t-w, t)
      case NoneC => (-(us - 1), -1L) // (t-w, t)
    }
    base(partitionBy).orderBy(unix_micros(timeCol.cast("timestamp"))).rangeBetween(lo, hi)
  }

  /** Apply an aggregate over a rolling spec with Polars min_periods guard. */
  def withMinPeriods(agg: Column, counted: Column, spec: WindowSpec, minPeriods: Int): Column =
    if (minPeriods <= 1) agg.over(spec)
    else when(count(counted).over(spec) >= lit(minPeriods), agg.over(spec))

  def rollingSum(c: Column, spec: WindowSpec, minPeriods: Int = 1): Column =
    withMinPeriods(sum(c), c, spec, minPeriods)
  def rollingMean(c: Column, spec: WindowSpec, minPeriods: Int = 1): Column =
    withMinPeriods(avg(c), c, spec, minPeriods)
  def rollingMin(c: Column, spec: WindowSpec, minPeriods: Int = 1): Column =
    withMinPeriods(min(c), c, spec, minPeriods)
  def rollingMax(c: Column, spec: WindowSpec, minPeriods: Int = 1): Column =
    withMinPeriods(max(c), c, spec, minPeriods)
  def rollingCount(c: Column, spec: WindowSpec): Column = count(c).over(spec)

  private def base(partitionBy: Seq[Column]): WindowSpec =
    if (partitionBy.nonEmpty) Window.partitionBy(partitionBy.toIndexedSeq: _*)
    else Window.partitionBy() // global rolling: single ordered partition (Polars semantics)
}
