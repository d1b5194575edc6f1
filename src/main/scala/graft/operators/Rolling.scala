package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** O(n) time-rolling SUM for the keyed API — Spark evaluates a sliding
    * range frame by rebuilding its buffer per row (O(n·w) per group, a
    * problem once a group's window spans thousands of rows). Sum is
    * subtractable, so compute cum(≤ upper) − cum(≤ lower−1) over two
    * unbounded-preceding frames instead; both are maintained incrementally.
    * Pass a DECIMAL view of `c` for exact subtraction, cast after. */
  def rollingSumByTime(c: Column, timeCol: Column, windowSize: String,
                       partitionBy: Seq[Column] = Seq.empty,
                       closed: Closed = Right): Column = {
    val us = Durations.parseMicros(windowSize)
    val (lo, hi) = closed match {
      case Right => (-(us - 1), 0L)
      case Both  => (-us, 0L)
      case Left  => (-us, -1L)
      case NoneC => (-(us - 1), -1L)
    }
    val b = base(partitionBy).orderBy(unix_micros(timeCol.cast("timestamp")))
    val cumHi = b.rangeBetween(Window.unboundedPreceding, hi)
    val cumLo = b.rangeBetween(Window.unboundedPreceding, lo - 1)
    when(count(c).over(cumHi) - coalesce(count(c).over(cumLo), lit(0L)) > 0,
      sum(c).over(cumHi) - coalesce(sum(c).over(cumLo), lit(0)))
  }
  /** Row-window twin of [[rollingSumByTime]]: O(n) sum over the last n rows
    * via cum(0) − cum(−n) unbounded-preceding frames. */
  def rollingSumByRows(c: Column, windowSize: String, order: Seq[Column],
                       partitionBy: Seq[Column] = Seq.empty): Column = {
    val n = Durations.parseRows(windowSize)
    val b = base(partitionBy).orderBy(order.toIndexedSeq: _*)
    val cumHi = b.rowsBetween(Window.unboundedPreceding, 0)
    val cumLo = b.rowsBetween(Window.unboundedPreceding, -n)
    when(count(c).over(cumHi) - coalesce(count(c).over(cumLo), lit(0L)) > 0,
      sum(c).over(cumHi) - coalesce(sum(c).over(cumLo), lit(0)))
  }

  def rollingMean(c: Column, spec: WindowSpec, minPeriods: Int = 1): Column =
    withMinPeriods(avg(c), c, spec, minPeriods)
  def rollingMin(c: Column, spec: WindowSpec, minPeriods: Int = 1): Column =
    withMinPeriods(min(c), c, spec, minPeriods)
  def rollingMax(c: Column, spec: WindowSpec, minPeriods: Int = 1): Column =
    withMinPeriods(max(c), c, spec, minPeriods)
  def rollingCount(c: Column, spec: WindowSpec): Column = count(c).over(spec)

  private def base(partitionBy: Seq[Column]): WindowSpec =
    if (partitionBy.nonEmpty) Window.partitionBy(partitionBy.toIndexedSeq: _*)
    else Window.partitionBy() // global rolling: single ordered partition —
    // fine inside tests/small frames; the scale path for UNKEYED rolling is
    // fixedGlobal/timeGlobal below (range partition + boundary context).

  // ---- unkeyed rolling at scale ------------------------------------------
  //
  // A Polars rolling over the whole frame has no partition key, and a bare
  // Window.partitionBy() serializes everything through one task. Instead:
  // range-partition on the order key, then DUPLICATE each partition's look-
  // back margin (last n−1 rows / last `window` µs) into the next partition(s)
  // as context rows. Every partition then computes its windows locally —
  // context rows get wrong (prefix-truncated) results but are dropped before
  // returning. Margins come from a P-row broadcast of per-partition offsets;
  // each margin row derives its candidate target pids NARROWLY (a bounded
  // contiguous pid range, exploded) and verifies them through a broadcast
  // equi-join — never a nested-loop theta probe over all P targets — so the
  // only data shuffles are the range exchange and the (tiny) context
  // duplication, and per-row work is O(candidates), not O(P).

  /** Unkeyed fixed-row rolling ("3i") over the whole frame.
    * `aggs`: output column name → aggregate over the rolling spec.
    *
    * Context duplication is EQUI-joined (round-10 verdict item 1): a row's
    * candidate targets are the contiguous pids `(p, qmax_p]` where `qmax_p`
    * (the largest partition whose n−1-row lookback any row of p enters) is
    * computed on the P-row bounds frame by a sorted merge of partition
    * starts vs partition reaches under one running max. Only the last n−1
    * rows of each partition explode their candidates, and the exact range
    * test runs as the residual filter of a broadcast HASH join on the pid —
    * no O(rows × P) BroadcastNestedLoopJoin probe anywhere (PlanSpec). */
  def fixedGlobal(df: DataFrame, windowSize: String, order: Seq[Column],
                  aggs: Seq[(String, WindowSpec => Column)]): DataFrame = {
    val n = Durations.parseRows(windowSize)
    val ordered = order.toIndexedSeq
    // VALUE-derived bucket ids (r17 sf1-oracle catch, see RangeId): the
    // plan references the partitioned frame from several subtrees with
    // different column prunings, so `repartitionByRange` +
    // `spark_partition_id()` instances could re-sample DIFFERENT split
    // points (ReuseExchange needs canonical equality; RangePartitioner
    // seeds per RDD id) and the pid spaces silently disagreed at one
    // boundary. RangeId bakes the split points into the plan as literals,
    // so every branch derives the identical id from the row's own keys;
    // the hash exchange below co-locates each id for the windows.
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = RangeId.withRangeId(df, ordered, ordered.map(_ => true), nPart, "__pid")
      .repartition(nPart, col("__pid"))
    val withRn = parted.withColumn("__rn",
      row_number().over(Window.partitionBy("__pid").orderBy(ordered: _*)).cast("long"))
    val prefix = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val boundsBase = withRn.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(prefix), lit(0L)))

    // qmax_p = max q with off_q ≤ off_{p+1} + n − 2: merge the P starts
    // (__off as values) with the P reaches (as queries) on one sorted
    // single-partition window — same cost class as the prefix sum above
    val vals = boundsBase.select(col("__off").as("__k"), lit(0).as("__t"),
      col("__pid").as("__q"), lit(null).cast("int").as("__p"))
    val qrys = boundsBase.select((col("__off") + col("__cnt") + lit(n - 2)).as("__k"),
      lit(1).as("__t"), lit(null).cast("int").as("__q"), col("__pid").as("__p"))
    val mw = Window.orderBy(col("__k"), col("__t")).rowsBetween(Window.unboundedPreceding, 0)
    val qmaxByPid = vals.unionByName(qrys)
      .withColumn("__qmax", max(col("__q")).over(mw))
      .filter(col("__p").isNotNull)
      .select(col("__p").as("__pid"), col("__qmax"))
    val bounds = boundsBase.join(qmaxByPid, Seq("__pid"))

    val withGrn = withRn.join(broadcast(bounds), Seq("__pid"))
      .withColumn("__grn", col("__rn") + col("__off"))

    // a row is context for q iff __grn ∈ [off_q − n + 2, off_q]; only the
    // last n−1 rows of a partition qualify for ANY target, so gate before
    // exploding the candidate pids, then verify each candidate against its
    // real offset as the residual of the broadcast equi-join
    val targets = boundsBase.select(col("__pid").as("__tq"), col("__off").as("__toff"))
    val cand = withGrn
      .filter(col("__rn") > col("__cnt") - lit(n - 1) && col("__qmax") >= col("__pid") + 1)
      .withColumn("__tpid", explode(sequence(col("__pid") + 1, col("__qmax"))))
    val ctx = cand.join(broadcast(targets),
        col("__tpid") === col("__tq") &&
        col("__grn") >= col("__toff") - lit(n - 1) && col("__grn") <= col("__toff"))
      .drop("__tq", "__toff")
      .withColumn("__ctx", lit(true))
    val own = withGrn.withColumn("__tpid", col("__pid")).withColumn("__ctx", lit(false))
    val all = own.unionByName(ctx.select(own.columns.map(col).toIndexedSeq: _*))

    finishGlobal(all, df.columns,
      Window.partitionBy("__tpid").orderBy(ordered: _*).rowsBetween(-(n - 1), 0), aggs)
  }

  /** Unkeyed time-based rolling over the whole frame.
    *
    * `aggs` evaluate over the sliding range frame — Spark rebuilds a
    * sliding frame's aggregation buffer per row, O(n·w), acceptable only
    * when windows hold few rows. For SUBTRACTABLE aggregates pass
    * `diffSums` instead: each is computed as cum(≤ upper) − cum(≤ lower−1)
    * over two UNBOUNDED-PRECEDING frames, which Spark maintains
    * incrementally — O(n) regardless of window row count (141 s → ~2 s on
    * the sf0.1 events bench). Exactness: feed it a DECIMAL view so the
    * subtraction is exact, cast after. */
  def timeGlobal(df: DataFrame, windowSize: String, timeCol: Column,
                 closed: Closed = Right,
                 aggs: Seq[(String, WindowSpec => Column)] = Seq.empty,
                 diffSums: Seq[(String, Column)] = Seq.empty,
                 diffCounts: Seq[(String, Column)] = Seq.empty): DataFrame = {
    val us = Durations.parseMicros(windowSize)
    val u = unix_micros(timeCol.cast("timestamp"))
    // value-derived bucket ids for the same multi-subtree divergence
    // reason as fixedGlobal (r17 sf1-oracle catch: q46 undercounted at one
    // boundary when two exchange instances sampled different split points)
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = RangeId.withRangeId(df.withColumn("__u", u),
        Seq(col("__u")), Seq(true), nPart, "__pid")
      .repartition(nPart, col("__pid"))
    // same equi-joined context shape as fixedGlobal: qmax_p = max q with
    // lo_q ≤ hi_p + us via the P-row sorted-merge running max; only rows in
    // the next partition's lookback (__u ≥ nextlo − us) explode candidates,
    // verified against the real lo_q as a broadcast-hash-join residual
    val boundsBase = parted.groupBy("__pid")
      .agg(min(col("__u")).as("__lo"), max(col("__u")).as("__hi"))
    val vals = boundsBase.select(col("__lo").as("__k"), lit(0).as("__t"),
      col("__pid").as("__q"), lit(null).cast("int").as("__p"))
    val qrys = boundsBase.select((col("__hi") + lit(us)).as("__k"), lit(1).as("__t"),
      lit(null).cast("int").as("__q"), col("__pid").as("__p"))
    val mw = Window.orderBy(col("__k"), col("__t")).rowsBetween(Window.unboundedPreceding, 0)
    val qmaxByPid = vals.unionByName(qrys)
      .withColumn("__qmax", max(col("__q")).over(mw))
      .filter(col("__p").isNotNull)
      .select(col("__p").as("__pid"), col("__qmax"))
    val pw = Window.orderBy("__pid")
    val bounds = boundsBase.withColumn("__nextlo", lead(col("__lo"), 1).over(pw))
      .select(col("__pid"), col("__nextlo"))
      .join(qmaxByPid, Seq("__pid"))
    val rows = parted.join(broadcast(bounds), Seq("__pid"))
    val targets = boundsBase.select(col("__pid").as("__tq"), col("__lo").as("__tlo"))
    val cand = rows
      .filter(col("__u") >= col("__nextlo") - lit(us) && col("__qmax") >= col("__pid") + 1)
      .withColumn("__tpid", explode(sequence(col("__pid") + 1, col("__qmax"))))
    val ctx = cand.join(broadcast(targets),
        col("__tpid") === col("__tq") &&
        col("__u") >= col("__tlo") - lit(us) && col("__u") < col("__tlo"))
      .drop("__tq", "__tlo")
      .withColumn("__ctx", lit(true))
    val own = rows.withColumn("__tpid", col("__pid")).withColumn("__ctx", lit(false))
    val all = own.unionByName(ctx.select(own.columns.map(col).toIndexedSeq: _*))

    val (lo, hi) = closed match {
      case Right => (-(us - 1), 0L)
      case Both  => (-us, 0L)
      case Left  => (-us, -1L)
      case NoneC => (-(us - 1), -1L)
    }
    val base = Window.partitionBy("__tpid").orderBy(col("__u"))
    val cumHi = base.rangeBetween(Window.unboundedPreceding, hi)
    val cumLo = base.rangeBetween(Window.unboundedPreceding, lo - 1)
    val diffAggs: Seq[(String, WindowSpec => Column)] = diffSums.map { case (name, c) =>
      name -> ((_: WindowSpec) =>
        when(count(c).over(cumHi) - coalesce(count(c).over(cumLo), lit(0L)) > 0,
          sum(c).over(cumHi) - coalesce(sum(c).over(cumLo), lit(0))))
    }
    // counts are subtractable too (Polars rolling count semantics: counts
    // NON-NULL values of c; pass lit(1) for a plain row count) — the same
    // two-incremental-frames O(n) shape, no per-row buffer rebuild
    val diffCnt: Seq[(String, WindowSpec => Column)] = diffCounts.map { case (name, c) =>
      name -> ((_: WindowSpec) =>
        count(c).over(cumHi) - coalesce(count(c).over(cumLo), lit(0L)))
    }
    finishGlobal(all, df.columns, base.rangeBetween(lo, hi), aggs ++ diffAggs ++ diffCnt)
  }

  private def finishGlobal(all: DataFrame, keep: Array[String],
                           spec: WindowSpec,
                           aggs: Seq[(String, WindowSpec => Column)]): DataFrame = {
    val withAggs = aggs.foldLeft(all) { case (acc, (name, f)) =>
      acc.withColumn(name, f(spec))
    }
    withAggs.filter(!col("__ctx"))
      .select((keep.map(col) ++ aggs.map(a => col(a._1))).toIndexedSeq: _*)
  }
}
