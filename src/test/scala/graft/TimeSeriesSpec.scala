package graft

import org.apache.spark.sql.functions._
import graft.operators.{DynamicGroupBy, Fill, Rolling}

/** Time-series semantics mirroring the reference's TimeSeriesTests
  * (Polars.CSharp.Tests/TimeSeriesTests.cs:8-46 — fixture F2). */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // 6 points at 10-min spacing from 10:00, Val = i
  private lazy val series = (0 until 6).map { i =>
    (java.sql.Timestamp.valueOf(f"2024-01-01 10:${i * 10}%02d:00"), i)
  }.toDF("Time", "Val")

  test("30-min tumble closed=Left: sums {3,12}, counts {3,3} (F2 golden)") {
    val got = DynamicGroupBy(series, "Time", every = "30m")(
        sum(col("Val")).as("SumVal"), count(lit(1)).as("Cnt"))
      .orderBy("Time").collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 3L && got(0).getLong(2) == 3L)
    assert(got(1).getLong(1) == 12L && got(1).getLong(2) == 3L)
    assert(got(0).getAs[java.sql.Timestamp](0).toString.startsWith("2024-01-01 10:00"))
  }

  test("closed=Right shifts boundary points into the earlier window") {
    // boundary point at 10:30 belongs to (10:00,10:30] under Right
    val got = DynamicGroupBy(series, "Time", every = "30m",
        closed = DynamicGroupBy.ClosedRight)(sum(col("Val")).as("s"))
      .orderBy("Time").collect()
    // windows keyed by [start,end) of t-1us: 10:00 point -> 09:30 window
    assert(got.length == 3)
    assert(got(0).getLong(1) == 0L)     // {10:00}
    assert(got(1).getLong(1) == 1 + 2 + 3) // {10:10,10:20,10:30}
    assert(got(2).getLong(1) == 4 + 5)  // {10:40,10:50}
  }

  test("closed=Both duplicates boundary points into both windows") {
    val got = DynamicGroupBy(series, "Time", every = "30m",
        closed = DynamicGroupBy.ClosedBoth)(sum(col("Val")).as("s"))
      .orderBy("Time").collect()
    // boundary points 10:00 (val 0) and 10:30 (val 3) belong to two windows:
    // [09:30,10:00]: {0}; [10:00,10:30]: {0,1,2,3}; [10:30,11:00]: {3,4,5}
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 6L, 12L))
  }

  test("closed=None drops boundary points entirely (tumbling)") {
    val got = DynamicGroupBy(series, "Time", every = "30m",
        closed = DynamicGroupBy.ClosedNone)(sum(col("Val")).as("s"))
      .orderBy("Time").collect()
    // 10:00 and 10:30 are on the grid -> dropped; (10:00,10:30): {1,2};
    // (10:30,11:00): {4,5}
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 9L))
  }

  test("sliding windows: every=30m period=1h") {
    val got = DynamicGroupBy(series, "Time", every = "30m", period = Some("1h"))(
        sum(col("Val")).as("s"))
      .orderBy("Time").collect()
    // windows starting 09:30,10:00,10:30: sums {3, 15, 12}
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 15L, 12L))
  }

  test("rolling fixed 3-row mean with min_periods (expr.rs:102-141)") {
    val df = (1 to 5).map(i => (i, i.toDouble)).toDF("id", "v")
    val spec = Rolling.fixedSpec("3i", Seq(col("id")))
    val got = df.withColumn("m", Rolling.rollingMean(col("v"), spec, minPeriods = 3))
      .orderBy("id").select("m").collect()
    assert(got(0).isNullAt(0) && got(1).isNullAt(0))
    assert(got(2).getDouble(0) == 2.0 && got(4).getDouble(0) == 4.0)
  }

  test("rolling time-based 3-min count closed=Right (ComplexTests.fs:419)") {
    val df = (0 until 10).map { i =>
      (java.sql.Timestamp.valueOf(s"2024-01-01 10:0$i:00"), 1)
    }.toDF("t", "one")
    val spec = Rolling.timeSpec("3m", col("t"))
    val got = df.withColumn("c", Rolling.rollingCount(col("one"), spec))
      .orderBy("t").select("c").collect()
    // (t-3m, t]: counts 1,2,3,3,3,...
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 3L, 3L, 3L, 3L, 3L, 3L, 3L))
  }

  test("rollingSumByRows (running-difference) equals the sliding ROWS frame") {
    val df = (0 until 2000).map(i => ((i % 2).toString, i, (i % 31).toDouble))
      .toDF("k", "i", "v")
    val slide = Rolling.fixedSpec("50i", Seq(col("i")), Seq(col("k")))
    val slow = df.withColumn("s", sum(col("v").cast("decimal(18,4)")).over(slide))
    val fast = df.withColumn("s", Rolling.rollingSumByRows(
      col("v").cast("decimal(18,4)"), "50i", Seq(col("i")), Seq(col("k"))))
    def vals(x: org.apache.spark.sql.DataFrame) =
      x.orderBy("k", "i").select("s").collect().map(_.getDecimal(0)).toSeq
    assert(vals(fast) == vals(slow))
  }

  test("rollingSumByTime (running-difference) equals the sliding-frame sum, keyed") {
    val df = (0 until 3000).map { i =>
      ((i % 3).toString, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i.toLong * 41)),
        (i % 53).toDouble)
    }.toDF("k", "t", "v")
    for (closed <- Seq(Rolling.Right, Rolling.Both, Rolling.Left, Rolling.NoneC)) {
      val slide = Rolling.timeSpec("30m", col("t"), Seq(col("k")), closed)
      val slow = df.withColumn("s", sum(col("v").cast("decimal(18,4)")).over(slide))
      val fast = df.withColumn("s", Rolling.rollingSumByTime(
        col("v").cast("decimal(18,4)"), col("t"), "30m", Seq(col("k")), closed))
      def vals(x: org.apache.spark.sql.DataFrame) =
        x.orderBy("k", "t").select("s").collect()
          .map(r => if (r.isNullAt(0)) null else r.getDecimal(0)).toSeq
      assert(vals(fast) == vals(slow), s"closed=$closed")
    }
  }

  test("forward fill with limit bounds the fill distance") {
    val df = Seq((1, Some(10.0)), (2, None), (3, None), (4, None), (5, Some(50.0)))
      .toDF("id", "v")
    val unlimited = df.withColumn("f", Fill.forwardFill(col("v"), Seq(col("id"))))
      .orderBy("id").select("f").collect()
    assert(unlimited.map(r => if (r.isNullAt(0)) -1.0 else r.getDouble(0)).toSeq ==
      Seq(10.0, 10.0, 10.0, 10.0, 50.0))
    val limited = df.withColumn("f", Fill.forwardFill(col("v"), Seq(col("id")), limit = Some(2)))
      .orderBy("id").select("f").collect()
    assert(limited.map(r => if (r.isNullAt(0)) -1.0 else r.getDouble(0)).toSeq ==
      Seq(10.0, 10.0, 10.0, -1.0, 50.0))
  }

  test("sliding windows with closed=Both/None (every=30m period=1h)") {
    // Both [s, s+1h]: boundary points join every window whose edge touches them
    val both = DynamicGroupBy(series, "Time", every = "30m", period = Some("1h"),
        closed = DynamicGroupBy.ClosedBoth)(sum(col("Val")).as("s"))
      .orderBy("Time").collect()
    assert(both.map(r => (r.getAs[java.sql.Timestamp](0).toString.substring(11, 16), r.getLong(1))).toSeq ==
      Seq("09:00" -> 0L, "09:30" -> 6L, "10:00" -> 15L, "10:30" -> 12L))
    // None (s, s+1h): start AND end points excluded; empty windows not emitted
    val none = DynamicGroupBy(series, "Time", every = "30m", period = Some("1h"),
        closed = DynamicGroupBy.ClosedNone)(sum(col("Val")).as("s"))
      .orderBy("Time").collect()
    assert(none.map(r => (r.getAs[java.sql.Timestamp](0).toString.substring(11, 16), r.getLong(1))).toSeq ==
      Seq("09:30" -> 3L, "10:00" -> 15L, "10:30" -> 9L))
  }

  test("calendar 1mo/1q dynamic grids hit true month boundaries (leap Feb)") {
    // daily points Jan 1 .. Apr 30 of leap-year 2024
    val df = (0 until 121).map { i =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).atStartOfDay), 1)
    }.toDF("t", "one")
    val mo = DynamicGroupBy(df, "t", every = "1mo", includeBoundaries = true)(
        count(lit(1)).as("n"))
      .orderBy("t").collect()
    assert(mo.map(_.getLong(3)).toSeq == Seq(31L, 29L, 31L, 30L),
      "month lengths must be calendar-true, not 30-day grids")
    assert(mo.map(_.getAs[java.sql.Timestamp](0).toString.take(10)).toSeq ==
      Seq("2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01"))
    // _upper_boundary is the real next month start (Feb 1 -> Mar 1 = 29 days)
    assert(mo(1).getAs[java.sql.Timestamp](2).toString.take(10) == "2024-03-01")
    val q = DynamicGroupBy(df, "t", every = "1q")(count(lit(1)).as("n"))
      .orderBy("t").collect()
    assert(q.map(_.getLong(1)).toSeq == Seq(91L, 30L)) // Q1 2024 = 91 days
    // closed=Right: Feb 1 00:00 belongs to the January window
    val right = DynamicGroupBy(df, "t", every = "1mo",
        closed = DynamicGroupBy.ClosedRight)(count(lit(1)).as("n"))
      .orderBy("t").collect()
    assert(right.map(_.getLong(1)).toSeq == Seq(1L, 31L, 29L, 31L, 29L))
  }

  test("calendar start_by=DataPoint anchors the month grid at the first sample") {
    // daily points Jan 15 .. Apr 30 → windows [Jan15,Feb15) [Feb15,Mar15) ...
    val df = (0 until 107).map { i =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 15).plusDays(i.toLong).atStartOfDay), 1)
    }.toDF("t", "one")
    val got = DynamicGroupBy(df, "t", every = "1mo",
        startBy = DynamicGroupBy.DataPoint)(count(lit(1)).as("n"))
      .orderBy("t").collect()
    assert(got.map(r => (r.getAs[java.sql.Timestamp](0).toString.take(10), r.getLong(1))).toSeq ==
      Seq("2024-01-15" -> 31L, "2024-02-15" -> 29L, "2024-03-15" -> 31L, "2024-04-15" -> 16L))
  }

  test("calendar closed=Both/None work on sliding month grids") {
    val df = (0 until 121).map { i =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).atStartOfDay), 1)
    }.toDF("t", "one")
    // Both on every=1mo period=2mo: month-boundary points join 3 windows
    val both = DynamicGroupBy(df, "t", every = "1mo", period = Some("2mo"),
        closed = DynamicGroupBy.ClosedBoth)(count(lit(1)).as("n"))
      .orderBy("t").collect()
    // [Nov1,Jan1]={Jan1}=1, [Dec1,Feb1]=32 (Jan + Feb1), [Jan1,Mar1]=61,
    // [Feb1,Apr1]=61, [Mar1,May1]=61, [Apr1,Jun1]=30
    assert(both.map(_.getLong(1)).toSeq == Seq(1L, 32L, 61L, 61L, 61L, 30L))
    val none = DynamicGroupBy(df, "t", every = "1mo", period = Some("2mo"),
        closed = DynamicGroupBy.ClosedNone)(count(lit(1)).as("n"))
      .orderBy("t").collect()
    // (Dec1,Feb1)=31, (Jan1,Mar1)=59 (Jan2..Feb29 minus boundaries),
    // (Feb1,Apr1)=59, (Mar1,May1)=60, (Apr1,Jun1)=29
    assert(none.map(_.getLong(1)).toSeq == Seq(31L, 59L, 59L, 60L, 29L))
  }

  test("calendar sliding: every=1mo period=2mo double-counts interior months") {
    val df = (0 until 121).map { i =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong).atStartOfDay), 1)
    }.toDF("t", "one")
    val got = DynamicGroupBy(df, "t", every = "1mo", period = Some("2mo"))(
        count(lit(1)).as("n")).orderBy("t").collect()
    // windows: [Dec,Feb)=31, [Jan,Mar)=60, [Feb,Apr)=60, [Mar,May)=61, [Apr,Jun)=30
    assert(got.map(_.getLong(1)).toSeq == Seq(31L, 60L, 60L, 61L, 30L))
  }

  test("calendar round picks the nearest real month boundary (ties up)") {
    import graft.api.syntax._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(ts("2024-02-10 00:00:00"), ts("2024-02-20 00:00:00"),
      ts("2024-02-15 12:00:00")).toDF("t") // Feb 2024 midpoint = Feb 15 12:00
    val got = df.select(col("t").dt.round("1mo").as("r")).collect()
      .map(_.getAs[java.sql.Timestamp](0).toString.take(10))
    assert(got.toSeq == Seq("2024-02-01", "2024-03-01", "2024-03-01"))
  }

  test("valueAt eager cell access (eager.rs:386-500)") {
    import graft.api.frame._
    val df = Seq((1, "a"), (2, null: String), (3, "c")).toDF("n", "s").orderBy("n")
    assert(df.valueAt(0, "s").contains("a"))
    assert(df.valueAt(1, "s").isEmpty)   // null cell
    assert(df.valueAt(2, "n").contains(3))
    assert(df.valueAt(9, "n").isEmpty)   // out of range
  }

  test("offset_by and truncate with calendar months clamp and floor correctly") {
    import graft.api.syntax._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(ts("2024-01-31 12:34:56"), ts("2024-02-29 08:00:00"), ts("2024-05-10 00:00:01"))
      .toDF("t")
    val got = df.select(
        col("t").dt.offsetBy("1mo").as("p1mo"),
        col("t").dt.offsetBy("1y").as("p1y"),
        col("t").dt.offsetBy("1mo2d").as("mixed"),
        col("t").dt.truncate("1mo").as("tmo"),
        col("t").dt.truncate("1q").as("tq"))
      .collect().map(r => (0 until 5).map(i => r.getAs[java.sql.Timestamp](i).toString).toList)
    assert(got(0)(0).startsWith("2024-02-29 12:34:56")) // Jan 31 +1mo clamps, keeps time
    assert(got(1)(1).startsWith("2025-02-28 08:00:00")) // leap day +1y clamps
    assert(got(0)(2).startsWith("2024-03-02 12:34:56")) // clamp then +2d
    assert(got(2)(3).startsWith("2024-05-01 00:00:00"))
    assert(got(2)(4).startsWith("2024-04-01 00:00:00")) // Q2 floor
  }

  test("fillGlobal matches single-window fill and stays multi-partition") {
    // nulls everywhere except every 37th row → fills regularly cross the
    // range-partition boundaries; oracle = the (single-partition) column API
    val df = (0 until 5000).map(i => (i, if (i % 37 == 0) Some(i.toDouble) else None))
      .toDF("id", "v").repartition(8)
    def vals(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    for {
      fwd <- Seq(true, false)
      lim <- Seq(None, Some(10))
    } {
      val fast = Fill.fillGlobal(df, Seq("v"), Seq(col("id")), forward = fwd, limit = lim)
      val slowCol = if (fwd) Fill.forwardFill(col("v"), Seq(col("id")), limit = lim)
                    else Fill.backwardFill(col("v"), Seq(col("id")), limit = lim)
      val slow = df.withColumn("v", slowCol)
      assert(vals(fast.orderBy("id").select("v").collect()) ==
             vals(slow.orderBy("id").select("v").collect()), s"forward=$fwd limit=$lim")
    }
    // AQE coalesces the tiny test shuffle; disable to assert the real plan shape
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val fast = Fill.fillGlobal(df, Seq("v"), Seq(col("id")))
      assert(fast.rdd.getNumPartitions > 1, "fillGlobal must not collapse to one task")
      // r17: the exchange hash-partitions on the VALUE-derived RangeId
      // bucket (identical in every plan subtree by construction), not on a
      // sampled rangepartitioning whose instances could disagree
      assert(fast.queryExecution.executedPlan.toString.contains("hashpartitioning(__pid"))
    } finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("global rolling (rows + time) matches single-window results, stays parallel") {
    val df = (0 until 4000).map { i =>
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i.toLong * 67)), i.toLong, (i % 97).toDouble)
    }.toDF("t", "id", "v").repartition(8)
    def nums(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (if (r.isNullAt(0)) -1.0 else r.getDouble(0), r.getLong(1))).toSeq

    // fixed 25-row window
    val fastR = Rolling.fixedGlobal(df, "25i", Seq(col("id")),
      Seq("rsum" -> (w => sum(col("v")).over(w)), "rn" -> (w => count(lit(1)).over(w))))
    val slowSpecR = Rolling.fixedSpec("25i", Seq(col("id")))
    val slowR = df.withColumn("rsum", sum(col("v")).over(slowSpecR))
      .withColumn("rn", count(lit(1)).over(slowSpecR))
    assert(nums(fastR.orderBy("id").select("rsum", "rn").collect()) ==
           nums(slowR.orderBy("id").select("rsum", "rn").collect()))

    // time 10-minute window, closed matrix; rsum through the O(n)
    // running-difference path (must equal the sliding frame bit-for-bit on
    // a decimal view), rn through the generic sliding frame
    for (closed <- Seq(Rolling.Right, Rolling.Both, Rolling.Left, Rolling.NoneC)) {
      val fastT = Rolling.timeGlobal(df, "10m", col("t"), closed,
        aggs = Seq("rn" -> (w => count(lit(1)).over(w))),
        diffSums = Seq("rsum" -> col("v").cast("decimal(18,4)")))
        .withColumn("rsum", col("rsum").cast("double"))
      val slowSpecT = Rolling.timeSpec("10m", col("t"), closed = closed)
      val slowT = df.withColumn("rsum", sum(col("v")).over(slowSpecT))
        .withColumn("rn", count(lit(1)).over(slowSpecT))
      assert(nums(fastT.orderBy("id").select("rsum", "rn").collect()) ==
             nums(slowT.orderBy("id").select("rsum", "rn").collect()), s"closed=$closed")
    }

    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val fast = Rolling.fixedGlobal(df, "25i", Seq(col("id")),
        Seq("rsum" -> (w => sum(col("v")).over(w))))
      assert(fast.rdd.getNumPartitions > 1, "global rolling must not collapse to one task")
    } finally spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("streaming twin: windowed agg over memory sink matches batch") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    series.write.mode("overwrite").parquet(dir)
    val schema = StructType(Seq(StructField("Time", TimestampType), StructField("Val", IntegerType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = graft.streaming.StreamOps.windowedAgg(stream, "Time", every = "30m")(
      sum(col("Val")).as("SumVal"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("graft_stream_test").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT SumVal FROM graft_stream_test ORDER BY Time").collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(3L, 12L))
    } finally q.stop()
  }

  test("streaming as-of join matches batch backward as-of (flatMapGroupsWithState)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // trades (left) and quotes (right) across two keys
    val trades = Seq(("A", ts(3), 100.0), ("A", ts(5), 101.0), ("B", ts(5), 50.0), ("B", ts(1), 49.0))
    val quotes = Seq(("A", ts(1), 99.5), ("A", ts(4), 100.5), ("B", ts(5), 50.5), ("A", ts(10), 101.5))

    val lStream = MemoryStream[(String, java.sql.Timestamp, Double)]
    val rStream = MemoryStream[(String, java.sql.Timestamp, Double)]
    val lDf = lStream.toDF.toDF("symbol", "t", "price")
    val rDf = rStream.toDF.toDF("symbol", "t", "bid")
    val joined = graft.streaming.AsofStream.asofStream(lDf, rDf, "t", "t",
      by = Seq(("symbol", "symbol")), watermark = "1 minute")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("graft_asof_stream").start()
    try {
      lStream.addData(trades: _*); rStream.addData(quotes: _*)
      q.processAllAvailable()
      // push the watermark past every left event so all matches finalize
      rStream.addData(("Z", ts(59), 0.0))
      q.processAllAvailable()
      lStream.addData(("Z", ts(59), 0.0)) // second advance flushes timeouts
      q.processAllAvailable()
      val got = spark.table("graft_asof_stream")
        .filter(col("symbol") =!= "Z")
        .orderBy("symbol", "t").select("symbol", "price", "bid").collect()
      val want = graft.operators.AsofJoin.join(
          trades.toDF("symbol", "t", "price"), quotes.toDF("symbol", "t", "bid"),
          "t", "t", Seq(("symbol", "symbol")))
        .orderBy("symbol", "t").select("symbol", "price", "bid").collect()
      assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq,
        s"stream=${got.mkString(",")} batch=${want.mkString(",")}")
    } finally q.stop()
  }

  test("streaming dedup within watermark + streaming parquet sink") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    // 3 distinct keys, each duplicated
    val dup = Seq(
      ("k1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1),
      ("k1", java.sql.Timestamp.valueOf("2024-01-01 10:00:05"), 2),
      ("k2", java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 3),
      ("k2", java.sql.Timestamp.valueOf("2024-01-01 10:01:30"), 4),
      ("k3", java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 5),
      ("k3", java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), 6))
      .toDF("k", "ts", "v")
    dup.write.mode("overwrite").parquet(s"$base/in")
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("ts", TimestampType), StructField("v", IntegerType)))
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
    val deduped = graft.streaming.StreamOps.dedupStream(stream, Seq("k"), "ts", "5 minutes")
    val q = graft.streaming.StreamOps.sinkFileStream(deduped, "parquet",
      s"$base/out", s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$base/out")
    assert(got.count() == 3, "one survivor per key within the watermark")
    assert(got.select("k").as[String].collect().sorted.toSeq == Seq("k1", "k2", "k3"))
  }

  test("randomized brute-force: running-difference rolling sums (seeded, ties, all closed modes)") {
    // the O(n) cum-difference formulation vs an in-memory reference on random
    // data with heavy timestamp ties — the existing tests compare against
    // Spark's own sliding frames on fixed data; this pins the closed-bound
    // arithmetic and decimal exactness independently
    val rnd = new scala.util.Random(77)
    val keyPool = Array("a", "b")
    val rows = (1 to 150).map(i => (i.toLong, keyPool(rnd.nextInt(2)),
      1000L + rnd.nextInt(100), rnd.nextInt(1000) / 100.0))
    val df = rows.map { case (id, k, t, v) =>
      (id, k, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t)), v)
    }.toDF("id", "k", "t", "v")
    val w = 30L
    for (closed <- Seq(Rolling.Right, Rolling.Both, Rolling.Left, Rolling.NoneC)) {
      val got = df.withColumn("s",
          Rolling.rollingSumByTime(col("v").cast("decimal(18,2)"), col("t"), s"${w}s",
            Seq(col("k")), closed).cast("double"))
        .select(col("id"), col("s")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      rows.foreach { case (id, k, t, _) =>
        val inWin: Long => Boolean = closed match {
          case Rolling.Right => rt => rt > t - w && rt <= t
          case Rolling.Both  => rt => rt >= t - w && rt <= t
          case Rolling.Left  => rt => rt >= t - w && rt < t
          case Rolling.NoneC => rt => rt > t - w && rt < t
        }
        val sel = rows.filter(r => r._2 == k && inWin(r._3))
          .map(r => BigDecimal(r._4).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        val want = if (sel.isEmpty) None else Some(sel.sum.toDouble)
        assert(got(id) == want, s"closed=$closed id=$id t=$t k=$k: got=${got(id)} want=$want")
      }
    }
    // row-window twin: last-5-rows sum per key ordered by unique id
    val gotRows = df.withColumn("s",
        Rolling.rollingSumByRows(col("v").cast("decimal(18,2)"), "5i",
          Seq(col("id")), Seq(col("k"))).cast("double"))
      .select(col("id"), col("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.groupBy(_._2).foreach { case (_, ks) =>
      val ordered = ks.sortBy(_._1)
      ordered.zipWithIndex.foreach { case ((id, _, _, _), i) =>
        val want = ordered.slice(math.max(0, i - 4), i + 1)
          .map(r => BigDecimal(r._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        assert(gotRows(id) == want, s"rows-window id=$id: got=${gotRows(id)} want=$want")
      }
    }
  }
}
