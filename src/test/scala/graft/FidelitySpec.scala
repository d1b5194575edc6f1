package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.functions.Quantiles
import graft.operators.DynamicGroupBy

/** Fidelity-corner tests: quantile interpolation modes, start_by weekday
  * alignment, stateful sessionization, type mapping. */
class FidelitySpec extends SparkSpec {
  import spark.implicits._

  test("quantile modes on a known vector (expr.rs:1156-1176)") {
    // values 10,20,30,40; q=0.35 -> h = 1.05
    val df = Seq(10.0, 40.0, 20.0, 30.0).toDF("v")
    val got = df.agg(
      Quantiles.quantile(col("v"), 0.35, Quantiles.Lower).as("lo"),
      Quantiles.quantile(col("v"), 0.35, Quantiles.Higher).as("hi"),
      Quantiles.quantile(col("v"), 0.35, Quantiles.Nearest).as("near"),
      Quantiles.quantile(col("v"), 0.35, Quantiles.Midpoint).as("mid"),
      Quantiles.quantile(col("v"), 0.35, Quantiles.Linear).as("lin")).collect()(0)
    assert(got.getDouble(0) == 20.0) // lower: idx 1
    assert(got.getDouble(1) == 30.0) // higher: idx 2
    assert(got.getDouble(2) == 20.0) // nearest: round(1.05)=1
    assert(got.getDouble(3) == 25.0)
    assert(math.abs(got.getDouble(4) - 20.5) < 1e-12) // 20 + 0.05*10
  }

  test("linear mode matches Spark's built-in percentile") {
    val li = sf("lineitem")
    val got = li.agg(
      Quantiles.quantile(col("l_quantity"), 0.25, Quantiles.Linear).as("mine"),
      percentile(col("l_quantity"), lit(0.25)).as("spark")).collect()(0)
    assert(got.getDouble(0) == got.getDouble(1))
  }

  test("start_by=Monday aligns weekly windows to Mondays") {
    // 2024-01-01 is a Monday; events over 3 weeks
    val df = (0 until 21).map(i =>
      (Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), 1)).toDF("t", "one")
    val got = DynamicGroupBy(df, "t", every = "1w",
        startBy = DynamicGroupBy.Weekday(1))(count(lit(1)).as("n"))
      .orderBy("t").collect()
    assert(got.length == 3)
    got.foreach { r =>
      val start = r.getAs[Timestamp](0).toLocalDateTime
      assert(start.getDayOfWeek == java.time.DayOfWeek.MONDAY, s"window start $start")
      assert(r.getLong(1) == 7L)
    }
  }

  test("start_by=DataPoint aligns the grid to the first sample; label=DataPoint") {
    // points at 10:07, 10:17, ..., 10:57 — DataPoint grid starts at 10:07
    val df = (0 until 6).map(i =>
      (Timestamp.valueOf(f"2024-01-01 10:${7 + i * 10}%02d:00"), i)).toDF("t", "v")
    val got = DynamicGroupBy(df, "t", every = "30m",
        startBy = DynamicGroupBy.DataPoint)(sum(col("v")).as("s"))
      .orderBy("t").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Timestamp](0).toString.startsWith("2024-01-01 10:07"))
    assert(got(0).getLong(1) == 3L && got(1).getLong(1) == 12L)
    val labeled = DynamicGroupBy(df, "t", every = "30m",
        startBy = DynamicGroupBy.DataPoint,
        label = DynamicGroupBy.LabelDataPoint)(sum(col("v")).as("s"))
      .orderBy("t").collect()
    assert(labeled(1).getAs[Timestamp](0).toString.startsWith("2024-01-01 10:37"))
  }

  test("stateful sessionization closes sessions on event-time gaps") {
    import graft.streaming.Sessionize
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    // user 1: two sessions (gap > 30m); user 2: one session
    Seq(
      Sessionize.Event(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      Sessionize.Event(1L, Timestamp.valueOf("2024-01-01 10:10:00"), 2.0),
      Sessionize.Event(1L, Timestamp.valueOf("2024-01-01 12:00:00"), 3.0),
      Sessionize.Event(2L, Timestamp.valueOf("2024-01-01 09:00:00"), 5.0),
      // late sentinel advances the watermark far enough to time out all state
      Sessionize.Event(99L, Timestamp.valueOf("2024-01-02 00:00:00"), 0.0),
    ).toDS().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(
      org.apache.spark.sql.Encoders.product[Sessionize.Event].schema)
      .parquet(dir).as[Sessionize.Event]
    val q = Sessionize.sessions(stream, gap = "30m", watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("graft_sessions").start()
    try {
      q.processAllAvailable()
      // feed an empty batch so event-time timeouts fire after watermark moves
      Seq.empty[Sessionize.Event].toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT userId, nEvents, sumValue FROM graft_sessions WHERE userId < 90 ORDER BY userId, sessionStart")
        .collect()
      assert(got.length >= 2, got.mkString(";"))
      val u1 = got.filter(_.getLong(0) == 1L)
      assert(u1.head.getLong(1) == 2L && u1.head.getDouble(2) == 3.0)
      // batch twin (q72's declarative face): identical sessions from the
      // same events — stream state machine == window composition
      val batch = graft.streaming.Sessionize.sessionsBatch(
          spark.read.parquet(dir).filter(col("userId") < 90)
            .select(col("userId"), col("ts"), col("value")),
          "userId", "ts", "value", gap = "30m")
        .select(col("userId"), col("n_events"),
          col("sum_value").cast("double"))
        .orderBy(col("userId"), col("session_id")).collect()
      assert(batch.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
        got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq,
        s"batch=${batch.mkString(";")} stream=${got.mkString(";")}")
    } finally q.stop()
  }

  /** grammar-36b session-event shapes, shared by the stream-fidelity
    * tests: per-user time walks whose steps force duplicate timestamps
    * (incl. ties at a boundary), boundary-exact gaps (diff == gap,
    * in-session under strict '>'), just-past boundaries (gap + 1 ms),
    * ordinary in-session steps, and guaranteed singletons (3x gap). All
    * µs values are ‰1000 so ms-built Timestamps are exact. */
  private def genSessionEvents(r: scala.util.Random, users: Long, minN: Int,
                               maxExtra: Int, gapUs: Long = 60000000L)
      : Seq[graft.streaming.Sessionize.Event] = {
    val rows = scala.collection.mutable.ArrayBuffer[graft.streaming.Sessionize.Event]()
    for (user <- 1L to users) {
      var us = 1700000000000000L + user * 86400000000L
      for (i <- 0 until (minN + r.nextInt(maxExtra))) {
        if (i > 0) us += (r.nextInt(5) match {
          case 0 => 0L            // duplicate (user, ts) — tie
          case 1 => gapUs         // boundary-exact: same session (strict >)
          case 2 => gapUs + 1000L // just past the boundary: new session
          case 3 => 1000000L      // 1s — well inside
          case _ => gapUs * 3     // far outside — guarantees singletons
        })
        rows += graft.streaming.Sessionize.Event(user,
          new java.sql.Timestamp(us / 1000L), (r.nextInt(10000) + 1) / 100.0)
      }
    }
    rows.toSeq
  }

  test("fuzz: sessionize stream == batch on ties / boundary-exact gaps / singletons") {
    // the grammar-36b fixture shapes driven through the STREAMING runtime:
    // the state machine (arrival-order ties, µs gap arithmetic, fixed-point
    // sums) must emit exactly the declarative batch twin's sessions —
    // including duplicate timestamps at a session boundary, diff == gap
    // staying in-session, and single-event sessions
    import graft.streaming.Sessionize
    implicit val sp = spark
    for (seed <- 4100 until 4104) {
      val r = new scala.util.Random(seed)
      // far-future sentinel closes all real sessions via timeout
      val rows = genSessionEvents(r, users = 10, minN = 1, maxExtra = 7) :+
        Sessionize.Event(99999L,
          new java.sql.Timestamp(1700000000000000L / 1000L + 1000L * 86400000L), 0.0)
      val dir = java.nio.file.Files.createTempDirectory(s"graft_sfz$seed").toString
      r.shuffle(rows).toDS().write.mode("overwrite").parquet(dir)
      val stream = spark.readStream.schema(
        org.apache.spark.sql.Encoders.product[Sessionize.Event].schema)
        .parquet(dir).as[Sessionize.Event]
      val qn = s"graft_sfz$seed"
      val q = Sessionize.sessions(stream, gap = "1m", watermarkDelay = "0 seconds")
        .writeStream.outputMode("append").format("memory").queryName(qn).start()
      try {
        q.processAllAvailable()
        Seq.empty[Sessionize.Event].toDS().write.mode("append").parquet(dir)
        q.processAllAvailable()
        val got = spark.table(qn).filter(col("userId") < 90000L)
          .select(col("userId"), col("sessionStart"), col("sessionEnd"),
            col("nEvents"), col("sumValue"))
          .orderBy(col("userId"), col("sessionStart"))
          .collect().map(_.toSeq).toSeq
        val want = Sessionize.sessionsBatch(
            spark.read.parquet(dir).filter(col("userId") < 90000L).toDF(),
            "userId", "ts", "value", gap = "1m")
          .select(col("userId"), col("session_start"), col("session_end"),
            col("n_events"), col("sum_value").cast("double"))
          .orderBy(col("userId"), col("session_start"))
          .collect().map(_.toSeq).toSeq
        assert(got == want, s"seed=$seed stream=${got.take(5)} batch=${want.take(5)}")
      } finally {
        q.stop()
        spark.catalog.dropTempView(qn)
      }
    }
  }

  test("sessionize state carries across micro-batches (maxFilesPerTrigger=1)") {
    // the property the single-batch replay harness (q73) can't exercise:
    // per-key session state must survive micro-batch boundaries. Input is
    // split over 6 files delivered ONE PER BATCH in arbitrary order; the
    // watermark delay (30d) covers the full inter-file event-time disorder
    // so nothing is late-dropped, the appended sentinel then advances the
    // watermark, and the final empty batch fires the timeouts.
    import graft.streaming.Sessionize
    implicit val sp = spark
    val r = new scala.util.Random(4200)
    val base = 1700000000000000L
    val rows = genSessionEvents(r, users = 8, minN = 2, maxExtra = 6)
    val dir = java.nio.file.Files.createTempDirectory("graft_smb").toString
    r.shuffle(rows).toDS().repartition(6).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .schema(org.apache.spark.sql.Encoders.product[Sessionize.Event].schema)
      .parquet(dir).as[Sessionize.Event]
    val qn = "graft_smb"
    val q = Sessionize.sessions(stream, gap = "1m", watermarkDelay = "30 days")
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      q.processAllAvailable() // 6+ micro-batches, state carries between them
      Seq(Sessionize.Event(99999L,
          new java.sql.Timestamp(base / 1000L + 3000L * 86400000L), 0.0))
        .toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      Seq.empty[Sessionize.Event].toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table(qn).filter(col("userId") < 90000L)
        .select(col("userId"), col("sessionStart"), col("sessionEnd"),
          col("nEvents"), col("sumValue"))
        .orderBy(col("userId"), col("sessionStart")).collect().map(_.toSeq).toSeq
      val want = Sessionize.sessionsBatch(
          spark.read.parquet(dir).filter(col("userId") < 90000L).toDF(),
          "userId", "ts", "value", gap = "1m")
        .select(col("userId"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value").cast("double"))
        .orderBy(col("userId"), col("session_start")).collect().map(_.toSeq).toSeq
      assert(got == want, s"stream=${got.take(5)} batch=${want.take(5)}")
    } finally {
      q.stop()
      spark.catalog.dropTempView(qn)
    }
  }

  test("sessionize survives a checkpointed stop/restart mid-stream") {
    // the operational property of a 100 TB/day pipeline: kill the query
    // after some micro-batches, restart from the checkpoint, and the
    // recovered SessBuf state (pending buffer + open session) must continue
    // to EXACTLY the batch twin's sessions — no loss, no duplication. File
    // sink + checkpoint = the production exactly-once pairing.
    import graft.streaming.Sessionize
    implicit val sp = spark
    val r = new scala.util.Random(4300)
    val base = 1700000000000000L
    val rows = genSessionEvents(r, users = 6, minN = 2, maxExtra = 5)
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    r.shuffle(rows).toDS().repartition(4).write.mode("overwrite").parquet(in)
    def start() = {
      val stream = spark.readStream.option("maxFilesPerTrigger", 1)
        .schema(org.apache.spark.sql.Encoders.product[Sessionize.Event].schema)
        .parquet(in).as[Sessionize.Event]
      Sessionize.sessions(stream, gap = "1m", watermarkDelay = "30 days")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt).start()
    }
    val q1 = start()
    q1.processAllAvailable() // phase 1: all initial files, state checkpointed
    q1.stop()
    // phase 2: restart from the checkpoint, deliver the sentinel + flush
    val q2 = start()
    try {
      q2.processAllAvailable()
      Seq(Sessionize.Event(99999L,
          new java.sql.Timestamp(base / 1000L + 3000L * 86400000L), 0.0))
        .toDS().write.mode("append").parquet(in)
      q2.processAllAvailable()
      Seq.empty[Sessionize.Event].toDS().write.mode("append").parquet(in)
      q2.processAllAvailable()
      val got = spark.read.parquet(out).filter(col("userId") < 90000L)
        .select(col("userId"), col("sessionStart"), col("sessionEnd"),
          col("nEvents"), col("sumValue"))
        .orderBy(col("userId"), col("sessionStart")).collect().map(_.toSeq).toSeq
      val want = Sessionize.sessionsBatch(
          spark.read.parquet(in).filter(col("userId") < 90000L).toDF(),
          "userId", "ts", "value", gap = "1m")
        .select(col("userId"), col("session_start"), col("session_end"),
          col("n_events"), col("sum_value").cast("double"))
        .orderBy(col("userId"), col("session_start")).collect().map(_.toSeq).toSeq
      assert(got == want, s"after restart: stream=${got.take(5)} batch=${want.take(5)}")
    } finally q2.stop()
  }

  test("sessionize DROPS events older than the watermark (late-arrival policy)") {
    // Pins the late-arrival policy end to end: a beyond-watermark event
    // must never fold into the open session across an arbitrary gap
    // (t - end is negative, trivially <= gap) or mint a duplicate session
    // after its true session already emitted. Spark 4's exec pre-filters
    // such rows AND the operator drops them itself; this test holds
    // whichever layer does the filtering.
    import graft.streaming.Sessionize
    implicit val sp = spark
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(sec: Int) = new java.sql.Timestamp(t0.getTime + sec * 1000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    Seq(Sessionize.Event(1L, at(0), 1.0), Sessionize.Event(1L, at(10), 2.0))
      .toDS().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(
      org.apache.spark.sql.Encoders.product[Sessionize.Event].schema)
      .parquet(dir).as[Sessionize.Event]
    val qn = "graft_late"
    val q = Sessionize.sessions(stream, gap = "1m", watermarkDelay = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      q.processAllAvailable()
      Seq(Sessionize.Event(999L, at(100 * 86400), 0.0)) // watermark riser
        .toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      Seq.empty[Sessionize.Event].toDS().write.mode("append").parquet(dir)
      q.processAllAvailable() // u1's session [0s,10s] closes and emits
      // a LATE event inside u1's already-emitted session window
      Seq(Sessionize.Event(1L, at(5), 100.0)).toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      Seq.empty[Sessionize.Event].toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table(qn).filter(col("userId") === 1L)
        .select(col("nEvents"), col("sumValue")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((2L, 3.0)), s"late event must be dropped, got $got")
    } finally {
      q.stop()
      spark.catalog.dropTempView(qn)
    }
  }

  test("stream dedup drops duplicates arriving in LATER micro-batches") {
    // q74's harness delivers all copies in one batch; the watermark-bounded
    // dedup state must also catch a duplicate whose copy arrives in a later
    // micro-batch (within the watermark delay)
    implicit val sp = spark
    def ev(k: Long, m: Int) = (k, java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00"), k * 1.5)
    val first = Seq(ev(1, 0), ev(2, 1), ev(3, 2))
    val dir = java.nio.file.Files.createTempDirectory("graft_dmb").toString
    first.toDF("k", "ts", "v").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val out = graft.streaming.StreamOps.dedupStream(
      spark.readStream.option("maxFilesPerTrigger", 1).schema(schema).parquet(dir),
      Seq("k"), "ts", "1 hour")
    val qn = "graft_dmb"
    val q = out.writeStream.outputMode("append").format("memory").queryName(qn).start()
    try {
      q.processAllAvailable()
      // batch 2: duplicates of keys 1 and 3 (same payload) + one new key
      Seq(ev(1, 0), ev(3, 2), ev(4, 5)).toDF("k", "ts", "v")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table(qn).orderBy(col("k")).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(got == Seq((1L, 1.5), (2L, 3.0), (3L, 4.5), (4L, 6.0)),
        s"got $got")
    } finally {
      q.stop()
      spark.catalog.dropTempView(qn)
    }
  }

  test("withStatePartitions: per-query state partition sizing, identical results") {
    // state partitioning is fixed at a streaming query's first checkpoint;
    // the knob must (a) actually set the state operator's partition count
    // and (b) change nothing about the result
    implicit val sp = spark
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val root = java.nio.file.Files.createTempDirectory("graft_wsp").toString
    val inL = s"$root/l"; val inR = s"$root/r"
    Seq((1L, ts(10), 5.0), (1L, ts(30), 6.0), (2L, ts(20), 7.0))
      .toDF("k", "lts", "lv").write.mode("overwrite").parquet(inL)
    Seq((1L, ts(5), 1.0), (1L, ts(25), 2.0), (2L, ts(19), 3.0), (3L, ts(1), 4.0))
      .toDF("k", "rts", "rv").write.mode("overwrite").parquet(inR)
    def drive(sess: org.apache.spark.sql.SparkSession, qn: String): (Seq[Seq[Any]], Long) = {
      val lS = sess.read.parquet(inL).schema
      val rS = sess.read.parquet(inR).schema
      val out = graft.streaming.StreamOps.intervalJoin(
        sess.readStream.schema(lS).parquet(inL),
        sess.readStream.schema(rS).parquet(inR),
        "lts", "rts", by = Seq(("k", "k")),
        before = "15m", after = "0s", watermark = "0 seconds")
      val q = out.writeStream.outputMode("append").format("memory").queryName(qn).start()
      try {
        q.processAllAvailable()
        val parts = q.lastProgress.stateOperators.map(_.numShufflePartitions).max
        val rows = sess.table(qn).orderBy(col("k"), col("lts"), col("rts"))
          .collect().map(_.toSeq).toSeq
        (rows, parts)
      } finally {
        q.stop(); sess.catalog.dropTempView(qn)
        graft.streaming.StreamOps.releaseStateStores()
      }
    }
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val (rDefault, pDefault) = drive(spark, "graft_wsp_d")
    val (r8, p8) = graft.streaming.StreamOps.withStatePartitions(spark, 8) {
      child => drive(child, "graft_wsp_8")
    }
    assert(rDefault.nonEmpty && rDefault == r8, s"$rDefault vs $r8")
    assert(p8 == 8L, s"state partitions under the knob: $p8")
    assert(pDefault == before.toLong, s"default drive state partitions: $pDefault")
    // the knob never leaks into the parent session
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("fuzz: as-of stream == batch under multi-batch file disorder (maxFilesPerTrigger=1)") {
    // AsofStream's pending-left/right-frontier state under out-of-order
    // delivery ACROSS micro-batches: left and right events are shuffled
    // over several files delivered one per batch; the 30d watermark delay
    // covers the disorder, a far-future right sentinel finalizes every
    // left, and the result must equal the batch backward as-of exactly.
    implicit val sp = spark
    for (seed <- 4400 until 4403) {
      val r = new scala.util.Random(seed)
      val base = 1700000000000000L
      def evs(n: Int) = (0 until n).map { _ =>
        (1L + r.nextInt(5),
          new java.sql.Timestamp((base + r.nextInt(1000000) * 1000000L) / 1000L),
          (r.nextInt(10000) + 1) / 100.0)
      }
      // unique (user, ts) per side: a tied right with a different bid would
      // make the backward match ambiguous on both engines
      val lRows = evs(40).distinctBy(t => (t._1, t._2))
      val rRows = evs(30).distinctBy(t => (t._1, t._2))
      val root = java.nio.file.Files.createTempDirectory(s"graft_asb$seed").toString
      val inL = s"$root/l"; val inR = s"$root/r"
      lRows.toDF("user_id", "ts", "price").repartition(4)
        .write.mode("overwrite").parquet(inL)
      r.shuffle(rRows).toDF("user_id", "ts", "bid").repartition(4)
        .write.mode("overwrite").parquet(inR)
      val lS = spark.read.parquet(inL).schema
      val rS = spark.read.parquet(inR).schema
      val out = graft.streaming.AsofStream.asofStream(
        spark.readStream.option("maxFilesPerTrigger", 1).schema(lS).parquet(inL),
        spark.readStream.option("maxFilesPerTrigger", 1).schema(rS).parquet(inR),
        "ts", "ts", by = Seq(("user_id", "user_id")), watermark = "30 days")
      // FORWARD runs concurrently (tolerance-bounded — an unbounded
      // forward wait can't finalize in a stream): BOTH queries must have
      // consumed every real file before the sentinel is written — delivered
      // early (one-file-per-trigger picks files in arbitrary order, and
      // coarse mtimes can tie) it would jump the watermark and legitimately
      // late-drop the rest, the standard far-future-event hazard
      val outF = graft.streaming.AsofStream.asofStream(
        spark.readStream.option("maxFilesPerTrigger", 1).schema(lS).parquet(inL),
        spark.readStream.option("maxFilesPerTrigger", 1).schema(rS).parquet(inR),
        "ts", "ts", by = Seq(("user_id", "user_id")), watermark = "30 days",
        strategy = graft.operators.AsofJoin.Forward, tolerance = Some("2d"))
      val qn = s"graft_asb$seed"; val qnF = s"graft_asbf$seed"
      val q = out.writeStream.outputMode("append").format("memory").queryName(qn).start()
      val qF = outF.writeStream.outputMode("append").format("memory").queryName(qnF).start()
      try {
        q.processAllAvailable(); qF.processAllAvailable() // all real files, wm stays low
        Seq((99999L, new java.sql.Timestamp((base + 3000L * 86400000000L) / 1000L), 0.0))
          .toDF("user_id", "ts", "bid").write.mode("append").parquet(inR)
        q.processAllAvailable(); qF.processAllAvailable()
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), lS)
          .write.mode("append").parquet(inL)
        q.processAllAvailable(); qF.processAllAvailable()
        def table(n: String) = spark.table(n).filter(col("user_id") < 90000L)
          .select(col("user_id"), col("ts"), col("price"), col("bid"))
          .orderBy(col("user_id"), col("ts")).collect().map(_.toSeq).toSeq
        def batch(strat: graft.operators.AsofJoin.Strategy, tol: Option[String]) =
          graft.operators.AsofJoin.join(
              lRows.toDF("user_id", "ts", "price"),
              rRows.toDF("user_id", "ts", "bid"),
              "ts", "ts", Seq(("user_id", "user_id")), strategy = strat, tolerance = tol)
            .select(col("user_id"), col("ts"), col("price"), col("bid"))
            .orderBy(col("user_id"), col("ts")).collect().map(_.toSeq).toSeq
        val got = table(qn)
        val want = batch(graft.operators.AsofJoin.Backward, None)
        assert(got == want, s"seed=$seed stream=${got.take(4)} batch=${want.take(4)}")
        val gotF = table(qnF)
        val wantF = batch(graft.operators.AsofJoin.Forward, Some("2d"))
        assert(gotF == wantF,
          s"forward seed=$seed stream=${gotF.take(4)} batch=${wantF.take(4)}")
      } finally {
        q.stop(); qF.stop()
        spark.catalog.dropTempView(qn); spark.catalog.dropTempView(qnF)
        graft.streaming.StreamOps.releaseStateStores()
      }
    }
  }

  test("cleaning trio: lenient cast → fill_nan → fill_null (CleaningTests.cs:75-110)") {
    import graft.api.syntax._
    // mixed junk column: parseable numbers, garbage, literal "NaN", null —
    // lenient cast nulls the garbage but parses "NaN" to the NaN VALUE
    // (distinct from null, same as Polars), so both fills are needed
    val df = Seq("100", "200.5", "NotANumber", "NaN", null).toDF("raw")
    val cleaned = df.select(
      col("raw").castLenient("double").fillNan(lit(0.0)).fillNull(lit(0.0)).as("cleaned"))
    assert(cleaned.collect().map(_.getDouble(0)).toSeq == Seq(100.0, 200.5, 0.0, 0.0, 0.0))
    // and without fillNan, the "NaN" row stays NaN — proving the cast parsed
    // it as a value rather than nulling it
    val noNanFill = df.select(col("raw").castLenient("double").fillNull(lit(0.0)).as("c"))
      .collect().map(_.getDouble(0))
    assert(noNanFill(3).isNaN && noNanFill(2) == 0.0)
  }

  test("interval join pins inclusive bounds on a hand-computed case") {
    import graft.streaming.StreamOps
    val l = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), "a"))
      .toDF("k", "ts", "tag")
    val r = Seq(
      (1L, Timestamp.valueOf("2024-01-01 09:49:59"), 0.0), // just outside
      (1L, Timestamp.valueOf("2024-01-01 09:50:00"), 1.0), // lower bound: in
      (1L, Timestamp.valueOf("2024-01-01 10:05:00"), 2.0), // upper bound: in
      (1L, Timestamp.valueOf("2024-01-01 10:05:01"), 3.0), // just outside
      (2L, Timestamp.valueOf("2024-01-01 10:00:00"), 4.0)) // wrong key
      .toDF("k", "rts", "v")
    val got = StreamOps.intervalJoin(l, r, "ts", "rts", Seq(("k", "k")),
        before = "10m", after = "5m")
      .orderBy("v").collect().map(_.getAs[Double]("v")).toSeq
    assert(got == Seq(1.0, 2.0))
    assert(StreamOps.intervalJoin(l, r, "ts", "rts", Seq(("k", "k")),
      before = "10m", after = "5m", joinType = "left_outer").count() == 2L)
  }

  test("interval join: stream == batch across inner/left/right/full outer") {
    import graft.streaming.StreamOps
    val rnd = new scala.util.Random(77)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def mkRows(n: Int) = (0 until n).map { i =>
      (i.toLong, rnd.nextInt(8).toLong,
        new Timestamp(base + rnd.nextInt(7200) * 1000L), rnd.nextInt(100).toDouble)
    }
    val sentinelTs = new Timestamp(base + 10L * 86400000L)
    val lRows = mkRows(40) :+ ((-1L, -1L, sentinelTs, 0.0))
    val rRows = mkRows(80).map { case (id, k, ts, v) => (id, k, ts, v) } :+
      ((-1L, -1L, sentinelTs, 0.0))
    val dirL = java.nio.file.Files.createTempDirectory("graft_ij_l").toString
    val dirR = java.nio.file.Files.createTempDirectory("graft_ij_r").toString
    lRows.toDF("id", "k", "ts", "v").write.mode("overwrite").parquet(dirL)
    rRows.toDF("rid", "k", "rts", "rv").write.mode("overwrite").parquet(dirR)
    val lSchema = spark.read.parquet(dirL).schema
    val rSchema = spark.read.parquet(dirR).schema
    def key(r: org.apache.spark.sql.Row) =
      (if (r.isNullAt(0)) -999L else r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -999L else r.getLong(2),
        if (r.isNullAt(3)) -999.0 else r.getDouble(3))
    for (jt <- Seq("inner", "left_outer", "right_outer", "full_outer")) {
      val out = StreamOps.intervalJoin(
        spark.readStream.schema(lSchema).parquet(dirL),
        spark.readStream.schema(rSchema).parquet(dirR),
        "ts", "rts", Seq(("k", "k")), before = "10m", after = "5m",
        watermark = "0 seconds", joinType = jt)
      val qn = s"graft_ij_$jt"
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName(qn).start()
      val got = try {
        q.processAllAvailable()
        // empty flush batch: watermark advanced past the sentinels at the
        // end of batch 1, so batch 2 evicts outer state → nulls emit
        Seq.empty[(Long, Long, Timestamp, Double)].toDF("id", "k", "ts", "v")
          .write.mode("append").parquet(dirL)
        q.processAllAvailable()
        spark.table(qn).filter(col("k") >= 0L)
          .select("id", "k", "rid", "rv").collect().map(key).sorted.toSeq
      } finally {
        q.stop(); StreamOps.releaseStateStores()
        spark.catalog.dropTempView(qn)
      }
      val batch = StreamOps.intervalJoin(
          spark.read.parquet(dirL), spark.read.parquet(dirR),
          "ts", "rts", Seq(("k", "k")), before = "10m", after = "5m",
          watermark = "0 seconds", joinType = jt)
        .filter(col("k") >= 0L)
        .select("id", "k", "rid", "rv").collect().map(key).sorted.toSeq
      assert(got == batch, s"$jt: stream ${got.size} rows vs batch ${batch.size}")
      assert(batch.nonEmpty)
      if (jt != "inner") assert(batch.exists(r => r._3 == -999L || r._1 == -999L),
        s"$jt: expected at least one watermark-finalized outer null")
      if (jt == "right_outer" || jt == "full_outer")
        assert(batch.exists(_._1 == -999L),
          s"$jt: expected at least one unmatched-right row with null left columns")
    }
  }

  test("interval join late-data contract: disordered multi-batch stream drops exactly the watermark-late rows") {
    // r12 directive 4 — the streaming-disorder face the as-of fuzz already
    // has: rows land in micro-batches in ARBITRARY time order with a
    // NONZERO watermark, so some genuinely arrive late and must drop. The
    // oracle is a driver-side simulation of the watermark contract as
    // Spark 4 actually schedules it (probed empirically, WmProbeSpec): the
    // LATE-EVENTS filter for micro-batch k uses the PREVIOUS batch's
    // watermark — i.e. the value derived from data through batch k-2
    // (Spark updates the watermark at batch start from the prior batch's
    // stats, and late-filters with the pre-update value) — applied as the
    // plain event-time predicate symmetrically on both sides; EVICTION
    // uses the post-update value, which by construction aligns with the
    // next batch's late filter, so a late-but-admitted row can never miss
    // an already-evicted partner. The join over the SURVIVING rows must
    // therefore equal the batch range join over that subset, including
    // the outer-null finalizations. Event times sit on a whole-second
    // grid and the delay on a .5 s offset, so strict-vs-inclusive
    // late-boundary semantics can never bite.
    import graft.streaming.StreamOps
    val delayMs = 1799500L // ~30 min, offset half a second off the ts grid
    val beforeS = "20m"; val afterS = "10m"
    val beforeUs = 20L * 60 * 1000000L; val afterUs = 10L * 60 * 1000000L
    for (seed <- Seq(101, 202)) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
      val nB = 6
      // (id, k, tsMs, v) — second-aligned event times so a ts can never
      // equal the .5 s-offset watermark (strict-< late test is unambiguous)
      def mk(n: Int, idOff: Long) = (0 until n).map { i =>
        (idOff + i, rnd.nextInt(6).toLong, base + rnd.nextInt(7200) * 1000L,
          rnd.nextInt(100).toDouble)
      }
      val lAll = mk(60, 0L); val rAll = mk(90, 1000L)
      // random batch assignment = maximal disorder across micro-batches
      val lBatches = lAll.groupBy(_ => rnd.nextInt(nB))
      val rBatches = rAll.groupBy(_ => rnd.nextInt(nB))
      val sentinelMs = base + 10L * 86400000L
      val dirL = java.nio.file.Files.createTempDirectory(s"graft_ijl$seed").toString
      val dirR = java.nio.file.Files.createTempDirectory(s"graft_ijr$seed").toString
      // one FILE per (side, batch), mtimes strictly increasing in batch
      // order: maxFilesPerTrigger=1 then consumes batch k's left and right
      // files together in micro-batch k, deterministically
      def writeBatch(dir: String, k: Int, rows: Seq[(Long, Long, Long, Double)],
                     cols: (String, String, String, String)): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("graft_ij_tmp").toString
        rows.map { case (id, kk, ts, v) => (id, kk, new Timestamp(ts), v) }
          .toDF(cols._1, cols._2, cols._3, cols._4)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
          .filter(p => p.getFileName.toString.startsWith("part-")).findFirst().get()
        val dst = java.nio.file.Paths.get(dir, f"batch_$k%02d.parquet")
        java.nio.file.Files.move(part, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + k * 60000L))
      }
      for (k <- 0 until nB) {
        writeBatch(dirL, k, lBatches.getOrElse(k, Seq.empty), ("id", "k", "ts", "v"))
        writeBatch(dirR, k, rBatches.getOrElse(k, Seq.empty), ("rid", "k", "rts", "rv"))
      }
      // final batch: far-future sentinels advance the watermark past every
      // real window so outer nulls finalize
      writeBatch(dirL, nB, Seq((-1L, -1L, sentinelMs, 0.0)), ("id", "k", "ts", "v"))
      writeBatch(dirR, nB, Seq((-1L, -1L, sentinelMs, 0.0)), ("rid", "k", "rts", "rv"))
      // ---- driver-side watermark simulation over the same batch sequence
      def batchOf(side: Map[Int, Seq[(Long, Long, Long, Double)]], k: Int) =
        if (k == nB) Seq((-1L, -1L, sentinelMs, 0.0))
        else side.getOrElse(k, Seq.empty)
      // wmAfter(k) = watermark derived from data through batch k (global =
      // min over the two sources of max-seen minus delay; never regresses;
      // starts at epoch)
      val wmAfter = new Array[Long](nB + 1)
      var maxL = Long.MinValue; var maxR = Long.MinValue
      for (k <- 0 to nB) {
        maxL = math.max(maxL, batchOf(lBatches, k).map(_._3).maxOption.getOrElse(Long.MinValue))
        maxR = math.max(maxR, batchOf(rBatches, k).map(_._3).maxOption.getOrElse(Long.MinValue))
        val cand =
          if (maxL != Long.MinValue && maxR != Long.MinValue)
            (math.min(maxL, maxR) - delayMs) * 1000L
          else 0L
        wmAfter(k) = math.max(if (k == 0) 0L else wmAfter(k - 1), math.max(0L, cand))
      }
      // late filter for batch k = wmAfter(k-2) (the one-batch-lagged value)
      def lateWm(k: Int): Long = if (k < 2) 0L else wmAfter(k - 2)
      val survL = Vector.newBuilder[(Long, Long, Long, Double)]
      val survR = Vector.newBuilder[(Long, Long, Long, Double)]
      var anyLate = false
      for (k <- 0 to nB) {
        val wm = lateWm(k)
        anyLate ||= (batchOf(lBatches, k) ++ batchOf(rBatches, k))
          .exists(_._3 * 1000L < wm)
        survL ++= batchOf(lBatches, k).filter(_._3 * 1000L >= wm)
        survR ++= batchOf(rBatches, k).filter(_._3 * 1000L >= wm)
      }
      assert(anyLate, s"seed=$seed: fixture produced no late rows — weaken the delay")
      val sL = survL.result(); val sR = survR.result()
      def simulate(jt: String): Seq[(Long, Long, Long, Double)] = {
        val pairs = for {
          (lid, lk, lts, _) <- sL
          (rid, rk, rts, rv) <- sR
          if lk == rk && rts * 1000L >= lts * 1000L - beforeUs &&
            rts * 1000L <= lts * 1000L + afterUs
        } yield (lid, lk, rid, rv)
        val matchedL = pairs.map(_._1).toSet
        val matchedR = pairs.map(_._3).toSet
        val lNulls = sL.filterNot(l => matchedL(l._1))
          .map(l => (l._1, l._2, -999L, -999.0))
        val rNulls = sR.filterNot(r => matchedR(r._1))
          .map(r => (-999L, r._2, r._1, r._4))
        (jt match {
          case "inner"       => pairs
          case "left_outer"  => pairs ++ lNulls
          case "right_outer" => pairs ++ rNulls
          case "full_outer"  => pairs ++ lNulls ++ rNulls
        }).filter(_._2 >= 0L).sorted
      }
      for (jt <- Seq("inner", "left_outer", "right_outer", "full_outer")) {
        val out = StreamOps.intervalJoin(
          spark.readStream.option("maxFilesPerTrigger", 1)
            .schema(spark.read.parquet(dirL).schema).parquet(dirL),
          spark.readStream.option("maxFilesPerTrigger", 1)
            .schema(spark.read.parquet(dirR).schema).parquet(dirR),
          "ts", "rts", Seq(("k", "k")), before = beforeS, after = afterS,
          watermark = s"$delayMs milliseconds", joinType = jt)
        val qn = s"graft_ijlate_${jt}_$seed"
        val q = out.writeStream.outputMode("append").format("memory")
          .queryName(qn).start()
        val got = try {
          q.processAllAvailable()
          // empty flush batch finalizes the outer nulls the sentinel batch
          // unlocked (watermark updates at batch end, applies next batch)
          Seq.empty[(Long, Long, Timestamp, Double)].toDF("id", "k", "ts", "v")
            .write.mode("append").parquet(dirL)
          q.processAllAvailable()
          spark.table(qn).filter(col("k") >= 0L)
            .select("id", "k", "rid", "rv").collect()
            .map(r => (if (r.isNullAt(0)) -999L else r.getLong(0), r.getLong(1),
              if (r.isNullAt(2)) -999L else r.getLong(2),
              if (r.isNullAt(3)) -999.0 else r.getDouble(3))).sorted.toSeq
        } finally {
          q.stop(); StreamOps.releaseStateStores()
          spark.catalog.dropTempView(qn)
        }
        val want = simulate(jt)
        assert(got == want,
          s"seed=$seed $jt: stream ${got.size} rows vs contract ${want.size}; " +
            s"stream-only=${got.diff(want).take(3)} contract-only=${want.diff(got).take(3)}")
      }
    }
  }

  test("type mapping widens unsigned and preserves µs datetimes (SURVEY 1.2)") {
    import org.apache.spark.sql.types._
    assert(graft.api.TypeMapping.byName("uint8") == ShortType)
    assert(graft.api.TypeMapping.byName("uint64") == DecimalType(20, 0))
    assert(graft.api.TypeMapping.byName("datetime") == TimestampNTZType)
    assert(graft.api.TypeMapping.byName("time") == LongType)
    assert(graft.api.TypeMapping.byKind(22) == DecimalType(38, 9))
  }
}
