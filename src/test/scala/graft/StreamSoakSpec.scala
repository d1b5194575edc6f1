package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.streaming.{Sessionize, StreamOps}

/** Long-horizon streaming soak (r13 directive 6). Every other streaming
  * spec drives 2–3 AvailableNow micro-batches; the 100 TB/day property —
  * state bounded by the WATERMARK HORIZON, not by stream length — is
  * asserted here over ≥60 real micro-batches of steadily advancing event
  * time. `StreamingQueryProgress.stateOperators` is the witness: once the
  * first horizon has filled, total state rows must plateau (and stay a
  * small fraction of cumulative input), while per-batch trigger cost stays
  * flat — the steady-state numbers BASELINE.md's round-14 note records.
  */
class StreamSoakSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ts(ms: Long): Timestamp = new Timestamp(base + ms)

  /** Drive `batches` micro-batches via `feed`, sampling total state rows
    * and trigger wall time after each; returns (stateRows, triggerMs). */
  private def soak(q: StreamingQuery, batches: Int)(feed: Int => Unit)
      : (Seq[Long], Seq[Double]) = {
    val rows = Seq.newBuilder[Long]
    val trig = Seq.newBuilder[Double]
    for (i <- 0 until batches) {
      feed(i)
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty) {
        rows += p.stateOperators.map(_.numRowsTotal).sum
        trig += p.durationMs.getOrDefault("triggerExecution", 0L).toDouble
      }
    }
    (rows.result(), trig.result())
  }

  /** state-rows sequence must rise to a plateau: the steady phase holds a
    * non-trivial buffer, stays within a tight band, and ends no higher
    * than its middle (growth with stream length = the bug this guards). */
  private def assertPlateau(rows: Seq[Long], warmup: Int, totalIn: Long,
                            tag: String): Unit = {
    assert(rows.length >= 50, s"$tag: want >=50 sampled batches, got ${rows.length}")
    val steady = rows.drop(warmup)
    val lo = steady.min.toDouble
    val hi = steady.max.toDouble
    assert(lo > 0, s"$tag: state empty in steady phase")
    assert(hi <= 1.6 * lo,
      s"$tag: steady state not a plateau: min=$lo max=$hi rows=$rows")
    // no trend: the last quarter's mean must not exceed the first
    // steady quarter's mean by more than the band already allows
    val qn = steady.length / 4
    val first = steady.take(qn).map(_.toDouble).sum / qn
    val last = steady.takeRight(qn).map(_.toDouble).sum / qn
    assert(last <= 1.3 * first,
      s"$tag: state trending up: first-quarter mean=$first last=$last")
    // bounded by horizon, not stream length: a small fraction of input
    assert(hi <= totalIn / 4.0,
      s"$tag: state $hi not << cumulative input $totalIn")
  }

  /** Trigger cost must be FLAT, not just logged (ADVICE r14): a state-store
    * compaction-debt trend would previously pass silently. Quarter MEDIANS
    * (not means) so one ambient-load straggler batch can't fail the run;
    * the band is wider than assertPlateau's because trigger wall time on a
    * shared box is noisier than state-row counts — a real debt trend grows
    * monotonically and blows well past 1.75x by batch 60. */
  private def assertTriggerFlat(trig: Seq[Double], warmup: Int,
                                tag: String): Unit = {
    val steady = trig.drop(warmup)
    val qn = steady.length / 4
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val first = med(steady.take(qn))
    val last = med(steady.takeRight(qn))
    assert(last <= math.max(1.75 * first, first + 200.0),
      s"$tag: trigger cost trending up: first-quarter median=$first ms " +
        s"last=$last ms over ${trig.length} batches")
  }

  test("soak: interval-join state plateaus at the watermark horizon (60 micro-batches)") {
    // per batch: 1 minute of event time, 8 keys × (3 left + 6 right) rows.
    // horizon = before(5m) + wm delay(2m) ≈ 7 batches of buffered traffic;
    // 60 batches ingest ~8.6x more than the horizon can hold.
    val l = MemoryStream[(Long, Long, Timestamp, Double)]
    val r = MemoryStream[(Long, Long, Timestamp, Double)]
    val out = StreamOps.intervalJoin(
      l.toDF().toDF("id", "k", "ts", "v"),
      r.toDF().toDF("rid", "k", "rts", "rv"),
      "ts", "rts", by = Seq(("k", "k")),
      before = "5m", after = "0s", watermark = "2 minutes")
    val q = out.writeStream.outputMode("append").format("noop").start()
    val batches = 60
    val (rows, trig) = try {
      soak(q, batches) { i =>
        val t0 = i * 60000L
        l.addData((0 until 8).flatMap(k => (0 until 3).map(j =>
          ((i * 100 + k * 10 + j).toLong, k.toLong, ts(t0 + j * 17000L), 1.0))))
        r.addData((0 until 8).flatMap(k => (0 until 6).map(j =>
          ((i * 100 + k * 10 + j).toLong, k.toLong, ts(t0 + j * 9000L), 2.0))))
        ()
      }
    } finally { q.stop(); StreamOps.releaseStateStores() }
    assertPlateau(rows, warmup = 15, totalIn = batches * 8L * 9L,
      tag = "interval-join")
    assertTriggerFlat(trig, warmup = 15, tag = "interval-join")
    val steadyTrig = trig.drop(15).sorted.apply(trig.drop(15).length / 2)
    info(s"interval-join soak: steady state rows ${rows.drop(15).max}, " +
      s"median trigger $steadyTrig ms over ${rows.length} batches")
  }

  test("soak: sessionize state plateaus at the watermark horizon (60 micro-batches)") {
    implicit val s = spark
    // per batch: 1 minute of event time, 8 users × 4 events inside its
    // first 40 s — the 50 s intra-batch silence exceeds the 45 s gap, so
    // every user closes a session ~every batch; pending buffer bounded by
    // the 90 s watermark delay, open-session state by one per user.
    val in = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessions(in.toDS(), gap = "45s",
      watermarkDelay = "90 seconds")
    val q = out.toDF().writeStream.outputMode("append").format("noop").start()
    val batches = 60
    val (rows, trig) = try {
      soak(q, batches) { i =>
        val t0 = i * 60000L
        in.addData((0 until 8).flatMap(u => (0 until 4).map(j =>
          Sessionize.Event(u.toLong, ts(t0 + j * 13000L), 1.0))))
        ()
      }
    } finally { q.stop(); StreamOps.releaseStateStores() }
    assertPlateau(rows, warmup = 15, totalIn = batches * 8L * 4L,
      tag = "sessionize")
    assertTriggerFlat(trig, warmup = 15, tag = "sessionize")
    val steadyTrig = trig.drop(15).sorted.apply(trig.drop(15).length / 2)
    info(s"sessionize soak: steady state rows ${rows.drop(15).max}, " +
      s"median trigger $steadyTrig ms over ${rows.length} batches")
  }
}
