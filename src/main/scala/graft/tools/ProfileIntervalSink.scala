package graft.tools

import graft.Sessions
import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Cross-scale evidence for the OUTER interval-join finalization paths
  * (r16 verdict item 1). q78/q79/q82's sf1 refs were honestly REMOVED in
  * r16 when the failed-rep ledger exposed their historical "readings" as
  * drive-then-abort walls at the memory-sink oracle harness's 100k
  * `localize` guard — a bound of the HARNESS, not of the faces. This tool
  * drives the identical outer joins through the production sink
  * (`StreamOps.sinkFileStream`: append mode, checkpointed, exactly-once,
  * never materializes on the driver — the reference's streaming-sink
  * contract, io.rs:391-479), so the outer-null finalization machinery —
  * the most state-intensive streaming path in the repo — gets real
  * >sf0.1 walls.
  *
  * Correctness is checked FILE-side, two ways:
  *  - in-tool: row count + an order-independent checksum (sum of xxhash64
  *    over every column's string form, nulls marked) of the sink output vs
  *    the BATCH range join of the same inputs. The batch twin runs a
  *    different physical execution (sort-merge range join vs
  *    StreamingSymmetricHashJoin + watermark finalization), so agreement
  *    is evidence, not tautology.
  *  - driver-side: `tools/check_ij_sink.py` re-derives the same join in
  *    DuckDB from the fixture parquet and diffs the sink output row-set
  *    exactly — the same independent-engine truth the Verify oracle uses.
  *
  * Usage: runMain graft.tools.ProfileIntervalSink [sfDir] [reps]
  * Prints one `{"metric":"ij_sink",...}` JSON line per (joinType, rep) and
  * leaves the LAST rep's fixture + sink dirs printed for the python check.
  */
object ProfileIntervalSink {

  /** (row count, order-independent checksum) of a frame: sum over rows of
    * xxhash64(all columns as strings, sorted by name, nulls marked) —
    * accumulated in decimal(38,0) so ANSI mode cannot overflow-abort. */
  private def summarize(df: DataFrame): (Long, String) = {
    val cols = df.columns.toSeq.sorted.map(c =>
      coalesce(col(c).cast("string"), lit("␀")))
    val row = df.agg(count(lit(1)),
      sum(xxhash64(cols: _*).cast("decimal(38,0)"))).head()
    (row.getLong(0),
      Option(row.getDecimal(1)).map(_.toBigInteger.toString).getOrElse("0"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm-up

    // q78-family fixtures: purchases/clicks + a far-future sentinel on BOTH
    // streams (the global watermark is the min across sources; the sentinel
    // advances it past every real window so outer nulls can finalize)
    val ev = graft.SparkEntry.t(spark, sfDir, "events")
    val maxTs = ev.agg(max(col("ts").cast("timestamp"))).head.getTimestamp(0)
    val farFuture = new java.sql.Timestamp(maxTs.getTime + 365L * 86400000L)
    val root = java.nio.file.Files.createTempDirectory("graft_ijsink").toString
    val dirL = s"$root/left"
    val dirR = s"$root/right"
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").as("ts"), col("value"))
      .unionByName(spark.range(1).select(lit(-1L).as("event_id"),
        lit(-1L).as("user_id"), lit(farFuture).cast("timestamp").as("ts"),
        lit(0.0).as("value")))
      .write.mode("overwrite").parquet(dirL)
    ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").cast("timestamp").as("click_ts"),
        col("value").as("click_value"))
      .unionByName(spark.range(1).select(lit(-1L).as("click_id"),
        lit(-1L).as("user_id"),
        lit(farFuture).cast("timestamp").as("click_ts"),
        lit(0.0).as("click_value")))
      .write.mode("overwrite").parquet(dirR)
    val lS = spark.read.parquet(dirL).schema
    val rS = spark.read.parquet(dirR).schema
    println(s"[ij-sink] fixtures: left=$dirL right=$dirR " +
      s"purchases=${spark.read.parquet(dirL).count()} clicks=${spark.read.parquet(dirR).count()}")

    def join(l: DataFrame, r: DataFrame, jt: String): DataFrame =
      StreamOps.intervalJoin(l, r, "ts", "click_ts",
        by = Seq(("user_id", "user_id")), before = "1d", after = "0s",
        watermark = "0 seconds", joinType = jt)

    for (jt <- Seq("left_outer", "right_outer", "full_outer")) {
      // batch truth once per join type (sentinel rows filtered like the
      // q78/q79/q82 faces: every real key is non-negative)
      val batch = join(spark.read.parquet(dirL), spark.read.parquet(dirR), jt)
        .filter(col("user_id") >= 0L)
      val (bn, bh) = summarize(batch)
      for (rep <- 1 to reps) {
        val outDir = s"$root/out_${jt}_$rep"
        val ckpt = s"$root/ckpt_${jt}_$rep"
        // flush files are deleted after each rep so every rep (and every
        // join type's batch truth) sees the identical fixture listing
        def ls: Set[java.nio.file.Path] = {
          val st = java.nio.file.Files.list(java.nio.file.Paths.get(dirL))
          try { import scala.jdk.CollectionConverters._; st.iterator().asScala.toSet }
          finally st.close()
        }
        val preFlush = ls
        val t0 = System.nanoTime()
        val q = StreamOps.sinkFileStream(
          join(spark.readStream.schema(lS).parquet(dirL),
            spark.readStream.schema(rS).parquet(dirR), jt),
          "parquet", outDir, ckpt, Trigger.ProcessingTime(0L))
        var stateRows = -1L
        var stateMb = 0.0
        val flushed = try {
          q.processAllAvailable()
          // empty flush batch (the drainStream choreography): the watermark
          // advanced at the previous batch's end; this batch fires the
          // eviction that emits the outer nulls through the sink
          spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), lS)
            .write.mode("append").parquet(dirL)
          q.processAllAvailable()
          q.recentProgress.flatMap(_.stateOperators.headOption).foreach { so =>
            stateRows = math.max(stateRows, so.numRowsTotal)
            stateMb = math.max(stateMb, so.memoryUsedBytes / 1e6)
          }
        } finally {
          q.stop()
          StreamOps.releaseStateStores()
          (ls -- preFlush).foreach(p =>
            try java.nio.file.Files.deleteIfExists(p)
            catch { case _: java.io.IOException => () })
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val sink = spark.read.parquet(outDir).filter(col("user_id") >= 0L)
        val (sn, sh) = summarize(sink)
        val ok = sn == bn && sh == bh
        println(f"""{"metric":"ij_sink","sf":"$sfDir","join":"$jt","rep":$rep,"wall_sec":${math.rint(wall * 100) / 100}%s,"rows":$sn,"batch_rows":$bn,"checksum_match":$ok,"state_rows_max":$stateRows,"state_mb_max":${math.rint(stateMb * 10) / 10}%s,"out":"$outDir"}""")
        require(ok, s"ij_sink $jt rep$rep: sink output != batch truth " +
          s"(rows $sn vs $bn, checksum ${sh.take(12)} vs ${bh.take(12)})")
        val _ = flushed
      }
    }
    spark.stop()
  }
}
