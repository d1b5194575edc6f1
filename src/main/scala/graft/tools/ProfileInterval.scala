package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** One-off cost decomposition of the q77/q78/q79 stream-stream interval
  * join faces (round-12 directive 2): separates (a) plain batch range-join
  * cost, (b) fixed micro-batch machinery (a stateless streaming
  * passthrough over the same sources), and (c) the symmetric-hash-join
  * drive itself, with per-batch durations and state-store rows/bytes from
  * the StreamingQueryProgress events. Not part of the library surface — a
  * measurement harness kept under tools/ for reproducibility.
  *
  * Usage: runMain graft.tools.ProfileInterval [sfDir]
  */
object ProfileInterval {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.streaming.StreamOps
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm-up

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ij-profile] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // q77's exact inputs (no sentinels — inner join needs none)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val dirL = java.nio.file.Files.createTempDirectory("graft_ijp_l").toString
    val dirR = java.nio.file.Files.createTempDirectory("graft_ijp_r").toString
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .write.mode("overwrite").parquet(dirL)
    ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
      .write.mode("overwrite").parquet(dirR)
    val lS = spark.read.parquet(dirL).schema
    val rS = spark.read.parquet(dirR).schema
    println(s"[ij-profile] purchases=${spark.read.parquet(dirL).count()} " +
      s"clicks=${spark.read.parquet(dirR).count()}")

    for (rep <- 1 to 3) {
      // (a) the batch twin — what the same range join costs without any
      // streaming machinery
      timed(s"rep$rep batch interval join (noop sink)") {
        StreamOps.intervalJoin(
            spark.read.parquet(dirL), spark.read.parquet(dirR),
            "ts", "click_ts", Seq(("user_id", "user_id")),
            before = "1d", after = "0s")
          .write.mode("overwrite").format("noop").save()
      }
      // (b) machinery floor: stateless streaming passthrough over BOTH
      // sources, memory sink — pays source listing, micro-batch planning,
      // offset log, sink, but zero join state
      timed(s"rep$rep stateless 2-source stream passthrough") {
        val s1 = spark.readStream.schema(lS).parquet(dirL)
          .select(col("event_id"))
        val s2 = spark.readStream.schema(rS).parquet(dirR)
          .select(col("click_id").as("event_id"))
        val q = s1.unionByName(s2).writeStream.outputMode("append")
          .format("memory").queryName("ijp_passthrough").start()
        try q.processAllAvailable() finally {
          q.stop(); StreamOps.releaseStateStores()
          spark.catalog.dropTempView("ijp_passthrough")
        }
      }
      // (c) the streaming interval join drive (q77 shape, inner);
      // SPARK_GRAFT_IJ_ROCKSDB=1 additionally drives the IDENTICAL join in
      // a RocksDB child session — the off-heap-state comparison that
      // matters once heap-resident state reaches GBs (sf10 measured
      // old-gen ~3 GB under the default provider, BASELINE r15)
      def drive(sess: org.apache.spark.sql.SparkSession, label: String): Unit = {
        val q = StreamOps.intervalJoin(
            sess.readStream.schema(lS).parquet(dirL),
            sess.readStream.schema(rS).parquet(dirR),
            "ts", "click_ts", Seq(("user_id", "user_id")),
            before = "1d", after = "0s", watermark = "0 seconds")
          .writeStream.outputMode("append").format("memory")
          .queryName("ijp_join").start()
        try {
          timed(s"rep$rep streaming interval join drive$label") {
            q.processAllAvailable()
          }
          q.recentProgress.foreach { p =>
            val so = p.stateOperators.headOption
            println(f"[ij-profile]   batch=${p.batchId}%2d in=${p.numInputRows}%7d " +
              f"trigger=${p.durationMs.getOrDefault("triggerExecution", 0L)}%6d ms " +
              f"addBatch=${p.durationMs.getOrDefault("addBatch", 0L)}%6d ms " +
              f"stateRows=${so.map(_.numRowsTotal).getOrElse(-1L)}%8d " +
              f"stateMB=${so.map(_.memoryUsedBytes).getOrElse(0L) / 1e6}%7.1f " +
              s"wm=${Option(p.eventTime.get("watermark")).getOrElse("-")}")
          }
        } finally {
          q.stop(); sess.catalog.dropTempView("ijp_join")
          StreamOps.releaseStateStores()
        }
      }
      drive(spark, "")
      if (sys.env.get("SPARK_GRAFT_IJ_ROCKSDB").contains("1"))
        // snapshot mode pinned explicitly: changelog became the library
        // default in r17, and this leg exists to measure the legacy axis
        StreamOps.withRocksDbStateStore(spark, changelogCheckpointing = false)(
          drive(_, " [rocksdb+snapshot]"))
      // r16 directive 5: the changelog-checkpointing axis — same RocksDB
      // drive with per-batch changelog commits instead of full-SST
      // snapshot uploads (the large-state production setting; snapshots
      // move to the background maintenance path)
      if (sys.env.get("SPARK_GRAFT_IJ_ROCKSDB_CHANGELOG").contains("1"))
        StreamOps.withRocksDbStateStore(spark, changelogCheckpointing = true)(
          drive(_, " [rocksdb+changelog]"))
    }
    spark.stop()
  }
}
