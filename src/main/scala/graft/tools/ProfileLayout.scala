package graft.tools

import graft.{MetricsProbe, Sessions}
import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Layout-write scaling probe at the AUTO file sizing (r16 directive 3):
  * q81's full z-order cycle — rank-quantized write + distributed footer
  * stats + clustering reduction — but written the way production would:
  * `targetFiles` omitted (auto: max(session parallelism, input/2 blocks))
  * and the default 128 MB row groups, instead of the bench face's pinned
  * `targetFiles = 4` / 16 KiB demo geometry. The r15 sf10 probe spilled
  * 418 MB precisely because the demo pin put ~15M rows in each of four
  * sorters; this records what the self-sized write costs at the same
  * volume — the claim is zero spill at the auto setting.
  *
  * Prints one JSON line per rep with wall/tasks/shuffle/spill from the
  * same MetricsProbe counters the bench gate uses.
  *
  * Usage: runMain graft.tools.ProfileLayout [sfDir] [reps]
  */
object ProfileLayout {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sc = spark.sparkContext
    val counters = MetricsProbe.install(sc)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm-up

    // q81's exact input shape (two masked dims + a payload column)
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      pmod(col("l_partkey").cast("long"), lit(1024L)).as("x"),
      pmod(col("l_suppkey").cast("long"), lit(1024L)).as("y"),
      col("l_orderkey"))
    val auto = Layout.autoTargetFiles(
      base.queryExecution.optimizedPlan.stats.sizeInBytes, 128L << 20,
      spark.sessionState.conf.numShufflePartitions)
    val dir = java.nio.file.Files.createTempDirectory("graft_layout_auto").toString

    for (rep <- 1 to reps) {
      spark.catalog.clearCache(); System.gc()
      org.apache.spark.graft.ListenerBusDrain.drain(sc)
      val s0 = counters.snap()
      val t0 = System.nanoTime()
      Layout.writeZOrderedByRank(base, Seq("x", "y"), bits = 10, s"$dir/z")
      val stats = Layout.rowGroupStats(spark, s"$dir/z", Seq("x", "y"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cf = Layout.clusteringFactor(stats).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      stats.unpersist()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusDrain.drain(sc)
      val d = counters.snap() - s0
      val files = spark.read.parquet(s"$dir/z").inputFiles.length
      println(f"""{"probe":"layout_auto","rep":$rep,"sf":"$sfDir","auto_target_files":$auto,"files_written":$files,"wall_sec":$wall%.2f,"tasks":${d.tasks},"shuffle_mb":${d.shuffleBytes / 1e6}%.1f,"spill_mb":${d.spilledBytes / 1e6}%.1f,"cf_x":${cf.getOrElse("x", -1.0)}%.3f,"cf_y":${cf.getOrElse("y", -1.0)}%.3f}""")
    }
    spark.stop()
  }
}
