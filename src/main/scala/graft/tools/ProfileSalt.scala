package graft.tools

import graft.Sessions
import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salt-count scaling of the all-pairs skew face at 100x data (r16):
  * qd33's exact query shape over a given fixture at several `nSalts`
  * settings. The face's semantic output is quadratic in group size (ALL
  * within-language pairs — 32.0B at sf10 vs 3.2M at sf0.1), so its wall is
  * pair-enumeration-bound and the lever is PARALLELISM: the salted
  * self-join exposes #langs x nSalts buckets, each enumerating
  * |lang|^2 / nSalts pairs. The bench face pins the sf0.1 demo nSalts=8;
  * this records what the documented knob buys when sized to the volume.
  *
  * Usage: runMain graft.tools.ProfileSalt [sfDir] [salts,csv]
  */
object ProfileSalt {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val salts = (if (args.length > 1) args(1) else "8,32,128")
      .split(',').map(_.trim.toInt)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"), col("doc_id"))
    docs.count() // warm-up

    // the qd33 pipeline with ONE domain adjustment: id_sum accumulates in
    // DOUBLE. At sf10 the ids carry the copy stride (~1e10) and the
    // within-lang pair count is ~5e9/lang, so the int64 sum the bench face
    // computes exceeds 2^63 (~1e20) — ANSI mode CORRECTLY aborts rather
    // than wrap (the face's own output domain, not the join, is what
    // cannot scale; its oracle-graded SFs fit comfortably). The double
    // accumulator keeps the full per-pair arithmetic + aggregation work so
    // the probe times the operator, not the abort.
    for (n <- salts; rep <- 1 to 2) {
      spark.catalog.clearCache(); System.gc()
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      Skew.saltedSelfJoin(docs, "lang", "doc_id", nSalts = n)
        .filter(col("doc_id") < col("doc_id_b"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("doc_id") + col("doc_id_b")).cast("double")).as("id_sum"))
        .orderBy(col("lang"))
        .write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"""{"probe":"salted_pairs","sf":"$sfDir","n_salts":$n,"rep":$rep,"wall_sec":$wall%.2f,"cpu_frac":${cpu / wall}%.1f}""")
    }
    spark.stop()
  }
}
