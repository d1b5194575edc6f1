package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** One-off reproduction harness for the sf1 q45/q46 global-rolling
  * divergence found by the r17 cross-scale ORACLE pass (18/21 faces
  * hash-exact at sf1; q45 showed one spurious window restart at a single
  * range-partition boundary). Prints the per-partition bounds/offsets the
  * context-duplication machinery derives, and re-runs the q45 plan
  * repeatedly to test determinism. Not part of the library surface.
  *
  * Usage: runMain graft.tools.DebugRollingGlobal [sfDir] [reps]
  */
object DebugRollingGlobal {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val orders = graft.SparkEntry.t(spark, sfDir, "orders")
    println(s"[dbg] orders rows = ${orders.count()}")

    // the exact q45 shape — roll_sum over o_totalprice matters: it widens
    // the data-path exchange vs the key-only bounds-path exchange, which
    // is the suspected AQE-coalescing divergence trigger
    def q45 = graft.operators.Rolling.fixedGlobal(
        orders, "25i", Seq(col("o_orderkey")),
        Seq("roll_sum" -> (w => sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")),
            "roll_n" -> (w => count(lit(1)).over(w))))
      .select(col("o_orderkey"), col("roll_sum"), col("roll_n"))

    for (rep <- 1 to reps) {
      val shorts = q45.filter(col("roll_n") < 25)
        .orderBy(col("o_orderkey"))
        .collect()
      val restarts = shorts.map(_.getLong(0)).filter(_ > 24)
      println(s"[dbg] rep$rep rows with roll_n<25: ${shorts.length} " +
        s"(expect 24); spurious restart keys: ${restarts.take(5).mkString(",")}")
    }

    // the machinery's own view: partition bounds after the range exchange
    val parted = orders.repartitionByRange(col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .withColumn("__pid", spark_partition_id())
    val bounds = parted.groupBy("__pid")
      .agg(count(lit(1)).as("cnt"), min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .orderBy("__pid")
    bounds.collect().foreach { r =>
      println(s"[dbg] pid=${r.getInt(0)} cnt=${r.getLong(1)} lo=${r.getLong(2)} hi=${r.getLong(3)}")
    }
    spark.stop()
  }
}
