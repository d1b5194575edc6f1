package graft.tools

import graft.Sessions
import graft.operators.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order pruning measured at sf1 with REALISTIC row-group sizes (r13
  * directive 7): LayoutSpec proves the property at 16-64 KiB groups on
  * sf0.1; this records, at ~6M rows and 1-4 MiB groups (the knob setting a
  * real lakehouse uses), what fraction of row groups a filter on each
  * interleaved column — and on both at once — can skip, for the
  * rank-quantized Z layout vs a single-column-sort control. Skipping is
  * counted from the same footer min/max stats the parquet reader prunes
  * with ([[Layout.rowGroupStats]]), plus the reader's own surfaced-row
  * metric as corroboration.
  *
  * Usage: runMain graft.tools.ProfileZorder [sfDir] [blockMiB]
  */
object ProfileZorder {

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numOutputRows").value
    }.sum
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_sf1")
    val blockMiB = if (args.length > 1) args(1).toLong else 2L
    val spark: SparkSession = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // x/y must be INDEPENDENT for the control to be honest: orderkey vs
    // partkey are (suppkey is partkey-derived in TPC-H), and the ScaleUp
    // copy stride is collapsed so a sort on one cannot accidentally
    // cluster the other through shared per-copy key ranges
    // FULL row width carried: pruning granularity is bytes-per-group /
    // bytes-per-row, and a 3-column projection compresses so well that 2
    // MiB groups each hold ~1M rows — the realistic shape is the whole
    // fact row (as a real table would be laid out), giving tens of rows
    // of payload per group at the same byte knob
    val li = spark.read.parquet(s"$src/lineitem.parquet")
      .withColumn("x", col("l_orderkey").cast("long") % ScaleUp.Stride)
      .withColumn("y", col("l_partkey").cast("long") % ScaleUp.Stride)
    val total = li.count()
    val root = java.nio.file.Files.createTempDirectory("graft_zorder_sf1").toString
    val zPath = s"$root/z"; val xPath = s"$root/xsort"
    val block = blockMiB << 20
    Layout.writeZOrderedByRank(li, Seq("x", "y"), bits = 10, zPath,
      targetFiles = 8, blockBytes = block)
    li.withColumn("__s", col("x"))
      .repartitionByRange(8, col("__s")).sortWithinPartitions(col("__s"))
      .drop("__s")
      .write.mode("overwrite").option("parquet.block.size", block).parquet(xPath)

    // ~1% bands in each column's value space, from its own quantiles
    def band(c: String): (Long, Long) = {
      val q = li.stat.approxQuantile(c, Array(0.495, 0.505), 0.0005)
      (math.ceil(q(0)).toLong, math.floor(q(1)).toLong)
    }
    val (xl, xh) = band("x"); val (yl, yh) = band("y")

    for ((tag, path) <- Seq(("zorder_rank", zPath), ("xsort_control", xPath))) {
      val stats = Layout.rowGroupStats(spark, path, Seq("x", "y"))
        .groupBy(col("file"), col("row_group"))
        .pivot("column", Seq("x", "y"))
        .agg(min(struct(col("min_value"), col("max_value"))).as("mm"))
        .select(col("x.min_value").as("xmin"), col("x.max_value").as("xmax"),
          col("y.min_value").as("ymin"), col("y.max_value").as("ymax"))
        .collect()
      val n = stats.length
      def hit(r: org.apache.spark.sql.Row, lo: Long, hi: Long, i: Int) =
        r.getDouble(i + 1) >= lo && r.getDouble(i) <= hi
      val hitX = stats.count(r => hit(r, xl, xh, 0))
      val hitY = stats.count(r => hit(r, yl, yh, 2))
      val hitBoth = stats.count(r => hit(r, xl, xh, 0) && hit(r, yl, yh, 2))
      val sx = scanRows(spark.read.parquet(path).filter(col("x").between(xl, xh)))
      val sy = scanRows(spark.read.parquet(path).filter(col("y").between(yl, yh)))
      val sb = scanRows(spark.read.parquet(path)
        .filter(col("x").between(xl, xh) && col("y").between(yl, yh)))
      println(f"""{"layout":"$tag","row_groups":$n,"block_mib":$blockMiB,"rows":$total,""" +
        f""""groups_hit":{"x":$hitX,"y":$hitY,"both":$hitBoth},""" +
        f""""skip_frac":{"x":${1.0 - hitX.toDouble / n}%.3f,"y":${1.0 - hitY.toDouble / n}%.3f,"both":${1.0 - hitBoth.toDouble / n}%.3f},""" +
        f""""surfaced_rows":{"x":$sx,"y":$sy,"both":$sb}}""")
    }
    spark.stop()
  }
}
