package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: curve correctness vs brute force, and the property the
  * layout exists for — measured row-group pruning on BOTH interleaved
  * columns, vs a single-column-sorted control. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def brute(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    var z = 0L
    for (j <- vals.indices; i <- 0 until bits)
      z |= ((vals(j) >> i) & 1L) << (i * n + j)
    z
  }

  test("zValue == brute-force interleave (2 and 3 cols, random, boundary values)") {
    val r = new scala.util.Random(42)
    val rows = Seq.fill(200)((r.nextInt(1024).toLong, r.nextInt(1024).toLong,
      r.nextInt(64).toLong)) ++
      Seq((0L, 0L, 0L), (1023L, 1023L, 63L), (1L, 0L, 0L), (0L, 1L, 63L))
    val df = rows.toDF("a", "b", "c")
    val got2 = df.select(col("a"), col("b"),
        Layout.zValue(Seq(col("a"), col("b")), 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got2.foreach { case (a, b, z) =>
      assert(z == brute(Seq(a, b), 10), s"2-col ($a,$b): $z")
    }
    val got3 = df.select(col("a"), col("b"), col("c"),
        Layout.zValue(Seq(col("a"), col("b"), col("c")), 6).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got3.foreach { case (a, b, c, z) =>
      assert(z == brute(Seq(a & 63, b & 63, c), 6), s"3-col ($a,$b,$c): $z")
    }
    // values beyond 2^bits alias onto their low bits, never corrupt others
    val wide = Seq((1025L, 7L)).toDF("a", "b")
      .select(Layout.zValue(Seq(col("a"), col("b")), 10).as("z"))
      .as[Long].head()
    assert(wide == brute(Seq(1025L & 1023L, 7L), 10))
  }

  /** Rows the parquet reader actually surfaced (post row-group pruning,
    * pre post-scan filter). */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.sum
  }

  test("Z-ordered layout prunes row groups for filters on EITHER column") {
    // 120k rows, two INDEPENDENT bounded dims (xxhash64 streams — two
    // hashBucket salts would be affine-related images of the same id and
    // leak accidental pruning into the single-sort control)
    val base = spark.range(120000).select(
      col("id"),
      pmod(xxhash64(lit("x"), col("id")), lit(1024L)).as("x"),
      pmod(xxhash64(lit("y"), col("id")), lit(1024L)).as("y"))
    val root = java.nio.file.Files.createTempDirectory("graft_zord").toString
    val zPath = s"$root/z"; val xPath = s"$root/xsort"
    // tiny row groups (64 KiB) so toy data spans many groups per file
    Layout.writeZOrdered(base, Seq("x", "y"), bits = 10, zPath,
      targetFiles = 4, blockBytes = 64L << 10)
    base.withColumn("__s", col("x"))
      .repartitionByRange(4, col("__s")).sortWithinPartitions(col("__s"))
      .drop("__s")
      .write.mode("overwrite").option("parquet.block.size", 64L << 10).parquet(xPath)
    def narrow(path: String, c: String) =
      scanRows(spark.read.parquet(path).filter(col(c) >= 100 && col(c) <= 119))
    val total = 120000L
    // x-sorted control: perfect on x, useless on y (reads ~everything)
    assert(narrow(xPath, "x") < total / 4, s"x-sort on x: ${narrow(xPath, "x")}")
    assert(narrow(xPath, "y") > (total * 3) / 4, s"x-sort on y: ${narrow(xPath, "y")}")
    // z-order: prunes on BOTH dimensions (a ~2% selective band on either
    // axis must skip well over half the corpus at this group granularity)
    val zx = narrow(zPath, "x"); val zy = narrow(zPath, "y")
    assert(zx < total / 2, s"z-order on x surfaced $zx of $total")
    assert(zy < total / 2, s"z-order on y surfaced $zy of $total")
    // and the results themselves are identical to the unpruned read
    val expect = base.filter(col("x").between(100, 119)).count()
    assert(spark.read.parquet(zPath).filter(col("x").between(100, 119)).count() == expect)
  }
}
