package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Empirical pin of the streaming symmetric hash join's LATE-INPUT
  * contract, the semantics the FidelitySpec late-data fuzz simulates:
  *  - the late filter for micro-batch k uses the PREVIOUS batch's
  *    watermark (derived from data through batch k-2) — Spark updates the
  *    watermark at batch start and late-filters with the pre-update value;
  *  - it is the PLAIN event-time predicate, applied symmetrically on both
  *    sides (the join condition's before/after bounds shape EVICTION, not
  *    input admission) — probes at -25..-1 min drop on BOTH sides despite
  *    before=20m/after=10m;
  *  - a row AT the watermark exactly is dropped (inclusive boundary).
  * Survival signal: a surviving unmatched row must emit a full-outer null
  * at finalization; a late-dropped one cannot. If a Spark upgrade shifts
  * any of this, this spec fails before the fuzz's simulation silently
  * diverges. */
class WmProbeSpec extends SparkSpec {
  import spark.implicits._

  test("probe per-side late-drop bounds") {
    import graft.streaming.StreamOps
    val t0 = Timestamp.valueOf("2024-03-01 12:00:00").getTime
    def ts(minOff: Int) = new Timestamp(t0 + minOff * 60000L)
    // probes at minute offsets relative to the anchor watermark (12:00)
    val offs = Seq(-25, -21, -19, -15, -11, -9, -5, -1, 0, 1, 5)
    for (side <- Seq("left", "right")) {
      val dirL = java.nio.file.Files.createTempDirectory("graft_wmp_l").toString
      val dirR = java.nio.file.Files.createTempDirectory("graft_wmp_r").toString
      def writeB(dir: String, k: Int, rows: Seq[(Long, Long, Timestamp, Double)],
                 cols: (String, String, String, String)): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("graft_wmp_t").toString
        rows.toDF(cols._1, cols._2, cols._3, cols._4)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
          .filter(p => p.getFileName.toString.startsWith("part-")).findFirst().get()
        val dst = java.nio.file.Paths.get(dir, f"b$k%02d.parquet")
        java.nio.file.Files.move(part, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + k * 60000L))
      }
      val lc = ("id", "k", "ts", "v"); val rc = ("rid", "k", "rts", "rv")
      // batch 0: non-matching anchors on both sides at 12:00 → wm = 12:00
      writeB(dirL, 0, Seq((900L, 900L, ts(0), 0.0)), lc)
      writeB(dirR, 0, Seq((901L, 901L, ts(0), 0.0)), rc)
      // batch 1: filler (late-filter watermark lags one batch behind)
      writeB(dirL, 1, Seq((903L, 903L, ts(0), 0.0)), lc)
      writeB(dirR, 1, Seq((904L, 904L, ts(0), 0.0)), rc)
      // batch 2: probes on ONE side, nothing matching anywhere
      if (side == "left") {
        writeB(dirL, 2, offs.zipWithIndex.map { case (o, i) =>
          ((i + 1).toLong, (i + 1).toLong, ts(o), o.toDouble) }, lc)
        writeB(dirR, 2, Seq((902L, 902L, ts(0), 0.0)), rc)
      } else {
        writeB(dirR, 2, offs.zipWithIndex.map { case (o, i) =>
          ((i + 1).toLong, (i + 1).toLong, ts(o), o.toDouble) }, rc)
        writeB(dirL, 2, Seq((902L, 902L, ts(0), 0.0)), lc)
      }
      // batch 3: far-future sentinels both sides → everything finalizes
      writeB(dirL, 3, Seq((999L, 999L, ts(600), 0.0)), lc)
      writeB(dirR, 3, Seq((998L, 998L, ts(600), 0.0)), rc)
      val out = StreamOps.intervalJoin(
        spark.readStream.option("maxFilesPerTrigger", 1)
          .schema(spark.read.parquet(dirL).schema).parquet(dirL),
        spark.readStream.option("maxFilesPerTrigger", 1)
          .schema(spark.read.parquet(dirR).schema).parquet(dirR),
        "ts", "rts", Seq(("k", "k")), before = "20m", after = "10m",
        watermark = "0 seconds", joinType = "full_outer")
      val qn = s"graft_wmp_$side"
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName(qn).start()
      try {
        q.processAllAvailable()
        Seq.empty[(Long, Long, Timestamp, Double)].toDF("id", "k", "ts", "v")
          .write.mode("append").parquet(dirL)
        q.processAllAvailable()
        val survived =
          if (side == "left")
            spark.table(qn).filter(col("id").between(1, 100)).select("id")
              .collect().map(_.getLong(0)).sorted.toSeq
          else
            spark.table(qn).filter(col("rid").between(1, 100)).select("rid")
              .collect().map(_.getLong(0)).sorted.toSeq
        val verdicts = offs.zipWithIndex.map { case (o, i) =>
          o -> survived.contains((i + 1).toLong) }
        println(s"[wmprobe] side=$side  " + verdicts.map { case (o, k) =>
          s"$o:${if (k) "KEEP" else "drop"}" }.mkString("  "))
        // contract: drop iff offset <= 0 (at-or-below the lagged watermark),
        // identically on both sides
        verdicts.foreach { case (o, kept) =>
          assert(kept == (o > 0), s"side=$side offset=$o kept=$kept — " +
            "the late-input contract moved; update the FidelitySpec simulation")
        }
      } finally {
        q.stop(); StreamOps.releaseStateStores()
        spark.catalog.dropTempView(qn)
      }
    }
  }
}
