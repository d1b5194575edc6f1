package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // reps >= 2: the first rep absorbs first-touch JIT/codegen for the
    // query's expression classes (round-4 adjudication measured recorded
    // cold outliers at 10-17x the warm cost - qd16 19.6s vs 0.65s warm);
    // the reported per-query number is the MIN across reps, the plan's
    // actual cost, with the cold first run kept alongside for reference
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
    val spark = Sessions.local(cpus)
    // one warm-up action so JVM/codegen startup isn't billed to the first query
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // optional comma-separated name filter for targeted A/B runs; the full
    // suite (empty filter) stays the artifact of record
    val only = sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "").split(',').map(_.trim).filter(_.nonEmpty).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty)
      System.err.println(s"[bench] WARNING: unknown names in SPARK_GRAFT_BENCH_ONLY " +
        s"(selected nothing): ${unknown.toSeq.sorted.mkString(", ")}")
    val selected = if (only.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(kv => only(kv._1))
    // SPARK_GRAFT_BENCH_NO_CLEAR=1 runs the suite WITHOUT the per-rep
    // clearCache/GC hygiene — the adversarial long-lived-session shape
    // (round 6's driver harness measured qd41 at 135 s under accumulated
    // cache pressure vs 7 s isolated). With the round-7 release contract
    // (SCALE_CONTRACTS.md "Cache lifecycle") queries retain nothing, so
    // this mode should now track the hygienic numbers; it exists to PROVE
    // that, not as a reporting mode.
    val noClear = sys.env.get("SPARK_GRAFT_BENCH_NO_CLEAR").contains("1")
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until reps).map { _ =>
        // isolate reps AND queries: operators persist internals (signatures,
        // edge lists, IVF cells) that nothing unpersists once the query's
        // plan is abandoned. Clearing per rep means every rep pays the full
        // plan cost against a clean storage pool - what the query would
        // cost as a job - rather than re-reading the previous rep's cache.
        if (!noClear) {
          spark.catalog.clearCache()
          // Spark's ContextCleaner frees shuffle files and broadcast blocks
          // only after their driver-side handles are GC'd; without an
          // explicit GC the suite accumulates dead state and later queries
          // measure the memory pressure of earlier ones (observed 1.5-4x
          // inflation vs running the same query in isolation)
          System.gc()
        }
        val t0 = System.nanoTime()
        // noop sink forces full materialization of every output column
        // (count() would let Catalyst prune the projections being measured)
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min, times.head)
    }
    def jmap(f: ((String, Double, Double)) => Double) =
      results.map { r => "\"" + r._1 + "\":" + f(r) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val coldTotal = results.map(_._3).sum
    // headline metric is named for its semantics (sum of per-query
    // min-across-reps) so trend consumers can't silently mix it with the
    // pre-reps single-run "total"; schema_version marks the methodology
    // a filtered run is marked in the artifact so a partial total can never
    // be mistaken for the suite total by a trend consumer
    val onlyField =
      (if (noClear) "\"no_clear\":true," else "") +
        (if (only.isEmpty) ""
         else only.toSeq.sorted.map("\"" + _ + "\"").mkString("\"only\":[", ",", "],"))
    val json = s"""{"metric":"total_warm_min","value":$total,"unit":"sec","schema_version":2,$onlyField"queries":${jmap(_._2)},"queries_cold":${jmap(_._3)},"cold_total":$coldTotal,"reps":$reps,"sf":"$sfDir"}"""
    // The driver's stdout capture truncated the round-6 artifact into an
    // unparseable fragment ("parsed": null — the warm map was lost). Guard
    // the headline against truncation from EITHER end: a compact summary
    // line (totals + 10 slowest warm queries, a few hundred bytes) prints
    // both BEFORE and AFTER the full artifact line, so any capture that
    // keeps either end of the output keeps machine-readable warm totals.
    val slowest = results.sortBy(-_._2).take(10)
      .map(r => "\"" + r._1 + "\":" + r._2).mkString("{", ",", "}")
    val summary = s"""{"metric":"total_warm_min_summary","value":$total,"unit":"sec","schema_version":2,$onlyField"n_queries":${results.size},"cold_total":$coldTotal,"reps":$reps,"sf":"$sfDir","slowest_warm":$slowest}"""
    println(summary)
    println(json)
    println(summary)
    // stdout tail-capture can truncate the per-query maps (round 5 lost the
    // warm map for q01-q33); the full artifact is always written to a file
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_latest.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] full result JSON written to $outPath")
    } catch {
      case e: Throwable => System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
