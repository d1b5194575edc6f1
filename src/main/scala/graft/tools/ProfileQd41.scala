package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.functions._

/** One-off stage decomposition of the qd41 flagship (round-10 verdict item
  * 5): times each pipeline stage separately in a fresh-cache session so the
  * cold cost can be attributed. Not part of the library surface — a
  * measurement harness kept under tools/ for reproducibility.
  *
  * Usage: scala -cp ... graft.ProfileQd41 [sfDir]
  */
object ProfileQd41 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val P = graft.prep.Prep
    // keep in lockstep with the flagship's inter-stage checkpoint level
    // (DISK_ONLY since r13 — eviction-proof, worst case a disk re-read)
    val lvl = org.apache.spark.storage.StorageLevel.DISK_ONLY

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[qd41-profile] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // session warm-up

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val baseCols = docs.columns.map(col).toIndexedSeq

    // stage 1: perplexity gate
    val s1 = P.perplexityBigram(docs, docs.filter(col("doc_id") % 11 === 0),
        "doc_id", "text")
      .filter(col("n_bigrams") > 0 &&
        col("nll_unats") <= lit(3500000L) * col("n_bigrams"))
      .select(baseCols: _*)
      .persist(lvl)
    timed("stage1 perplexity gate (materialize)") { s1.count() }

    // stage 2: bloom decontamination — constructor runs the eager bench
    // count + bloom build; the count materializes the verify join
    val s2 = timed("stage2 bloom model build (eager)") {
      P.contaminationBloom(s1, docs.filter(col("doc_id") % 89 === 0),
          "doc_id", "text", shingleK = 5, minShared = 1, fpp = 0.01)
        .filter(!col("contaminated"))
        .select(baseCols: _*)
        .persist(lvl)
    }
    timed("stage2 verify join (materialize)") { s2.count() }

    // stage 3: DSIR weights + top-k
    val top = timed("stage3 DSIR weights + top-50") {
      P.selectTopK(
          P.importanceWeightsMicro(s2, s2.filter(col("doc_id") % 17 === 0),
            "doc_id", "text"),
          "dsir_uweight", "doc_id", k = 50)
        .select(col("doc_id"), col("dsir_uweight")).collect()
    }
    println(s"[qd41-profile] top-50 rows: ${top.length}")

    s2.unpersist(blocking = true); s1.unpersist(blocking = true)

    // whole-query cold replica for reference (fresh cache)
    spark.catalog.clearCache(); System.gc()
    timed("whole qd41 (fresh cache, this JVM)") {
      SparkEntry.queries("qd41_pipeline_quality_select")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    timed("whole qd41 (warm rerun)") {
      spark.catalog.clearCache(); System.gc()
      SparkEntry.queries("qd41_pipeline_quality_select")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
