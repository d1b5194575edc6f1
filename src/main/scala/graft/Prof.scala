package graft

import org.apache.spark.sql.functions._

/** Scratch profiling harness (round-4): per-stage timing of the heavy
  * bench queries so optimization targets the real cost, not a guess. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[prof] documents rows = ${docs.count()}")

    // ---- q49 stage split ----
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.5)
    t("q49a jaccard pairs (cold)") { pairs.write.mode("overwrite").format("noop").save() }
    val comps = t("q49b components (pairs warm-ish)") {
      val c = graft.dedup.ConnectedComponents.components(pairs)
      c.write.mode("overwrite").format("noop").save(); c
    }
    t("q49c anti-join") {
      val losers = comps.filter(col("id") =!= col("component")).select(col("id"))
      docs.join(losers, docs("doc_id") === losers("id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source")).orderBy(col("doc_id"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.sharedState.cacheManager.clearCache()

    t("qd03 jaccard pairs (cache cleared)") {
      graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.5)
        .orderBy(col("id_a"), col("id_b"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.sharedState.cacheManager.clearCache()

    t("qd03 PREFIX jaccard pairs (cache cleared)") {
      graft.dedup.Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 5, 0.5)
        .orderBy(col("id_a"), col("id_b"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.sharedState.cacheManager.clearCache()

    // ---- qd04 stage split ----
    graft.plans.SketchExprs.register(spark)
    import graft.functions.{HashFunctions => H, TextFunctions => T}
    val sigs = docs.select(col("doc_id").as("id"),
        call_function("graft_minhash",
          call_function("graft_shingles", T.tokens(col("text")), lit(5), lit(true)),
          lit(128)).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("qd04a signatures") { sigs.write.mode("overwrite").format("noop").save() }
    val bandsDf = sigs.withColumn("bh", explode(H.bandHashes(col("sig"), 128, 32)))
      .select(col("id"), col("bh.band"), col("bh.bucket"))
    val a = bandsDf.alias("a"); val b = bandsDf.alias("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    t("qd04b band join + distinct") { cand.write.mode("overwrite").format("noop").save() }
    t("qd04c estimate re-join") {
      cand.join(sigs.select(col("id").as("id_a"), col("sig").as("__sa")), "id_a")
        .join(sigs.select(col("id").as("id_b"), col("sig").as("__sb")), "id_b")
        .select(col("id_a"), col("id_b"),
          H.minhashJaccardEstimate(col("__sa"), col("__sb")).as("jaccard_est"))
        .filter(col("jaccard_est") >= 0.5)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
