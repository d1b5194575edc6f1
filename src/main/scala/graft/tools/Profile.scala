package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling harness: time named sub-pipelines repeatedly in one warm
  * session to separate cold (JIT/codegen) cost from steady-state cost.
  * Usage: sbt "runMain graft.tools.Profile <sfDir> <reps> <name1> <name2> ..."
  */
object Profile {
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    s.read.parquet(s"$dir/$n.parquet")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq else Seq()
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val pipelines: Seq[(String, () => DataFrame)] = Seq(
      "jaccard_cooc" -> (() => graft.dedup.Dedup.ngramJaccardPairs(
        t(spark, sfDir, "documents"), "doc_id", "text", 5, 0.5)),
      "jaccard_prefix" -> (() => graft.dedup.Dedup.ngramJaccardPairsPrefix(
        t(spark, sfDir, "documents"), "doc_id", "text", 5, 0.5)),
      "components" -> (() => graft.dedup.ConnectedComponents.components(
        graft.dedup.Dedup.ngramJaccardPairs(t(spark, sfDir, "documents"), "doc_id", "text", 5, 0.5))),
      "q49" -> (() => graft.SparkEntry.queries("q49_pipeline_dedup_keeplist")(spark, sfDir)),
      "minhash" -> (() => graft.dedup.Dedup.minhashPairs(
        t(spark, sfDir, "documents"), "doc_id", "text", 128, 32, 5, 0.5)),
      "q12_str" -> (() => graft.SparkEntry.queries("q12_str_funcs")(spark, sfDir)),
      "qd06" -> (() => graft.SparkEntry.queries("qd06_langid")(spark, sfDir)),
      "q51" -> (() => graft.SparkEntry.queries("q51_pipeline_data_prep")(spark, sfDir)),
      "q45_roll" -> (() => graft.SparkEntry.queries("q45_rolling_global_rows")(spark, sfDir)),
      "q41_asof" -> (() => graft.SparkEntry.queries("q41_asof_unkeyed")(spark, sfDir)),
      "qd23_pack" -> (() => graft.SparkEntry.queries("qd23_pack_global")(spark, sfDir)),
      "qd23_nosort" -> (() => {
        val T = graft.functions.TextFunctions
        graft.prep.Prep.packGlobal(
          t(spark, sfDir, "documents")
            .withColumn("n_tokens", T.tokenCount(col("text")).cast("long")),
          Seq("doc_id"), "n_tokens", budget = 1024L)
      }),
      "qd23_tokcount" -> (() =>
        t(spark, sfDir, "documents").select(
          graft.functions.TextFunctions.tokenCount(col("text")).as("n"))),
      "qd18" -> (() => graft.SparkEntry.queries("qd18_decontaminate")(spark, sfDir)),
      "qs03" -> (() => graft.SparkEntry.queries("qs03_ann_ivf")(spark, sfDir)),
      "qd16" -> (() => graft.SparkEntry.queries("qd16_jaccard_prefix")(spark, sfDir)),
      "qd28_span" -> (() => graft.SparkEntry.queries("qd28_span_dedup")(spark, sfDir)),
      "qd29_sem" -> (() => graft.SparkEntry.queries("qd29_semantic_dedup")(spark, sfDir)),
      "qd31_line" -> (() => graft.SparkEntry.queries("qd31_line_dedup")(spark, sfDir)),
      "qd32_bpe" -> (() => graft.SparkEntry.queries("qd32_bpe_tokenize")(spark, sfDir)),
      "qs04_pq" -> (() => graft.SparkEntry.queries("qs04_ann_pq")(spark, sfDir)),
      "q53_clean" -> (() => graft.SparkEntry.queries("q53_pipeline_clean_pack")(spark, sfDir)),
      // span-dedup decomposition (mirrors keepFirstUnits' internals for
      // stage attribution; spanWords=20 matches qd28)
      "qd28_tok" -> (() => {
        val T = graft.functions.TextFunctions
        t(spark, sfDir, "documents").select(size(T.tokens(col("text"))).as("n"))
      }),
      "qd28_units" -> (() => {
        val T = graft.functions.TextFunctions
        val toks = T.tokens(col("text"))
        val nSpans = ceil(size(toks).cast("double") / 20).cast("int")
        val spanArr = when(size(toks) > lit(0),
            transform(sequence(lit(0), nSpans - lit(1)),
              i => array_join(slice(toks, i * 20 + lit(1), lit(20)), " ")))
          .otherwise(array().cast("array<string>"))
        t(spark, sfDir, "documents")
          .select(col("doc_id").as("__id"), posexplode(spanArr).as(Seq("__pos", "__unit")))
          .select(col("__id"), col("__pos"), xxhash64(col("__unit")).as("__uh"),
            xxhash64(col("__unit"), lit(1L)).as("__uh2"))
      }),
      "qd28_winners" -> (() => {
        val T = graft.functions.TextFunctions
        val toks = T.tokens(col("text"))
        val nSpans = ceil(size(toks).cast("double") / 20).cast("int")
        val spanArr = when(size(toks) > lit(0),
            transform(sequence(lit(0), nSpans - lit(1)),
              i => array_join(slice(toks, i * 20 + lit(1), lit(20)), " ")))
          .otherwise(array().cast("array<string>"))
        t(spark, sfDir, "documents")
          .select(col("doc_id").as("__id"), posexplode(spanArr).as(Seq("__pos", "__unit")))
          .select(col("__id"), col("__pos"), xxhash64(col("__unit")).as("__uh"),
            xxhash64(col("__unit"), lit(1L)).as("__uh2"))
          .groupBy(col("__uh"))
          .agg(min(struct(col("__id"), col("__pos"), col("__uh2"))).as("__w"))
      }),
      "qm01" -> (() => graft.SparkEntry.queries("qm01_media_meta")(spark, sfDir)),
      "qm02" -> (() => graft.SparkEntry.queries("qm02_decode_features")(spark, sfDir)),
      "qm04" -> (() => graft.SparkEntry.queries("qm04_video_meta")(spark, sfDir)),
      // round-6 crawl/quality pipelines + their stage decompositions
      "qd41_sel" -> (() => graft.SparkEntry.queries("qd41_pipeline_quality_select")(spark, sfDir)),
      "qd41_ppl" -> (() => graft.SparkEntry.queries("qd39_perplexity")(spark, sfDir)),
      "qd41_bloom" -> (() => graft.SparkEntry.queries("qd34_decontaminate_bloom")(spark, sfDir)),
      "qd41_dsir" -> (() => graft.SparkEntry.queries("qd36_dsir_weights")(spark, sfDir)),
      "q54_crawl" -> (() => graft.SparkEntry.queries("q54_pipeline_crawl")(spark, sfDir)),
      "q54_extract" -> (() => graft.SparkEntry.queries("qd43_html_extract")(spark, sfDir)),
      "q54_c4" -> (() => graft.SparkEntry.queries("qd40_c4_filter")(spark, sfDir)),
      "q54_gopher" -> (() => graft.SparkEntry.queries("qd44_gopher_quality")(spark, sfDir)),
      "qd45_sent" -> (() => graft.SparkEntry.queries("qd45_sentence_dedup")(spark, sfDir)),
      "qd46_para" -> (() => graft.SparkEntry.queries("qd46_dup_paragraphs")(spark, sfDir)),
    ).filter { case (n, _) => names.isEmpty || names.contains(n) }

    for ((name, mk) <- pipelines; r <- 1 to reps) {
      // SPARK_GRAFT_CLEARCACHE=1 measures each rep against a clean storage
      // pool (the bench's per-job contract); without it, reps re-hit
      // plan-matched persisted internals (CacheManager matches by logical
      // plan) and measure steady-state-with-cache instead
      if (sys.env.contains("SPARK_GRAFT_CLEARCACHE")) spark.catalog.clearCache()
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").format("noop").save()
      println(f"[profile] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
