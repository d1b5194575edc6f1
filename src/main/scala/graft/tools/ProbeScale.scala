package graft.tools

import graft.Sessions
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** One-off diagnostics for the approximate-operator contract faces at a
  * given SF: prints qd05's candidate-pair cosine distribution and qs04's
  * per-query true-top-5 overlap, so contract thresholds are derived from
  * measurements (across ALL SFs incl. sf0.1), not asserted.
  *
  * Usage: runMain graft.tools.ProbeScale [sfDir]
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def t(n: String) = SparkEntry.t(s, d, n)

    // ---- qd05: cosine of every simhash candidate pair
    val docs = t("documents")
    val T = graft.functions.TextFunctions
    val pairs = graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text",
        chunks = 4, maxHamming = 3)
      .select(col("id_a"), col("id_b"))
    val tf = docs.select(col("doc_id"), explode(T.tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).cast("double").as("c"))
    val norms = tf.groupBy(col("doc_id")).agg(sum(col("c") * col("c")).as("n2"))
    val dots = pairs
      .join(tf.select(col("doc_id").as("id_a"), col("w"), col("c").as("ca")), Seq("id_a"))
      .join(tf.select(col("doc_id").as("id_b"), col("w"), col("c").as("cb")), Seq("id_b", "w"))
      .groupBy(col("id_a"), col("id_b")).agg(sum(col("ca") * col("cb")).as("dot"))
    val cos = pairs
      .join(dots, Seq("id_a", "id_b"), "left")
      .join(norms.select(col("doc_id").as("id_a"), col("n2").as("na")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("n2").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (coalesce(col("dot"), lit(0.0)) / sqrt(col("na") * col("nb"))).as("cos"))
      .cache()
    val n = cos.count()
    val below = cos.filter(col("cos") < 0.6).orderBy(col("cos")).collect()
    println(s"[probe] qd05 @$d: pairs=$n below0.6=${below.length} " +
      s"frac=${below.length.toDouble / math.max(n, 1)}")
    below.take(10).foreach(r => println(s"[probe]   pair ${r.getLong(0)}-${r.getLong(1)} cos=${r.getDouble(2)}"))
    cos.unpersist()

    // ---- qs04: per-query overlap with the exact top-5, by rescore pool
    val e = t("embeddings")
    val q = e.filter(col("vec_id") < 10)
    val P = graft.similarity.Pq
    val cb = P.train(e, dim = 64, m = 16, ksub = 16, sampleN = 1000)
    val enc = P.encode(e, cb, m = 16, ksub = 16).cache()
    val exact = graft.similarity.Ann.bruteForceTopK(e, q, k = 5)
    for (rescore <- Seq(100, 200, 400)) {
      val ann = P.searchAdc(enc, cb, q, k = 5, m = 16, ksub = 16, rescore = rescore)
      val ov = ann.select(col("query_id"), col("neighbor_id"))
        .join(exact.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("ov"))
        .orderBy(col("query_id"))
        .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      println(s"[probe] qs04 @$d rescore=$rescore overlaps: $ov")
    }
    enc.unpersist()
    s.stop()
  }
}
