package graft

import org.apache.spark.sql.functions._

import graft.prep.Prep

/** CCNet-style bigram-LM perplexity filtering
  * ([[graft.prep.Prep.perplexityBigram]] exact face,
  * [[graft.prep.Prep.perplexityBigramHashed]] narrow face). */
class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat again"),
    (3L, "zx qv wq jj zx qv"),
    (4L, "the mat sat"),
    (5L, ""),
    (6L, "single")).toDF("doc_id", "text")

  private lazy val lm = corpus.filter(col("doc_id").isin(1L, 2L))

  /** Driver-side reference: add-a bigram model with head counts, V = distinct
    * LM unigrams (or `vOverride` for the hashed convention). Returns
    * (n_bigrams, total NLL in nats). Also asserts the model is a proper
    * conditional: probabilities per seen head sum to 1. */
  private def reference(docs: Seq[(Long, String)], lmTexts: Seq[String],
                        a: Double = 1.0, vOverride: Option[Long] = None): Map[Long, (Long, Double)] = {
    def toks(s: String) = s.split("\\s+").filter(_.nonEmpty).toSeq
    def bigrams(t: Seq[String]) = t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    val lmToks = lmTexts.map(toks)
    val v = vOverride.getOrElse(lmToks.flatten.distinct.size.toLong)
    val c1 = lmToks.filter(_.size >= 2).flatMap(t => t.dropRight(1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c12 = lmToks.flatMap(bigrams).groupBy(identity).view.mapValues(_.size.toLong).toMap
    // proper conditional: for each seen head, P(.|w1) sums to 1 over the vocab
    if (vOverride.isEmpty) {
      val vocab = lmToks.flatten.distinct
      for ((w1, n1) <- c1) {
        val mass = vocab.map(w2 => (c12.getOrElse(w1 + " " + w2, 0L) + a) / (n1 + a * v)).sum
        assert(math.abs(mass - 1.0) < 1e-9, s"P(.|$w1) must sum to 1, got $mass")
      }
    }
    docs.map { case (id, text) =>
      val bgs = bigrams(toks(text))
      val nll = bgs.map { bg =>
        val w1 = bg.split(" ")(0)
        math.log(c1.getOrElse(w1, 0L) + a * v) - math.log(c12.getOrElse(bg, 0L) + a)
      }.sum
      id -> (bgs.size.toLong, nll)
    }.toMap
  }

  test("exact NLL matches the driver-side reference (micro-nat tolerance)") {
    val got = Prep.perplexityBigram(corpus, lm, "doc_id", "text")
      .select("doc_id", "n_bigrams", "nll_unats").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = reference(corpus.as[(Long, String)].collect().toSeq,
      lm.select("text").as[String].collect().toSeq)
    for ((id, (nb, nll)) <- want) {
      assert(got(id)._1 == nb, s"doc $id bigram count")
      // each bigram contributes <= 0.5 micro-nats of quantization error
      assert(math.abs(got(id)._2 - nll * 1e6) <= nb * 0.5 + 1,
        s"doc $id: got ${got(id)._2} want ~${nll * 1e6}")
    }
  }

  test("directionality: in-domain text scores lower NLL than OOV text") {
    val ppl = Prep.perplexityBigram(corpus, lm, "doc_id", "text")
      .select("doc_id", "ppl_nats").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(ppl(1L) < ppl(3L), s"LM doc must beat OOV doc: $ppl")
    assert(ppl(2L) < ppl(3L))
    // short docs have no bigrams: null mean NLL, zero counts
    assert(ppl(5L).isNaN && ppl(6L).isNaN)
  }

  test("hashed face matches the exact estimator when collision-free (support-V convention)") {
    // the hashed face smooths over occupied unigram buckets, which equals
    // the exact face's distinct-unigram V on a collision-free vocabulary —
    // so the two faces produce the SAME NLLs and a threshold calibrated on
    // one transfers to the other
    val b = 1 << 16
    val docs = corpus.as[(Long, String)].collect().toSeq
    val want = reference(docs, lm.select("text").as[String].collect().toSeq)
    val got = Prep.perplexityBigramHashed(corpus, lm, "text", buckets = b)
      .select("doc_id", "n_bigrams", "nll_nats").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    for ((id, (nb, nll)) <- want) {
      assert(got(id)._1 == nb, s"doc $id bigram count")
      assert(math.abs(got(id)._2 - nll) <= 1e-9 * (1 + math.abs(nll)),
        s"doc $id: hashed ${got(id)._2} want $nll")
    }
  }

  test("integer keep gate equals the float threshold comparison") {
    val scored = Prep.perplexityBigram(corpus, lm, "doc_id", "text")
    val thrUnats = 3500000L
    val viaInt = scored.filter(col("n_bigrams") > 0 &&
        col("nll_unats") <= lit(thrUnats) * col("n_bigrams"))
      .select("doc_id").as[Long].collect().toSet
    val viaFloat = scored.filter(col("ppl_nats") <= 3.5)
      .select("doc_id").as[Long].collect().toSet
    assert(viaInt == viaFloat)
  }
}
