package graft

import org.apache.spark.sql.functions._

/** Product-quantization ANN: codebook training, encoding, ADC search,
  * exact-rescore refinement, and the IVF-PQ composition. */
class PqSpec extends SparkSpec {
  import spark.implicits._
  private val P = graft.similarity.Pq

  /** 4 orthogonal direction clusters of 25 slightly-perturbed unit vectors
    * each (dim 64) — PQ must keep clusters separable. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(11)
    val rows = for (c <- 0 until 4; i <- 0 until 25) yield {
      val v = new Array[Float](64)
      for (d <- 0 until 16) v(c * 16 + d) = 1.0f + (rnd.nextFloat() - 0.5f) * 0.1f
      (c * 100L + i, v, c)
    }
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("train is deterministic and shapes the codebook as m*ksub*subDim") {
    val cb1 = P.train(clustered, dim = 64, m = 8, ksub = 4, sampleN = 100, lloydIters = 3)
    val cb2 = P.train(clustered, dim = 64, m = 8, ksub = 4, sampleN = 100, lloydIters = 3)
    assert(cb1.length == 8 * 4 * 8)
    assert(cb1.toSeq == cb2.toSeq)
  }

  test("encode emits m codes per row, all inside [0, ksub)") {
    val cb = P.train(clustered, dim = 64, m = 8, ksub = 4, sampleN = 100)
    val codes = P.encode(clustered, cb, m = 8, ksub = 4)
      .select("pq_codes").as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 4)))
  }

  test("ADC score equals dot(query, decoded-centroids) reconstruction") {
    val m = 8; val ksub = 4; val subDim = 8
    val cb = P.train(clustered, dim = 64, m = m, ksub = ksub, sampleN = 100)
    val q = clustered.filter($"vec_id" === 0L)
    val got = P.searchAdc(P.encode(clustered, cb, m, ksub), cb, q, k = 5, m = m, ksub = ksub)
      .orderBy("rank").select("neighbor_id", "adc").as[(Long, Double)].collect()
    // driver-side reconstruction with the same normalize→encode→sum math
    val vecs = clustered.select($"vec_id", P.unit($"embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    val codes = P.encode(clustered, cb, m, ksub)
      .select("vec_id", "pq_codes").as[(Long, Seq[Int])].collect().toMap
    val qv = vecs(0L)
    for ((nid, adc) <- got) {
      val expect = (0 until m).map { mi =>
        val cOff = (mi * ksub + codes(nid)(mi)) * subDim
        (0 until subDim).map(d => qv(mi * subDim + d).toDouble * cb(cOff + d)).sum
      }.sum
      assert(math.abs(adc - expect) < 1e-9, s"neighbor $nid: $adc vs $expect")
    }
  }

  test("ADC top-k stays inside the query's cluster") {
    val cb = P.train(clustered, dim = 64, m = 8, ksub = 16, sampleN = 100)
    val enc = P.encode(clustered, cb, m = 8, ksub = 16)
    val queries = clustered.filter($"vec_id" % 100 === 0) // one per cluster
    val got = P.searchAdc(enc, cb, queries, k = 10, m = 8, ksub = 16)
    val byCluster = got.select($"query_id" / 100 cast "int", $"neighbor_id" / 100 cast "int")
      .as[(Int, Int)].collect()
    assert(byCluster.nonEmpty && byCluster.forall { case (qc, nc) => qc == nc })
  }

  test("exact rescore recovers brute-force top-k on real embeddings") {
    val e = sf("embeddings")
    val queries = e.filter($"vec_id" < 5)
    // near-random embeddings are PQ's hardest case (no cluster structure to
    // quantize onto): use finer subspaces (m=16 → 4-dim subvectors) and a
    // deeper rescore pool (20% of the corpus)
    val cb = P.train(e, dim = 64, m = 16, ksub = 16, sampleN = 1000)
    val enc = P.encode(e, cb, m = 16, ksub = 16)
    val pq = P.searchAdc(enc, cb, queries, k = 5, m = 16, ksub = 16, rescore = 100)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = graft.similarity.Ann.bruteForceTopK(e, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (pq & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"rescored recall $recall < 0.8")
  }

  test("IVF-PQ probes cells and keeps cluster locality") {
    val (cents, assigned) = graft.similarity.Ivf.buildIndex(
      clustered, nlist = 8, idCol = "vec_id", vecCol = "embedding", lloydIters = 1)
    val cb = P.train(clustered, dim = 64, m = 8, ksub = 16, sampleN = 100)
    val enc = P.encode(assigned, cb, m = 8, ksub = 16)
    val queries = clustered.filter($"vec_id" % 100 === 0)
    val got = P.searchIvfPq(enc, cents, cb, queries, k = 5, m = 8, ksub = 16, nprobe = 3)
    val counts = got.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 5))
    val byCluster = got.select($"query_id" / 100 cast "int", $"neighbor_id" / 100 cast "int")
      .as[(Int, Int)].collect()
    assert(byCluster.forall { case (qc, nc) => qc == nc })
  }

  test("IVF-PQ exact rescore matches brute force restricted to probed cells") {
    val e = sf("embeddings")
    val queries = e.filter($"vec_id" < 5)
    val (cents, assigned) = graft.similarity.Ivf.buildIndex(
      e, nlist = 4, idCol = "vec_id", vecCol = "embedding", lloydIters = 1)
    val cb = P.train(e, dim = 64, m = 16, ksub = 16, sampleN = 1000)
    val enc = P.encode(assigned, cb, m = 16, ksub = 16)
    // nprobe = nlist: every cell probed, so the rescored result must EQUAL
    // brute force (the rescore pool is deep enough to hold the true top-k)
    val got = P.searchIvfPq(enc, cents, cb, queries, k = 5, m = 16, ksub = 16,
        nprobe = 4, rescore = 200)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = graft.similarity.Ann.bruteForceTopK(e, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF-PQ rescored recall $recall < 0.8")
  }
}
