package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable byte-pair-encoding tokenizer (Sennrich/Haddow/Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) — the
  * real merge-table BPE that [[TextFunctions.bpeTokenCount]]'s pre-tokenizer
  * regex approximates.
  *
  * Division of labor (same pattern as [[graft.similarity.Pq]]):
  *  - TRAIN runs driver-side over an explicitly bounded, hash-ranked sample:
  *    merge learning is a sequential algorithm over a word-frequency table
  *    (each merge depends on the last), and the sample's word table is tiny
  *    next to the corpus. The output — an ordered merge list — is a few KB.
  *  - ENCODE is distributed and corpus-shaped: the merge ranks ride into
  *    [[graft.plans.BpeEncodeExpr]] as a plan literal and every document
  *    tokenizes in a narrow map, no shuffle, no driver involvement.
  *
  * Word model: whitespace words ([[TextFunctions.tokens]] semantics) split
  * to single characters plus a terminal `</w>` symbol; merges never cross
  * word boundaries. Deterministic: ties on pair frequency break on the
  * lexicographically smallest pair.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Split a word into its initial BPE symbols — by Unicode code point,
    * not Java char, so surrogate pairs (emoji, rare CJK) stay whole
    * instead of becoming lone surrogates that UTF-8 cannot represent. */
  def symbols(word: String): Vector[String] =
    word.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp))) :+ EndOfWord

  /** Learn up to `numMerges` merges from a deterministic `sampleN`-document
    * sample. Stops early when no adjacent pair occurs twice. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            sampleN: Int = 2000, idCol: String = null, seed: Long = 42L): Seq[(String, String)] = {
    // hash-rank for determinism in BOTH paths: a bare limit() would take
    // whichever partitions materialize first
    val rankKey = if (idCol == null) col(textCol) else col(idCol)
    val ranked = df.select(col(textCol), xxhash64(rankKey, lit(seed)).as("__r"))
      .orderBy(col("__r")).limit(sampleN).select(col(textCol))
    val texts = ranked.collect().map(r => Option(r.getString(0)).getOrElse(""))
    val wordFreq = new scala.collection.mutable.HashMap[String, Long]()
    for (t <- texts; w <- t.split("\\s+") if w.nonEmpty)
      wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1L)
    learnMerges(wordFreq.toMap, numMerges)
  }

  /** Learn merges from the WHOLE corpus — the 100 TB shape: the word
    * frequency table is built distributed (one explode + map-side-combined
    * groupBy over the corpus), and only the top-`maxVocab` (frequency,
    * word)-ranked vocabulary reaches the driver, so driver memory is
    * bounded by the vocabulary cut, not the corpus. Exact BPE when the
    * vocabulary fits the cut; merge frequencies are corpus-true either
    * way, unlike sample-based [[train]]. */
  def trainCorpus(df: DataFrame, textCol: String, numMerges: Int,
                  maxVocab: Int = 100000): Seq[(String, String)] = {
    val wf = df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    learnMerges(wf, numMerges)
  }

  private def learnMerges(wordFreq: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] =
      wordFreq.iterator.map { case (w, f) => symbols(w) -> f }.toMap
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var continue = true
    while (continue && merges.length < numMerges) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, f) <- words; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts.update(p, counts.getOrElse(p, 0L) + f)
      }
      val best = counts.filter(_._2 >= 2)
      if (best.isEmpty) continue = false
      else {
        val (pair, _) = best.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        words = words.map { case (syms, f) => (mergeOnce(syms, pair), f) }
      }
    }
    merges.toSeq
  }

  /** Replace every adjacent (a, b) with a+b, left to right. */
  def mergeOnce(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Reference encoder (drives the expression's spec): apply merges to one
    * word by ascending rank until no ranked pair remains. */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = symbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      for (i <- 0 until syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
      }
      if (bestIdx < 0) continue = false
      else {
        syms = mergeOnce(syms, (syms(bestIdx), syms(bestIdx + 1)))
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** Distributed encode: whitespace-token array column → flat sub-token
    * array ([[graft.plans.BpeEncodeExpr]]; merges travel in the plan). */
  def encodeCol(tokens: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe_encode", tokens,
      typedlit(merges.map(p => Seq(p._1, p._2))))

  /** Sub-token count per document under a trained merge table. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encodeCol(TextFunctions.tokens(text), merges))

  /** Persist a trained merge table as a tiny rank-ordered parquet — the
    * tokenizer artifact a corpus build trains once and every downstream
    * job (and the serving side) reloads byte-identically. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a merge table saved by [[saveMerges]], rank order restored. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[(String, String)] =
    // select by NAME: a reordered or hand-produced artifact must not
    // silently swap merge pair sides
    spark.read.parquet(path).orderBy(col("rank"))
      .select(col("left"), col("right"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
}
