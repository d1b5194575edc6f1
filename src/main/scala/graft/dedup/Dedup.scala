package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions => H, TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for training-data pipelines, all shuffle-lean:
  *
  *  - exact / fingerprint: one hash-groupBy (map-side combine applies)
  *  - MinHash LSH: shingle → signature (no shuffle) → band explode →
  *    bucket self-join (shuffle on band hash only) → signature-estimate filter
  *  - SimHash: 64-bit sketch → pigeonhole chunk blocking → hamming filter
  *  - n-gram Jaccard: exact pairwise via shingle co-occurrence counting
  *    (shuffle on shingle; the join fans out only where shingles collide)
  *  - embedding cosine: blocked self-join + exact cosine threshold
  *
  * At 100 TB the candidate-pair joins are the cost center; every variant
  * keys its shuffle on the blocking value (band bucket / chunk / shingle /
  * block key) so AQE can split skewed buckets, and nothing ever collects to
  * the driver.
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `orderCol` per duplicate
    * group (deterministic, unlike dropDuplicates). */
  def exact(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Fingerprint dedup: exact dedup over the normalized-text fingerprint. */
  def byFingerprint(df: DataFrame, textCol: String, orderCol: String): DataFrame =
    exact(df.withColumn("__fp", T.fingerprint(col(textCol))), Seq("__fp"), orderCol)
      .drop("__fp")

  /** Candidate near-duplicate pairs via MinHash + LSH banding.
    * Returns (idA, idB, jaccard_est) with idA < idB, est >= threshold. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 128, bands: Int = 32, shingleK: Int = 5,
                   threshold: Double = 0.8): DataFrame = {
    graft.plans.SketchExprs.register(df.sparkSession)
    // native sketch expression (tight loop) + persist: the signature scan
    // runs ONCE; only (id, band, bucket) flows through the self-join shuffle,
    // and signatures re-attach by id for the estimate.
    val sigs = df.select(col(idCol).as("id"),
        call_function("graft_minhash",
          array_distinct(T.shingles(T.tokens(col(textCol)), shingleK)), lit(numHashes))
          .as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandsDf = sigs
      .withColumn("bh", explode(H.bandHashes(col("sig"), numHashes, bands)))
      .select(col("id"), col("bh.band"), col("bh.bucket"))
    val a = bandsDf.alias("a"); val b = bandsDf.alias("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sigs.select(col("id").as("id_a"), col("sig").as("__sa")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("__sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        H.minhashJaccardEstimate(col("__sa"), col("__sb")).as("jaccard_est"))
      .filter(col("jaccard_est") >= threshold)
  }

  /** Drop near-duplicates found by MinHash LSH: of each candidate pair, the
    * larger id is dropped (transitive chains collapse to their smallest id
    * after one pass on this data; full connected components would iterate). */
  def dedupByMinhash(df: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 128, bands: Int = 32, shingleK: Int = 5,
                     threshold: Double = 0.8): DataFrame = {
    val drops = minhashPairs(df, idCol, textCol, numHashes, bands, shingleK, threshold)
      .select(col("id_b").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Candidate pairs via SimHash: pigeonhole chunk blocking + hamming bound.
    * Returns (idA, idB, hamming) with hamming <= maxHamming < chunks. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   chunks: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < chunks, "pigeonhole blocking needs maxHamming < chunks")
    graft.plans.SketchExprs.register(df.sparkSession)
    val sims = df.select(col(idCol).as("id"),
        call_function("graft_simhash", T.tokens(lower(col(textCol)))).as("sim"))
      .withColumn("blk", explode(H.simhashBlocks(col("sim"), chunks)))
      .select(col("id"), col("sim"), col("blk.chunk"), col("blk.key"))
    val a = sims.alias("a"); val b = sims.alias("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        H.hamming64(col("a.sim"), col("b.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs via shingle co-occurrence: shared-count join
    * on distinct shingles, |A∩B| / (|A|+|B|−|A∩B|) >= threshold. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 5, threshold: Double = 0.5): DataFrame = {
    // the exploded shingle set feeds three consumers (both self-join sides
    // and the per-doc counts) — materialize it once
    val sh = df.select(col(idCol).as("id"),
        explode(array_distinct(T.shingles(T.tokens(col(textCol)), shingleK))).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val shared = sh.alias("a")
      .join(sh.alias("b"), col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold within blocks
    * (blockCol keys the self-join shuffle; pass a constant column for a full
    * cross scan — quadratic, only for small corpora or after LSH). */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           blockCol: String, threshold: Double): DataFrame = {
    // native codegen cosine: bit-identical to the HOF fold (PipelineSpec
    // asserts it), ~64x less per-element interpreter overhead
    graft.plans.CosineSimilarityExpr.register(df.sparkSession)
    val e = df.select(col(idCol).as("id"), col(blockCol).as("blk"), col(vecCol).as("v"))
    e.alias("a")
      .join(e.alias("b"), col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        call_function("graft_cosine", col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Embedding near-duplicate pairs with NO precomputed block column:
    * banded sign-LSH candidates (any-band match, see
    * [[graft.similarity.Ann.lshBandBuckets]]) verified by exact cosine —
    * candidates below `threshold` never survive, so precision is exact;
    * only recall is probabilistic. The self-join shuffle is keyed on
    * (band,bucket) so AQE can split hot buckets; per-band bucket count
    * 2^bandBits bounds pair work. Dials: more `bandBits` = cheaper + lower
    * recall at moderate similarity; more `bands` = recall back up at
    * proportional cost (the same banding trade MinHash makes). */
  def embeddingLshPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                        threshold: Double, bandBits: Int = 8, bands: Int = 4,
                        seed: Long = 42L): DataFrame = {
    graft.plans.CosineSimilarityExpr.register(df.sparkSession)
    val e = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("blk", explode(
        graft.similarity.Ann.lshBandBuckets(col("v"), dim, bandBits, bands, seed)))
    e.alias("a")
      .join(e.alias("b"), col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        call_function("graft_cosine", col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct() // a pair can match in several bands
  }
}
