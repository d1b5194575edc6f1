package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-flat approximate nearest neighbor: partition the corpus into nlist
  * Voronoi cells around centroid vectors; queries probe only the nprobe
  * closest cells.
  *
  * Centroids are a deterministic hash-ranked sample of the corpus itself
  * (IVF with sampled centroids — no k-means iterations; Lloyd refinement
  * slots in here later without changing the search side). The centroid set
  * is tiny (nlist rows) and broadcast everywhere; the corpus shuffles ONCE
  * at index-build time on cell id and never again per query — the property
  * that matters at 100 TB, where `lshTopK`'s per-query bucket scan and this
  * cell layout are the two standard trade-offs.
  */
object Ivf {

  /** Build the cell index: returns (centroids, assigned corpus).
    * assigned = corpus + `cell` column, repartitioned by cell.
    *
    * `lloydIters` > 0 runs that many Lloyd (k-means) refinement rounds over
    * the sampled seeds before the final assignment: assign → element-wise
    * mean per cell → re-assign. Each round is two shuffles (the assignment
    * cross-join is broadcast; the mean reduces corpus×dim exploded elements
    * with map-side partial aggregation); empty cells keep their previous
    * centroid. Better-balanced cells mean fewer over-full probes at search
    * time — the classic IVF build trade: pay once at index time. */
  def buildIndex(corpus: DataFrame, nlist: Int, seed: Long = 42L,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 lloydIters: Int = 0): (DataFrame, DataFrame) = {
    graft.plans.CosineSimilarityExpr.register(corpus.sparkSession)
    // deterministic sample: hash-rank rows, take nlist as centroids
    var centroids = corpus
      .withColumn("__r", xxhash64(col(idCol), lit(seed)))
      .orderBy(col("__r")).limit(nlist)
      .select(monotonically_increasing_id().as("cell"), col(vecCol).as("__centroid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    for (_ <- 0 until lloydIters) {
      val members = assignCells(corpus, centroids, 1, idCol, vecCol)
      val means = members
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("__p", "__x")))
        .groupBy(col("cell"), col("__p")).agg(avg(col("__x")).as("__m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("__p"), col("__m")))).as("__pm"))
        .select(col("cell"),
          transform(col("__pm"), s => s.getField("__m").cast("float")).as("__newc"))
      val next = centroids.join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("__newc"), col("__centroid")).as("__centroid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before unpersisting the previous round
      centroids.unpersist()
      centroids = next
    }

    val assigned = assignCells(corpus, centroids, 1, idCol, vecCol)
      .repartition(col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (centroids, assigned)
  }

  /** Attach each row's top-`p` nearest cells (p=1 for corpus assignment,
    * p=nprobe for queries). */
  private[similarity] def assignCells(df: DataFrame, centroids: DataFrame, p: Int,
                          idCol: String, vecCol: String): DataFrame = {
    val scored = df.crossJoin(broadcast(centroids))
      .withColumn("__csim", call_function("graft_cosine", col(vecCol), col("__centroid")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__csim").desc_nulls_last, col("cell"))
    scored.withColumn("__crank", row_number().over(w))
      .filter(col("__crank") <= p)
      .drop("__centroid", "__csim", "__crank")
  }

  /** Search: probe the nprobe closest cells per query, exact cosine within. */
  def search(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
             k: Int, nprobe: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding",
             queryIdCol: String = "query_id"): DataFrame = {
    graft.plans.CosineSimilarityExpr.register(assigned.sparkSession)
    val q = assignCells(
        queries.select(col(idCol).as(queryIdCol), col(vecCol).as("__qv")),
        centroids, nprobe, queryIdCol, "__qv")
      .select(col(queryIdCol), col("__qv"), col("cell"))
    val c = assigned.select(col("cell"), col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col(queryIdCol) =!= col("neighbor_id"))
      .withColumn("cosine", call_function("graft_cosine", col("__qv"), col("__cv")))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cosine").desc_nulls_last, col("neighbor_id"))
    scored.select(col(queryIdCol), col("neighbor_id"), col("cosine")).distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
