package graft

/** Library cache-hygiene contract: no public op retains cache blocks past
  * its query's materialization.
  *
  * Why this is a first-class contract and not a style preference: a real
  * 100 TB session is LONG-LIVED — it chains dedup passes, model builds, and
  * selection queries for hours. Any op that persists an intermediate and
  * never releases it turns that session into a slow leak of MEMORY_AND_DISK
  * blocks; the executors' storage pools fill with dead signatures and count
  * tables, and every later shuffle pays the eviction pressure. The round-6
  * driver bench measured exactly this shape (queries 14-19× their isolated
  * cost under suite cache pressure).
  *
  * The discipline, per op class:
  *   - model builders (DSIR log-ratio, bigram LM, Jaccard shingle sets):
  *     NO persist — multiply-referenced subplans dedupe via ReuseExchange
  *     inside the single action instead (asserted below);
  *   - eager model extractions (Bloom builds): persist scoped to the eager
  *     actions, released in a `finally` before the op returns;
  *   - bounded-result pipelines (flagship top-k, ANN neighbor lists):
  *     stages persist, the result localizes eagerly, stages release before
  *     the lambda returns;
  *   - caller-owned handles (Ivf.buildIndex): the caller releases — and
  *     every SparkEntry query using one does so.
  */
class CacheHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Queries are grouped into a few suite entries (not one test per query) so
  // failure output stays readable while every query is still covered.
  private val groups = SparkEntry.queries.keys.toSeq.sorted.grouped(20).toSeq

  for (group <- groups)
    test(s"no retained cache blocks after: ${group.head}..${group.last}") {
      for (name <- group) {
        spark.catalog.clearCache() // isolate: a leak must be THIS query's
        SparkEntry.queries(name)(spark, dir).write.mode("overwrite")
          .format("noop").save()
        val retained = spark.sparkContext.getPersistentRDDs
        assert(retained.isEmpty,
          s"$name retained ${retained.size} cached RDD(s) after its action: " +
            retained.values.map(_.name).mkString("; "))
      }
    }

  // The bench-only operator faces (round 10: qd04/qd05/qs04/qd32 overrides)
  // run under the same contract — the bench's long 5-rep suite would
  // amplify any leak 5x per query.
  private val benchOnly =
    (SparkEntry.benchQueries.keySet -- SparkEntry.queries.keySet) ++
      SparkEntry.benchQueries.keys.filter(k =>
        SparkEntry.benchQueries(k) ne SparkEntry.queries.getOrElse(k, null))

  test(s"no retained cache blocks after bench faces: ${benchOnly.toSeq.sorted.mkString(", ")}") {
    for (name <- benchOnly.toSeq.sorted) {
      spark.catalog.clearCache()
      SparkEntry.benchQueries(name)(spark, dir).write.mode("overwrite")
        .format("noop").save()
      val retained = spark.sparkContext.getPersistentRDDs
      assert(retained.isEmpty,
        s"bench face $name retained ${retained.size} cached RDD(s): " +
          retained.values.map(_.name).mkString("; "))
    }
  }

  test("DSIR exact face dedupes its count tables via ReuseExchange, not persist") {
    val docs = sf("documents")
    val df = graft.prep.Prep
      .importanceWeightsMicro(docs, docs.filter(org.apache.spark.sql.functions
        .col("doc_id") % 17 === 0), "doc_id", "text")
    // AQE resolves exchange reuse at runtime (stage cache keyed on the
    // canonicalized subplan), so the assertion must read the FINAL plan of
    // an executed QueryExecution — collect() runs this df's own QE.
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"expected an executed adaptive plan:\n$plan")
    assert(plan.contains("ReusedExchange"),
      "expected the multiply-referenced corpus count table to plan as a " +
        s"ReusedExchange; got:\n$plan")
  }
}
