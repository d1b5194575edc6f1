package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities — the manual tools for when AQE's runtime skew
  * handling isn't enough (extreme hot keys in 100 TB aggregations/joins).
  *
  *  - `saltedAgg`: two-phase aggregation. Phase 1 aggregates on
  *    (keys, salt) so a hot key's rows spread over `nSalts` reducers; phase 2
  *    re-aggregates the per-salt partials on the true keys. Caller supplies
  *    re-aggregatable pairs (partial, merge) — sum/sum, count/sum, min/min…
  *  - `saltedJoin`: replicate the build side `nSalts`× with a salt column,
  *    salt the skewed probe side deterministically, join on (key, salt) —
  *    a hot key's probe rows land on nSalts tasks instead of one.
  */
object Skew {

  /** (outName, partialAgg, mergeAgg(col)) triples, e.g.
    * ("n", count(lit(1)), sum), ("total", sum($"x"), sum).
    *
    * Floating-point partials re-associate (per-salt partial then merge), so
    * double sums can differ from a single-phase sum in the last ulps — keep
    * partials in DECIMAL and cast after the merge when exactness matters
    * (same rule as the oracle queries). */
  def saltedAgg(df: DataFrame, keys: Seq[String], nSalts: Int)
               (aggs: (String, Column, Column => Column)*): DataFrame = {
    require(nSalts > 0)
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")).toIndexedSeq: _*)
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
        aggs.tail.map(a => a._2.as(s"__p_${a._1}")).toIndexedSeq: _*)
    partial
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
        aggs.tail.map(a => a._3(col(s"__p_${a._1}")).as(a._1)).toIndexedSeq: _*)
  }

  /** Inner/left equi-join with the right (small-ish, replicable) side
    * replicated nSalts times. */
  def saltedJoin(leftSkewed: DataFrame, right: DataFrame, key: String,
                 nSalts: Int, how: String = "inner"): DataFrame = {
    val l = leftSkewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
    val r = right.withColumn("__salt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    l.join(r, Seq(key, "__salt"), how).drop("__salt")
  }
}
