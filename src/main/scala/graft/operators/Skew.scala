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

  /** Two-sided salted SELF-join for pairwise candidate generation — the
    * explicit fallback for the skew AQE normally absorbs (qd16's two-sided
    * hot-shingle case is only sub-partition-splittable as a runtime AQE
    * rewrite; with AQE off, a corpus-hot blocking key collapses the plain
    * self-join into one straggler task that does df(hot)² comparisons).
    *
    * Scheme: the probe side keeps ONE salt per row — `xxhash64(idCol) mod
    * nSalts`, content-derived so it is stable under task retry and
    * partition relayout, unlike a positional id — and the build side is
    * replicated ×nSalts carrying every salt value; the join matches on
    * (key, salt). Each ordered row pair of a key therefore meets in exactly
    * one task (the probe row's salt), so the output is row-for-row the
    * plain `df.join(df, key)` self-join — same (a, a) rows, same (a, b) /
    * (b, a) doubling for the caller's `id_a < id_b` filter to halve — while
    * a hot key's probe rows spread over nSalts reducers instead of one.
    *
    * Cost model (why this is a knob and not the default): the build side's
    * shuffle volume is ×nSalts, so salt only when a blocking key's df is
    * hot enough that one task's df(hot)² dominates the ×S replication —
    * exactly the decision AQE's runtime statistics make automatically when
    * it is on.
    *
    * Right-side columns (except the join key) come back suffixed; the
    * caller's downstream is otherwise identical to the unsalted join. */
  def saltedSelfJoin(df: DataFrame, key: String, idCol: String, nSalts: Int,
                     suffix: String = "_b"): DataFrame = {
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    // validate the synthesized names up front: a pre-existing '__salt' would
    // corrupt the join condition, and a column that already carries the
    // suffix of another (x and x_b both present) would collide after the
    // right-side rename — both silently wrong, so fail fast instead
    require(!df.columns.contains("__salt"),
      "saltedSelfJoin: input already has a '__salt' column")
    val renamed = df.columns.map(c => if (c == key) c else c + suffix)
    val clash = renamed.diff(Array(key)).intersect(df.columns) ++
      renamed.diff(renamed.distinct)
    require(clash.isEmpty,
      s"saltedSelfJoin: suffix '$suffix' collides on ${clash.distinct.mkString(", ")}")
    val l = df.withColumn("__salt", pmod(xxhash64(col(idCol)), lit(nSalts.toLong)))
    val r = df.select(df.columns.map(c =>
        col(c).as(if (c == key) c else c + suffix)).toIndexedSeq: _*)
      .withColumn("__salt", explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
