package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]`/`Array[Double]` embedding columns.
  *
  * Two tiers:
  *  - `cosine`/`dot`/`norm2`: higher-order-function compositions
  *    (`zip_with` + `aggregate`) — codegen'd by Catalyst, and their
  *    left-to-right fold order makes results bit-identical to a sequential
  *    float64 loop (verified against DuckDB `list_sum` folds), which is what
  *    the correctness oracle needs.
  *  - `graft.plans.CosineSimilarityExpr`: a native Catalyst expression with
  *    `doGenCode` emitting a tight primitive loop — the hot path for ANN
  *    scans at scale (no per-element lambda closure dispatch).
  */
object VectorFunctions {

  private def d(x: Column): Column = x.cast("double")

  /** Sequential-fold dot product in float64. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm (sequential fold). */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + d(v) * d(v))

  def norm2(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity, dot/(|a||b|); null-safe zero-vector guard → null. */
  def cosine(a: Column, b: Column): Column = {
    val den = sqrt(normSq(a) * normSq(b))
    when(den =!= lit(0.0), dot(a, b) / den)
  }

  /** Euclidean distance (sequential fold). */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (d(x) - d(y)) * (d(x) - d(y))), lit(0.0),
      (acc, v) => acc + v))
}
