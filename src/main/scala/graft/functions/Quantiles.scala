package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact group quantiles with the reference's five interpolation modes
  * (reference: native_shim/src/expr.rs:1156-1176 — nearest / higher / lower /
  * midpoint / linear; `Describe()` uses nearest at DataFrame.cs:686-688).
  *
  * Spark's built-in `percentile` is linear-only, so the other modes are
  * composed as aggregate expressions: sort the group's values once
  * (`sort_array(collect_list(x))`) and index with the mode's position
  * arithmetic (h = q·(n−1), 0-based). Exact quantiles inherently buffer one
  * group's values — identical to Spark's own Percentile aggregate — so
  * per-group cardinality bounds memory, not dataset size.
  */
object Quantiles {

  sealed trait Interpolation
  case object Linear extends Interpolation
  case object Lower extends Interpolation
  case object Higher extends Interpolation
  case object Nearest extends Interpolation
  case object Midpoint extends Interpolation

  /** Aggregate expression: quantile of `c` at `q` with the given mode. */
  def quantile(c: Column, q: Double, interpolation: Interpolation = Linear): Column = {
    val sorted = sort_array(collect_list(c.cast("double")))
    val n = size(sorted)
    val h = lit(q) * (n - lit(1)).cast("double")
    val lo = element_at(sorted, floor(h).cast("int") + 1)
    val hi = element_at(sorted, ceil(h).cast("int") + 1)
    val out = interpolation match {
      case Lower => lo
      case Higher => hi
      case Nearest => element_at(sorted, floor(h + lit(0.5)).cast("int") + 1)
      case Midpoint => (lo + hi) / lit(2.0)
      case Linear => lo + (h - floor(h)) * (hi - lo)
    }
    when(n > 0, out)
  }

  /** Sketch-based quantile for groups too large to buffer exactly — the
    * 100 TB twin of [[quantile]] (a superset of the reference's exact-only
    * surface). Wraps Spark's `percentile_approx` (KLL-style sketch, bounded
    * memory, map-side mergeable partials). `accuracy` trades memory for
    * error: rank error ≤ 1/accuracy. */
  def quantileApprox(c: Column, q: Double, accuracy: Int = 10000): Column =
    percentile_approx(c.cast("double"), lit(q), lit(accuracy))
}
