package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** forward_fill / backward_fill with optional limit
  * (reference: native_shim/src/expr.rs:1066-1101).
  *
  * Polars fills are positional on frame order; in a distributed plan an
  * explicit order column is required (documented semantic delta, SURVEY §7.1).
  * The `limit` variant bounds the fill distance in rows: implemented by also
  * carrying the row position of the last non-null and comparing distances —
  * still two window passes over one shuffle, no driver-side loops.
  */
object Fill {

  def forwardFill(c: Column, order: Seq[Column], partitionBy: Seq[Column] = Seq.empty,
                  limit: Option[Int] = None): Column =
    fill(c, order, partitionBy, limit, forward = true)

  def backwardFill(c: Column, order: Seq[Column], partitionBy: Seq[Column] = Seq.empty,
                   limit: Option[Int] = None): Column =
    fill(c, order, partitionBy, limit, forward = false)

  private def fill(c: Column, order: Seq[Column], partitionBy: Seq[Column],
                   limit: Option[Int], forward: Boolean): Column = {
    val ordered = if (forward) order else order.map(_.desc)
    val w0 =
      (if (partitionBy.nonEmpty) Window.partitionBy(partitionBy.toIndexedSeq: _*)
       else Window.partitionBy()).orderBy(ordered.toIndexedSeq: _*)
    val w = w0.rowsBetween(Window.unboundedPreceding, 0)
    val filled = last(c, ignoreNulls = true).over(w)
    limit match {
      case None => filled
      case Some(n) =>
        val rn = row_number().over(w0)
        val lastPos = max(when(c.isNotNull, rn)).over(w)
        when(c.isNotNull, c).otherwise(when(rn - lastPos <= lit(n), filled))
    }
  }
}
