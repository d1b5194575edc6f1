package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eager-feeling `Series` facade — the reference's fundamental 1-D
  * abstraction (reference: native_shim/src/types.rs:24-26, series.rs;
  * Polars.CSharp/Series.cs: named typed columnar array with vectorized
  * arith/compare/agg at series.rs:559-753).
  *
  * Spark has no standalone columnar vector; a Series here is a named
  * single-column DataFrame, so every op stays a distributed plan and two
  * Series of the same length zip positionally (the reference's alignment
  * semantics) via the row-index join used by horizontal concat. Aggregations
  * return scalars eagerly like the reference's `sum()`/`mean()` getters.
  */
final class Series private (val name: String, private val df: DataFrame) {

  private def unary(f: Column => Column, newName: String = name): Series =
    new Series(newName, df.select(f(col(name)).as(newName)))

  def rename(newName: String): Series = unary(identity, newName)
  def cast(t: String): Series = unary(_.cast(t))
  def abs: Series = unary(org.apache.spark.sql.functions.abs)
  def sqrt: Series = unary(org.apache.spark.sql.functions.sqrt)
  def exp: Series = unary(org.apache.spark.sql.functions.exp)
  def isNull: Series = unary(_.isNull)
  def isNotNull: Series = unary(_.isNotNull)
  /** NaN family (series.rs:719-753); NaN ≠ null, matching the reference. */
  def isNan: Series = unary(c => c.isNotNull && isnan(c))
  def isNotNan: Series = unary(c => c.isNull || !isnan(c))
  def isFinite: Series =
    unary(c => !isnan(c) && c =!= lit(Double.PositiveInfinity) && c =!= lit(Double.NegativeInfinity))
  def isInfinite: Series =
    unary(c => c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity))

  /** Vectorized binary op against a scalar. */
  def +(v: Double): Series = unary(_ + lit(v))
  def -(v: Double): Series = unary(_ - lit(v))
  def *(v: Double): Series = unary(_ * lit(v))
  def /(v: Double): Series = unary(_ / lit(v))

  /** Vectorized compare against a scalar (series.rs:559-633). */
  def eq(v: Any): Series = unary(_ === lit(v))
  def neq(v: Any): Series = unary(_ =!= lit(v))
  def lt(v: Any): Series = unary(_ < lit(v))
  def ltEq(v: Any): Series = unary(_ <= lit(v))
  def gt(v: Any): Series = unary(_ > lit(v))
  def gtEq(v: Any): Series = unary(_ >= lit(v))

  /** Positional compare/boolean ops vs another Series (series.rs:559-717). */
  def eq(other: Series): Series = zipWith(other, _ === _, name)
  def neq(other: Series): Series = zipWith(other, _ =!= _, name)
  def lt(other: Series): Series = zipWith(other, _ < _, name)
  def ltEq(other: Series): Series = zipWith(other, _ <= _, name)
  def gt(other: Series): Series = zipWith(other, _ > _, name)
  def gtEq(other: Series): Series = zipWith(other, _ >= _, name)
  def and(other: Series): Series = zipWith(other, _ && _, name)
  def or(other: Series): Series = zipWith(other, _ || _, name)
  def xor(other: Series): Series = zipWith(other, _ =!= _, name)

  /** Positional zip with another Series (reference series arithmetic). */
  def zipWith(other: Series, f: (Column, Column) => Column, newName: String): Series = {
    import graft.api.frame._
    val joined = df.concatHorizontal(other.df.select(col(other.name).as("__other")))
    new Series(newName, joined.select(f(col(name), col("__other")).as(newName)))
  }
  def +(other: Series): Series = zipWith(other, _ + _, name)
  def -(other: Series): Series = zipWith(other, _ - _, name)
  def *(other: Series): Series = zipWith(other, _ * _, name)
  def /(other: Series): Series = zipWith(other, _ / _, name)

  // eager scalar aggregations (series.rs:559-753)
  def len(): Long = df.count()
  def sum(): Double = agg(org.apache.spark.sql.functions.sum(col(name)))
  def mean(): Double = agg(avg(col(name)))
  def min(): Double = agg(org.apache.spark.sql.functions.min(col(name)).cast("double"))
  def max(): Double = agg(org.apache.spark.sql.functions.max(col(name)).cast("double"))
  def nullCount(): Long =
    df.agg(org.apache.spark.sql.functions.sum(when(col(name).isNull, 1L).otherwise(0L)))
      .collect()(0).getLong(0)

  private def agg(c: Column): Double = {
    val r = df.agg(c.cast("double")).collect()(0)
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** Positional slice (series.rs:214 `pl_series_slice(offset, length)`;
    * Series.cs:610 — negative offset counts from the end). Semantics match
    * the reference exactly: `start = offset >= 0 ? min(offset, len) :
    * max(len + offset, 0)`, then length clips to what remains — out-of-range
    * never throws, it returns the empty/short series. A non-negative offset
    * stays fully lazy (row-index filter, no job); a negative offset needs
    * the length and pays one count — the same cost the eager reference pays
    * implicitly by owning the materialized array. */
  def slice(offset: Long, length: Long): Series = {
    require(length >= 0, s"slice length must be >= 0, got $length")
    val start =
      if (offset >= 0) offset
      else math.max(len() + offset, 0L)
    val sliced = graft.api.frame.withRowIndex(df)
      .filter(col("__idx") >= start && col("__idx") < start + length)
      .select(col(name))
    new Series(name, sliced)
  }
  /** First/last n rows (reference head/tail via slice). */
  def head(n: Long = 10L): Series = slice(0L, n)
  def tail(n: Long = 10L): Series = slice(-n, n)

  /** Materialize (reference per-cell getters, series.rs:439-553). */
  def toSeq[T: scala.reflect.ClassTag]: Seq[T] = df.collect().map(_.getAs[T](0)).toSeq
  def toFrame: DataFrame = df
}

object Series {
  def apply(name: String, values: Seq[Any])(implicit spark: SparkSession): Series = {
    import spark.implicits._
    val df = values.headOption match {
      case Some(_: Int) => values.map(_.asInstanceOf[Int]).toDF(name)
      case Some(_: Long) => values.map(_.asInstanceOf[Long]).toDF(name)
      case Some(_: Double) => values.map(_.asInstanceOf[Double]).toDF(name)
      case Some(_: String) => values.map(_.asInstanceOf[String]).toDF(name)
      case Some(_: Boolean) => values.map(_.asInstanceOf[Boolean]).toDF(name)
      case other => throw new IllegalArgumentException(s"unsupported series type: $other")
    }
    new Series(name, df)
  }
  def fromColumn(name: String, df: DataFrame): Series =
    new Series(name, df.select(col(name)))
}
