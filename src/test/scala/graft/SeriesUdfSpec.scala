package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.Series

/** Series facade + UDF surface tests (reference SeriesTests.cs / UdfTests.cs). */
class SeriesUdfSpec extends SparkSpec {

  test("series construction, vectorized arith, eager aggs (series.rs:559-753)") {
    implicit val s = spark
    val a = Series("a", Seq(1.0, 2.0, 3.0, 4.0))
    assert(a.len() == 4)
    assert(a.sum() == 10.0 && a.mean() == 2.5 && a.min() == 1.0 && a.max() == 4.0)
    assert((a * 2.0).sum() == 20.0)
    assert((a + 1.0).toSeq[Double] == Seq(2.0, 3.0, 4.0, 5.0))
  }

  test("series positional zip arithmetic") {
    implicit val s = spark
    val a = Series("a", Seq(1.0, 2.0, 3.0))
    val b = Series("b", Seq(10.0, 20.0, 30.0))
    assert((a + b).toSeq[Double] == Seq(11.0, 22.0, 33.0))
    assert((b - a).toSeq[Double] == Seq(9.0, 18.0, 27.0))
  }

  test("series vectorized compare vs scalar and vs series (series.rs:559-717)") {
    implicit val s = spark
    val a = Series("a", Seq(1.0, 2.0, 3.0))
    val b = Series("b", Seq(3.0, 2.0, 1.0))
    assert(a.gt(1.5).toSeq[Boolean] == Seq(false, true, true))
    assert(a.ltEq(2.0).toSeq[Boolean] == Seq(true, true, false))
    assert(a.eq(b).toSeq[Boolean] == Seq(false, true, false))
    assert(a.lt(b).toSeq[Boolean] == Seq(true, false, false))
    assert(a.gtEq(b).toSeq[Boolean] == Seq(false, true, true))
    val p = Series("p", Seq(true, true, false))
    val q = Series("q", Seq(true, false, false))
    assert(p.xor(q).toSeq[Boolean] == Seq(false, true, false))
    assert(p.and(q).toSeq[Boolean] == Seq(true, false, false))
    assert(p.or(q).toSeq[Boolean] == Seq(true, true, false))
  }

  test("series NaN family distinguishes NaN from null (series.rs:719-753)") {
    implicit val s = spark
    val a = Series("a", Seq(1.0, Double.NaN, Double.PositiveInfinity))
    assert(a.isNan.toSeq[Boolean] == Seq(false, true, false))
    assert(a.isNotNan.toSeq[Boolean] == Seq(true, false, true))
    assert(a.isFinite.toSeq[Boolean] == Seq(true, false, false))
    assert(a.isInfinite.toSeq[Boolean] == Seq(false, false, true))
    assert((a / Series("b", Seq(2.0, 1.0, 1.0))).toSeq[Double].head == 0.5)
  }

  test("series from a frame column; cast and null count") {
    import spark.implicits._
    val df = Seq[(java.lang.Integer, String)]((1, "x"), (null, "y"), (3, "z")).toDF("n", "s")
    val n = Series.fromColumn("n", df)
    assert(n.nullCount() == 1)
    assert(n.cast("double").sum() == 4.0)
  }

  test("typed UDF map changes dtype like the reference (UdfTests.cs)") {
    import spark.implicits._
    val f = graft.functions.Udfs.map((i: Int) => s"v$i")
    val got = Seq(1, 2).toDF("x").select(f(col("x")).as("s")).as[String].collect()
    assert(got.toSeq == Seq("v1", "v2"))
  }

  test("nullable UDF map propagates and fills nulls explicitly") {
    import spark.implicits._
    val f = graft.functions.Udfs.mapNullable((o: Option[Int]) => o.map(_ * 2).orElse(Some(-1)))
    val got = Seq[java.lang.Integer](1, null).toDF("x")
      .select(f(col("x")).as("y")).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(2, -1))
  }

  test("mapBatches streams partitions with an explicit schema (io.rs:566-606)") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
    val out = StructType(Seq(StructField("doubled", IntegerType)))
    val got = graft.functions.Udfs.mapBatches(df, out) { rows =>
      rows.map(r => org.apache.spark.sql.Row(r.getInt(0) * 2))
    }
    assert(got.agg(sum("doubled")).collect()(0).getLong(0) == 2 * 5050)
  }

  test("series slice/head/tail: positional, negative offset, clipping (series.rs:214, Series.cs:610)") {
    implicit val s = spark
    val a = Series("a", Seq(10, 20, 30, 40, 50))
    // plain positional slice
    assert(a.slice(1, 3).toSeq[Int] == Seq(20, 30, 40))
    // negative offset counts from the end
    assert(a.slice(-2, 2).toSeq[Int] == Seq(40, 50))
    // length clips to what remains, never throws
    assert(a.slice(3, 100).toSeq[Int] == Seq(40, 50))
    assert(a.slice(10, 5).toSeq[Int] == Seq())
    // negative offset beyond the start clamps to 0 (polars semantics)
    assert(a.slice(-100, 2).toSeq[Int] == Seq(10, 20))
    assert(a.slice(0, 0).toSeq[Int] == Seq())
    assert(a.head(2).toSeq[Int] == Seq(10, 20))
    assert(a.tail(2).toSeq[Int] == Seq(40, 50))
    // tail longer than the series returns the whole series
    assert(a.tail(99).toSeq[Int] == Seq(10, 20, 30, 40, 50))
    // sliced series still participates in positional ops
    assert((a.slice(0, 2) + a.slice(-2, 2)).toSeq[Int] == Seq(50, 70))
  }
}
