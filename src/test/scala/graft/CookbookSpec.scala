package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.api.syntax._
import graft.api.frame._

/** Parity cookbook (r13 directive 8): the reference README's own showcase
  * examples (reference: README.md:18-39 quick start, :45-58 trades/quotes
  * as-of join, :62-75 UDF map), re-expressed through `graft.api` —
  * the user-facing proof that a Polars.NET user's queries compose the
  * same way here, with the results pinned by hand-computed expectations.
  * Doc-style: each test's body is the cookbook entry.
  */
class CookbookSpec extends SparkSpec {
  import spark.implicits._

  test("quick start: scan CSV -> filter -> group_by/agg -> sort -> collect") {
    // reference README.md:18-39 —
    //   Polars.scanCsv "data.csv" None
    //   |> Polars.filterLazy (Polars.col "age" .> Polars.lit 18)
    //   |> Polars.groupByLazy [col "department"]
    //        [col("salary").Mean().Alias("avg_salary"); count().Alias("count")]
    //   |> Polars.sortLazy (Polars.col "avg_salary") true
    //   |> Polars.collect
    val dir = java.nio.file.Files.createTempDirectory("graft_cookbook").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "data.csv"),
      """name,department,age,salary
        |ada,eng,35,120.0
        |bob,eng,17,40.0
        |cyd,eng,28,100.0
        |dee,sales,45,90.0
        |eli,sales,19,70.0
        |fin,ops,52,80.0
        |""".stripMargin)
    val lf = graft.sources.IO.scanCsv(spark, s"$dir/data.csv")
    val df = lf
      .filter(col("age") > lit(18))
      .groupBy(col("department"))
      .agg(avg(col("salary")).as("avg_salary"),
        graft.api.syntax.len().as("count")) // Polars.count()
      .sortBy(Seq(("avg_salary", true))) // descending, like sortLazy _ true
    df.show() // the README's Polars.show
    val got = df.as[(String, Double, Long)].collect().toSeq
    assert(got == Seq(("eng", 110.0, 2L), ("sales", 80.0, 2L), ("ops", 80.0, 1L))
      || got == Seq(("eng", 110.0, 2L), ("ops", 80.0, 1L), ("sales", 80.0, 2L)),
      got.toString) // ties may order either way, as in the reference
  }

  test("time-series: trades matched to the latest quote within 2 minutes (as-of)") {
    // reference README.md:45-58 —
    //   lfTrades |> Polars.joinAsOf lfQuotes (col "time") (col "time")
    //     [] [] (Some "backward") (Some "2m") |> Polars.collect
    val trades = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:30"), 101.0),
      (Timestamp.valueOf("2024-01-01 10:03:30"), 102.0), // quote 2m31s old: out of tolerance
      (Timestamp.valueOf("2024-01-01 10:05:10"), 103.0)
    ).toDF("time", "price")
    val quotes = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:59"), 100.8, 101.2), // AFTER trade 1: not matched
      (Timestamp.valueOf("2024-01-01 10:00:00"), 100.9, 101.1),
      (Timestamp.valueOf("2024-01-01 10:04:45"), 102.9, 103.1)
    ).toDF("time", "bid", "ask")
    val res = graft.operators.AsofJoin.join(trades, quotes,
      leftOn = "time", rightOn = "time",
      strategy = graft.operators.AsofJoin.Backward, tolerance = Some("2m"))
    val got = res.orderBy(col("time"))
      .select(col("price"), col("bid"), col("ask"))
      .collect().map(r => (r.getDouble(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got == Seq(
      (101.0, Some(100.9), Some(101.1)), // latest quote at/before 10:00:30
      (102.0, None, None),               // nearest earlier quote too stale
      (103.0, Some(102.9), Some(103.1))), got.toString)
  }

  test("UDF: custom scalar logic applied to a column (README's addOne)") {
    // reference README.md:62-75 —
    //   let addOne (x: int) = x + 1
    //   lf |> Polars.withColumn (col "value" |> fun e -> e.Map(mapInt32 addOne))
    val addOne = graft.functions.Udfs.map[Int, Int](_ + 1)
    val out = Seq(1, 41, -1).toDF("value")
      .withColumn("value", addOne(col("value")))
      .as[Int].collect().toSeq
    assert(out.sorted == Seq(0, 2, 42))
  }
}
