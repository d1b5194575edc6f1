package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.IO

/** JDBC source/sink e2e — mirrors the reference's database integration suite
  * (Polars.CSharp.Tests/IntegrationTests.cs: SQL Server via Testcontainers;
  * DataFrame.ReadDatabase DataFrame.cs:204-230, WriteTo/SqlBulkCopy
  * DataFrame.cs:634-660, DbToArrowStream.cs:10-57). No container engine here,
  * so two REAL embedded engines stand in: Apache Derby (on the Spark
  * classpath) and DuckDB via its JDBC driver — write → read-back → exact
  * compare, plus the partitioned-scan and pushdown plan shapes that make the
  * source usable at scale.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  // keep derby.log out of the repo working dir
  System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))

  private val derbyUrl = "jdbc:derby:memory:graft_test;create=true"

  test("Derby: typed round-trip write -> scan -> exact compare") {
    val df = Seq(
      (1L, "alpha", 1.5, true, java.sql.Date.valueOf("2024-01-31"),
        java.sql.Timestamp.valueOf("2024-01-31 12:34:56")),
      (2L, "beta", -0.25, false, java.sql.Date.valueOf("2023-06-15"),
        java.sql.Timestamp.valueOf("2023-06-15 00:00:01")),
      (3L, null, 99.0, true, null, null),
    ).toDF("id", "name", "score", "flag", "d", "ts")
    IO.writeJdbc(df, derbyUrl, "roundtrip")
    val back = IO.scanJdbc(spark, derbyUrl, "roundtrip")
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("Derby: overwrite mode replaces, append mode accumulates") {
    val a = Seq((1L, "x")).toDF("id", "v")
    IO.writeJdbc(a, derbyUrl, "modes")
    IO.writeJdbc(Seq((2L, "y")).toDF("id", "v"), derbyUrl, "modes", mode = SaveMode.Append)
    assert(IO.scanJdbc(spark, derbyUrl, "modes").count() == 2)
    IO.writeJdbc(a, derbyUrl, "modes") // overwrite back to one row
    assert(IO.scanJdbc(spark, derbyUrl, "modes").count() == 1)
  }

  test("Derby: partitioned scan splits the read into N parallel queries") {
    val cust = sf("customer").select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    IO.writeJdbc(cust, derbyUrl, "cust_part")
    val back = IO.scanJdbcPartitioned(spark, derbyUrl, "cust_part",
      "c_custkey", 1L, 150L, 8)
    assert(back.rdd.getNumPartitions == 8)
    assert(back.count() == cust.count())
    // exact content, all stripes included (below lower / above upper too)
    assert(back.agg(sum(col("c_custkey"))).head().getLong(0) ==
      cust.agg(sum(col("c_custkey"))).head().getLong(0))
  }

  test("Derby: filters push down into the JDBC scan (not post-filtered in Spark)") {
    IO.writeJdbc(sf("customer").select(col("c_custkey"), col("c_name")),
      derbyUrl, "cust_push")
    val filtered = IO.scanJdbc(spark, derbyUrl, "cust_push")
      .filter(col("c_custkey") > 100L)
    val scan = filtered.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("c_custkey"),
      s"filter not pushed to JDBC:\n$scan")
  }

  test("DuckDB: second-engine round-trip through a file-backed database") {
    val dir = java.nio.file.Files.createTempDirectory("graft_duck").toFile
    val url = s"jdbc:duckdb:${dir.getAbsolutePath}/e2e.duckdb"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.duckdb.DuckDBDriver")
    val nat = sf("nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    IO.writeJdbc(nat, url, "nation_rt", props)
    val back = IO.scanJdbc(spark, url, "nation_rt", props)
    assert(back.collect().map(_.toSeq).toSet == nat.collect().map(_.toSeq).toSet)
  }
}
