package graft

import org.apache.spark.sql.functions._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Async facade (reference DataFrame.cs:163-196 ReadCsvAsync/ReadParquetAsync,
  * AsyncTests.cs Test_Async_IO_And_Execution / Test_Async_Scan_And_Collect):
  * reads and collects return Futures, the calling thread stays free, and
  * CONCURRENT collects interleave as independent Spark jobs — the analogue of
  * the reference's awaited native completion handles. */
class AsyncIoSpec extends SparkSpec {

  private val IO = graft.sources.IO

  test("readCsvAsync + collectAsync round-trip (AsyncTests.cs:8-36)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_async").toFile
    dir.deleteOnExit()
    val csv = new java.io.File(dir, "t.csv")
    val w = new java.io.PrintWriter(csv)
    w.println("name,age"); w.println("alice,30"); w.println("bob,25"); w.close()

    val df = Await.result(IO.scanCsvAsync(spark, csv.getAbsolutePath), 2.minutes)
    assert(df.columns.toSeq == Seq("name", "age"))
    val rows = Await.result(IO.collectAsync(df.orderBy("name")), 2.minutes)
    assert(rows.map(_.getString(0)).toSeq == Seq("alice", "bob"))
  }

  test("readParquetAsync + concurrent collects run as independent jobs (AsyncTests.cs:39-58)") {
    val docs = Await.result(
      IO.scanParquetAsync(spark, "/root/testdata/sf0.001/documents.parquet"), 2.minutes)
    // several async actions in flight at once; each resolves to the same
    // answer its blocking twin gives
    val futs = (1 to 4).map { i =>
      IO.collectAsync(docs.filter(col("doc_id") % 4 === i % 4)
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("s")))
    }
    val expected = (1 to 4).map { i =>
      docs.filter(col("doc_id") % 4 === i % 4)
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("s")).collect()(0)
    }
    val got = Await.result(Future.sequence(futs), 5.minutes).map(_(0))
    assert(got.map(r => (r.getLong(0), r.getLong(1))) ==
      expected.map(r => (r.getLong(0), r.getLong(1))))
  }
}
