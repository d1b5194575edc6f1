package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Scan / read / sink surface mirroring the reference's io layer
  * (reference: native_shim/src/io.rs).
  *
  * In the reference, read_* is eager and scan_* is lazy; Spark reads are lazy
  * plans with pushdown, so a single scan covers both (the Parquet/CSV scans
  * get predicate + projection pushdown from Catalyst, strictly more than the
  * reference's AnonymousScan flags at lazy.rs:707-715 allow).
  */
object IO {

  /** Minimal DuckDB JDBC dialect: Spark's generic dialect rethrows the
    * table-existence probe's SQLException unless the dialect recognizes it as
    * object-not-found (JdbcUtils.tableExists), and DuckDB reports catalog
    * misses with its own message shape and no SQLState. URL-match only — no
    * compile dependency on the driver. */
  private object DuckDbDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:duckdb")
    override def isObjectNotFoundException(e: java.sql.SQLException): Boolean =
      e.getMessage != null &&
        (e.getMessage.contains("does not exist") || e.getMessage.contains("Catalog Error"))
  }
  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DuckDbDialect)

  /** CSV scan with reference options (io.rs:16-92): optional schema override,
    * header flag, separator, skip_rows, try_parse_dates. */
  def scanCsv(spark: SparkSession, path: String,
              schema: Option[StructType] = None,
              hasHeader: Boolean = true,
              separator: String = ",",
              skipRows: Int = 0,
              tryParseDates: Boolean = false): DataFrame = {
    var r: DataFrameReader = spark.read
      .option("header", hasHeader.toString)
      .option("sep", separator)
      .option("inferSchema", schema.isEmpty)
    if (tryParseDates) r = r
      .option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").option("dateFormat", "yyyy-MM-dd")
    schema.foreach(s => r = r.schema(s))
    // skip_rows drops N PHYSICAL lines before header parsing (io.rs:16-92:
    // the header itself shifts down). Spark CSV has no skipLines option;
    // read as text, drop N from the file head — which is partition 0 of a
    // Hadoop text read (splits are created in file-offset order) — then
    // parse the line dataset with the same CSV options. Only the head task
    // drops lines; every other partition streams through untouched, so the
    // scan stays fully parallel (the old emulation was a global one-task
    // window — a scale-killer).
    if (skipRows > 0) {
      import spark.implicits._
      val lines = spark.sparkContext.textFile(path)
        .mapPartitionsWithIndex(
          (i, it) => if (i == 0) it.drop(skipRows) else it,
          preservesPartitioning = true)
      r.csv(spark.createDataset(lines))
    } else r.csv(path)
  }

  /** Parquet scan (io.rs:96-124). */
  def scanParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-array read (io.rs:130-142) — multiLine; NDJSON scan (io.rs:145-155)
    * is the Spark default. */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
  def scanNdjson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** ORC scan/sink — a Spark-native columnar format the reference does not
    * offer (beyond-reference coverage): same predicate-pushdown/column-
    * pruning properties as parquet, useful where an existing lake is
    * ORC-based. */
  def scanOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
  def sinkOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Arrow IPC (Feather v2) scan/sink (io.rs:159-179, 308-319) — see
    * [[ArrowIpc]] for the batch-granular parallel read and per-partition
    * streamed write. */
  def scanIpc(spark: SparkSession, path: String): DataFrame = ArrowIpc.read(spark, path)
  def sinkIpc(df: DataFrame, path: String): Unit = ArrowIpc.write(df, path)

  /** JDBC source — covers ReadDatabase/ScanDatabase (DataFrame.cs:204-230,
    * LazyFrame.cs:173-200); naturally re-scannable and partitionable. */
  def scanJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned JDBC scan — the 100 TB-shaped variant: N executors each pull
    * a stride of the partition column concurrently instead of one connection
    * streaming the whole table (the reference reads through a single
    * DbDataReader, DbToArrowStream.cs:10-57 — this strictly dominates it). */
  def scanJdbcPartitioned(spark: SparkSession, url: String, table: String,
                          partitionCol: String, lower: Long, upper: Long,
                          numPartitions: Int,
                          props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  /** JDBC sink — WriteTo/SqlBulkCopy egress (DataFrame.cs:634-660); each
    * partition writes through its own batched connection. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties = new java.util.Properties(),
                mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Sinks (io.rs:274-334 eager, io.rs:391-479 streaming): Spark writes are
    * already pipelined + distributed; one path covers both. */
  def sinkParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
  def sinkCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)
  def sinkJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Async facade (DataFrame.cs:163-196 `ReadCsvAsync`/`ReadParquetAsync`,
    * LazyFrame `CollectAsync`; AsyncTests.cs). Spark actions block their
    * calling thread, so the async face is a `Future` around the blocking
    * call with `blocking` marked — a `ForkJoinPool`-backed context spawns a
    * compensation thread instead of starving its parallelism. Spark's
    * scheduler is thread-safe: concurrent submissions run as independent
    * jobs and share the cluster per `spark.scheduler.mode`. The reference
    * awaits a task that polls a native completion handle; the observable
    * contract (caller thread free, result delivered on completion) is the
    * same. */
  def scanCsvAsync(spark: SparkSession, path: String,
                   schema: Option[StructType] = None,
                   hasHeader: Boolean = true,
                   separator: String = ",",
                   skipRows: Int = 0,
                   tryParseDates: Boolean = false)
                  (implicit ec: scala.concurrent.ExecutionContext): scala.concurrent.Future[DataFrame] =
    scala.concurrent.Future(scala.concurrent.blocking(
      scanCsv(spark, path, schema, hasHeader, separator, skipRows, tryParseDates)))

  def scanParquetAsync(spark: SparkSession, path: String)
                      (implicit ec: scala.concurrent.ExecutionContext): scala.concurrent.Future[DataFrame] =
    scala.concurrent.Future(scala.concurrent.blocking(scanParquet(spark, path)))

  def collectAsync(df: DataFrame)
                  (implicit ec: scala.concurrent.ExecutionContext): scala.concurrent.Future[Array[org.apache.spark.sql.Row]] =
    scala.concurrent.Future(scala.concurrent.blocking(df.collect()))

  /** Batch export to the caller (io.rs:608-657 pl_dataframe_export_batches):
    * partition-at-a-time iterator without materializing the whole result. */
  def exportBatches(df: DataFrame): Iterator[org.apache.spark.sql.Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }

  /** Batch-callback sink (io.rs:489-606 pl_lazy_map_batches used as a sink):
    * runs fn on each partition on the executors. */
  def sinkForeachBatch(df: DataFrame)(fn: Iterator[org.apache.spark.sql.Row] => Unit): Unit =
    df.foreachPartition(fn)
}
