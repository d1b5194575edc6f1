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
    val df = r.csv(path)
    // skip_rows: the reference drops N physical leading rows before the
    // header. Spark CSV has no skipRows option; emulate by filtering on a
    // monotonic index only when requested (rare path).
    if (skipRows > 0) {
      import org.apache.spark.sql.functions._
      val w = org.apache.spark.sql.expressions.Window.orderBy(monotonically_increasing_id())
      df.withColumn("__rn", row_number().over(w)).filter(col("__rn") > skipRows).drop("__rn")
    } else df
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

  /** JDBC source — covers ReadDatabase/ScanDatabase (DataFrame.cs:204-230,
    * LazyFrame.cs:173-200); naturally re-scannable and partitionable. */
  def scanJdbc(spark: SparkSession, url: String, table: String,
               props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Sinks (io.rs:274-334 eager, io.rs:391-479 streaming): Spark writes are
    * already pipelined + distributed; one path covers both. */
  def sinkParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
  def sinkCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)
  def sinkJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

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
