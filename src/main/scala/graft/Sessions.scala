package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for the driver entry points (Verify,
  * Bench) and tests — one place for the configs every run needs. */
object Sessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // write µs-unit timestamps (not INT96) so DuckDB/pyarrow read back the
      // exact instants the oracle computes
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.parquet carries TIMESTAMP(NANOS), unreadable natively; read as
      // long and convert in the loader (SparkEntry.t)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
