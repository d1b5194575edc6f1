package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL facade mirroring the reference's `SqlContext`
  * (reference: native_shim/src/sql.rs:12-65; Polars.CSharp/SqlContext.cs:14-53).
  *
  * register(name, frame) + execute(query) → lazy frame; on Spark this is temp
  * views + spark.sql, which runs through the same Catalyst pipeline as the
  * DataFrame API — strictly a superset of the Polars SQL dialect.
  */
final class SqlContext(spark: SparkSession) {
  def register(name: String, df: DataFrame): SqlContext = {
    df.createOrReplaceTempView(name); this
  }
  def execute(query: String): DataFrame = spark.sql(query)
  def unregister(name: String): SqlContext = {
    spark.catalog.dropTempView(name); this
  }
  def tables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq
}

object SqlContext {
  def apply(spark: SparkSession): SqlContext = new SqlContext(spark)
}
