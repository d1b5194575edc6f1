package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical as an explicit dictionary-encoded pair — the Spark-first
  * answer to Polars' physical Categorical type (reference datatypes.rs:76:
  * `DataType::Categorical` is semantically String, physically dense codes).
  *
  * Storage-side dictionary encoding already happens inside parquet; what a
  * cluster actually gains from categoricals is COMPUTE on small fixed-width
  * codes — shuffles, joins and group-bys keyed on an int instead of a
  * string. That is exactly what this exposes: `encode` splits a column into
  * (codes, dictionary), the heavy operators run on the codes, `decode` maps
  * back at the end through a broadcast join of the tiny dictionary.
  *
  * Codes are dense 0-based ints in category sort order — deterministic
  * across runs and partitionings (Polars' insertion-order codes are
  * scan-order-dependent, which has no stable meaning on a distributed scan).
  * The dictionary is tiny by the definition of "categorical", so its
  * single-partition row_number window is a few rows on the driver-side scale
  * and both joins broadcast.
  */
object Categorical {

  /** Returns (encoded frame, dictionary). The encoded frame drops `column`
    * and carries `codeCol: int` as its LAST column (join-appended — select
    * afterwards if positional layout matters); null categories get null
    * codes. Dictionary schema: (column, codeCol). */
  def encode(df: DataFrame, column: String, codeCol: String): (DataFrame, DataFrame) = {
    require(!df.columns.contains(codeCol),
      s"code column '$codeCol' already exists in the frame")
    val dict = df.select(col(column)).where(col(column).isNotNull).distinct()
      .withColumn(codeCol, row_number().over(Window.orderBy(col(column))) - 1)
    val encoded = df.join(broadcast(dict), Seq(column), "left").drop(column)
    (encoded, dict)
  }

  /** Re-attach the category values for `codeCol` (dropping the codes; null
    * codes stay as null categories via the left join). */
  def decode(df: DataFrame, dict: DataFrame, codeCol: String): DataFrame = {
    val categoryCol = dict.columns.filterNot(_ == codeCol).head
    require(!df.columns.contains(categoryCol),
      s"category column '$categoryCol' already exists in the frame")
    df.join(broadcast(dict), Seq(codeCol), "left").drop(codeCol)
  }
}
