package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.StructType
import scala.reflect.runtime.universe.TypeTag

/** UDF surface mirroring the reference's map/map_batches
  * (reference: native_shim/src/udf.rs:27-123 `pl_expr_map` — whole-Series
  * Arrow→Arrow callback; Polars.CSharp/Expr.cs:509-516 typed `Expr.Map`;
  * io.rs:566-606 `pl_lazy_map_batches`).
  *
  * On Spark the typed scalar path is a Catalyst `ScalaUDF` (codegen-called,
  * null-safe via Option), and the batch path is `mapPartitions` — both are
  * optimizer barriers exactly like the reference's UDF nodes
  * (AllowedOptimizations::default() at io.rs:586-593 ≙ Catalyst treating
  * UDFs as opaque).
  */
object Udfs {

  /** Typed scalar map: Expr.Map<TIn,TOut>. Nullable inputs → use Option[I]. */
  def map[I: TypeTag, O: TypeTag](f: I => O): UserDefinedFunction = udf(f)

  /** Null-aware scalar map (reference UdfUtils nullable writers). */
  def mapNullable[I: TypeTag, O: TypeTag](f: Option[I] => Option[O]): UserDefinedFunction =
    udf(f)

  /** Whole-batch map: DataFrame→DataFrame per partition with an explicit
    * output schema (pl_lazy_map_batches). The callback sees an iterator —
    * never a materialized partition — so it streams at any scale. */
  def mapBatches(df: DataFrame, outSchema: StructType)
                (f: Iterator[Row] => Iterator[Row]): DataFrame = {
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions(f)
  }
}
