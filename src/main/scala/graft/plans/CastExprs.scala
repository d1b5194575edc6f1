package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
import org.apache.spark.sql.types.DataType

/** ANSI-mode cast, independent of `spark.sql.ansi.enabled`.
  *
  * The reference's strict cast (native_shim/src/expr.rs:1015-1033) raises on
  * overflow/unparseable input regardless of engine configuration; a plain
  * `Column.cast` follows the session's eval mode, which a user can flip. This
  * pins `EvalMode.ANSI` on the Cast node itself so `castStrict` is always
  * strict (and `try_cast` stays the lenient twin).
  */
object CastExprs {
  /** Register SQL-callable form: graft_cast_ansi(col, 'ddl-type'). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cast_ansi", exprs => Cast(exprs(0),
        DataType.fromDDL(exprs(1).eval().toString), None, EvalMode.ANSI),
      "built-in")
  }
}
