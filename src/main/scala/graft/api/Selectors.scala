package graft.api

import org.apache.spark.sql.types._

/** Column-set algebra mirroring the reference's `Selector`
  * (reference: native_shim/src/selectors.rs:21-279).
  *
  * A selector is a pure function `StructType => Seq[String]` resolved against a
  * frame's schema at call time — no Catalyst work needed; resolution order
  * follows schema order (as the reference's wildcard expansion does).
  */
sealed trait Selector { self =>
  def resolve(schema: StructType): Seq[String]

  /** Intersection (selectors.rs:212-226 `and`). */
  def &(other: Selector): Selector = Selector.fn { s =>
    val r = other.resolve(s).toSet; self.resolve(s).filter(r)
  }
  /** Union (selectors.rs:228-242 `or`), keeping schema order. */
  def |(other: Selector): Selector = Selector.fn { s =>
    val keep = (self.resolve(s) ++ other.resolve(s)).toSet
    s.fieldNames.toSeq.filter(keep)
  }
  /** Difference. */
  def -(other: Selector): Selector = Selector.fn { s =>
    val drop = other.resolve(s).toSet; self.resolve(s).filterNot(drop)
  }
  /** Complement (selectors.rs:244-264 `not` = wildcard minus self). */
  def unary_! : Selector = Selector.all - self
}

object Selectors {
  /** all() — selectors.rs:21-29 */
  def all: Selector = Selector.all
  /** exclude(names) — selectors.rs:33-54 */
  def exclude(names: String*): Selector = Selector.fn { s =>
    val drop = names.toSet; s.fieldNames.toSeq.filterNot(drop)
  }
  /** name-pattern selectors on COLUMN NAMES — selectors.rs:65-114 */
  def startsWith(prefix: String): Selector = Selector.fn(_.fieldNames.toSeq.filter(_.startsWith(prefix)))
  def endsWith(suffix: String): Selector = Selector.fn(_.fieldNames.toSeq.filter(_.endsWith(suffix)))
  def contains(sub: String): Selector = Selector.fn(_.fieldNames.toSeq.filter(_.contains(sub)))
  def matches(regex: String): Selector = {
    val p = regex.r
    Selector.fn(_.fieldNames.toSeq.filter(n => p.findFirstIn(n).isDefined))
  }
  /** by_dtype incl. fuzzy matching — selectors.rs:127-197 */
  def byDtype(pred: DataType => Boolean): Selector =
    Selector.fn(s => s.fields.toSeq.filter(f => pred(f.dataType)).map(_.name))
  def string: Selector = byDtype(_ == StringType)
  def temporal: Selector = byDtype {
    case _: TimestampType | _: DateType | TimestampNTZType => true; case _ => false
  }
  def struct: Selector = byDtype(_.isInstanceOf[StructType])
  def list: Selector = byDtype(_.isInstanceOf[ArrayType])
  /** numeric() — selectors.rs:199-206 */
  def numeric: Selector = byDtype(_.isInstanceOf[NumericType])
  def byName(names: String*): Selector = Selector.fn { s =>
    val keep = names.toSet; s.fieldNames.toSeq.filter(keep)
  }
}

object Selector {
  private[api] def fn(f: StructType => Seq[String]): Selector = new Selector {
    def resolve(schema: StructType): Seq[String] = f(schema)
  }
  private[api] val all: Selector = fn(_.fieldNames.toSeq)
}
