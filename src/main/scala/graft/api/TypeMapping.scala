package graft.api

import org.apache.spark.sql.types._

/** Reference type system → Spark type mapping (SURVEY §1.2; reference:
  * native_shim/src/datatypes.rs:51-79).
  *
  * Deltas, documented once here and normalized everywhere:
  *  - unsigned ints widen (Spark has none): u8→Short, u16→Int, u32→Long,
  *    u64→Decimal(20,0) (the shim itself funnels u64→i64 in scalar getters,
  *    eager.rs:409-420);
  *  - Time (ns-since-midnight) → Long (reference physical repr,
  *    series.rs:522-530);
  *  - Datetime default unit µs ≡ Spark µs exactly; ns truncates;
  *  - Categorical → String (identical functional semantics);
  *  - Decimal defaults to (38, 9) when precision/scale unset
  *    (datatypes.rs:344-345).
  */
object TypeMapping {

  /** Polars kind code (datatypes.rs:51-79) → Spark DataType. */
  val byKind: Map[Int, DataType] = Map(
    1 -> BooleanType, 2 -> ByteType, 3 -> ShortType, 4 -> IntegerType, 5 -> LongType,
    6 -> ShortType, 7 -> IntegerType, 8 -> LongType, 9 -> DecimalType(20, 0), // u8..u64 widened
    10 -> FloatType, 11 -> DoubleType,
    12 -> StringType,
    13 -> DateType,
    14 -> TimestampNTZType, // naive µs default; tz-aware → TimestampType
    15 -> LongType,         // Time: ns since midnight
    16 -> DayTimeIntervalType(), // Duration, µs
    17 -> BinaryType,
    18 -> NullType,
    21 -> StringType,       // Categorical
    22 -> DecimalType(38, 9),
  )

  def byName(name: String): DataType = name.toLowerCase match {
    case "boolean" => BooleanType
    case "int8" => ByteType; case "int16" => ShortType
    case "int32" => IntegerType; case "int64" => LongType
    case "uint8" => ShortType; case "uint16" => IntegerType
    case "uint32" => LongType; case "uint64" => DecimalType(20, 0)
    case "float32" => FloatType; case "float64" => DoubleType
    case "string" | "categorical" => StringType
    case "date" => DateType
    case "datetime" => TimestampNTZType
    case "time" => LongType
    case "duration" => DayTimeIntervalType()
    case "binary" => BinaryType
    case "decimal" => DecimalType(38, 9)
    case other => throw new IllegalArgumentException(s"unknown reference type: $other")
  }
}
