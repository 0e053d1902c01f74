package graft.types

import org.apache.spark.sql.types._

/** Canonical type mapping for incoming data.
  *
  * Mirrors the reference's Arrow→Iceberg type registry
  * (reference: `src/iceberg_loader/utils/types.py:24-86`): narrow ints
  * widen to Integer, 64-bit ints to Long, unsigned-64 to Decimal(20,0),
  * null-typed columns to String, decimals pass through, anything outside
  * the supported set raises. Custom overrides are registrable
  * (`utils/types.py:56-57,119-120`).
  *
  * Two surfaces:
  *   - [[TypeRegistry.canonicalize]] over Spark [[DataType]]s (used when a
  *     DataFrame arrives with a schema Spark already inferred);
  *   - [[TypeRegistry.fromArrowName]] over Arrow-style type names (used by
  *     the messy-JSON ingest path and for reference-parity tests,
  *     `tests/test_type_mappings.py:8-39`).
  */
final class TypeRegistry private (custom: Map[DataType, DataType]) {

  /** Register a custom mapping consulted before the defaults. */
  def register(from: DataType, to: DataType): TypeRegistry =
    new TypeRegistry(custom + (from -> to))

  /** Map an incoming Spark type to its canonical table type.
    * Throws [[IllegalArgumentException]] on unsupported types, like the
    * reference (`utils/types.py:86`).
    */
  def canonicalize(dt: DataType): DataType = custom.getOrElse(dt, dt match {
    case ByteType | ShortType | IntegerType => IntegerType
    case LongType                           => LongType
    case FloatType                          => FloatType
    case DoubleType                         => DoubleType
    case StringType                         => StringType
    case BooleanType                        => BooleanType
    case BinaryType                         => BinaryType
    case DateType                           => DateType
    case TimestampType                      => TimestampType
    case TimestampNTZType                   => TimestampNTZType
    case NullType                           => StringType // utils/types.py:60-61
    case d: DecimalType                     => d          // utils/types.py:81-84
    // Extension beyond the reference (which JSON-stringifies nesting):
    // numeric arrays are first-class for the embedding operators.
    case ArrayType(e, n) => ArrayType(canonicalize(e), n)
    case other =>
      throw new IllegalArgumentException(s"Unsupported data type: $other")
  })

  def canonicalizeSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(dataType = canonicalize(f.dataType))))

  /** Arrow-style type-name mapping (reference `utils/types.py:24-54,68-84`).
    * Covers the widening rules the reference tests pin down: any int ≤32
    * bits → Integer, 64-bit signed → Long, uint64 → Decimal(20,0) (no
    * unsigned type exists), tz-aware timestamps → Timestamp, naive →
    * TimestampNTZ, null → String.
    */
  def fromArrowName(name: String): DataType = {
    val n = name.trim.toLowerCase
    val decimalRe = """decimal(?:128|256)?\((\d+)\s*,\s*(-?\d+)\)""".r
    val tsRe = """timestamp\[(s|ms|us|ns)(?:,\s*tz=([^\]]+))?\]""".r
    n match {
      case "string" | "utf8" | "large_string"              => StringType
      case "int8" | "int16" | "int32" | "uint8" | "uint16" => IntegerType
      case "uint32"                                        => LongType
      case "int64"                                         => LongType
      case "uint64"                                        => DecimalType(20, 0)
      case "float" | "float32" | "halffloat"               => FloatType
      case "double" | "float64"                            => DoubleType
      case "bool" | "boolean"                              => BooleanType
      case "binary" | "large_binary"                       => BinaryType
      case "date32" | "date64" | "date"                    => DateType
      case "null"                                          => StringType
      case decimalRe(p, s)                                 => DecimalType(p.toInt, s.toInt)
      case tsRe(_, tz) => if (tz != null) TimestampType else TimestampNTZType
      case other =>
        throw new IllegalArgumentException(s"Unsupported data type: $other")
    }
  }
}

object TypeRegistry {
  val default: TypeRegistry = new TypeRegistry(Map.empty)
  def apply(): TypeRegistry = default
}
