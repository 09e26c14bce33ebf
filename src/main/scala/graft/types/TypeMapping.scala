package graft.types

import org.apache.spark.sql.types._

/** Hive type-name ⇄ Spark `DataType` mapping with the same coverage as the
  * reference's Hive ⇄ Feast ⇄ Arrow tables
  * (ref: feast_hive/hive_type_map.py:8-24, 27-62, 65-79).
  *
  * The reference has no nested types (no array/map/struct); we additionally
  * accept `array<...>` because the extension operators (embeddings) need it.
  */
object TypeMapping {

  private val decimalRe = raw"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)".r
  private val arrayRe = raw"array\s*<(.+)>".r
  private val varcharRe = raw"(?:varchar|char)\s*\(\s*\d+\s*\)".r

  /** Hive type name (as `DESCRIBE` prints it) → Spark DataType.
    * ref: feast_hive/hive_type_map.py:65-79 (hive → pa), :8-24 (hive → feast).
    */
  def hiveToSpark(hiveType: String): DataType =
    hiveType.trim.toLowerCase match {
      case "tinyint"                       => ByteType
      case "smallint"                      => ShortType
      case "int" | "integer"               => IntegerType
      case "bigint"                        => LongType
      case "float"                         => FloatType
      case "double" | "numeric"            => DoubleType
      case "timestamp"                     => TimestampType
      case "date"                          => DateType
      case "string" | "varchar" | "char"   => StringType
      case varcharRe()                     => StringType
      case "boolean"                       => BooleanType
      case "binary"                        => BinaryType
      case "null" | "void"                 => NullType
      case decimalRe(p, s)                 => DecimalType(p.toInt, s.toInt)
      case arrayRe(el)                     => ArrayType(hiveToSpark(el))
      case other =>
        throw new IllegalArgumentException(s"Unsupported Hive type: $other")
    }

  /** Spark DataType → Hive type name.
    * ref: feast_hive/hive_type_map.py:27-62 (pa → hive, upload direction).
    */
  def sparkToHive(dt: DataType): String = dt match {
    case ByteType                 => "tinyint"
    case ShortType                => "smallint"
    case IntegerType              => "int"
    case LongType                 => "bigint"
    case FloatType                => "float"
    case DoubleType               => "double"
    case TimestampType            => "timestamp"
    case DateType                 => "date"
    case StringType               => "string"
    case BooleanType              => "boolean"
    case BinaryType               => "binary"
    case NullType                 => "null"
    case d: DecimalType           => s"decimal(${d.precision},${d.scale})"
    case ArrayType(el, _)         => s"array<${sparkToHive(el)}>"
    case other =>
      throw new IllegalArgumentException(s"Unsupported Spark type: $other")
  }
}
