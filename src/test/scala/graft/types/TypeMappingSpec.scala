package graft.types

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Hive ⇄ Spark type-name mapping, with the DECIMAL(p,s) surface the
  * reference explicitly gave up on (ref: feast_hive/hive_type_map.py:84-85
  * — decimal commented out of every table) covered end to end: name
  * round-trip, parquet write→read round-trip preserving precision/scale,
  * and exact decimal values surviving the loader. */
class TypeMappingSpec extends SparkSpec {

  test("hive name → spark type → hive name round-trips, decimal included") {
    val cases = Seq(
      "tinyint" -> ByteType, "smallint" -> ShortType, "int" -> IntegerType,
      "bigint" -> LongType, "float" -> FloatType, "double" -> DoubleType,
      "timestamp" -> TimestampType, "date" -> DateType,
      "string" -> StringType, "boolean" -> BooleanType,
      "binary" -> BinaryType,
      "decimal(12,2)" -> DecimalType(12, 2),
      "decimal(38,18)" -> DecimalType(38, 18),
      "array<decimal(9,4)>" -> ArrayType(DecimalType(9, 4)))
    cases.foreach { case (hive, spark_) =>
      assert(TypeMapping.hiveToSpark(hive) == spark_, s"hiveToSpark($hive)")
      assert(TypeMapping.sparkToHive(spark_) == hive, s"sparkToHive($spark_)")
    }
    // DESCRIBE-style spellings normalize
    assert(TypeMapping.hiveToSpark("DECIMAL( 7 , 3 )") == DecimalType(7, 3))
  }

  test("decimal columns round-trip through parquet with exact values") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_decimal").toString + "/t.parquet"
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DecimalType(12, 2))))
    val rows = Seq(
      Row(1L, new java.math.BigDecimal("12345.67")),
      Row(2L, new java.math.BigDecimal("-0.01")),
      Row(3L, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(dir)
    val back = graft.Tables.readParquet(spark, dir)
    assert(back.schema("amount").dataType == DecimalType(12, 2))
    val got = back.orderBy("id").collect()
    assert(got(0).getDecimal(1) == new java.math.BigDecimal("12345.67"))
    assert(got(1).getDecimal(1) == new java.math.BigDecimal("-0.01"))
    assert(got(2).isNullAt(1))
    // exact aggregation: decimal sums carry no FP error
    val total = back.agg(sum("amount").cast("decimal(18,2)")).collect()(0)
    assert(total.getDecimal(0) == new java.math.BigDecimal("12345.66"))
  }

  test("unsupported names fail loudly instead of mapping silently") {
    intercept[IllegalArgumentException](TypeMapping.hiveToSpark("uniontype"))
    intercept[IllegalArgumentException](
      TypeMapping.sparkToHive(CalendarIntervalType))
  }
}
