package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import graft.sources.FeatureSource

/** Source abstraction + schema introspection + nanos repair
  * (ref: tests/test_all.py:132-185). */
class SourcesSpec extends SparkSpec {

  test("events nanos timestamps are repaired to TimestampType") {
    val df = Tables.read(spark, sf(), "events")
    assert(df.schema("ts").dataType == TimestampType)
    // and values are sane microsecond instants in 2024
    val r = df.selectExpr("min(year(ts))", "max(year(ts))").head()
    assert(r.getInt(0) == 2024 && r.getInt(1) == 2024)
  }

  test("non-nanos tables read untouched") {
    val df = Tables.read(spark, sf(), "lineitem")
    assert(df.schema("l_orderkey").dataType == LongType)
    // Spark 4 reads parquet timestamps with isAdjustedToUTC=false as NTZ;
    // under a UTC session both behave identically — accept either.
    assert(Set[org.apache.spark.sql.types.DataType](
      TimestampType, TimestampNTZType).contains(df.schema("l_shipdate").dataType))
  }

  test("schema introspection is analysis-only and post-fieldMapping") {
    val src = FeatureSource(
      path = Some(s"${sf()}/events.parquet"),
      eventTimestampColumn = "event_ts",
      fieldMapping = Map("ts" -> "event_ts"))
    val cols = src.columnNamesAndTypes(spark).toMap
    assert(cols.contains("event_ts") && !cols.contains("ts"))
    assert(cols("event_ts") == "timestamp")
  }

  test("query source requires a name; table source defaults its name") {
    intercept[DataSourceNoNameException] {
      FeatureSource(query = Some("SELECT 1"), eventTimestampColumn = "ts")
    }
    val t = FeatureSource(table = Some("events_tbl"), eventTimestampColumn = "ts")
    assert(t.resolvedName == "events_tbl")
  }

  test("missing table raises DataSourceNotFoundException") {
    intercept[DataSourceNotFoundException] {
      FeatureSource(table = Some("graft_no_such_table"),
        eventTimestampColumn = "ts").resolve(spark)
    }
  }

  test("tableQueryString mirrors the reference's forms") {
    assert(FeatureSource(table = Some("db.t"), eventTimestampColumn = "ts")
      .tableQueryString == "`db.t`")
    assert(FeatureSource(query = Some("SELECT 1"), name = Some("q"),
      eventTimestampColumn = "ts").tableQueryString == "(SELECT 1)")
  }
}
