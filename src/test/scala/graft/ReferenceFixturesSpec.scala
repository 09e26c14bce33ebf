package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.FeatureView
import graft.sources.FeatureSource

/** Ports of the reference's two nastiest fixture classes:
  *
  *  - MIXED-TIMEZONE entity timestamps through the PIT join: the reference
  *    feeds the same instants as tz-naive, UTC, fixed-offset(+01:00) and
  *    US/Pacific pandas timestamps and requires identical results
  *    (tests/feast_tests_funcs.py:15-30, create_dataset:370-390;
  *    normalization at hive.py:355-360). A JVM Timestamp is already an
  *    instant, so the meaningful port goes through the PARSER: the same
  *    instants written as naive / 'Z' / '+01:00' / '-08:00' SQL timestamp
  *    literals must produce identical PIT results.
  *
  *  - ABNORMAL UPLOAD round-trip (tests/test_all.py:211-241,
  *    test_upload_abnormal_df): NaN doubles, float32, int32, categorical
  *    (a low-cardinality string here) and NULL strings must survive an
  *    upload → SQL read-back unchanged. */
class ReferenceFixturesSpec extends SparkSpec {

  // Three renderings of the SAME four instants (session tz is UTC).
  // 12:00Z == 13:00+01:00 == 04:00-08:00 (US/Pacific standard time).
  private val naive = Seq(
    "2024-01-15 12:00:00", "2024-01-15 13:30:00",
    "2024-01-15 15:00:00", "2024-01-16 01:45:00")
  private val zulu = naive.map(_.replace(" ", "T") + "Z")
  private val plus1 = Seq(
    "2024-01-15T13:00:00+01:00", "2024-01-15T14:30:00+01:00",
    "2024-01-15T16:00:00+01:00", "2024-01-16T02:45:00+01:00")
  private val pacific = Seq(
    "2024-01-15T04:00:00-08:00", "2024-01-15T05:30:00-08:00",
    "2024-01-15T07:00:00-08:00", "2024-01-15T17:45:00-08:00")

  private def entityFrom(reprs: Seq[String]): DataFrame = {
    import spark.implicits._
    reprs.zipWithIndex.map { case (s, i) => (100L + i, 5001L + i % 2, s) }
      .toDF("order_id", "driver_id", "ts_str")
      .select(col("order_id"), col("driver_id"),
        to_timestamp(col("ts_str")).as("event_timestamp"))
  }

  private def featureView(): FeatureView = {
    import spark.implicits._
    Seq(
      (5001L, Timestamp.valueOf("2024-01-15 11:00:00"), 0.11),
      (5001L, Timestamp.valueOf("2024-01-15 13:00:00"), 0.13),
      (5002L, Timestamp.valueOf("2024-01-15 12:30:00"), 0.21),
      (5002L, Timestamp.valueOf("2024-01-16 01:00:00"), 0.22))
      .toDF("driver_id", "event_timestamp", "conv_rate")
      .createOrReplaceTempView("tz_stats")
    FeatureView(
      name = "tz_stats",
      entities = Seq("driver_id"),
      source = FeatureSource(table = Some("tz_stats")),
      features = Seq("conv_rate"),
      ttlSeconds = 0)
  }

  test("PIT join results are identical across timestamp zone renderings") {
    val fv = featureView()
    def run(reprs: Seq[String]): Seq[(Long, Long, Option[Any])] =
      PointInTime.getHistoricalFeatures(entityFrom(reprs), Seq(fv))
        .collect().toSeq.map(r =>
          (r.getAs[Long]("order_id"), r.getAs[Timestamp]("event_timestamp").getTime,
            Option(r.getAs[Any]("conv_rate"))))
        .sortBy(_._1)

    val base = run(naive)
    assert(base.exists(_._3.isDefined), "fixture must join some features")
    assert(run(zulu) == base, "'Z' rendering diverged from naive")
    assert(run(plus1) == base, "'+01:00' rendering diverged from naive")
    assert(run(pacific) == base, "'-08:00' rendering diverged from naive")
    // and the instants themselves survived parsing: 12:00:00Z epoch-ms
    assert(base.head._2 == 1705320000000L)
  }

  test("abnormal df (NaN/float32/int32/categorical/None) round-trips upload") {
    import spark.implicits._
    val df = Seq(
      (1.0, 1.0f, 3, "test", "foo"),
      (Double.NaN, 1.0f, 3, "train", "oof"),
      (0.11122123123, 1.0f, 3, "test", "ofo"),
      (0.331412414132123123131231, 1.0f, 3, "train", null))
      .toDF("a", "c", "d", "e", "f")

    val eng = new Engine(spark)
    // physical round-trip (CTAS), ref's temporarily_upload_df_to_hive
    eng.createTableAs("graft_abnormal_rt", df)
    try {
      val back = spark.sql("SELECT * FROM graft_abnormal_rt")
      // parquet read-back is always nullable; the reference's own compare
      // is check_dtype=False — we keep dtypes strict, nullability lax
      assert(back.schema.fields.map(f => f.name -> f.dataType).toSeq ==
        df.schema.fields.map(f => f.name -> f.dataType).toSeq,
        "dtypes must survive the round-trip")
      def key(r: org.apache.spark.sql.Row) = (
        java.lang.Double.doubleToLongBits(r.getDouble(0)), // NaN-safe compare
        r.getFloat(1), r.getInt(2), r.getString(3), Option(r.getString(4)))
      assert(back.collect().map(key).toSet == df.collect().map(key).toSet)
      // the NaN and the NULL both survived distinctly
      assert(back.filter(isnan(col("a"))).count() == 1)
      assert(back.filter(col("f").isNull).count() == 1)
    } finally eng.dropTable("graft_abnormal_rt")
  }

  test("temp-view upload round-trips the same abnormal values") {
    import spark.implicits._
    val df = Seq((Double.NaN, "x"), (2.0, null)).toDF("a", "f")
    new Engine(spark).uploadEntityDf("graft_abnormal_view", df)
    val back = spark.sql("SELECT * FROM graft_abnormal_view")
    assert(back.schema == df.schema)
    assert(back.filter(isnan(col("a"))).count() == 1)
    assert(back.filter(col("f").isNull).count() == 1)
  }
}
