package graft

import graft.model.FeatureView
import graft.sources.FeatureSource

/** The native-operator orchestration must return exactly what the
  * compositional flagship returns, across views/ttls/prefixing. */
class NativePitSpec extends SparkSpec {

  private def normalize(df: org.apache.spark.sql.DataFrame) = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
  }

  test("native orchestration equals compositional PIT on fixtures") {
    val stats = Fixtures.driverStats(spark)
    stats.createOrReplaceTempView("native_pit_stats")
    val entity = Fixtures.orders(spark)
    for {
      ttl <- Seq(7200L, 0L)
      full <- Seq(false, true)
    } {
      val fv = FeatureView(
        name = "driver_stats",
        entities = Seq("driver_id"),
        source = FeatureSource(
          table = Some("native_pit_stats"),
          eventTimestampColumn = "event_timestamp",
          createdTimestampColumn = Some("created")),
        features = Seq("conv_rate", "acc_rate"),
        ttlSeconds = ttl)
      val classic = PointInTime.getHistoricalFeatures(
        entity, Seq(fv), fullFeatureNames = full)
      val native = PointInTime.getHistoricalFeaturesNative(
        entity, Seq(fv), fullFeatureNames = full)
      assert(classic.columns.sorted.sameElements(native.columns.sorted),
        s"columns ttl=$ttl full=$full")
      assert(normalize(classic) == normalize(native),
        s"rows differ ttl=$ttl full=$full")
    }
  }
}
