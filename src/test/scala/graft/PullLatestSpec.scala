package graft

import java.sql.Timestamp
import java.time.{ZonedDateTime, ZoneId}

import graft.sources.FeatureSource

/** Materialization-correctness fixture (ref: tests/feast_tests_funcs.py:
  * 370-400, test_all.py:491-502): 5 rows with mixed-timezone construction,
  * field_mapping, created-ts tie-break; expected as-of answers per the
  * reference. */
class PullLatestSpec extends SparkSpec {

  private val now = Fixtures.Now
  private def t(secsAgo: Long): Timestamp =
    Timestamp.from(now.minusSeconds(secsAgo))
  // (now-4h as Europe/Berlin wall-instant) — same instant, different route
  private val berlin = Timestamp.from(
    ZonedDateTime.ofInstant(now.minusSeconds(4 * 3600),
      ZoneId.of("Europe/Berlin")).toInstant)

  private def fixture() = {
    import spark.implicits._
    val df = Seq(
      (1L, Some(0.1), t(4 * 3600), t(0)),
      (2L, None, t(0), t(0)),
      (1L, Some(0.3), t(3 * 3600), t(0)),
      (3L, Some(4.0), berlin, t(0)),
      (3L, Some(5.0), t(1 * 3600), t(0))
    ).toDF("id", "value", "ts_1", "created_ts")
    df.createOrReplaceTempView("mat_correctness")
    FeatureSource(
      table = Some("mat_correctness"),
      eventTimestampColumn = "ts",
      createdTimestampColumn = Some("created_ts"),
      // ref: test_all.py:84-91 — field_mapping renames source→model cols,
      // including the event-ts column itself.
      fieldMapping = Map("ts_1" -> "ts", "id" -> "driver_id"))
  }

  test("pullLatest returns newest row per key in inclusive range") {
    val src = fixture()
    val out = new Engine(spark).pullLatest(
      src, Seq("driver_id"), Seq("value"), "ts", Some("created_ts"),
      startDate = t(5 * 3600), endDate = t(0)).toDF
      .collect().map(r => r.getAs[Long]("driver_id") ->
        Option(r.getAs[Any]("value"))).toMap
    // driver 1: latest is now-3h → 0.3; driver 2: now → null value;
    // driver 3: now-1h → 5.0 (ref expected answers)
    assert(out(1L) == Some(0.3))
    assert(out(2L) == None)
    assert(out(3L) == Some(5.0))
  }

  test("range upper bound excludes later rows") {
    val src = fixture()
    val out = new Engine(spark).pullLatest(
      src, Seq("driver_id"), Seq("value"), "ts", Some("created_ts"),
      startDate = t(5 * 3600), endDate = t(2 * 3600)).toDF
      .collect().map(r => r.getAs[Long]("driver_id") ->
        Option(r.getAs[Any]("value"))).toMap
    assert(out(1L) == Some(0.3)) // now-3h within [now-5h, now-2h]
    assert(out(3L) == Some(4.0)) // now-4h; the now-1h row is out of range
    assert(!out.contains(2L))    // driver 2's only row is at `now`
  }

  test("keyless pull latest returns global top-1 with dummy entity") {
    val src = fixture()
    val out = new Engine(spark).pullLatest(
      src, Nil, Seq("value"), "ts", Some("created_ts"),
      startDate = t(5 * 3600), endDate = t(30 * 60)).toDF.collect()
    assert(out.length == 1)
    assert(out.head.getAs[String](
      graft.model.FeatureView.DummyEntityId) == "")
    assert(out.head.getAs[Double]("value") == 5.0) // now-1h is newest ≤ now-30m
  }

  test("created-ts desc breaks event-ts ties") {
    import spark.implicits._
    val df = Seq(
      (7L, 1.0, t(3600), t(600)),
      (7L, 2.0, t(3600), t(60)) // same event ts, NEWER created → wins
    ).toDF("driver_id", "value", "ts", "created_ts")
    df.createOrReplaceTempView("tie_tbl")
    val out = new Engine(spark).pullLatest(
      FeatureSource(table = Some("tie_tbl"), eventTimestampColumn = "ts",
        createdTimestampColumn = Some("created_ts")),
      Seq("driver_id"), Seq("value"), "ts", Some("created_ts"),
      startDate = t(7200), endDate = t(0)).toDF.collect()
    assert(out.length == 1 && out.head.getAs[Double]("value") == 2.0)
  }
}
