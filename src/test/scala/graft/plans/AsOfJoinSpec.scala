package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{Fixtures, SparkSpec}

/** The native sort-merge as-of join must agree with the nested-loop
  * oracle and the compositional PIT plan on the reference fixtures. */
class AsOfJoinSpec extends SparkSpec {

  test("native as-of equals the nested-loop oracle (ttl + unbounded)") {
    val stats = Fixtures.driverStats(spark)
    val statRows = stats.collect().toSeq.map { r =>
      (r.getAs[Timestamp]("event_timestamp"), r.getAs[Long]("driver_id"),
        r.getAs[Timestamp]("created"),
        Map[String, Any]("conv_rate" -> r.getAs[Float]("conv_rate")))
    }
    val entity = Fixtures.orders(spark)
      .select("order_id", "driver_id", "event_timestamp")
    for (ttl <- Seq(7200L, 0L)) {
      val keyed = AsOf.join(
        entity,
        stats.select(
          col("driver_id"),
          col("event_timestamp").as("f_ts"),
          col("created"), col("conv_rate")),
        keys = Seq("driver_id"),
        entityTsCol = "event_timestamp", featureTsCol = "f_ts",
        createdCol = Some("created"), ttlSeconds = ttl)
      val got = keyed.collect().map { r =>
        r.getAs[Long]("order_id") -> Option(r.getAs[Any]("conv_rate"))
      }.toMap
      entity.collect().foreach { e =>
        val exp = Fixtures.findAsof(
          statRows.filter(_._2 == e.getAs[Long]("driver_id"))
            .map(t => (t._1, t._3, t._4)),
          e.getAs[Timestamp]("event_timestamp"), ttl)
        assert(got(e.getAs[Long]("order_id")) == exp.map(_("conv_rate")),
          s"ttl=$ttl order=${e.getAs[Long]("order_id")}")
      }
    }
  }

  test("created-ts tie-break: same event ts, newest created wins") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val feats = Seq(
      (1L, t0, Timestamp.valueOf("2024-01-01 10:00:01"), 1.0),
      (1L, t0, Timestamp.valueOf("2024-01-01 10:00:09"), 2.0)
    ).toDF("k", "f_ts", "created", "v")
    val ent = Seq((1L, Timestamp.valueOf("2024-01-01 11:00:00")))
      .toDF("k", "ts")
    val out = AsOf.join(ent, feats, Seq("k"), "ts", "f_ts",
      Some("created"), 0L).collect()
    assert(out.length == 1 && out.head.getAs[Double]("v") == 2.0)
  }

  test("self-as-of (same table both sides) does not alias-collide") {
    val events = graft.Tables.read(spark, sf(), "events")
      .select("user_id", "ts", "value")
    val entity = events
      .select(col("user_id"), (col("ts") + expr("INTERVAL 30 MINUTES")).as("ts"))
      .limit(50)
    val out = AsOf.join(entity, events, Seq("user_id"), "ts", "ts",
      None, 3600L)
    assert(out.count() == 50)
    assert(out.columns.count(_ == "value") == 1)
    // right key dropped; colliding feature ts renamed
    assert(out.columns.count(_ == "user_id") == 1)
    assert(out.columns.contains("ts_asof"))
  }

  test("NULL keys match nothing (SQL equi-join semantics)") {
    import spark.implicits._
    val feats = Seq(
      (Option.empty[Long], Timestamp.valueOf("2024-01-01 09:00:00"), 1.0),
      (Some(1L), Timestamp.valueOf("2024-01-01 09:00:00"), 2.0)
    ).toDF("k", "f_ts", "v")
    val ent = Seq(
      (Option.empty[Long], Timestamp.valueOf("2024-01-01 10:00:00")),
      (Some(1L), Timestamp.valueOf("2024-01-01 10:00:00"))
    ).toDF("k", "ts")
    val out = AsOf.join(ent, feats, Seq("k"), "ts", "f_ts", None, 0L)
      .collect().map(r =>
        Option(r.getAs[Any]("k")) -> Option(r.getAs[Any]("v"))).toMap
    assert(out(None) == None, "null-keyed entity row must get NULL features")
    assert(out(Some(1L)) == Some(2.0))
  }

  test("plan contains AsOfJoinExec and exactly one exchange per side") {
    val events = graft.Tables.read(spark, sf(), "events")
      .select("user_id", "ts", "value")
    val entity = events
      .select(col("user_id"), (col("ts") + expr("INTERVAL 30 MINUTES")).as("e_ts"))
    val out = AsOf.join(entity, events, Seq("user_id"), "e_ts", "ts",
      None, 3600L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    val nEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(nEx == 2, s"expected 2 exchanges, got $nEx:\n$plan")
    assert(!plan.contains("Window"), plan)
  }
}
