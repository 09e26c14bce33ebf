package graft

import java.sql.Timestamp
import java.time.{Instant, ZonedDateTime, ZoneId, ZoneOffset}

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ports of the reference's seeded dataset generators
  * (ref: tests/feast_tests_funcs.py:33-220) and the nested-loop as-of
  * oracle (ref: tests/feast_tests_funcs.py:263-367).
  *
  * The reference cycles four timezone STYLES for the same instants
  * (naive, UTC, +01:00, US/Pacific — feast_tests_funcs.py:15-30) to prove
  * UTC normalization; on the JVM a Timestamp IS an instant, so we
  * construct the same instants through different ZoneId routes — the
  * round-trip proves zone-of-construction can't leak into results. */
object Fixtures {

  final case class DriverStat(
      event_timestamp: Timestamp, driver_id: Long, conv_rate: Float,
      acc_rate: Float, avg_daily_trips: Int, created: Timestamp)
  final case class OrderRow(
      order_id: Long, driver_id: Long, customer_id: Long,
      order_is_success: Int, event_timestamp: Timestamp)

  val Now: Instant = Instant.parse("2026-08-12T00:00:00Z")

  /** Same instant constructed via a rotating zone — must be equal no
    * matter the route (ref: feast_tests_funcs.py:22-30). */
  def zonedInstant(base: Instant, i: Int): Timestamp = {
    val zones = Seq(
      ZoneOffset.UTC, ZoneId.of("UTC"), ZoneOffset.ofHours(1),
      ZoneId.of("America/Los_Angeles"))
    val z = zones(i % zones.length)
    Timestamp.from(ZonedDateTime.ofInstant(base, z).toInstant)
  }

  /** ref: feast_tests_funcs.py:92-150 — hourly grid × drivers, constant
    * created ts, plus injected duplicate rows for created-ts dedup. */
  def driverStats(spark: SparkSession, nDrivers: Int = 20,
      hours: Int = 48, seed: Int = 42): DataFrame = {
    import spark.implicits._
    val rnd = new Random(seed)
    val created = Timestamp.from(Now)
    val base = for {
      h <- 0 until hours
      d <- 5001L until (5001L + nDrivers)
    } yield DriverStat(
      zonedInstant(Now.minusSeconds(3600L * (hours - h)), h.toInt),
      d, rnd.nextFloat(), rnd.nextFloat(), rnd.nextInt(1000), created)
    // Injected duplicates with a NEWER created ts and different values:
    // the created-ts dedup must pick these (ref: feast_tests_funcs.py:143-148).
    val dups = base.take(2).map(r => r.copy(
      conv_rate = 9.99f,
      created = Timestamp.from(Now.plusSeconds(60))))
    spark.createDataFrame(rnd.shuffle(base ++ dups))
  }

  /** ref: feast_tests_funcs.py:33-89,205-220 — entity spine spanning far
    * beyond feature TTLs so NULL paths are exercised. */
  def orders(spark: SparkSession, n: Int = 200, nDrivers: Int = 20,
      seed: Int = 42): DataFrame = {
    val rnd = new Random(seed)
    import spark.implicits._
    val span = 30L * 24 * 3600
    (0 until n).map { i =>
      OrderRow(
        100L + i,
        5001L + rnd.nextInt(nDrivers),
        1001L + rnd.nextInt(10),
        rnd.nextInt(2),
        zonedInstant(
          Now.minusSeconds(span).plusSeconds((2L * span * i) / n), i))
    }.toDF()
  }

  /** Nested-loop as-of oracle (ref: tests/feast_tests_funcs.py:263-316):
    * latest record with ts in [entityTs - ttl, entityTs] (ttl=0 ⇒ no lower
    * bound), ties on ts broken by max created. */
  def findAsof(
      rows: Seq[(Timestamp, Timestamp, Map[String, Any])], // (ts, created, vals)
      entityTs: Timestamp, ttlSeconds: Long): Option[Map[String, Any]] = {
    val lower =
      if (ttlSeconds > 0) Some(Timestamp.from(
        entityTs.toInstant.minusSeconds(ttlSeconds)))
      else None
    val cands = rows.filter { case (ts, _, _) =>
      !ts.after(entityTs) && lower.forall(l => !ts.before(l))
    }
    if (cands.isEmpty) None
    else Some(cands.maxBy { case (ts, created, _) =>
      (ts.getTime, Option(created).map(_.getTime).getOrElse(0L))
    }._3)
  }
}
