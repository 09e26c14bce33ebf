package graft

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC / MERGE-apply semantics: latest-wins, delete, untouched rows,
  * idempotence, and arrival-order invariance. */
class CdcSpec extends SparkSpec {

  import Cdc.applyChanges

  private def base() = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "amt")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("latest change wins, deletes remove, untouched rows survive") {
    import spark.implicits._
    val ch = Seq(
      (1L, 1, "U", "stale", 11.0), // must LOSE to version 2
      (1L, 2, "U", "new", 12.0),
      (2L, 2, "D", "b", 20.0),     // delete key 2
      (4L, 1, "U", "ins", 40.0)    // brand-new key → insert
    ).toDF("k", "version", "op", "status", "amt")
    val got = rows(applyChanges(base(), ch, Seq("k"), "version", "op"))
    assert(got == Set((1L, "new", 12.0), (3L, "c", 30.0), (4L, "ins", 40.0)))
  }

  test("applying the same batch twice is a no-op (retry safety)") {
    import spark.implicits._
    val ch = Seq(
      (1L, 2, "U", "new", 12.0),
      (2L, 2, "D", "b", 20.0)
    ).toDF("k", "version", "op", "status", "amt")
    val once = applyChanges(base(), ch, Seq("k"), "version", "op")
    val twice = applyChanges(once, ch, Seq("k"), "version", "op")
    assert(rows(twice) == rows(once))
  }

  test("result is invariant to change-batch partitioning and order") {
    import spark.implicits._
    val ch = Seq(
      (1L, 1, "U", "stale", 11.0), (1L, 2, "U", "new", 12.0),
      (2L, 2, "D", "b", 20.0), (4L, 1, "U", "ins", 40.0)
    ).toDF("k", "version", "op", "status", "amt")
    val a = rows(applyChanges(base(), ch, Seq("k"), "version", "op"))
    val b = rows(applyChanges(
      base(), ch.orderBy(col("amt").desc).repartition(7),
      Seq("k"), "version", "op"))
    assert(a == b)
  }

  test("version-tie winner is invariant to the batch's column order") {
    import spark.implicits._
    // Two changes for key 1 with the SAME version: the pinned
    // (op, data-cols-by-name) tie-break must pick the same winner no
    // matter how the caller ordered the batch's columns (ADVICE r7).
    val ch = Seq(
      (1L, 2, "U", "aaa", 99.0),
      (1L, 2, "U", "zzz", 11.0)
    ).toDF("k", "version", "op", "status", "amt")
    val reordered = ch.select("amt", "status", "op", "version", "k")
    val a = rows(applyChanges(base(), ch, Seq("k"), "version", "op"))
    val b = rows(applyChanges(base(), reordered, Seq("k"), "version", "op"))
    assert(a == b)
    // name order: amt sorts before status, so amt=99.0 wins the tie
    assert(a.contains((1L, "aaa", 99.0)))
  }

  test("changes missing an after-image column are rejected") {
    import spark.implicits._
    val ch = Seq((1L, 2, "U", "new")).toDF("k", "version", "op", "status")
    val e = intercept[IllegalArgumentException] {
      applyChanges(base(), ch, Seq("k"), "version", "op")
    }
    assert(e.getMessage.contains("after-images"))
  }
}
