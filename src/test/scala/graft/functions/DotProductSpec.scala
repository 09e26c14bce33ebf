package graft.functions

import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Native DotProduct: parity with the HOF fold (bit-exact), null handling,
  * mixed element types, codegen presence. */
class DotProductSpec extends SparkSpec {

  private def dotCol(a: String, b: String) =
    GraftSql.column(DotProduct(
      GraftSql.expression(col(a)), GraftSql.expression(col(b))))

  test("bit-exact parity with aggregate(zip_with(...)) fold") {
    import spark.implicits._
    val df = Seq(
      (Array(1.5f, -2.25f, 3.0f), Array(0.5f, 4.0f, -1.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.3f, 0.2f, 0.1f))
    ).toDF("a", "b")
    val rows = df.select(
      dotCol("a", "b").as("native"),
      aggregate(
        zip_with(
          transform(col("a"), x => x.cast("double")),
          transform(col("b"), x => x.cast("double")),
          (x, y) => x * y),
        lit(0d), (acc, x) => acc + x).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null ELEMENT yields null (matches the HOF fold)") {
    val df = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS a, array(1.0D, 2.0D) AS b")
    val native = df.select(dotCol("a", "b")).collect().head
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0d), (acc, x) => acc + x)).collect().head
    assert(hof.isNullAt(0), "HOF reference must be NULL")
    assert(native.isNullAt(0), "native must match the HOF's NULL")
  }

  test("null array yields null; mixed float/double widens") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Array(3.0, 4.0)),
      (None, Array(1.0, 1.0))
    ).toDF("a", "b")
    val got = df.select(dotCol("a", "b")).collect()
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0))
  }

  test("non-array input is rejected at analysis") {
    import spark.implicits._
    val df = Seq((1, Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception] { df.select(dotCol("a", "b")).collect() }
    assert(e.getMessage.contains("graft_dot"))
  }

  test("expression participates in codegen (no fallback)") {
    // a local Seq collapses to LocalTableScan (no stages) — use a real
    // parquet scan so a WholeStageCodegen stage exists to inspect
    val emb = graft.Tables.read(spark, sf(), "embeddings")
      .select(col("embedding").as("a"), col("embedding").as("b"))
    val plan = emb.select(dotCol("a", "b")).queryExecution.executedPlan
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    assert(plan.toString.linesIterator.exists(l =>
      l.contains("graft_dot") && l.trim.startsWith("*(")),
      s"expected graft_dot inside a codegen stage:\n$plan")
  }
}
