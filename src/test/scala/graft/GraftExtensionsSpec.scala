package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The extensions class is loaded reflectively by Spark from
  * `spark.sql.extensions` — a signature drift would only surface at
  * session startup in production, so pin it here. */
class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions applies cleanly to a SparkSessionExtensions") {
    // builder-style injection can't be exercised on the suite's shared
    // session (extensions bind at session construction); applying to a
    // fresh extensions registry proves the injections are well-formed
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("graft_dot SQL function matches the DataFrame expression") {
    import spark.implicits._
    // the per-session registration path (same builder used by AsOf.join)
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.DotProduct].getName, "graft_dot"),
      exprs => graft.functions.DotProduct(exprs(0), exprs(1)))
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    df.createOrReplaceTempView("ext_spec_vecs")
    val viaSql = spark.sql(
      "SELECT graft_dot(a, b) AS d FROM ext_spec_vecs").collect()(0).getDouble(0)
    assert(viaSql == 11.0)
  }

  test("graft_zorder2 SQL function matches Layout.zOrder2") {
    import spark.implicits._
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_zorder2"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        Layout.getClass.getName, "graft_zorder2"),
      exprs => Layout.zOrder2Expr(exprs(0), exprs(1)))
    Seq((3L, 5L), (65535L, 0L)).toDF("x", "y")
      .createOrReplaceTempView("ext_spec_z")
    val viaSql = spark.sql(
      "SELECT graft_zorder2(x, y) AS z FROM ext_spec_z ORDER BY z")
      .as[Long].collect().toSeq
    assert(viaSql == Seq(39L, 1431655765L))
  }
}
