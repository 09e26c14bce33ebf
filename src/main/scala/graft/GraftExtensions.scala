package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotProduct

/** SQL surface for the engine's native expressions and the planner rule
  * for the native as-of join, injected through the PUBLIC extensions API:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * The DataFrame operators do NOT require the extension to be installed —
  * they build the expressions directly, and [[graft.plans.AsOf.join]]
  * installs its strategy per-session on first use — so the library works
  * in any session; the extension adds the SQL names and makes the as-of
  * strategy available session-wide up front. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    // graft_zorder2(x, y): the Morton clustering key (Layout.zOrder2) as
    // a SQL name — built from existing codegen'd integer expressions, so
    // registration is a composition, not a new Expression class
    ext.injectFunction((
      new FunctionIdentifier("graft_zorder2"),
      new ExpressionInfo(Layout.getClass.getName, "graft_zorder2"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Layout.zOrder2Expr(exprs(0), exprs(1))))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
