package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.SparkPlan

/** Plan-shape proofs for the TPC-H-style queries added in round 8: the
  * oracle gate proves the VALUES; these prove the 100 TB-relevant plan
  * properties — predicates at the scan, dimensions broadcast — that
  * correctness alone cannot see. */
class TpchPlanSpec extends SparkSpec {

  // executed AQE plans bury subtrees inside QueryStageExec leaves (and
  // reused exchanges) — unwrap all of them or scans/joins are invisible
  private def executedNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => a +: executedNodes(a.executedPlan)
      case q: QueryStageExec => q +: executedNodes(q.plan)
      case r: ReusedExchangeExec => r +: executedNodes(r.child)
      case n => Seq(n)
    }

  test("x_q6_revenue pushes every predicate into the parquet scan") {
    val df = SparkEntry.queries("x_q6_revenue")(spark, sf())
    // run THIS QueryExecution so AQE finalizes the inspected plan
    df.queryExecution.toRdd.count()
    val scan = executedNodes(df.queryExecution.executedPlan).collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("expected a FileSourceScanExec leaf"))
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    // all three predicate families must reach the scan: the timestamp
    // range, the discount double range, and the quantity bound
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("LessThan(l_quantity"),
      s"Q6 predicates must push to the scan, got: $pushed")
    // column pruning: only the four referenced columns are read
    val readSchema = scan.metadata.getOrElse("ReadSchema", "")
    Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .foreach(c => assert(readSchema.contains(c), s"$c missing: $readSchema"))
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_tax"),
      s"unreferenced columns must be pruned, got: $readSchema")
  }

  test("x_q14_promo and x_q19_disjunctive broadcast the part dimension") {
    // sf0.01, not sf0.001: at the smallest SF Q19's brand/size/quantity
    // disjunction matches zero build-side rows and AQE rewrites the
    // whole join to EmptyRelation (correct, but then there is no join
    // node left to assert on)
    Seq("x_q14_promo", "x_q19_disjunctive").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf("sf0.01"))
      df.queryExecution.toRdd.count()
      val joins = executedNodes(df.queryExecution.executedPlan).collect {
        case j: BroadcastHashJoinExec => j
      }
      assert(joins.nonEmpty, s"$q: the part dim join must be broadcast; plan:\n" +
        df.queryExecution.executedPlan.toString.take(2500))
    }
  }

  test("x_q21_last_shipper runs EXISTS/NOT EXISTS as semi/anti hash joins") {
    val df = SparkEntry.queries("x_q21_last_shipper")(spark, sf("sf0.01"))
    df.queryExecution.toRdd.count()
    val kinds = executedNodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.joinType.toString
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.joinType.toString
      case j: BroadcastHashJoinExec => j.joinType.toString
    }
    // both quantified predicates must be genuine semi/anti joins keyed on
    // l_orderkey — never a rewritten aggregate-and-count or a nested loop
    assert(kinds.exists(_.startsWith("LeftSemi")),
      s"EXISTS must plan as a left-semi join, got: $kinds")
    assert(kinds.exists(_.startsWith("LeftAnti")),
      s"NOT EXISTS must plan as a left-anti join, got: $kinds")
  }

  test("round-9 TPC-H shapes: broadcast dims, no nested loops beyond " +
    "the licensed 1-row stats row") {
    Seq("x_q2_min_cost", "x_q7_volume", "x_q8_market_share",
      "x_q16_supplier_count", "x_q20_dominant_suppliers",
      "x_q9_profit", "x_q10_returned", "x_q12_late_priority").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf("sf0.01"))
      df.queryExecution.toRdd.count()
      val nodes = executedNodes(df.queryExecution.executedPlan)
      assert(nodes.collect {
        case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"$q: dimension joins must broadcast; plan:\n" +
          df.queryExecution.executedPlan.toString.take(2500))
      val bad = nodes.filter {
        case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
        case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => true
        case _ => false
      }
      assert(bad.isEmpty, s"$q: unlicensed non-equi join: $bad")
    }
    // q11's global scalar is the ONE licensed 1-row broadcast nested
    // loop (the crossJoin stats-row pattern); everything else equi-joins
    val df = SparkEntry.queries("x_q11_important_parts")(spark, sf("sf0.01"))
    df.queryExecution.toRdd.count()
    val nl = executedNodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(nl.size <= 1, s"q11: only the 1-row stats crossJoin may nest: $nl")
  }

  test("x_q20 semi-joins stay semi (no fact-side distinct explosion)") {
    val df = SparkEntry.queries("x_q20_dominant_suppliers")(spark, sf("sf0.01"))
    df.queryExecution.toRdd.count()
    val kinds = executedNodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.joinType.toString
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.joinType.toString
      case j: BroadcastHashJoinExec => j.joinType.toString
    }
    assert(kinds.count(_.startsWith("LeftSemi")) >= 2,
      s"nested IN subqueries must plan as semi joins, got: $kinds")
  }

  test("x_q15_top_supplier broadcasts the 1-row max, never collects") {
    val df = SparkEntry.queries("x_q15_top_supplier")(spark, sf("sf0.01"))
    df.queryExecution.toRdd.count()
    // the scalar-max filter must be a broadcast hash join against the
    // 1-row aggregate (the distributed scalar-subquery shape), so the
    // plan has ≥2 broadcast joins: max-rev attach + supplier dim
    val joins = executedNodes(df.queryExecution.executedPlan).collect {
      case j: BroadcastHashJoinExec => j
    }
    assert(joins.size >= 2,
      s"expected max-row + supplier broadcasts; plan:\n" +
        df.queryExecution.executedPlan.toString.take(2500))
  }
}
