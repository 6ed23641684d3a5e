package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the physical-plan invariants PLANS.md documents for the classic
  * queries, so an innocent-looking refactor cannot silently regress the
  * shapes the 100 TB posture rests on: filters reaching the parquet scan,
  * star joins broadcasting every dimension (fact never shuffles), top-k
  * planning as TakeOrderedAndProject. Complements the shape asserts
  * scattered in the per-family specs (q167 TakeOrdered + cartesian-free,
  * q174 single-shuffle windows, BM25 broadcast probe, bucketed no-shuffle
  * join, dedup cartesian-free plans).
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: the date filter is pushed into the parquet scan, columns pruned") {
    val plan = planOf(operators.Cleaning.pipelineAgg(s, TestSpark.sf))
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"the shipdate predicate must reach the scan:\n$plan")
    // column pruning: the scan's schema must not read the full 16-column
    // lineitem row for a 7-column aggregation
    assert(!plan.contains("l_comment") && !plan.contains("l_receiptdate"),
      "unused lineitem columns must be pruned from the scan")
  }

  test("q10: every dimension broadcasts; the only hash exchange is the final agg's") {
    val plan = planOf(operators.Relational.joinRevenue(s, TestSpark.sf))
    val bhj = plan.split("BroadcastHashJoin").length - 1
    assert(bhj >= 3, s"expected >= 3 broadcast dimension joins, got $bhj:\n$plan")
    val hashEx = plan.split("Exchange hashpartitioning").length - 1
    assert(hashEx <= 1,
      s"the fact side must never shuffle (only the final agg may): $hashEx exchanges:\n$plan")
  }

  test("q40: global top-k plans TakeOrderedAndProject, not a full sort") {
    val plan = planOf(operators.Relational.topK(s, TestSpark.sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan per-partition heaps + driver merge:\n$plan")
  }
}
