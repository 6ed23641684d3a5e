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

  private def fileScans(
      df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def go(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(go)
    }
    go(df.queryExecution.executedPlan)
  }

  test("q01: the date filter is pushed into the parquet scan, columns pruned") {
    // assert on the scan node's actual requiredSchema / metadata, not the
    // plan string — toString truncates ReadSchema/PushedFilters past
    // spark.sql.maxMetadataStringLength, so a substring check can pass
    // vacuously on a wide unpruned schema
    val df = operators.Cleaning.pipelineAgg(s, TestSpark.sf)
    val li = fileScans(df).filter(_.requiredSchema.fieldNames.exists(_.startsWith("l_")))
    assert(li.nonEmpty, s"expected a lineitem parquet scan:\n${planOf(df)}")
    assert(li.exists(_.metadata.get("PushedFilters").exists(_.contains("l_shipdate"))),
      s"the shipdate predicate must reach the scan: " +
        li.map(_.metadata.getOrElse("PushedFilters", "")).mkString("; "))
    // column pruning: the scan's schema must not read the full 16-column
    // lineitem row for a 7-column aggregation
    val fields = li.flatMap(_.requiredSchema.fieldNames).toSet
    assert(!fields.contains("l_comment") && !fields.contains("l_receiptdate"),
      s"unused lineitem columns must be pruned from the scan, got: $fields")
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
