package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partitioned layout + partition pruning: the other half of the 100 TB
  * story (bucketing covers join co-location; partitioning covers scan
  * elimination). A year-partitioned copy of orders must answer a one-year
  * query by reading ONLY that year's files.
  */
class PartitioningSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("year-partitioned table prunes partitions for a year filter") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    val orders = s.read.parquet(s"${TestSpark.sf}/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(out)

    val q = s.read.parquet(out).filter(col("o_year") === 1995)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"expected partition filters in:\n$plan")

    // only the 1995 directory is actually read
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains("o_year=1994") || scanned.contains("..."),
      "scan should not enumerate other years")
    // and the values are right
    val direct = orders.filter(col("o_year") === 1995).count()
    assert(q.count() == direct && direct > 0)
  }
}
