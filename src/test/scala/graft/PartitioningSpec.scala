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

  test("AQE splits a skewed sort-merge join at runtime") {
    import s.implicits._
    Engine.tune(s)
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> s.conf.getOption(k)).toMap
    try {
      // thresholds scaled down so the fixture-sized hot key trips the same
      // AQE machinery that handles real skew at cluster scale
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val hot = s.range(300000).select(lit(0L).as("k"), col("id").as("v"))
        .union(s.range(1000).select((col("id") % 50 + 1).as("k"), col("id").as("v")))
      val dim = s.range(51).select(col("id").as("k"), (col("id") * 10).as("w"))
      val j = hot.join(dim, "k")
      // action on j's OWN QueryExecution — an action on a derived frame
      // would leave this AdaptiveSparkPlan un-finalized
      assert(j.collect().length == 301000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot partition as skewed:\n$plan")
    } finally prev.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    }
  }
}
