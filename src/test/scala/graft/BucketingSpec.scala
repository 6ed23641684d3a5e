package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: when both sides are bucketed on the join
  * key, the sort-merge join runs with NO shuffle exchange — the 100 TB
  * answer for repeated fact-fact joins (bucket once, join many times).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    try {
      val wh = java.nio.file.Files.createTempDirectory("graft_buckets")
      s.read.parquet(s"${TestSpark.sf}/orders.parquet")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
      s.read.parquet(s"${TestSpark.sf}/customer.parquet")
        .withColumnRenamed("c_custkey", "o_custkey")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/customer_b").mode("overwrite").saveAsTable("customer_b")

      val joined = s.table("orders_b").join(s.table("customer_b"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle; plan:\n$plan")
      // and it still computes the right thing
      val direct = s.read.parquet(s"${TestSpark.sf}/orders.parquet")
        .join(s.read.parquet(s"${TestSpark.sf}/customer.parquet"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == direct)
    } finally {
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS customer_b")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
