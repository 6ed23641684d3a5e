package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup stack behavior on the fixtures: the injected exact/near duplicates
  * must actually be caught, and the plans must stay scale-safe (band-bucket
  * equi-joins, never a cartesian product).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("exact dedup counts the injected identical copies") {
    val rows = Dedup.dedupExact(s, TestSpark.sf)
      .agg(sum("n_dup_docs")).collect()(0).getLong(0)
    assert(rows > 0, "injected exact duplicates must be found")
  }

  test("minhash LSH finds the injected exact-copy pairs with sig_sim == 1.0") {
    val cand = Dedup.minhashCandidates(s, TestSpark.sf).cache()
    // exact copies (doc_id + 200000) collide on every band
    val exactPairs = cand.filter(col("db") === col("da") + 200000L && col("sig_sim") === 1.0)
    assert(exactPairs.count() > 0)
  }

  test("jaccard verification: exact copies have jacc == 1.0 and is_dup") {
    val j = Dedup.jaccardVerify(s, TestSpark.sf)
      .filter(col("db") === col("da") + 200000L)
    assert(j.count() > 0)
    assert(j.filter(!col("is_dup")).count() == 0)
    assert(j.agg(min("jacc")).collect()(0).getDouble(0) == 1.0)
  }

  test("simhash: identical docs get identical fingerprints") {
    val fp = Dedup.simhash(s, TestSpark.sf)
    val a = fp.filter(col("doc_id") === 0L).collect()(0).getLong(1)
    val b = fp.filter(col("doc_id") === 200000L).collect()(0).getLong(1)
    assert(a == b)
  }

  test("multi-signal clustering path contains no cartesian product") {
    val plan = Dedup.multiSignalClusters(s, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
  }

  test("candidate generation contains no cartesian product in the plan") {
    val plan = Dedup.minhashCandidates(s, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan was:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan was:\n$plan")
  }
}
