package graft

import graft.operators.{Cleaning, Dedup, ScaleOps}
import org.scalatest.funsuite.AnyFunSuite

/** The engine's central correctness claim: results are bit-identical under
  * any parallelism (the decimal accumulators make double aggregation
  * order-independent, hashes are portable, ties are broken totally). Run the
  * same queries under different shuffle partitioning and compare row sets
  * exactly.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def underPartitions[T](n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("flagship aggregates are identical under 1 vs 32 shuffle partitions") {
    val a = underPartitions(1)(collectSorted(Cleaning.pipelineAgg(s, TestSpark.sf)))
    val b = underPartitions(32)(collectSorted(Cleaning.pipelineAgg(s, TestSpark.sf)))
    assert(a == b)
  }

  test("minhash signatures are identical under 2 vs 16 shuffle partitions") {
    val a = underPartitions(2)(collectSorted(Dedup.minhashCandidates(s, TestSpark.sf)))
    val b = underPartitions(16)(collectSorted(Dedup.minhashCandidates(s, TestSpark.sf)))
    assert(a == b)
  }

  test("count-min sketch and top-k ranking are identical under 1 vs 16 partitions") {
    val a = underPartitions(1)(collectSorted(ScaleOps.heavyHitters(s, TestSpark.sf)))
    val b = underPartitions(16)(collectSorted(ScaleOps.heavyHitters(s, TestSpark.sf)))
    assert(a == b)
  }

  test("persisted-index screening loop is identical under 2 vs 16 partitions") {
    // the most stateful query in the registry: index build/load, branch
    // copy, refresh append, two screens — the summary must not depend on
    // how any of those stages were parallelized
    val a = underPartitions(2)(collectSorted(Dedup.screenLoop(s, TestSpark.sf)))
    val b = underPartitions(16)(collectSorted(Dedup.screenLoop(s, TestSpark.sf)))
    assert(a == b)
  }

  test("IVM loop is identical under 2 vs 16 partitions") {
    // five commits, four change-feed refreshes, broadcast delete resolves,
    // per-round checkpoints — the maintained state must not depend on how
    // any commit's segment or any refresh's join was parallelized
    val a = underPartitions(2)(collectSorted(
      graft.sources.RoundTrip.ivmLoop(s, TestSpark.sf)))
    val b = underPartitions(16)(collectSorted(
      graft.sources.RoundTrip.ivmLoop(s, TestSpark.sf)))
    assert(a == b)
  }

  test("funnel, water-fill, and segment compaction are identical under 1 vs 16 partitions") {
    // round-9 additions: stacked windows over user partitions (q174), the
    // closed-form metadata window + limit-1 cut row (q179), and the
    // branch/refresh/compact store cycle (q178)
    val a1 = underPartitions(1)(collectSorted(graft.operators.Events.funnelSteps(s, TestSpark.sf)))
    val b1 = underPartitions(16)(collectSorted(graft.operators.Events.funnelSteps(s, TestSpark.sf)))
    assert(a1 == b1)
    val a2 = underPartitions(1)(collectSorted(ScaleOps.budgetWaterfill(s, TestSpark.sf)))
    val b2 = underPartitions(16)(collectSorted(ScaleOps.budgetWaterfill(s, TestSpark.sf)))
    assert(a2 == b2)
    val a3 = underPartitions(2)(collectSorted(graft.operators.Search.segmentCompact(s, TestSpark.sf)))
    val b3 = underPartitions(16)(collectSorted(graft.operators.Search.segmentCompact(s, TestSpark.sf)))
    assert(a3 == b3)
  }

  test("cdc apply and importance resample are identical under 1 vs 16 partitions") {
    val a1 = underPartitions(1)(collectSorted(ScaleOps.cdcApply(s, TestSpark.sf)))
    val b1 = underPartitions(16)(collectSorted(ScaleOps.cdcApply(s, TestSpark.sf)))
    assert(a1 == b1)
    val a2 = underPartitions(1)(collectSorted(ScaleOps.importanceResample(s, TestSpark.sf)))
    val b2 = underPartitions(16)(collectSorted(ScaleOps.importanceResample(s, TestSpark.sf)))
    assert(a2 == b2)
  }

  test("kmeans refine and pagerank iterations are identical under 1 vs 16 partitions") {
    // both are iterative: kmeans' decimal component means and pagerank's
    // integer femto-ranks are the two mechanisms that make iteration
    // results independent of how each step was shuffled
    val a = underPartitions(1)(collectSorted(
      graft.operators.Similarity.kmeansRefine(s, TestSpark.sf)))
    val b = underPartitions(16)(collectSorted(
      graft.operators.Similarity.kmeansRefine(s, TestSpark.sf)))
    assert(a == b)
    val a2 = underPartitions(1)(collectSorted(
      graft.operators.Analytics.pageRank(s, TestSpark.sf)))
    val b2 = underPartitions(16)(collectSorted(
      graft.operators.Analytics.pageRank(s, TestSpark.sf)))
    assert(a2 == b2)
  }

  test("classifier logits and RRF fusion are identical under 1 vs 16 partitions") {
    // integer micro-logits (q190) and integer RRF contributions (q193) are
    // the mechanisms that keep model filtering and rank fusion partition-
    // independent — float scores would drift in the low bits here
    val a = underPartitions(1)(collectSorted(
      graft.operators.Search.qualityClassifier(s, TestSpark.sf)))
    val b = underPartitions(16)(collectSorted(
      graft.operators.Search.qualityClassifier(s, TestSpark.sf)))
    assert(a == b)
    val a2 = underPartitions(1)(collectSorted(
      graft.operators.Search.hybridRrf(s, TestSpark.sf)))
    val b2 = underPartitions(16)(collectSorted(
      graft.operators.Search.hybridRrf(s, TestSpark.sf)))
    assert(a2 == b2)
  }

  test("kNN graph and its cluster closure are identical under 2 vs 16 partitions") {
    // the classic hazard this family carries: per-pair double folds
    // (rounded to 9 before any ranking), window ties broken on neighbor
    // id, a checkpointed reciprocity join, and a CC closure whose label
    // is the component minimum — none of it may depend on how the cell
    // self-join or the union-find input was parallelized
    val a = underPartitions(2)(collectSorted(
      graft.operators.Similarity.knnGraph(s, TestSpark.sf)))
    val b = underPartitions(16)(collectSorted(
      graft.operators.Similarity.knnGraph(s, TestSpark.sf)))
    assert(a == b)
    val a2 = underPartitions(2)(collectSorted(
      graft.operators.Similarity.knnClusters(s, TestSpark.sf)))
    val b2 = underPartitions(16)(collectSorted(
      graft.operators.Similarity.knnClusters(s, TestSpark.sf)))
    assert(a2 == b2)
  }
}
