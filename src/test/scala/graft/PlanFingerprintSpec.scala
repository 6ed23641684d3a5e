package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the physical-plan SHAPE of the most expensive bench queries
  * against `src/test/resources/plan_fingerprints.lock` (see
  * [[PlanFingerprint]] for the counted features and the regeneration
  * workflow). The correctness gate cannot see a lost broadcast or an
  * extra exchange — this spec can, and fails with a per-feature diff
  * plus the full plan so the drift is diagnosable from the test output
  * alone.
  */
class PlanFingerprintSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private lazy val lock = PlanFingerprint.readLock()

  test("the lockfile covers exactly PlanFingerprint.locked") {
    assert(lock.keySet == PlanFingerprint.locked.toSet,
      s"lockfile out of sync with PlanFingerprint.locked — regenerate: " +
        s"missing=${PlanFingerprint.locked.filterNot(lock.contains)} " +
        s"stale=${lock.keySet.filterNot(PlanFingerprint.locked.contains)}")
  }

  // one test per locked query, in generation order (cache-population order
  // must match the generator's so session-cached substrates fingerprint
  // identically)
  PlanFingerprint.locked.foreach { name =>
    test(s"$name: plan shape matches the lockfile") {
      // warm-then-fingerprint-fresh: the same steady-state contract the
      // generator uses (see PlanFingerprint.steadyStateFingerprint) — an
      // unexecuted first call would see different cache/stats context
      // depending on which suites ran before this one
      val actual =
        PlanFingerprint.steadyStateFingerprint(SparkEntry.queries(name)(s, TestSpark.sf))
      val expected = lock(name)
      if (actual != expected) {
        val keys = (actual.keySet ++ expected.keySet).toSeq.sorted
        val diff = keys.flatMap { k =>
          val e = expected.getOrElse(k, 0); val a = actual.getOrElse(k, 0)
          if (e != a) Some(s"  $k: locked=$e actual=$a") else None
        }.mkString("\n")
        fail(
          s"""plan shape drifted for $name:
             |$diff
             |If this change is INTENTIONAL, regenerate the lockfile
             |(sbt "runMain graft.PlanFingerprint") and justify it in the
             |commit message. Current plan:
             |${PlanFingerprint.freshPlanOf(SparkEntry.queries(name)(s, TestSpark.sf))
                 .queryExecution.executedPlan}""".stripMargin)
      }
    }
  }
}
