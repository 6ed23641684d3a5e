package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The substrate cache's lifecycle contract: bounded LRU over sessions,
  * eviction unpersists. (A weak-keyed map cannot provide this — a Dataset
  * strongly references its own SparkSession, so weak entries never
  * collect; the bound is the honest alternative.)
  */
class SessionCacheSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("bounded LRU: oldest session evicted and its frames unpersisted") {
    val s1 = s.newSession()
    val f1 = SessionCache.cached(s1, "scs:t")(s1.range(10).toDF())
    f1.count() // materialize the cached blocks
    assert(f1.storageLevel != StorageLevel.NONE, "cached while session is live in the LRU")
    // five fresher sessions push s1 past the bound. Distinct plans per
    // session — the CacheManager is SHARED across sessions and dedupes by
    // canonical plan, so an identical range(10) would re-cache s1's entry.
    (1 to 5).foreach { i =>
      val ss = s.newSession()
      SessionCache.cached(ss, "scs:t")(ss.range(100 + i).toDF()).count()
    }
    assert(SessionCache.sessionCount <= 4, "cache must stay bounded")
    assert(f1.storageLevel == StorageLevel.NONE, "eviction must unpersist the session's frames")
  }

  test("same session + key returns the identical cached frame") {
    val ss = s.newSession()
    val a = SessionCache.cached(ss, "scs:same")(ss.range(5).toDF())
    val b = SessionCache.cached(ss, "scs:same")(ss.range(5).toDF())
    assert(a eq b)
  }
}
