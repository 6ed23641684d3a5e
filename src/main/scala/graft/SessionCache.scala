package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bounded per-session materialization cache for shared substrate frames
  * (the dedup shingle/signature/candidate tables, the contamination gram
  * index): one build, N consumer queries, exactly as a production pipeline
  * materializes its intermediate tables once per run.
  *
  * Lifetime is explicit, not GC-driven: a Dataset strongly references its
  * SparkSession, so weak-keying a cache by session can never collect —
  * every value reaches its own key, and the "entries become unreachable,
  * ContextCleaner unpersists" lifecycle never fires. Instead this cache
  * holds strong keys in access-order LRU bounded to [[maxSessions]]
  * sessions; evicting a session unpersists every frame it cached. A
  * long-lived JVM that churns through sessions therefore holds at most
  * `maxSessions` sessions' worth of cached RDD blocks, and the common
  * one-session-per-JVM drivers (Verify, Bench, tests) never evict at all.
  *
  * Caveat (inherent to Spark, pinned in SessionCacheSpec): the
  * CacheManager is SHARED across sessions of one SparkContext and keyed by
  * canonical plan, so unpersisting an evicted session's frame also drops a
  * plan-identical frame another live session cached — the next consumer
  * simply recomputes and re-caches, a performance blip, not a correctness
  * hazard.
  */
object SessionCache {

  private val maxSessions = 4

  private final case class Entry(value: Any, cleanup: () => Unit)

  private type Frames = scala.collection.mutable.Map[String, Entry]

  private val perSession =
    new java.util.LinkedHashMap[SparkSession, Frames](16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(e: java.util.Map.Entry[SparkSession, Frames]): Boolean =
        if (size > maxSessions) {
          // best-effort: the evicted session may already be stopped
          e.getValue.values.foreach(en => scala.util.Try(en.cleanup()))
          true
        } else false
    }

  /** Get-or-build the frame for (session, key); the frame is `.cache()`d
    * (lazily — first consumer materializes it). Reentrant: `build` may
    * itself call [[cached]] for its upstream substrate frames.
    */
  def cached(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cachedValue[DataFrame](s, key)(build.cache())(df => { df.unpersist(); () })

  /** Get-or-build an arbitrary memoized value for (session, key) in the
    * SAME bounded LRU as [[cached]] — evicting a session runs each entry's
    * `cleanup` (e.g. unpersisting a checkpointed frame the value holds).
    * For composite run artifacts (the BPE training run) that aren't a bare
    * DataFrame but still pin cluster memory via one.
    */
  def cachedValue[T](s: SparkSession, key: String)(build: => T)(cleanup: T => Unit): T =
    synchronized {
      perSession
        .computeIfAbsent(s, _ => scala.collection.mutable.Map.empty)
        .getOrElseUpdate(key, {
          val v = build
          Entry(v, () => cleanup(v))
        })
        .value
        .asInstanceOf[T]
    }

  /** Number of sessions currently holding cached frames (test hook). */
  private[graft] def sessionCount: Int = synchronized(perSession.size)
}
