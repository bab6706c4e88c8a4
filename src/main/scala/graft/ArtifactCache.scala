package graft

/** Process-level memoizer for per-source-dir derived artifacts (the
  * co-purchase graph edge set, cluster-label frames, PQ codebooks, shared
  * persisted subtrees). Two guarantees the raw `TrieMap.getOrElseUpdate`
  * idiom it replaces did NOT give:
  *
  *  - '''single-flight build''': the builder runs at most once per key.
  *    `TrieMap.getOrElseUpdate` may evaluate the builder concurrently on
  *    first access and discard one result — for artifacts that are
  *    context-cached RDDs, the loser's cached partitions were never
  *    unpersisted and leaked executor memory for the JVM lifetime.
  *    Builds here run under the cache lock; builders are side-effecting
  *    Spark jobs that take seconds and run once per (JVM, dir), so lock
  *    granularity is irrelevant next to build cost.
  *
  *  - '''eviction''': `evict(key)` / `evictAll()` drop entries and run the
  *    cache's `release` callback (unpersist cached RDDs/frames). Bounded
  *    by construction in this harness (≤2 dirs per JVM), but a long-lived
  *    multi-tenant driver serving many dirs needs the hook — Bench and
  *    Verify call [[ArtifactCache.evictAllCaches]] on teardown and the
  *    eviction spec proves release actually unpersists.
  *
  * Every instance auto-registers in a process-wide registry so teardown
  * code can evict everything without knowing each operator bank's caches.
  */
final class ArtifactCache[V](release: V => Unit) {
  ArtifactCache.register(this)
  private val m = scala.collection.mutable.HashMap.empty[String, V]

  /** Memoized lookup; `build` runs at most once per key, single-flight. */
  def getOrElseUpdate(key: String, build: => V): V =
    synchronized { m.getOrElseUpdate(key, build) }

  /** Insert (replacing and RELEASING any previous value for the key) —
    * the at-most-one-live-entry discipline persistShared sites use.
    * `v` is BY-NAME and evaluated only after the previous entry is
    * released: persistShared passes `df.persist()`, and when a rebuilt
    * frame has the SAME plan as the entry it replaces (same dir), Spark's
    * CacheManager unpersists by plan equality — releasing the old entry
    * after the new persist would silently uncache the new frame too. */
  def put(key: String, v: => V): V = synchronized {
    m.remove(key).foreach(release)
    val value = v
    m.update(key, value)
    value
  }

  def evict(key: String): Unit =
    synchronized { m.remove(key).foreach(release) }

  def evictAll(): Unit = synchronized {
    m.valuesIterator.foreach(release)
    m.clear()
  }

  private[graft] def size: Int = synchronized(m.size)
}

object ArtifactCache {
  private val registry = scala.collection.mutable.Buffer.empty[ArtifactCache[_]]
  private def register(c: ArtifactCache[_]): Unit =
    registry.synchronized { registry += c }

  /** Evict every artifact cache in the process — the Bench/Verify teardown
    * hook (and the lever a long-lived driver pulls between corpora). */
  def evictAllCaches(): Unit =
    registry.synchronized { registry.foreach(_.evictAll()) }
}
