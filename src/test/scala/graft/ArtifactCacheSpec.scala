package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.ArtifactCache: the process-level artifact memoizer must build
  * single-flight (the TrieMap.getOrElseUpdate idiom it replaced could run
  * a builder twice concurrently and leak the loser's cached RDDs) and must
  * actually release resources on eviction. */
class ArtifactCacheSpec extends AnyFunSuite {

  test("single-flight: a racing first access builds exactly once") {
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val c = new ArtifactCache[Int]("test-single-flight", _ => (),
      ArtifactCache.KeyDriven("unit fixture"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = c.getOrElseUpdate("k", {
            Thread.sleep(25) // widen the race window
            built.incrementAndGet(); 42
          })
        })
      }
      assert(tasks.map(_.get()).toSet === Set(42))
      assert(built.get() === 1, "builder ran more than once for one key")
    } finally pool.shutdown()
  }

  test("evict runs release exactly once; entry rebuilds after eviction") {
    var released = List.empty[Int]
    val c = new ArtifactCache[Int]("test-release", v => released ::= v,
      ArtifactCache.KeyDriven("unit fixture"))
    assert(c.getOrElseUpdate("k", 7) === 7)
    c.evict("k")
    c.evict("k") // second evict of an absent key is a no-op
    assert(released === List(7))
    assert(c.getOrElseUpdate("k", 9) === 9, "evicted key must rebuild")
    c.evictAll()
    assert(released === List(9, 7))
    assert(c.size === 0)
  }

  test("put replaces and releases the previous value (persistShared discipline)") {
    var released = List.empty[Int]
    val c = new ArtifactCache[Int]("test-release", v => released ::= v,
      ArtifactCache.KeyDriven("unit fixture"))
    c.put("site", 1)
    c.put("site", 2)
    assert(released === List(1), "put must release the value it displaced")
    assert(c.getOrElseUpdate("site", 99) === 2)
    assert(c.size === 1)
  }

  test("evictAllCaches unpersists the memoized graph-artifact RDDs and allows rebuild") {
    val spark = SparkSuite.spark
    val sc = spark.sparkContext
    ArtifactCache.evictAllCaches() // start from a clean registry state
    val base = sc.getPersistentRDDs.keySet
    // basket_pairs materializes the coPurchaseGraph artifact (2 cached RDDs)
    val n1 = SparkEntry.queries("basket_pairs")(spark, SparkSuite.sf).count()
    val added = sc.getPersistentRDDs.keySet -- base
    assert(added.nonEmpty, "expected the graph artifact to register cached RDDs")
    ArtifactCache.evictAllCaches()
    val leaked = sc.getPersistentRDDs.keySet.intersect(added)
    assert(leaked.isEmpty, s"evictAllCaches leaked RDD ids: $leaked")
    // and the artifact rebuilds transparently on next use
    assert(SparkEntry.queries("basket_pairs")(spark, SparkSuite.sf).count() === n1)
  }

  test("supplierServiceGraph memoizes one build shared by pagerank and ppr") {
    val spark = SparkSuite.spark
    val sc = spark.sparkContext
    ArtifactCache.evictAllCaches()
    val base = sc.getPersistentRDDs.keySet
    val (e1, d1, n1) = operators.AnalyticsOps.supplierServiceGraph(spark, SparkSuite.sf)
    val added = sc.getPersistentRDDs.keySet -- base
    assert(added.size === 2, s"expected edge+degree cached RDDs, got $added")
    assert(n1 > 0 && d1.count() === n1)
    // second access returns the SAME cached RDDs — no rebuild
    val (e2, _, n2) = operators.AnalyticsOps.supplierServiceGraph(spark, SparkSuite.sf)
    assert(n2 === n1)
    assert(sc.getPersistentRDDs.keySet -- base === added, "second access rebuilt")
    assert(e1.count() === e2.count())
    // degrees in the artifact match a fresh recount over the edges
    val recount = e1.groupBy(org.apache.spark.sql.functions.col("src"))
      .count().count()
    assert(recount === n1)
    // the artifact survives catalog.clearCache (the between-queries hygiene)
    spark.catalog.clearCache()
    assert(sc.getPersistentRDDs.keySet.intersect(added) === added,
      "clearCache must not drop the context-level artifact RDDs")
    ArtifactCache.evictAllCaches()
    assert(sc.getPersistentRDDs.keySet.intersect(added).isEmpty, "eviction leaked")
  }
}
