package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.operators.{DedupQueries, IvfIndex}

/** Pins the [[IndexCatalog]] contract the class doc promises:
  *
  *  1. builders run ONCE per (application, key) — every later call for
  *     the same key skips straight to the artifact read;
  *  2. no builder's cache outlives its build — after any artifact
  *     materializes, the session-wide cache manager is empty (a library
  *     caller can invoke builders back-to-back without accumulating
  *     cached frames, the round-2 "cache leak" finding). */
class CacheDisciplineSpec extends SparkSpec {

  test("ensure() memoizes: the builder runs once per key") {
    val builds = new AtomicInteger(0)
    // unique key: the catalog now persists manifests ACROSS processes,
    // so a fixed key would adopt a previous test run's artifact
    val key = s"cache_discipline_probe_${System.nanoTime}"
    val dir1 = IndexCatalog.ensure(spark, key) { _ =>
      builds.incrementAndGet(); ()
    }
    val dir2 = IndexCatalog.ensure(spark, key) { _ =>
      builds.incrementAndGet(); ()
    }
    assert(builds.get() === 1, "second ensure() call must skip the build")
    assert(dir1 === dir2)
  }

  test("artifact builders leave no residual cached frames") {
    spark.catalog.clearCache()
    // Each builder caches its corpus-sized input for the one
    // materializing pass and must unpersist before returning.
    DedupQueries.lshPairs(spark, sf0001).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "lshPairs builder left cached frames behind")
    DedupQueries.embPairs(spark, sf0001).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "embPairs builder left cached frames behind")
    DedupQueries.lshKeepList(spark, sf0001).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "lshKeepList builder left cached frames behind")
    IvfIndex.assignments(spark, sf0001, 8, 2).count()
    assert(spark.sharedState.cacheManager.isEmpty,
      "IvfIndex builder left cached frames behind")
  }

  test("back-to-back artifact queries reuse the stored artifact") {
    // Two runs of the same registered LSH query: identical results, and
    // the second is served from the artifact (still no cached frames).
    val r1 = DedupQueries.minhashLshPairs.run(spark, sf0001).collect()
    val r2 = DedupQueries.minhashLshPairs.run(spark, sf0001).collect()
    assert(r1.toSeq === r2.toSeq)
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
