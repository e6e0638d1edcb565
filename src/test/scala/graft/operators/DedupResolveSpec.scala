package graft.operators

import graft.SparkSpec
import graft.plans.NormalizeUnicode.nfcCol
import org.apache.spark.sql.functions._

/** Cluster resolution over near-dup pairs + NFC normalization. */
class DedupResolveSpec extends SparkSpec {
  import spark.implicits._

  test("pairs resolve to connected components with min-id clusters") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star on 20)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val out = DedupResolve.keepList(pairs)
      .as[(Long, Long, Boolean)].collect()
      .map { case (id, c, k) => id -> ((c, k)) }.toMap
    assert(out == Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)), 4L -> ((1L, false)),
      10L -> ((10L, true)), 11L -> ((10L, false)),
      20L -> ((20L, true)), 21L -> ((20L, false)), 22L -> ((20L, false))))
  }

  test("long chains converge (path of 33 nodes -> one cluster)") {
    val pairs = (0L until 32L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val clusters = DedupResolve.resolve(pairs, maxIter = 10)
      .select("cluster").distinct().as[Long].collect()
    assert(clusters.toSeq == Seq(0L))
  }

  test("lsh pairs from the corpus resolve into clusters covering all pair members") {
    val pairs = DedupQueries.minhashLshPairs.run(spark, sf0001)
      .select("doc_a", "doc_b")
    val n = pairs.select(explode(array(col("doc_a"), col("doc_b"))))
      .distinct().count()
    val resolved = DedupResolve.keepList(pairs)
    assert(resolved.count() == n)
    assert(resolved.filter(col("keep")).count() <= n)
  }

  test("soft-dedup weights: 1/cluster-size ppm, singletons full, " +
    "per-cluster mass ~1e6") {
    val w = DedupQueries.softWeights.run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // one row per corpus document, weights in (0, 1e6]
    assert(w.length == 500)
    w.foreach { case (_, _, csize, ppm) =>
      assert(csize >= 1 && ppm == 1000000L / csize, s"bad weight: $ppm/$csize")
    }
    // singletons keep full weight; some cluster actually bites
    assert(w.exists(r => r._3 == 1 && r._4 == 1000000L))
    assert(w.exists(_._3 > 1), "replica-heavy corpus must have clusters")
    // per-cluster effective mass: sum of weights = csize * (1e6 div
    // csize) — within floor loss (< csize) of one effective copy
    w.groupBy(_._2).foreach { case (c, rows) =>
      val n = rows.head._3
      assert(rows.length == n, s"cluster $c rows ${rows.length} != csize $n")
      val mass = rows.map(_._4).sum
      assert(mass <= 1000000L && 1000000L - mass < n,
        s"cluster $c mass $mass outside [1e6-n, 1e6]")
    }
    // consistency with the keep-list clusters
    val kl = DedupQueries.resolveClusters.run(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    w.foreach { case (doc, cluster, csize, _) =>
      if (csize > 1) assert(kl(doc) == cluster)
      else assert(cluster == doc && !kl.contains(doc))
    }
  }

  test("NFC normalization canonicalizes composed vs decomposed Vietnamese") {
    val composed = "ph\u00edm"    // precomposed U+00ED
    val decomposed = "phi\u0301m" // i + combining acute U+0301
    val out = Seq(composed, decomposed).toDF("s")
      .select(nfcCol(col("s")).as("n")).as[String].collect()
    assert(out(0) == out(1))
    assert(out.forall(_ == composed))
    // null passthrough
    val nulls = Seq(Option.empty[String]).toDF("s")
      .select(nfcCol(col("s"))).collect()
    assert(nulls.head.isNullAt(0))
  }
}
