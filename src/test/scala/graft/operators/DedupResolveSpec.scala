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
