package graft.operators

import graft.SparkSpec

/** Hubness audit invariants: in-degrees conserve the edge count, every
  * vector is covered (zero-in-degree rows included), the hub flag is
  * the documented threshold, and the skew it exists to expose is
  * actually present on this corpus (max in-degree well above k while
  * some vectors are never anyone's neighbor). */
class HubnessSpec extends SparkSpec {

  test("degrees conserve edges, coverage total, flag consistent, skew real") {
    val out = SimilarityQueries.knnHubness.run(spark, sf0001).collect()
    val edges = SimilarityQueries.knnEdges(spark, sf0001).count()
    assert(out.length == 500)
    assert(out.map(_.getLong(1)).sum == edges,
      "sum of in-degrees must equal the edge count")
    out.foreach(r =>
      assert(r.getBoolean(2) == (r.getLong(1) >= 3 * SimilarityQueries.knnK)))
    assert(out.map(_.getLong(1)).max >= 2 * SimilarityQueries.knnK,
      "high-dim kNN should show in-degree skew")
    assert(out.exists(_.getLong(1) == 0),
      "anti-hubs (never anyone's neighbor) should exist")
  }
}
