package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The incremental pair generator's contract: joining only delta band
  * rows against the full band index yields EXACTLY the delta-touching
  * subset of the full pair set — same pairs, same nbands, same jaccard. */
class IncrementalDedupSpec extends SparkSpec {

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))

  test("incremental pairs equal the delta-touching slice of the full run") {
    val sh = DedupQueries.lshShingles(spark, sf0001).cache()
    try {
      val full = DedupQueries.lshPairsFrom(sh).collect()
        .filter(r => r.getLong(0) % 10 == 7 || r.getLong(1) % 10 == 7)
        .map(key).toSet
      val inc = DedupQueries
        .lshIncrementalFrom(sh, col("doc_id") % 10 === 7).collect()
        .map(key).toSet
      assert(inc == full,
        s"missing=${(full -- inc).take(5)} extra=${(inc -- full).take(5)}")
      assert(inc.nonEmpty, "sf0.001 should produce delta-touching pairs")
      // and the delta really participates in every pair
      assert(inc.forall(p => p._1 % 10 == 7 || p._2 % 10 == 7))
    } finally sh.unpersist()
  }

  test("an empty delta produces no pairs without touching base-base work") {
    val sh = DedupQueries.lshShingles(spark, sf0001)
    val none = DedupQueries.lshIncrementalFrom(sh, lit(false))
    assert(none.count() == 0)
  }
}
