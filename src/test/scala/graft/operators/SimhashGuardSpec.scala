package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The SimHash half-bucket guard under an adversarial boilerplate
  * corpus: 600 documents all sharing one 8-bit half. Uncapped, that
  * half-bucket alone generates ~180k candidate pairs (quadratic in the
  * bucket); capped, candidate work stays bounded, the dropped bucket is
  * reported, and every pair whose agreeing half SURVIVES the cap is
  * still found — the documented recall contract. */
class SimhashGuardSpec extends SparkSpec {
  import spark.implicits._

  /** 600 sigs: first half identical (the boilerplate), second half the
    * 8-bit binary of doc_id % 256 — residues 0..87 hold 3 docs each,
    * 88..255 hold 2. */
  private def boilerplate = spark.range(600).select(
    col("id").as("doc_id"),
    concat(lit("00000000"),
      lpad(conv(col("id") % 256, 10, 2), 8, "0")).as("simhash"))

  test("a hot half-bucket is dropped, reported, and pairing stays bounded") {
    val sig = boilerplate.cache()
    try {
      val over = DedupQueries.simhashOversizedBuckets(sig).collect()
      assert(over.length == 1 &&
        over(0).getAs[String]("bits") == "00000000" &&
        over(0).getAs[Long]("n_docs") == 600L,
        s"telemetry should report exactly the boilerplate half: ${over.toSeq}")

      val capped = DedupQueries.simhashPairsFrom(sig).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // Hamming-0 pairs pair through their surviving second half:
      // residues 0..87 → C(3,2)=3 pairs, 88..255 → 1 pair each
      assert(capped.size == 88 * 3 + 168,
        s"expected 432 surviving pairs, got ${capped.size}")

      // the uncapped run is a strict superset — the delta is exactly the
      // Hamming-1 pairs whose only agreeing half was the dropped bucket
      val uncapped = DedupQueries.simhashPairsFrom(sig, maxBucket = 1000000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(capped.subsetOf(uncapped))
      assert(uncapped.size > capped.size,
        "adversarial corpus should have Hamming-1 mass behind the hot bucket")
    } finally sig.unpersist()
  }

  test("a healthy corpus is untouched by the cap") {
    // distinct second halves AND distinct first halves per small group:
    // no bucket anywhere near the cap, so capped ≡ uncapped
    val sig = spark.range(300).select(
      col("id").as("doc_id"),
      concat(lpad(conv(col("id") % 128, 10, 2), 8, "0"),
        lpad(conv(col("id") / lit(2), 10, 2), 8, "0")).as("simhash"))
    val capped = DedupQueries.simhashPairsFrom(sig).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = DedupQueries.simhashPairsFrom(sig, maxBucket = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped)
    assert(DedupQueries.simhashOversizedBuckets(sig).isEmpty)
  }
}
