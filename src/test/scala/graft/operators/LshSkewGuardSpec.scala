package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions.{tokens, wordShingles}
import org.apache.spark.sql.functions._

/** Adversarial-skew guard for LSH pair generation: a corpus where 90%
  * of documents share one text (hence one hot (band, key) bucket per
  * band) must complete with bounded candidate counts instead of going
  * quadratic in the hot bucket. */
class LshSkewGuardSpec extends SparkSpec {
  import spark.implicits._

  private val nHot = 900
  private val nTail = 100

  /** 900 identical boilerplate docs + 100 distinct tail docs, where
    * tail docs 900+2i and 900+2i+1 are genuine near-duplicates (same
    * word order, one word changed at the end). */
  private lazy val shingles = {
    val hot = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " +
      "eiusmod tempor incididunt ut labore et dolore magna aliqua"
    val hotDocs = (0 until nHot).map(i => (i.toLong, hot))
    val tailDocs = (0 until nTail).map { i =>
      val base = (0 until 11).map(j => s"w${(i / 2 * 7 + j * 13) % 97}")
      val last = if (i % 2 == 0) "alpha" else "beta"
      ((nHot + i).toLong, (base :+ last).mkString(" "))
    }
    (hotDocs ++ tailDocs).toDF("doc_id", "text")
      .select(col("doc_id"),
              array_distinct(wordShingles(tokens(col("text")), 3)).as("ss"))
  }

  test("90%-hot bucket: capped pipeline completes with bounded candidates") {
    val capped = DedupQueries.lshPairsFrom(shingles, 100).collect()
    // the hot cluster (whose candidate join would be 900²/2 ≈ 404k
    // pairs) never reaches the join: no output pair joins two hot docs
    assert(capped.forall(r => !(r.getLong(0) < nHot && r.getLong(1) < nHot)))
    // the genuine tail near-dups survive — they pair through buckets
    // the cap leaves alone
    val tailPairs = capped.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until nTail / 2)
      .map(i => ((nHot + 2 * i).toLong, (nHot + 2 * i + 1).toLong)).toSet
    assert(expected.subsetOf(tailPairs),
      s"missing ${expected.diff(tailPairs).size} true tail pairs")
    assert(capped.length <= nTail * (nTail - 1) / 2)
  }

  test("telemetry names exactly the hot buckets, one per band") {
    val over = DedupQueries.lshOversizedBuckets(shingles, 100).collect()
    assert(over.length == 8) // the hot cluster occupies one bucket per band
    assert(over.forall(_.getAs[Long]("n_docs") >= nHot))
  }

  test("capped pairs are a subset of uncapped pairs") {
    val capped = DedupQueries.lshPairsFrom(shingles, 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val uncapped = DedupQueries.lshPairsFrom(shingles, Int.MaxValue)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped))
  }

  test("healthy corpora are untouched by the default cap") {
    val sh = DedupQueries.lshShingles(spark, sf0001)
    val capped = DedupQueries.lshPairsFrom(sh)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val uncapped = DedupQueries.lshPairsFrom(sh, Int.MaxValue)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
    assert(DedupQueries.lshOversizedBuckets(sh).isEmpty)
  }
}
