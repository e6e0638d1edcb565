package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the interpolated Kneser–Ney scorer (`q_lm_kn`) and the CCNet
  * perplexity banding (`q_quality_tertiles`):
  *  - the exact integer rational (num, den) the bit-length surrogate
  *    scores, on a hand corpus where KN is computable by hand;
  *  - the continuation-distribution effect raw MLE cannot express: of
  *    two singleton bigrams with equally-frequent first words, the one
  *    whose SECOND word appears in fewer distinct contexts scores
  *    strictly more surprising;
  *  - single-word documents drop out (no order-1 evidence) — on both
  *    engines, since both derive the doc frame from the bigram frame;
  *  - tertile banding: per-source bucket sizes differ by ≤1, bounds
  *    nest (head.hi ≤ middle.lo ≤ middle.hi ≤ tail.lo), mean ∈ [lo, hi].
  */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private def scoresOf(docs: Seq[(Long, String, String)]) = {
    val inst = docs.toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        explode(graft.functions.TextFunctions.wordShingles(
          split(trim(col("text")), "\\s+"), 2)).as("bg"))
    LangModelQueries.knScoresFrom(inst)
  }

  test("hand corpus: KN rational matches the by-hand computation") {
    // corpus bigrams: "a b" ×2, "a c" ×1  →  T=2 types
    // c(a·)=3, N1+(a·)=2, N1+(·b)=1, N1+(·c)=1
    val out = scoresOf(Seq(
      (1L, "s", "a b"), (2L, "s", "a b"), (3L, "s", "a c")))
      .orderBy("doc_id").collect()
    // "a b": num = max(4·2−3,0)·2 + 3·2·1 = 10+6 = 16, den = 4·3·2 = 24
    //   bits = bitlen(24) − bitlen(16) = 5 − 5 = 0
    // "a c": num = max(4·1−3,0)·2 + 3·2·1 = 2+6 = 8, den = 24
    //   bits = 5 − 4 = 1  (the rarer transition is more surprising)
    assert(out.map(r => (r.getLong(0), r.getLong(3))).toSeq ===
      Seq((1L, 0L), (2L, 0L), (3L, 1L)))
    // avg_ppm = kn_bits·1e6 div n_bigrams, one bigram per doc here
    assert(out.map(_.getLong(4)).toSeq === Seq(0L, 0L, 1000000L))
  }

  test("continuation effect: rare-context second word is dearer") {
    // "x u" singleton where u appears ONLY after x (N1+(·u)=1) vs
    // "y v" singleton where v also follows z (N1+(·v)=2): same c(first·),
    // same c(bigram); KN separates them, raw MLE would not.
    val out = scoresOf(Seq(
      (1L, "s", "x u"), (2L, "s", "y v"), (3L, "s", "z v")))
      .orderBy("doc_id").collect()
    val bitsXU = out(0).getLong(3)
    val bitsYV = out(1).getLong(3)
    // T=3; x u: num = 1·3 + 3·1·1 = 6, den = 4·1·3 = 12 → bits 4−3 = 1
    //       y v: num = 1·3 + 3·1·2 = 9, den = 12      → bits 4−4 = 0
    assert(bitsXU === 1L && bitsYV === 0L, "continuation mass must differ")
  }

  test("single-word documents drop out of the score frame") {
    val out = scoresOf(Seq((1L, "s", "hello"), (2L, "s", "a b")))
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("q_lm_kn runs on sf0.001 with non-negative scores") {
    val out = LangModelQueries.kneserNey.run(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 25)
    assert(out.forall(_.getLong(2) >= 0L), "KN surprisal is non-negative")
    // ordered by avg_ppm desc
    val ppm = out.map(_.getLong(3)).toSeq
    assert(ppm === ppm.sorted.reverse)
  }

  test("q_lm_kn_heldout scores only the held-out fifth, non-negatively") {
    val out = LangModelQueries.kneserNeyHeldout.run(spark, sf0001).collect()
    assert(out.nonEmpty && out.length <= 25)
    out.foreach { r =>
      assert(r.getLong(0) % 5 == 4, "only held-out docs may be scored")
      assert(r.getLong(2) >= 0L, "backoff-priced surprisal stays non-negative")
    }
  }

  test("q_quality_mixture: head keeps all, tail keeps none, middle " +
    "keeps a strict subset; kept words bounded by seen words") {
    val rows = LangModelQueries.qualityMixture.run(spark, sf0001).collect()
    rows.foreach { r =>
      val (bucket, nDocs, nKept) = (r.getString(1), r.getLong(2), r.getLong(3))
      val (wTot, wKept) = (r.getLong(4), r.getLong(5))
      bucket match {
        case "head" => assert(nKept == nDocs && wKept == wTot)
        case "tail" => assert(nKept == 0 && wKept == 0)
        case "middle" =>
          assert(nKept <= nDocs && wKept <= wTot)
          assert(nKept > 0 && nKept < nDocs,
            "the ~50% coin must land strictly inside at this corpus size")
      }
    }
  }

  test("q_quality_tertiles: three bands per source, sizes within 1, " +
    "nested bounds, mean within bounds") {
    val rows = LangModelQueries.qualityTertiles.run(spark, sf0001).collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getString(1)).toSeq == Seq("head", "middle", "tail"),
        s"$src must emit the three bands in order")
      val ns = rs.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$src ntile sizes must differ by ≤1")
      val Seq(h, m, t) = rs.toSeq
      assert(h.getLong(4) <= m.getLong(3) && m.getLong(4) <= t.getLong(3),
        s"$src band ppm bounds must nest")
      rs.foreach { r =>
        assert(r.getLong(5) >= r.getLong(3) && r.getLong(5) <= r.getLong(4),
          s"$src mean_ppm must lie within [lo, hi]")
      }
    }
  }
}
