package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sign-forcing + admission-math pins for the trained quality
  * classifier (r15 verdict item 3): a corpus built to score POSITIVE
  * must score positive, one built to score NEGATIVE must score
  * negative, and the Pareto gate must be exactly the documented
  * integer formula — certain at the top clamp, md5-lucky below,
  * monotone in the score. */
class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  /** Synthetic pool: 10 target docs of "alpha beta", one crawl doc of
    * the SAME tokens (must score > 0 — more target-like than
    * crawl-like), one crawl doc of tokens the target never uses (must
    * score < 0). Runs the REAL training path (bucketize → model →
    * score), not a hand-built weights frame. */
  test("classifier scores force both signs on a constructed corpus") {
    val target = (1L to 10L).map(i =>
      (i, "src0", ("alpha beta " * 20).trim))
    val docs = (target :+
      (100L, "src9", ("alpha beta " * 20).trim) :+
      (101L, "src9", ("zork quux " * 20).trim))
      .toDF("doc_id", "source", "text")
    val bk = DsirQueries.bucketTokens(docs)
    val bt = DsirQueries.bucketModel(bk)
    val tot = bt.agg(sum("ct").as("nt"), sum("cr").as("nr"))
    val w = bk.filter(!DsirQueries.isTarget)
      .join(bt.crossJoin(tot), Seq("b"))
      .withColumn("s", DsirQueries.scoreCol)
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("s").cast("long")).as("weight_bits"))
    val scored = QualityClassifierQueries.classify(w)
      .select("doc_id", "score_pct")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(100L) > 0,
      s"target-identical crawl doc must score positive, got ${scored(100L)}")
    assert(scored(101L) < 0,
      s"target-disjoint crawl doc must score negative, got ${scored(101L)}")
  }

  /** The documented admission formula, pinned against an independent
    * JVM-side computation of U = first-8-hex(md5('qclf|'||doc_id)). */
  private def expectedAdmit(docId: Long, scorePct: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"qclf|$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val u = java.lang.Long.parseLong(hex, 16)
    val d = 300L - scorePct
    u * d * d * d < QualityClassifierQueries.ParetoRhs
  }

  /** Weights rows engineered to land on exact clamp/score points:
    * (n_tokens, weight_bits) → expected score_pct. */
  test("score clamps at ±100 and the Pareto gate matches the formula") {
    val rows = Seq(
      // wb = 2·nt → raw 200 → clamped +100 → certain admission
      (1L, "src9", 10L, 20L, 100L),
      // wb = -63·nt → raw -6300... clamped -100 → 1/8 luck
      (2L, "src9", 10L, -630L, -100L),
      // wb = 0 → score 0
      (3L, "src9", 10L, 0L, 0L),
      // wb = -1, nt = 3 → floor(-100/3) = -34 (floor, NOT truncate -33)
      (4L, "src9", 3L, -1L, -34L),
      // wb = 1, nt = 3 → floor(100/3) = 33
      (5L, "src9", 3L, 1L, 33L))
    val w = rows.map { case (id, src, nt, wb, _) => (id, src, nt, wb) }
      .toDF("doc_id", "source", "n_tokens", "weight_bits")
    val got = QualityClassifierQueries.classify(w)
      .select("doc_id", "score_pct", "admitted")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    rows.foreach { case (id, _, _, _, expectPct) =>
      assert(got(id)._1 == expectPct,
        s"doc $id: score_pct ${got(id)._1} != expected $expectPct")
      assert(got(id)._2 == expectedAdmit(id, expectPct),
        s"doc $id: admitted ${got(id)._2} diverges from the formula")
    }
    // top clamp is CERTAIN admission for any doc_id (U < 16^8 always)
    val top = (1L to 50L).map(i => (i, "src9", 10L, 20L))
      .toDF("doc_id", "source", "n_tokens", "weight_bits")
    assert(QualityClassifierQueries.classify(top)
      .filter(!col("admitted")).count() == 0,
      "a doc at the top clamp was rejected")
    // bottom clamp admits SOME but not all across 200 ids (p = 1/8)
    val bot = (1L to 200L).map(i => (i, "src9", 10L, -630L))
      .toDF("doc_id", "source", "n_tokens", "weight_bits")
    val nBot = QualityClassifierQueries.classify(bot)
      .filter(col("admitted")).count()
    assert(nBot > 0 && nBot < 200,
      s"bottom-clamp admission should be lucky-some, got $nBot/200")
  }

  /** Admission is monotone in score for a FIXED document (fixed U):
    * once admitted at score s, admitted at every s' > s. */
  test("admission is monotone in the score") {
    val grid = for {
      id <- 1L to 20L
      s <- -100L to 100L by 25L
    } yield (id, "src9", 100L, s) // nt=100 → wb=s → raw score s, unclamped
    val got = QualityClassifierQueries.classify(
        grid.toDF("doc_id", "source", "n_tokens", "weight_bits"))
      .select("doc_id", "score_pct", "admitted")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap
    for (id <- 1L to 20L; s <- -100L to 75L by 25L)
      assert(!got((id, s)) || got((id, s + 25L)),
        s"doc $id admitted at $s but rejected at ${s + 25L}")
  }

  /** The composed Pareto funnel variant (round-16 verdict item 5):
    * stages before admission are byte-identical to the threshold
    * funnel (same excision/quality/LM gates over the same artifacts),
    * and the admission stage itself follows the documented gate
    * doc-for-doc — checked against an INDEPENDENT JVM-side md5
    * computation, not the Spark expression under test. */
  test("the Pareto funnel matches the threshold funnel below stage 5 " +
    "and the gate formula at it") {
    def stages(q: graft.Q) = q.run(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val v2 = stages(PipelineV2Queries.corpusPipelineV2)
    val pa = stages(PipelineV2Queries.corpusPipelinePareto)
    Seq("0_raw", "1_excised", "2_quality", "3_lm_band", "4_softdedup")
      .foreach(st => assert(v2(st) == pa(st),
        s"pre-admission stage $st diverges: ${v2(st)} vs ${pa(st)}"))
    // per-doc: among pre-admission survivors (level >= 3), level >= 4
    // iff target-slice OR the Pareto gate admits its artifact score
    val scores = QualityClassifierQueries
      .classify(DsirQueries.weightsTable(spark, sf0001))
      .select("doc_id", "score_pct")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sv = PipelineV2Queries.survivorFrame(spark, sf0001, pareto = true)
      .filter(col("level") >= 3)
      .select("doc_id", "source", "level")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(sv.nonEmpty)
    sv.foreach { case (id, src, level) =>
      val want = DsirQueries.TargetSrcs.contains(src) ||
        scores.get(id).exists(s => expectedAdmit(id, s))
      assert((level >= 4) == want,
        s"doc $id ($src): level $level vs gate verdict $want")
    }
  }
}
