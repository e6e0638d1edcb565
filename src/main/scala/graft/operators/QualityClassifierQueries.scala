package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Q

/** Trained quality classifier — the GPT-3 / PaLM-style target-vs-crawl
  * filter (Brown et al. 2020 appendix A; Chowdhery et al. 2022 §3):
  * train a classifier to separate a high-quality TARGET slice from the
  * raw crawl, score every crawl document, and admit stochastically so
  * the kept set skews high-quality WITHOUT a hard cutoff (a lucky
  * low-scoring document still gets in — the published trick that keeps
  * the filtered corpus from collapsing onto the target distribution).
  *
  * Model: the classifier IS the naive-Bayes log-odds scorer the DSIR
  * tier already trains — per-token hashed-unigram bucket counts, scored
  * in exact-integer bit-length-log2 units ([[DsirQueries]]; its
  * persisted `weight_bits`/`n_tokens` artifact is the trained model
  * applied to the pool, served train-once/query-many). This file adds
  * the CLASSIFIER policy on top:
  *
  *  - per-document score in integer PERCENT of a bit per token:
  *    `score_pct = clamp(floor(100·weight_bits / n_tokens), -100, 100)`
  *    — computed shift-then-divide so floor and truncating division
  *    agree ((100·wb + 6400·nt) div nt − 6400: the numerator is
  *    provably non-negative because |per-token score| < 64 bits, and
  *    truncation equals floor on non-negatives in BOTH engines — the
  *    negative-division floor-vs-truncate trap never opens);
  *  - Pareto admission: GPT-3 keeps a document iff a Pareto sample
  *    beats `1 − score`. Deterministically and integer-exactly: with
  *    U the first-8-hex md5 integer of `'qclf|' ‖ doc_id` (uniform on
  *    [0, 16⁸)) and s = score_pct, admit iff
  *    `U · (300 − s)³ < 16⁸ · 200³`
  *    — i.e. keep-probability `(200 / (300 − s))³`: 1 at the clamp top
  *    (s = 100, the THRESHOLD admission — at or above a bit-per-token
  *    of target-likeness a document is certain), ~0.30 at s = 0, ~0.125
  *    at the bottom clamp. This is the Pareto-tail CDF with α = 3;
  *    the reference papers use α = 9, which would need (300−s)⁹ ≈ 2⁶⁴⁺
  *    products — α = 3 keeps every intermediate in int64 on both
  *    engines (documented deviation; the shape — certain above
  *    threshold, heavy-tailed luck below — is the published one).
  *
  * Policy note (v2 funnel): [[PipelineV2Queries]] stage 5 keeps DSIR's
  * sign-threshold admission; this classifier's Pareto gate is the
  * documented alternative dial. Swapping it in would re-baseline the
  * funnel's hashes for no semantic gain, so the composed pipeline stays
  * on the threshold policy and the classifier ships as its own
  * oracle-checked surface.
  *
  * Scale shape: both queries are a map-only projection over the
  * persisted doc-grain weights artifact (plus one |sources|-row
  * hash-agg for the sample report) — no joins, no windows; at 100 TB
  * the cost is the one already-paid DSIR training pass.
  */
object QualityClassifierQueries {

  /** Clamp bounds (percent of a bit per token) and the Pareto constant
    * 16⁸ · 200³ = 4294967296 · 8000000. */
  private[graft] val ClampPct = 100L
  private[graft] val ParetoRhs = 4294967296L * 8000000L

  /** score_pct over (weight_bits, n_tokens) columns — the shift-then-
    * divide clamped percent score (see object scaladoc). */
  private[graft] def scorePct: Column =
    greatest(lit(-ClampPct), least(lit(ClampPct),
      expr("(100 * weight_bits + 6400 * n_tokens) div n_tokens - 6400")))

  /** Pareto admission over (doc_id, score_pct) columns. */
  private[graft] def admittedCol: Column = {
    val u = conv(substring(md5(concat(lit("qclf|"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    u * pow3(lit(300L) - col("score_pct")) < lit(ParetoRhs)
  }

  private def pow3(c: Column): Column = c * c * c

  /** The classifier policy over any (doc_id, source, n_tokens,
    * weight_bits) frame — shared by both queries and the sign-forcing
    * spec (which feeds hand-built weight rows). */
  private[graft] def classify(w: DataFrame): DataFrame =
    w.withColumn("score_pct", scorePct)
      .withColumn("admitted", admittedCol)

  private def hexU8 = DsirQueries.hexU8(
    "md5('qclf|' || CAST(doc_id AS VARCHAR))")

  /** DuckDB twin of the Pareto POOL admission as a doc_id set over a
    * DSIR weights CTE named `wtsName` — the fragment
    * [[PipelineV2Queries]]'s Pareto funnel variant splices where the
    * threshold funnel has `WHERE weight_bits > 0`, so the gate
    * arithmetic lives in exactly one place per engine. */
  private[operators] def paretoPoolSql(wtsName: String): String =
    s"""SELECT doc_id FROM (
       |    SELECT doc_id,
       |      greatest(-100, least(100,
       |        (100 * weight_bits + 6400 * n_tokens) // n_tokens - 6400))
       |        AS score_pct
       |    FROM $wtsName) pq
       |  WHERE $hexU8
       |      * (300 - score_pct) * (300 - score_pct) * (300 - score_pct)
       |      < $ParetoRhs""".stripMargin

  /** Spark twin of [[paretoPoolSql]]: the admitted doc_ids of a DSIR
    * weights frame under the Pareto gate. */
  private[operators] def paretoPoolFrame(w: DataFrame): DataFrame =
    classify(w).filter(col("admitted")).select(col("doc_id"))

  private def scoredCtes: String =
    s"""${DsirQueries.scoreCtes},
       |qsc AS (
       |  SELECT doc_id, source, n_tokens, weight_bits,
       |    greatest(-100, least(100,
       |      (100 * weight_bits + 6400 * n_tokens) // n_tokens - 6400))
       |      AS score_pct
       |  FROM wts
       |),
       |qad AS (
       |  SELECT doc_id, source, n_tokens, weight_bits,
       |    CAST(score_pct AS BIGINT) AS score_pct,
       |    $hexU8 * (300 - score_pct) * (300 - score_pct) * (300 - score_pct)
       |      < ${ParetoRhs} AS admitted
       |  FROM qsc
       |)""".stripMargin

  /** Per-document classifier verdict over the raw pool: the trained
    * score (percent of a bit per token, clamped) and the Pareto-gate
    * admission. */
  val qualityClassifier = Q(
    "q_quality_classifier",
    s"""WITH $scoredCtes
       |SELECT doc_id, source, n_tokens, weight_bits, score_pct, admitted
       |FROM qad ORDER BY doc_id""".stripMargin) { (s, d) =>
    classify(DsirQueries.weightsTable(s, d))
      .select("doc_id", "source", "n_tokens", "weight_bits",
        "score_pct", "admitted")
      .orderBy("doc_id")
  }

  /** The admitted sample, reported per source: pool size, admitted
    * count, admitted token mass, and the score span — the acceptance
    * accounting a filtered-corpus datasheet publishes. */
  val qualityClfSample = Q(
    "q_quality_clf_sample",
    s"""WITH $scoredCtes
       |SELECT source,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_admitted,
       |  CAST(sum(CASE WHEN admitted THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS admitted_tokens,
       |  CAST(min(score_pct) AS BIGINT) AS min_score,
       |  CAST(max(score_pct) AS BIGINT) AS max_score
       |FROM qad GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    classify(DsirQueries.weightsTable(s, d))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("admitted"), col("n_tokens")).otherwise(0L))
          .as("admitted_tokens"),
        min("score_pct").as("min_score"),
        max("score_pct").as("max_score"))
      .orderBy("source")
  }
}
