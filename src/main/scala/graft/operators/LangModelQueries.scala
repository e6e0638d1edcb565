package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions._

/** Statistical language-model operators over the `documents` corpus —
  * the "learn a distribution from the corpus, then score/classify the
  * corpus with it" family that sits between the closed-form text
  * statistics ([[TextQueries]]) and the iterated trainers
  * ([[ChunkingQueries]] BPE). Three members:
  *
  *  - `q_lm_bigram` — bigram-conditional surprisal scoring, the
  *    LM-perplexity quality filter at Markov order 1 (the unigram
  *    version is `q_text_surprisal`);
  *  - `q_source_divergence` — per-source chi-square drift of the token
  *    distribution vs the pooled corpus, the mixture-monitoring gauge
  *    of a multi-source corpus build;
  *  - `q_trained_langid` — a train/apply token-frequency voting
  *    classifier over the labeled `lang` column with add-one smoothing,
  *    evaluated as a held-out confusion matrix.
  *
  * All three stay in EXACT INTEGER arithmetic (the `q_text_surprisal` /
  * `q_tfidf_terms` house trick: bit-length for log2, fixed-point `div`
  * for ratios), so every emitted cell is bit-identical in DuckDB.
  * Every frame is token-vocabulary-sized or posting-sized — nothing
  * pairs documents quadratically, so the plans survive corpus scale-up;
  * the only broadcasts are 1-row (corpus totals) or ≤|lang|-row frames.
  */
object LangModelQueries {

  private val W = """string_split_regex(trim(text), '\s+')"""

  /** Bigram-conditional surprisal — the order-1 LM quality score.
    * Per bigram (w1,w2): `surprisal = bitlen(c(w1·)) − bitlen(c(w1 w2))`
    * (both counts over the whole corpus, numerator counts w1 in
    * bigram-FIRST position so the ratio is the conditional MLE
    * P(w2|w1); `cb ≤ c1` makes the score non-negative). Bit-length
    * replaces log2, so the score is exact in both engines; a document
    * of improbable word TRANSITIONS (shuffled text, boilerplate
    * stitching, OCR junk) ranks high even when each word is
    * individually common — exactly what unigram surprisal cannot see.
    *
    * Plan: one fused-shingle explode ([[wordShingles]] k=2, the native
    * expression), two COUNT OVERs (bigram key, first-word key) on the
    * same frame — two vocabulary-keyed exchanges, one per-doc hash-agg,
    * one top-k. No joins, no quadratic frame; at 100 TB this is the
    * collocations plan with a doc-level reduce on top. */
  val lmBigram = Q(
    "q_lm_bigram",
    s"""WITH tok AS (SELECT doc_id, $W AS w FROM documents),
       |b AS (
       |  SELECT doc_id, unnest([array_to_string(w[i:i+1], ' ')
       |                         for i in range(1, len(w))]) AS bg
       |  FROM tok
       |), c AS (
       |  SELECT doc_id,
       |    count(*) OVER (PARTITION BY bg) AS cb,
       |    count(*) OVER (PARTITION BY split_part(bg, ' ', 1)) AS c1
       |  FROM b
       |)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(sum(length(bin(c1)) - length(bin(cb))) AS BIGINT) AS surprisal,
       |  CAST(sum(length(bin(c1)) - length(bin(cb))) * 1000000 // count(*)
       |       AS BIGINT) AS avg_ppm
       |FROM c GROUP BY doc_id
       |ORDER BY avg_ppm DESC, doc_id LIMIT 25""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(wordShingles(tokens(col("text")), 2)).as("bg"))
      .withColumn("cb", count(lit(1)).over(Window.partitionBy("bg")))
      .withColumn("c1", count(lit(1)).over(
        Window.partitionBy(substring_index(col("bg"), " ", 1))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(length(bin(col("c1"))) - length(bin(col("cb")))).as("surprisal"))
      .withColumn("avg_ppm", expr("surprisal * 1000000 div n_bigrams"))
      .orderBy(col("avg_ppm").desc, col("doc_id"))
      .limit(25)
  }

  /** Per-source token-distribution drift vs the pooled corpus — the
    * mixture-health gauge of a multi-source build (a crawl slice whose
    * distribution walks away from the pool is the first sign of
    * boilerplate floods, language drift, or scraper breakage).
    *
    * Statistic: a chi-square-shaped sum over the source's observed
    * vocabulary, `Σ (p_s − p)² div (p + 1)`, with both relative
    * frequencies in fixed-point ppm (`c·10⁶ div T`) — exact BIGINT
    * algebra, no float log, deterministic in both engines. One-sided by
    * construction (tokens the source never emits contribute 0);
    * that keeps the frame posting-sized and the statistic monotone in
    * over-representation, which is the signal that matters for drift.
    *
    * Plan: one (source, token) hash-agg, a window sum to token totals,
    * a window sum to source totals, the 1-row corpus total broadcast —
    * all vocabulary-keyed, nothing quadratic. */
  val sourceDivergence = Q(
    "q_source_divergence",
    s"""WITH sc AS (
       |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT source, unnest($W) AS w FROM documents)
       |  GROUP BY source, w
       |), tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM sc),
       |d AS (
       |  SELECT source,
       |    c * 1000000 // sum(c) OVER (PARTITION BY source) AS ps,
       |    (sum(c) OVER (PARTITION BY w)) * 1000000 // tot.t AS pg
       |  FROM sc CROSS JOIN tot
       |)
       |SELECT source, count(*) AS n_terms,
       |  CAST(sum((ps - pg) * (ps - pg) // (pg + 1)) AS BIGINT) AS chi2_ppm
       |FROM d GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val sc = Tables.documents(s, d)
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val tot = sc.agg(sum(col("c")).as("t"))
    sc
      .withColumn("ts", sum(col("c")).over(Window.partitionBy("source")))
      .withColumn("cg", sum(col("c")).over(Window.partitionBy("w")))
      .crossJoin(broadcast(tot))
      .select(col("source"),
        expr("c * 1000000 div ts").as("ps"),
        expr("cg * 1000000 div t").as("pg"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"),
        sum(expr("(ps - pg) * (ps - pg) div (pg + 1)")).as("chi2_ppm"))
      .orderBy("source")
  }

  /** Train/apply language classification — the supervised twin of the
    * stopword-heuristic `q_text_langid`: TRAIN per-language token
    * frequencies on 4/5 of the corpus (doc_id % 5 < 4), APPLY to the
    * held-out fifth, and emit the confusion matrix (lang × lang_pred ×
    * count) — the measured-accuracy loop of a production labeler.
    *
    * Model: each training-vocabulary token votes for the language
    * maximizing its add-one-smoothed relative frequency
    * `(c_L(w)+1)·10¹² div (T_L + V)` (fixed-point, exact; ties →
    * lexicographically-first language); a held-out document's
    * prediction is the majority token vote (ties → first language).
    * This is naive Bayes with per-token hard assignment — chosen over
    * summed log-likelihoods because it needs NO float logarithm, so the
    * whole train/apply loop is engine-exact. Held-out tokens absent
    * from the training vocabulary abstain (inner join); a document of
    * only-unseen tokens drops out of the matrix, which the spec pins.
    *
    * Plan: training counts are one (lang, token) hash-agg; the vote
    * table is vocabulary × |lang| (the ≤5-row totals frame and the
    * 1-row vocabulary size broadcast onto it); apply is one
    * posting-sized join + two windowed argmaxes. Nothing scales worse
    * than the corpus token count. */
  val trainedLangId = Q(
    "q_trained_langid",
    s"""WITH tok AS (SELECT doc_id, lang, unnest($W) AS w FROM documents),
       |tr AS (SELECT * FROM tok WHERE doc_id % 5 < 4),
       |cnt AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
       |        FROM tr GROUP BY lang, w),
       |tot AS (SELECT lang, CAST(count(*) AS BIGINT) AS t FROM tr GROUP BY lang),
       |voc AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM tr),
       |grid AS (
       |  SELECT vw.w, tot.lang, tot.t, voc.v
       |  FROM (SELECT DISTINCT w FROM tr) vw CROSS JOIN tot CROSS JOIN voc
       |), wt AS (
       |  SELECT g.w, g.lang,
       |    (coalesce(c.c, 0) + 1) * 1000000000000 // (g.t + g.v) AS weight
       |  FROM grid g LEFT JOIN cnt c ON c.lang = g.lang AND c.w = g.w
       |), vote AS (
       |  SELECT w, lang AS lang_vote FROM (
       |    SELECT w, lang, row_number() OVER (
       |      PARTITION BY w ORDER BY weight DESC, lang) AS rn
       |    FROM wt) WHERE rn = 1
       |), ballots AS (
       |  SELECT t.doc_id, t.lang, v.lang_vote, count(*) AS n
       |  FROM tok t JOIN vote v ON v.w = t.w
       |  WHERE t.doc_id % 5 = 4
       |  GROUP BY t.doc_id, t.lang, v.lang_vote
       |), pred AS (
       |  SELECT doc_id, lang, lang_vote AS lang_pred FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY doc_id ORDER BY n DESC, lang_vote) AS rn
       |    FROM ballots) WHERE rn = 1
       |)
       |SELECT lang, lang_pred, count(*) AS n_docs
       |FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin) {
      (s, d) => confusionFrom(Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("w")))
    }

  /** The full train/apply plan over any (doc_id, lang, w) token frame
    * (exposed for unit tests over hand-built corpora). */
  private[graft] def confusionFrom(
      tok: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tr = tok.filter(col("doc_id") % 5 < 4)
    val cnt = tr.groupBy("lang", "w").agg(count(lit(1)).as("c"))
    val tot = tr.groupBy("lang").agg(count(lit(1)).as("t"))
    val voc = tr.agg(countDistinct(col("w")).as("v"))
    val grid = tr.select("w").distinct()
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(voc))
    val wt = grid.join(cnt, Seq("lang", "w"), "left")
      .select(col("w"), col("lang"),
        expr("(coalesce(c, 0) + 1) * 1000000000000 div (t + v)").as("weight"))
    val vote = wt
      .withColumn("rn", row_number().over(
        Window.partitionBy("w").orderBy(col("weight").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("w"), col("lang").as("lang_vote"))
    val ballots = tok.filter(col("doc_id") % 5 === 4)
      .join(vote, "w")
      .groupBy("doc_id", "lang", "lang_vote")
      .agg(count(lit(1)).as("n"))
    ballots
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("n").desc, col("lang_vote"))))
      .filter(col("rn") === 1)
      .groupBy(col("lang"), col("lang_vote").as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "lang_pred")
  }
}
