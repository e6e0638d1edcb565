package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.plans.CosineSimilarity.cosineSim

/** Hybrid retrieval — the RAG-serving workload: fuse a LEXICAL ranking
  * (more-like-this BM25 over the persisted positional inverted index)
  * with a VECTOR ranking (cell-pruned cosine over the persisted IVF
  * index) by reciprocal-rank fusion. Everything is served from the two
  * stored artifacts; this query trains nothing and scans no raw text.
  *
  * Fusion is rank-based (RRF, Cormack et al.'s 1/(60+rank) in ×10⁶
  * fixed point), so the two scoring scales never need calibration —
  * the standard production answer to "BM25 scores and cosines aren't
  * commensurable". All arithmetic is exact BIGINT (the `q_text_bm25`
  * integer Robertson scheme + integer rank reciprocals), so the fused
  * ranking is bit-identical in the DuckDB oracle.
  *
  * `q_retrieval_mrr` is the family's self-measuring eval (the recall-
  * gauge discipline of the ANN tier): reciprocal rank of the TRUE
  * nearest neighbor (exact brute-force cosine, the bounded baseline)
  * inside the hybrid's fused top-10, per query.
  */
object RetrievalQueries {

  import SimilarityQueries.{cosSql, ivfIters, ivfK}

  private val W = """string_split_regex(trim(text), '\s+')"""

  /** Oracle CTE chain ending in `hyb(query_id, doc_id, lex_rank,
    * vec_rank, rrf, rank)` — the fused top-10 per query; shared by
    * [[hybridRrf]] and the MRR gauge. */
  private def hybridCtes: String =
    s"""${IvfQuantizer.oracleCtes(ivfK, ivfIters)},
       |tf AS (
       |  SELECT doc_id, g AS term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest($W) AS g FROM documents)
       |  GROUP BY doc_id, g
       |), dfc AS (
       |  SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df
       |  FROM tf
       |), st AS (SELECT count(*) AS n_docs,
       |          CAST(sum(len($W)) AS BIGINT) AS total_tokens FROM documents),
       |dl AS (SELECT doc_id, CAST(len($W) AS BIGINT) AS dl FROM documents),
       |qt AS (
       |  SELECT doc_id AS query_id, term FROM (
       |    SELECT d.doc_id, d.term,
       |      row_number() OVER (PARTITION BY d.doc_id
       |        ORDER BY d.tf * 1000000 // d.df DESC, d.term) AS rk
       |    FROM dfc d CROSS JOIN st
       |    WHERE d.doc_id < 5 AND d.df * 4 <= st.n_docs
       |  ) WHERE rk <= 4
       |), lexscore AS (
       |  SELECT q.query_id, p.doc_id,
       |    CAST(sum(
       |      ((((st.n_docs - p.df) * 2 + 1) * 1000) // (2 * p.df + 1))
       |      * (22 * p.tf * st.total_tokens)
       |      // (10 * p.tf * st.total_tokens + 3 * st.total_tokens
       |         + 9 * dl.dl * st.n_docs)) AS BIGINT) AS score
       |  FROM qt q
       |  JOIN dfc p ON p.term = q.term AND p.doc_id <> q.query_id
       |  JOIN dl ON dl.doc_id = p.doc_id CROSS JOIN st
       |  GROUP BY q.query_id, p.doc_id
       |), lex AS (
       |  SELECT query_id, doc_id, lrank FROM (
       |    SELECT query_id, doc_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS lrank
       |    FROM lexscore) WHERE lrank <= 20
       |), vec AS (
       |  SELECT query_id, doc_id, vrank FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $cosSql DESC, c.vec_id) AS vrank
       |    FROM (SELECT v.vec_id, asn.cell, v.e FROM v JOIN asn USING (vec_id)
       |          WHERE v.vec_id < 5) q
       |    JOIN (SELECT v.vec_id, asn.cell, v.e FROM v JOIN asn USING (vec_id)) c
       |      ON c.cell = q.cell AND c.vec_id <> q.vec_id
       |  ) WHERE vrank <= 20
       |), fused AS (
       |  SELECT query_id, doc_id,
       |    CAST(coalesce(l.lrank, 0) AS BIGINT) AS lex_rank,
       |    CAST(coalesce(vv.vrank, 0) AS BIGINT) AS vec_rank,
       |    CAST(coalesce(1000000 // (60 + l.lrank), 0)
       |       + coalesce(1000000 // (60 + vv.vrank), 0) AS BIGINT) AS rrf
       |  FROM lex l FULL JOIN vec vv USING (query_id, doc_id)
       |), hyb AS (
       |  SELECT query_id, doc_id, lex_rank, vec_rank, rrf,
       |    CAST(rank AS BIGINT) AS rank
       |  FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rank
       |    FROM fused
       |  ) WHERE rank <= 10
       |)""".stripMargin

  /** The fused top-10 frame (query_id, doc_id, lex_rank, vec_rank,
    * rrf, rank), unordered — shared by [[hybridRrf]] and
    * [[retrievalMrr]]. */
  private def hybridRanked(s: SparkSession, d: String): DataFrame = {
    // lexical leg: persisted postings -> salient query terms -> BM25
    val post = TextQueries.invertedIndex(s, d)
      .select("term", "doc_id", "tf")
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
    val stats = TextQueries.textStats(s, d)
    val qt = post
      .filter(col("doc_id") < 5)
      .crossJoin(broadcast(stats))
      .filter(col("df") * 4 <= col("n_docs"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(expr("tf * 1000000 div df").desc, col("term"))))
      .filter(col("rk") <= 4)
      .select(col("doc_id").as("query_id"), col("term").as("qterm"))
    val lexscore = broadcast(qt)
      .join(post, col("term") === col("qterm") &&
        col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("tf"), col("df"))
      .join(TextQueries.doclens(s, d), "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        expr("(((n_docs - df) * 2 + 1) * 1000) div (2 * df + 1)"))
      .withColumn("tscore",
        expr("(idf * (22 * tf * total_tokens)) div " +
          "(10 * tf * total_tokens + 3 * total_tokens + 9 * dl * n_docs)"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("tscore")).as("score"))
    val lex = lexscore
      .withColumn("lrank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("lrank") <= 20)
      .select("query_id", "doc_id", "lrank")
    // vector leg: the q_ann_ivf plan at k = 20 over the same artifact
    val asn = IvfIndex.assignments(s, d, ivfK, ivfIters)
    val v = Tables.embeddings(s, d).select("vec_id", "embedding")
      .join(asn, Seq("vec_id"))
    val vec = broadcast(
        v.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("cell").as("ql"),
            col("embedding").as("eq")))
      .join(v.select(col("vec_id").as("doc_id"), col("cell").as("cl"),
          col("embedding").as("ec")),
        col("cl") === col("ql") && col("doc_id") =!= col("query_id"))
      .withColumn("cosine", cosineSim(col("eq"), col("ec")))
      .withColumn("vrank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("doc_id"))))
      .filter(col("vrank") <= 20)
      .select("query_id", "doc_id", "vrank")
    // rank-reciprocal fusion over the two k-bounded legs
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lrank"), lit(0)).cast("long").as("lex_rank"),
        coalesce(col("vrank"), lit(0)).cast("long").as("vec_rank"),
        (coalesce(expr("1000000 div (60 + lrank)"), lit(0))
          + coalesce(expr("1000000 div (60 + vrank)"), lit(0)))
          .cast("long").as("rrf"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id")))
        .cast("long"))
      .filter(col("rank") <= 10)
  }

  /** Hybrid more-like-this for query docs 0..4.
    *
    * Lexical leg: each query doc contributes its top-4 salient terms
    * (tf·idf integer rank, `q_tfidf_terms` arithmetic) RESTRICTED to
    * terms with df·4 ≤ n_docs — the fan-out bound that keeps the
    * postings join ≤ Σ df ≈ n_docs·k/4 candidates per query even on a
    * stopword-heavy corpus; then candidates score integer-BM25 over the
    * shared postings (df from one window, lengths from the stored
    * doclens, constants from the 1-row stats broadcast), rank ≤ 20.
    *
    * Vector leg: the query's trained IVF cell only (the `q_ann_ivf`
    * plan, same persisted centroids/assignments, k = 20).
    *
    * Fusion: FULL OUTER on (query_id, doc_id);
    * `rrf = Σ_leg 10⁶ div (60 + rank)` with an absent leg contributing
    * 0 (emitted rank 0 marks the absence); final top-10 per query,
    * ties → doc_id. The fused frames are k-bounded per query, so the
    * fusion join is broadcast-trivial at any corpus size — the heavy
    * lifting stays inside the two index-pruned legs. */
  val hybridRrf = Q(
    "q_hybrid_rrf",
    s"""WITH $hybridCtes
       |SELECT query_id, doc_id, lex_rank, vec_rank, rrf, rank
       |FROM hyb ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    hybridRanked(s, d).orderBy("query_id", "rank")
  }

  /** MRR gauge of the hybrid retriever: per query, the fused rank of
    * the TRUE nearest neighbor (exact brute-force cosine over ALL
    * vectors — the bounded-query-batch baseline, same class as
    * `q_ann_bruteforce`) and its ×10⁶ reciprocal; 0 marks a miss (the
    * true NN escaped both legs — different IVF cell AND lexically
    * dissimilar). The semantic ground truth makes retrieval quality a
    * measured number instead of a claimed one, per query, oracle-exact;
    * the mean over queries is the MRR a retrieval dashboard tracks.
    *
    * Scale: the exact-NN side is query-batch × corpus (5·n, bounded by
    * the batch contract); the hybrid side is the artifact-served fused
    * top-10. The final join is 5×10 rows. */
  val retrievalMrr = Q(
    "q_retrieval_mrr",
    s"""WITH $hybridCtes,
       |rel AS (
       |  SELECT query_id, doc_id AS rel_doc FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $cosSql DESC, c.vec_id) AS rk
       |    FROM (SELECT * FROM v WHERE vec_id < 5) q
       |    JOIN v c ON c.vec_id <> q.vec_id
       |  ) WHERE rk = 1
       |)
       |SELECT r.query_id, r.rel_doc,
       |  CAST(coalesce(h.rank, 0) AS BIGINT) AS hyb_rank,
       |  CAST(coalesce(1000000 // h.rank, 0) AS BIGINT) AS rr_ppm
       |FROM rel r LEFT JOIN hyb h
       |  ON h.query_id = r.query_id AND h.doc_id = r.rel_doc
       |ORDER BY r.query_id""".stripMargin) { (s, d) =>
    val v = Tables.embeddings(s, d).select("vec_id", "embedding")
    val rel = broadcast(
        v.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding").as("eq")))
      .join(v.select(col("vec_id").as("rel_doc"), col("embedding").as("ec")),
        col("rel_doc") =!= col("query_id"))
      .withColumn("cosine", cosineSim(col("eq"), col("ec")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("rel_doc"))))
      .filter(col("rk") === 1)
      .select("query_id", "rel_doc")
    val hyb = hybridRanked(s, d)
      .select(col("query_id"), col("doc_id").as("rel_doc"), col("rank"))
    rel.join(hyb, Seq("query_id", "rel_doc"), "left")
      .select(col("query_id"), col("rel_doc"),
        coalesce(col("rank"), lit(0L)).cast("long").as("hyb_rank"),
        coalesce(expr("1000000 div rank"), lit(0L)).cast("long").as("rr_ppm"))
      .orderBy("query_id")
  }
}
