package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions.tokens

/** Deterministic corpus sampling — the reproducible-subset primitives a
  * training-data pipeline needs (Spark's `df.sample` is seed-stable only
  * per partitioning, and no cross-engine oracle can replay it):
  *
  *  - hash-gate sampling: keep a row iff a hex prefix of `md5(key)` is
  *    below a threshold — pure map work, engine-independent, stable
  *    under repartitioning/reruns, and composable (the same row is
  *    in/out of the sample everywhere);
  *  - stratified variant: a different gate per stratum (here `source`)
  *    — the mixture-reweighting step of corpus curation.
  *
  * Threshold math: the first two md5 hex chars are uniform over 256
  * values, so `< '1a'` keeps 26/256 ≈ 10.2%, and `< '40'` keeps
  * 64/256 = 25%. Lexicographic hex compare is identical on both
  * engines.
  */
object SampleQueries {

  /** DuckDB fragment: whitespace tokens of `text`. Declared before the
    * query vals that interpolate it (object init order). */
  private val W = """string_split_regex(trim(text), '\s+')"""

  /** DuckDB fragment: first 8 hex chars of md5 expression `m` as an
    * integer, by digit arithmetic (no hex-cast builtin needed). */
  private def hexU8(m: String): String =
    (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', ($m)[$i]) - 1) * ${math.pow(16, 8 - i).toLong}")
      .mkString("(", " + ", ")")

  /** ~10% deterministic sample of `documents`, summarized per source. */
  val hashSample = Q(
    "q_sample_hash",
    """SELECT source, count(*) AS n_docs, min(doc_id) AS first_doc,
      |  CAST(sum(length(text)) AS BIGINT) AS chars
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
      |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < "1a")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"),
           sum(length(col("text"))).as("chars"))
      .orderBy("source")
  }

  /** Stratified gates: per-source sampling rates (the corpus-mixture
    * reweighting move: upsample rare strata, downsample dominant ones).
    * Unlisted strata fall back to the base ~10% gate. */
  val stratifiedSample = Q(
    "q_sample_stratified",
    """SELECT source, count(*) AS n_docs, min(doc_id) AS first_doc
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |  CASE source WHEN 'src0' THEN '0d' WHEN 'src1' THEN '80' ELSE '1a' END
      |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
    val gate = when(col("source") === "src0", "0d")       // ~5%
      .when(col("source") === "src1", "80")               // 50%
      .otherwise("1a")                                    // ~10%
    Tables.documents(s, d)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < gate)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy("source")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each row gets the key u^(1/w) for a deterministic uniform u and
    * weight w, and the global top-k by key IS a weighted sample without
    * replacement — the mixture-sampling primitive that favors (here)
    * longer documents without ever materializing per-row randomness
    * state. One map pass + one top-k; repartition/rerun-stable.
    *
    * Engine-exact determinism:
    *  - u = (first-8-hex-chars-of-md5 + 0.5) / 2^32 — integer-exact in
    *    both engines (hex digits → integer by arithmetic, division by a
    *    power of two is exact in binary floating point);
    *  - keys compare in the ln domain (ln(u)/w, monotone in u^(1/w) —
    *    avoids pow's rational exponent); both engines evaluate ln on
    *    BIT-IDENTICAL inputs, and with 500 md5-spread candidates the
    *    top-k boundary is never within an ulp of a tie, so the SELECTED
    *    SET agrees even if the last ulp of ln differs. The float key is
    *    deliberately NOT an output column — only integer facts are. */
  val weightedSample = Q(
    "q_sample_weighted",
    s"""WITH c AS (
      |  SELECT doc_id, source, len($W) AS w,
      |    ln((${hexU8("md5('ws|' || CAST(doc_id AS VARCHAR))")} + 0.5)
      |        / 4294967296.0) / len($W) AS k
      |  FROM documents WHERE len($W) >= 1
      |)
      |SELECT doc_id, source, CAST(w AS BIGINT) AS w
      |FROM (SELECT * FROM c ORDER BY k DESC, doc_id LIMIT 20)
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = size(tokens(col("text")))
    val u = (conv(substring(md5(concat(lit("ws|"), col("doc_id").cast("string"))), 1, 8),
                  16, 10).cast("double") + 0.5) / 4294967296.0
    Tables.documents(s, d)
      .filter(size(tokens(col("text"))) >= 1)
      .select(col("doc_id"), col("source"), w.cast("long").as("w"),
              (log(u) / w).as("k"))
      .orderBy(col("k").desc, col("doc_id"))
      .limit(20)
      .select("doc_id", "source", "w")
      .orderBy("doc_id")
  }

  /** Fixed-SIZE per-stratum sample: exactly k = 3 documents per source,
    * chosen by md5 order — the "take N examples from every domain"
    * move (eval-set construction, per-domain inspection), complementing
    * the RATE-based stratified gate above. One window per source
    * partition, deterministic under repartition/rerun (md5 of the id,
    * doc_id tie-break), no corpus sort. */
  val perSourceSample = Q(
    "q_sample_per_source",
    """SELECT source, doc_id FROM (
      |  SELECT source, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5('psamp|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents
      |) WHERE rk <= 3 ORDER BY source, doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(concat(lit("psamp|"), col("doc_id").cast("string"))),
        col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
      .select("source", "doc_id")
      .orderBy("source", "doc_id")
  }

  /** Cluster-balanced (diversity) sampling: exactly k = 5 vectors per
    * LEARNED cluster, chosen by md5 order — uniform over SEMANTIC space
    * rather than over sources (topic-balancing a skewed corpus,
    * diverse eval-set construction, prototype selection). Strata come
    * from the persisted [[IvfIndex]] assignments — no training
    * in-plan, the artifact-lifecycle discipline — and each window
    * partitions on one cell, so nothing is corpus-wide. The oracle
    * replays the k-means training to the same assignments, then the
    * same windowed draw. */
  val perClusterSample = Q(
    "q_sample_per_cluster",
    s"""WITH ${IvfQuantizer.oracleCtes(SimilarityQueries.ivfK,
                                       SimilarityQueries.ivfIters)}
       |SELECT cell, vec_id FROM (
       |  SELECT cell, vec_id,
       |    row_number() OVER (PARTITION BY cell
       |      ORDER BY md5('csamp|' || CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |  FROM asn
       |) WHERE rk <= 5 ORDER BY cell, vec_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cell")
      .orderBy(md5(concat(lit("csamp|"), col("vec_id").cast("string"))),
        col("vec_id"))
    IvfIndex.assignments(s, d, SimilarityQueries.ivfK, SimilarityQueries.ivfIters)
      .select(col("cell"), col("vec_id"), row_number().over(w).as("rk"))
      .filter(col("rk") <= 5)
      .select("cell", "vec_id")
      .orderBy("cell", "vec_id")
  }
}
