package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

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
}
