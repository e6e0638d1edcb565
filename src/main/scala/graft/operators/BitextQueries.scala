package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.plans.CosineSimilarity.cosineSim

/** Margin-based alignment mining (Artetxe & Schwenk 2019, the
  * LASER/CCMatrix recipe): to pair documents ACROSS a partition of the
  * corpus (languages for bitext, domains/modalities for any aligned
  * corpus — here the embedding `label`), raw cosine is not enough — hub
  * vectors are everyone's nearest neighbor and flood the mined set.
  * The fix is the MARGIN: accept x→y only when cos(x, y) clearly beats
  * x's next-best cross-partition option (the ratio variant,
  * cos(best)/cos(second)). Mined pairs feed translation/alignment
  * training; the margin threshold is the precision dial.
  *
  * Plan: bounded query batch (vec_id < [[MineQ]], the ann-family
  * convention) broadcast against one corpus scan restricted to
  * CROSS-label candidates; rank-1/rank-2 from one window. At 100 TB
  * the scan side prunes through the IVF cell artifact exactly like
  * `q_ann_ivf` (the shortlist-then-margin shape); brute force here is
  * the oracle-exact baseline the pruned variant would be measured
  * against. Cosines are deterministic doubles (the `recall` column
  * convention), so the frame is hash-exact. */
object BitextQueries {

  private[graft] final val MineQ = 20
  /** Ratio-margin acceptance threshold, in milli (1.06 — the
    * CCMatrix-style operating point). Stored floor-milli so the
    * verdict column is integer-stable.
    *
    * The ratio is only defined for a POSITIVE denominator: with
    * cos_second <= 0 Spark's floor(Infinity).cast(long) saturates to
    * Long.MaxValue while DuckDB's CAST raises, and a negative ratio
    * would REJECT a query whose best clearly dominates a negative
    * runner-up — inverted semantics. So margin_milli is NULL when
    * cos_second <= 0, and acceptance falls back to cos_best > 0 (a
    * positive best beats any non-positive second by unbounded ratio),
    * guarded identically in the plan and the oracle.
    *
    * A TINY positive denominator is the same divergence class: the
    * ratio can exceed BIGINT range, where Spark's double→long cast
    * saturates while DuckDB's CAST raises — so the stored margin is
    * capped at [[MarginCapMilli]] before the cast, identically in both
    * engines (9·10¹⁸ is exactly double-representable, below Long.Max,
    * and far above any meaningful margin; acceptance is unaffected). */
  private[graft] final val MarginMilli = 1060L

  /** Saturation cap for the stored ratio margin (see above). */
  private[graft] final val MarginCapMilli = 9000000000000000000L

  private val cosSql = SimilarityQueries.cosSql

  val bitextMine = Q(
    "q_bitext_mine",
    s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
       |           FROM embeddings),
       |ranked AS (
       |  SELECT q.vec_id AS query_id, q.label AS query_label,
       |    c.vec_id AS cand_id, c.label AS cand_label,
       |    $cosSql AS cosine,
       |    row_number() OVER (PARTITION BY q.vec_id
       |                       ORDER BY $cosSql DESC, c.vec_id) AS rank
       |  FROM (SELECT * FROM v WHERE vec_id < $MineQ) q
       |  JOIN v c ON c.label <> q.label
       |)
       |SELECT b.query_id, b.query_label, b.cand_id AS best_id,
       |  b.cand_label AS best_label, b.cosine AS cos_best,
       |  s.cosine AS cos_second,
       |  CASE WHEN s.cosine > 0
       |       THEN CAST(least(floor(1000 * b.cosine / s.cosine),
       |                       $MarginCapMilli) AS BIGINT)
       |  END AS margin_milli,
       |  CASE WHEN s.cosine > 0
       |       THEN floor(1000 * b.cosine / s.cosine) >= $MarginMilli
       |       ELSE b.cosine > 0
       |  END AS accepted
       |FROM (SELECT * FROM ranked WHERE rank = 1) b
       |JOIN (SELECT * FROM ranked WHERE rank = 2) s USING (query_id)
       |ORDER BY query_id""".stripMargin) { (s, d) =>
    val v = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), col("embedding"))
    val q = v.filter(col("vec_id") < MineQ)
      .select(col("vec_id").as("query_id"), col("label").as("query_label"),
        col("embedding").as("eq"))
    val c = v.select(col("vec_id").as("cand_id"), col("label").as("cand_label"),
      col("embedding").as("ec"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("cand_id"))
    val ranked = broadcast(q).join(c, col("cand_label") =!= col("query_label"))
      .withColumn("cosine", cosineSim(col("eq"), col("ec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 2)
      .select("query_id", "query_label", "cand_id", "cand_label",
        "cosine", "rank")
    val best = ranked.filter(col("rank") === 1)
      .select(col("query_id"), col("query_label"),
        col("cand_id").as("best_id"), col("cand_label").as("best_label"),
        col("cosine").as("cos_best"))
    val second = ranked.filter(col("rank") === 2)
      .select(col("query_id"), col("cosine").as("cos_second"))
    best.join(second, Seq("query_id"))
      .withColumn("margin_milli",
        when(col("cos_second") > 0,
          least(floor(lit(1000) * col("cos_best") / col("cos_second")),
            lit(MarginCapMilli)).cast("long")))
      .select(col("query_id"), col("query_label"), col("best_id"),
        col("best_label"), col("cos_best"), col("cos_second"),
        col("margin_milli"),
        when(col("cos_second") > 0, col("margin_milli") >= MarginMilli)
          .otherwise(col("cos_best") > 0).as("accepted"))
      .orderBy("query_id")
  }
}
