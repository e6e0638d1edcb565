package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Q

/** Image-grain benchmark contamination (r15 verdict item 5) — the
  * multimodal twin of the text-grain contamination family: a TRAIN
  * image that is a near-duplicate (Hamming ≤ 3 on the 64-bit aHash,
  * INCLUDING exact copies at 0) of any EVAL-slice signature is a leak —
  * the model would be evaluated on pixels it trained on. The eval slice
  * is `doc_id % 97 = 0` (a fixed ~1% pseudo-benchmark, the repo's
  * held-out-slice idiom), and the signature pool is the UNION of both
  * persisted pixel-signature artifacts: per-image aHashes (img_phash)
  * and per-frame GIF aHashes (gif_phash) — so an eval IMAGE leaking
  * into a train VIDEO frame (or vice versa) is caught across
  * modalities, both hashes living in the same 64-bit aHash space.
  *
  * Matching is the shared pigeonhole discipline ([[MultimodalQueries]]
  * near-dup family): 4 bands × 16 bits — ≤ 3 differing bits cannot
  * touch all 4 bands, so every true leak agrees on at least one band —
  * then exact Hamming verify. Unlike the near-dup queries there is NO
  * band-bucket cap and NO representative collapse: an audit must not
  * silently drop a leak, and the join stays bounded because the eval
  * side is a fixed ~1% slice (candidates ≤ 4·Σ_bucket |train|·|eval|
  * with |eval| small per bucket; at 100× a skewed band value is salted
  * by splitting the eval bucket, the [[DedupQueries]] dial).
  *
  * Output: one row per CONTAMINATED train document — how many eval
  * documents it collides with, the closest distance, and the first
  * offending eval document. Decode cost is zero: both signature
  * artifacts are already persisted (pixels touched once per corpus).
  */
object MmContaminationQueries {

  private[graft] val EvalMod = 97L

  /** The matching kernel over any (doc_id, phash) 64-bit signature
    * frame — shared with the planted-leak spec. Returns one row per
    * flagged train doc: (doc_id, n_eval_docs, min_hamming,
    * first_eval). */
  private[graft] def contaminationFrom(sigs: DataFrame): DataFrame = {
    val valid = sigs.filter(col("phash") =!= "")
    // decode the 64-char '0'/'1' signature into two 32-bit halves ONCE
    // per signature row, before banding multiplies it 4x: the candidate
    // shuffle/distinct then carries 4 longs instead of two 64-char
    // strings (guide §2.3 narrower shuffles), and Hamming is two
    // codegen bit_count(xor) terms instead of 64 substring comparisons
    // (the decode is injective on the fixed-width string, so the
    // distinct groups and every distance are unchanged)
    def bandsOf(f: DataFrame) = f
      .withColumn("h1", conv(substring(col("phash"), 1, 32), 2, 10).cast("long"))
      .withColumn("h2", conv(substring(col("phash"), 33, 32), 2, 10).cast("long"))
      .select(col("doc_id"), col("h1"), col("h2"),
        posexplode(array((0 until 4).map(b =>
          substring(col("phash"), b * 16 + 1, 16)): _*)).as(Seq("b", "bits")))
    val ev = bandsOf(valid.filter(col("doc_id") % EvalMod === 0))
      .select(col("doc_id").as("eval_doc"), col("h1").as("e1"),
        col("h2").as("e2"), col("b"), col("bits"))
    val tr = bandsOf(valid.filter(col("doc_id") % EvalMod =!= 0))
      .select(col("doc_id").as("train_doc"), col("h1").as("a1"),
        col("h2").as("a2"), col("b"), col("bits"))
    val cand = tr.join(ev, Seq("b", "bits"))
      .select("train_doc", "a1", "a2", "eval_doc", "e1", "e2")
      .distinct()
    cand
      .withColumn("hamming",
        (expr("bit_count(a1 ^ e1)") + expr("bit_count(a2 ^ e2)")).cast("long"))
      .filter(col("hamming") <= 3L)
      // a (train, eval) doc pair may collide through several signature
      // pairs (frames) — its distance is the closest one
      .groupBy("train_doc", "eval_doc")
      .agg(min("hamming").as("hamming"))
      .groupBy(col("train_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_eval_docs"),
        min("hamming").as("min_hamming"),
        min("eval_doc").as("first_eval"))
      .orderBy("doc_id")
  }

  /** DuckDB: the GIF per-frame closed-form aHash stream (the
    * q_mm_gif_frames contract) as (doc_id, phash). */
  private def gifSigSql: String =
    """gf AS (
      |  SELECT doc_id,
      |    repeat('1', CAST(8 + (doc_id + frame_idx) % 48 AS INTEGER)) ||
      |    repeat('0', CAST(56 - (doc_id + frame_idx) % 48 AS INTEGER)) AS phash
      |  FROM (
      |    SELECT doc_id,
      |      CAST(unnest(range(0, 2 + doc_id % 3)) AS INTEGER) AS frame_idx
      |    FROM documents WHERE doc_id < 500
      |  ) WHERE frame_idx % 2 = 0
      |)""".stripMargin

  val mmContamination = Q(
    "q_mm_contamination",
    s"""WITH ${MultimodalQueries.imgPhashCtesP("i")},
       |$gifSigSql,
       |sigs AS (
       |  SELECT doc_id, phash FROM ihash
       |  UNION ALL SELECT doc_id, phash FROM gf
       |),
       |ev AS (SELECT doc_id, phash, b.b,
       |         substr(phash, b.b * 16 + 1, 16) AS bits
       |       FROM sigs, unnest(range(0, 4)) AS b(b)
       |       WHERE doc_id % $EvalMod = 0),
       |tr AS (SELECT doc_id, phash, b.b,
       |         substr(phash, b.b * 16 + 1, 16) AS bits
       |       FROM sigs, unnest(range(0, 4)) AS b(b)
       |       WHERE doc_id % $EvalMod <> 0),
       |cand AS (
       |  SELECT DISTINCT t.doc_id AS train_doc, t.phash AS ha,
       |    e.doc_id AS eval_doc, e.phash AS hb
       |  FROM tr t JOIN ev e ON t.b = e.b AND t.bits = e.bits
       |),
       |ham AS (
       |  SELECT train_doc, eval_doc,
       |    CAST(list_sum([CASE WHEN ha[j] <> hb[j] THEN 1 ELSE 0 END
       |                   for j in range(1, 65)]) AS BIGINT) AS hamming
       |  FROM cand
       |),
       |pairm AS (
       |  SELECT train_doc, eval_doc, min(hamming) AS hamming
       |  FROM ham WHERE hamming <= 3 GROUP BY train_doc, eval_doc
       |)
       |SELECT train_doc AS doc_id,
       |  count(*) AS n_eval_docs,
       |  CAST(min(hamming) AS BIGINT) AS min_hamming,
       |  min(eval_doc) AS first_eval
       |FROM pairm GROUP BY train_doc ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sigs = MultimodalQueries.phashFrame(s, d)
      .select(col("doc_id"), col("phash"))
      .unionByName(MultimodalQueries.gifFrameTable(s, d)
        .select(col("doc_id"), col("ahash").as("phash")))
    contaminationFrom(sigs)
  }
}
