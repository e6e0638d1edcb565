package graft.operators

import graft.SparkSpec

/** Margin mining: pins (a) the real-corpus invariants (cross-label
  * best, ordered cosines, verdict consistent with the threshold) and
  * (b) THE reason the margin exists — on a crafted corpus with a hub
  * vector (everyone's near-neighbor), raw cosine would mine the hub
  * for every query, but the ratio margin accepts only the query with
  * a genuinely isolated partner and rejects the hub-dominated ones. */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft_bitext_spec"

  test("real corpus: invariants and a discriminating verdict") {
    val out = BitextQueries.bitextMine.run(spark, sf0001).collect()
    assert(out.length == BitextQueries.MineQ)
    out.foreach { r =>
      assert(r.getInt(1) != r.getInt(3), "best must be cross-label")
      assert(r.getDouble(4) >= r.getDouble(5), "cos_best >= cos_second")
      assert(r.getBoolean(7) == (r.getLong(6) >= BitextQueries.MarginMilli))
    }
    val acc = out.count(_.getBoolean(7))
    assert(acc > 0 && acc < out.length,
      s"threshold should discriminate on this corpus, accepted $acc/20")
  }

  test("crafted ambiguity: margin accepts the isolated true pair, " +
    "rejects the query whose two best candidates are near-equal") {
    def vec(parts: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f)
      parts.foreach { case (i, v) => a(i) = v }
      a.toSeq
    }
    // query 0 has an exact cross-label twin and everything else is far
    // (margin >> threshold); query 1's two candidates score 0.994 and
    // 0.986 — a real best, but ambiguous (ratio 1.008 < 1.06), which
    // is exactly the hubness/ambiguity case the margin exists to drop
    val rows = Seq(
      (0L, vec(0 -> 1f, 5 -> 0.1f), 0),
      (1L, vec(1 -> 1f, 5 -> 0.1f), 0),
      (100L, vec(0 -> 1f, 5 -> 0.1f), 1),            // exact twin of 0
      (101L, vec(1 -> 0.9f, 2 -> 0.1f, 5 -> 0.1f), 1),  // q1 best
      (102L, vec(1 -> 0.88f, 2 -> 0.15f, 5 -> 0.1f), 1)) // q1 runner-up
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = BitextQueries.bitextMine.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val q0 = out(0L)
    assert(q0.getLong(2) == 100L && q0.getBoolean(7),
      s"the isolated true pair must be mined: $q0")
    val q1 = out(1L)
    assert(q1.getLong(2) == 101L && !q1.getBoolean(7),
      s"101 is query 1's best, but the ambiguous margin must REJECT it: $q1")
  }

  test("non-positive second-best: ratio undefined (NULL margin), " +
    "acceptance falls back to cos_best > 0") {
    def vec(parts: (Int, Float)*): Seq[Float] = {
      val a = Array.fill(64)(0f)
      parts.foreach { case (i, v) => a(i) = v }
      a.toSeq
    }
    // query 0: best is an exact-direction twin (cos 1.0), second is
    // ORTHOGONAL (cos exactly 0.0) — the floor(Infinity) engine trap
    // the r11 advice flagged; must accept with a NULL margin.
    // query 1: ALL cross-label candidates orthogonal (best = second =
    // 0.0) — nothing positive to accept.
    val rows = Seq(
      (0L, vec(0 -> 1f), 0),
      (1L, vec(2 -> 1f), 0),
      (100L, vec(0 -> 0.8f), 1), // cos(q0)=1, cos(q1)=0
      (101L, vec(1 -> 1f), 1))   // cos(q0)=0, cos(q1)=0
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${dir}_guard/embeddings.parquet")
    val out = BitextQueries.bitextMine.run(spark, s"${dir}_guard").collect()
      .map(r => r.getLong(0) -> r).toMap
    val q0 = out(0L)
    assert(q0.getLong(2) == 100L && q0.getDouble(5) == 0.0, q0.toString)
    assert(q0.isNullAt(6), s"margin must be NULL on a zero denominator: $q0")
    assert(q0.getBoolean(7), s"positive best over zero second must accept: $q0")
    val q1 = out(1L)
    assert(q1.getDouble(4) == 0.0 && q1.isNullAt(6) && !q1.getBoolean(7),
      s"non-positive best must not accept: $q1")
  }
}
