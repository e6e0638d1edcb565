package graft.operators

import graft.SparkSpec

/** Matryoshka truncated retrieval: (a) on a corpus whose signal lives
  * entirely in the leading MatDims dims, truncation is LOSSLESS — the
  * truncated ranking equals the full-dim ranking exactly (the MRL
  * promise when the model concentrates the prefix); (b) real-corpus
  * invariants — well-formed top-5 per query, recall in [0, 1] and
  * consistent with the two rankings it compares. */
class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._
  import SimilarityQueries.MatDims

  private val dir = "/tmp/graft_matryoshka_spec"

  test("prefix-only corpus: truncated ranking equals the full ranking") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map { id =>
      val head = Array.fill(MatDims)(rnd.nextFloat() * 2 - 1)
      (id, (head ++ Array.fill(64 - MatDims)(0f)).toSeq, s"l${id % 4}")
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val full = SimilarityQueries.bruteForceTopK.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val mat = SimilarityQueries.matryoshkaTopK.run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(mat == full, "zero tail dims must make truncation lossless")

    val rec = SimilarityQueries.matryoshkaRecall.run(spark, dir).collect()
    assert(rec.length == 10)
    rec.foreach(r => assert(r.getLong(1) == 5 && r.getDouble(2) == 1.0))
  }

  test("two-stage rerank: never below raw truncation, equals exact when " +
    "the shortlist holds the true top-5, lossless on the prefix corpus") {
    // on the prefix-only corpus both stages are exact
    val rec = SimilarityQueries.rerankRecall.run(spark, dir).collect()
    rec.foreach(r => assert(r.getDouble(2) == 1.0, r.toString))

    // real corpus: rerank recall >= raw truncated recall per query
    // (stage two can only fix the shortlist's internal order)
    val raw = SimilarityQueries.matryoshkaRecall.run(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rr = SimilarityQueries.rerankRecall.run(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    raw.keys.foreach(q => assert(rr(q) >= raw(q), s"query $q: ${rr(q)} < ${raw(q)}"))
    assert(rr.values.sum > raw.values.sum,
      "the exact rerank should buy back some recall on this corpus")

    val rrTop = SimilarityQueries.rerankTopK.run(spark, sf0001).collect()
    assert(rrTop.length == 50)
    rrTop.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to 5))
    }
  }

  test("real corpus: well-formed ranking, recall consistent") {
    val mat = SimilarityQueries.matryoshkaTopK.run(spark, sf0001).collect()
    assert(mat.length == 50)
    mat.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to 5))
      assert(rs.map(_.getLong(1)).distinct.length == 5)
    }
    val bf = SimilarityQueries.bruteForceTopK.run(spark, sf0001)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val mt = mat.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    SimilarityQueries.matryoshkaRecall.run(spark, sf0001).collect().foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(1) == (bf(q) intersect mt(q)).size,
        s"recall hits must be the overlap of the two top-5 sets for query $q")
    }
  }
}
