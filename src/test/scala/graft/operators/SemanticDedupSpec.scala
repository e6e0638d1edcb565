package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.plans.CosineSimilarity.cosineSim

/** IVF-cell-blocked semantic dedup: within-cell verification must find
  * exactly the exact-cosine pairs whose members share a cell, the cell
  * cap must bound an adversarial overfull cell (with telemetry), and on
  * the shipped corpus the blocking must never invent pairs while the
  * recall gauge reports the true coverage. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic assignment + vectors, one-hot in an n-dim space so every
    * non-planted pair is exactly orthogonal: ids 0..19 form ten planted
    * identical pairs (2k, 2k+1) at dimension k; every other id gets its
    * own dimension. */
  private def vecs(n: Int, cellOf: Long => Int) = {
    val rows = (0L until n.toLong).map { i =>
      val dim = (if (i < 20) i / 2 else i).toInt
      val e = Array.tabulate(n)(j => if (j == dim) 1.0f else 0.0f)
      (i, e, cellOf(i))
    }
    val v = rows.map(r => (r._1, r._2)).toDF("vec_id", "embedding")
    val asn = rows.map(r => (r._1, r._3)).toDF("vec_id", "cell")
    (asn, v)
  }

  private val planted = (0L until 10L).map(k => (2 * k, 2 * k + 1)).toSet

  test("within-cell pairs at the threshold, and only those, are found") {
    val (asn, v) = vecs(20, _ => 0)
    val got = DedupQueries.semanticPairsFrom(asn, v)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got == planted, s"got $got")
  }

  test("a cross-cell duplicate pair is invisible to cell blocking") {
    // the (0, 1) duplicate pair splits across cells — blocking misses it
    val (asn, v) = vecs(20, i => if (i == 1) 1 else 0)
    val got = DedupQueries.semanticPairsFrom(asn, v)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got == planted - ((0L, 1L)), s"got $got")
  }

  test("an overfull cell is dropped, reported, and pairing stays bounded") {
    // 60 vectors in one hot cell (cap 50), 20 orthogonal in a healthy one
    val (asn, v) = vecs(80, i => if (i < 60) 0 else 1)
    val over = DedupQueries.semanticOversizedCells(asn, maxCell = 50).collect()
    assert(over.length == 1 && over(0).getInt(0) == 0 &&
      over(0).getLong(1) == 60L, s"telemetry: ${over.toSeq}")
    val capped = DedupQueries.semanticPairsFrom(asn, v, maxCell = 50)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // the planted pairs all live in the dropped hot cell; the healthy
    // cell is mutually orthogonal — so the capped run finds nothing,
    // and the uncapped run finds exactly the planted pairs
    assert(capped.isEmpty, s"got $capped")
    val uncapped = DedupQueries.semanticPairsFrom(asn, v, maxCell = 1000000)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(uncapped == planted)
  }

  test("multi-probe blocking is a strict recall dial: probed ⊇ single-probe") {
    import SimilarityQueries.{ivfIters, ivfK}
    val v = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val t = IvfQuantizer.train(spark, sf0001, ivfK, ivfIters)
    try {
      val single = DedupQueries.semanticPairsFrom(IvfQuantizer.cellsOf(t, 1), v)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      val probed = DedupQueries.semanticPairsProbed(IvfQuantizer.cellsOf(t, 2), v)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(single.subsetOf(probed),
        s"single-probe pairs missing from probed: ${(single -- probed).take(3)}")
      assert(probed.size >= single.size)
    } finally t.quantized.unpersist()
  }

  test("on the shipped corpus, blocking never invents pairs; recall is real") {
    import SimilarityQueries.{ivfIters, ivfK}
    val v = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val exact = v.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      .crossJoin(v.select(col("vec_id").as("vec_b"), col("embedding").as("eb")))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosineSim(col("ea"), col("eb")))
      .filter(col("cosine") >= 0.45)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val sem = DedupQueries.semanticPairsFrom(
        IvfQuantizer.assignments(spark, sf0001, ivfK, ivfIters), v)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain ≥0.45 pairs")
    assert(sem.subsetOf(exact), "blocking must never invent pairs")
    assert(sem.nonEmpty, "some exact pairs should share a cell")
    // this corpus's ≥0.45 pairs are random-tail cosines (max ~0.48 at
    // sf0.001), the adversarial regime for ANY blocking scheme — the
    // registered recall gauge (q_dedup_semantic_recall) reports this
    // honestly. A pair of IDENTICAL vectors, the actual near-dup shape,
    // always shares a cell: nearest-centroid is a function of the vector
    val dup = v.limit(1).select(lit(999999L).as("vec_id"), col("embedding"))
    val withDup = v.unionByName(dup)
    val asn2 = IvfQuantizer.assignments(spark, sf0001, ivfK, ivfIters)
    val srcCell = asn2.join(v.limit(1).select("vec_id"), Seq("vec_id"))
      .select("cell").as[Int].head()
    // re-deriving the clone's cell from the trained centroids must land
    // it with its source (same integer distances, same tie-break)
    val t = IvfQuantizer.train(spark, sf0001, ivfK, ivfIters)
    try {
      val cloneCell = IvfQuantizer
        .nearestCells(IvfQuantizer.vq(withDup.filter(col("vec_id") === 999999L)),
                      t.centroids, 1)
        .select("cell").as[Int].head()
      assert(cloneCell == srcCell,
        "an exact duplicate must be assigned to its source's cell")
    } finally t.quantized.unpersist()
  }

  test("semantic decontamination: one certificate row per eval vector, " +
    "flags consistent with the pair artifact") {
    val out = DedupQueries.semanticContamination.run(spark, sf0001).collect()
    val nEval = graft.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 97 === 0).count()
    assert(out.length == nEval, "every eval vector must get a row")
    out.foreach { r =>
      val n = r.getLong(1)
      assert((n > 0) == (r.getInt(3) == 1), "flag must equal n_train_nbrs>0")
      assert((n > 0) == !r.isNullAt(2), "max_cosine iff contaminated")
      if (n > 0) assert(r.getDouble(2) >= 0.45, "hits obey the threshold")
      assert(r.getLong(0) % 97 == 0, "only eval-slice vectors appear")
    }
  }
}
