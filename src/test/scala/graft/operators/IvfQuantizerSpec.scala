package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Trained IVF quantizer: assignment totality, determinism, and the
  * recall floor of cell-pruned search vs the exact baseline. */
class IvfQuantizerSpec extends SparkSpec {
  import spark.implicits._

  test("every vector gets exactly one cell in [0, k); multiple cells survive training") {
    val asn = IvfQuantizer.assignments(spark, sf0001, k = 8, iters = 2).cache()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(asn.count() == n)
    assert(asn.select("vec_id").distinct().count() == n)
    assert(asn.filter(col("cell") < 0 || col("cell") >= 8).count() == 0)
    val nCells = asn.select("cell").distinct().count()
    assert(nCells > 1, s"k-means collapsed to $nCells cell(s)")
    spark.catalog.clearCache()
  }

  test("training is deterministic: two independent runs agree exactly") {
    val a = IvfQuantizer.assignments(spark, sf0001, k = 8, iters = 2)
    val b = IvfQuantizer.assignments(spark, sf0001, k = 8, iters = 2)
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
    spark.catalog.clearCache()
  }

  test("cell-pruned search keeps a usable fraction of the exact top-5; probing 2 cells helps") {
    val bf = SimilarityQueries.bruteForceTopK.run(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SimilarityQueries.ivfTopK.run(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf2 = SimilarityQueries.ivfTopKProbe2.run(spark, sf0001)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    spark.catalog.clearCache()
    val recall = (bf & ivf).size.toDouble / bf.size
    val recall2 = (bf & ivf2).size.toDouble / bf.size
    // single-probe IVF on near-orthogonal vectors: a floor, not a target
    assert(recall >= 0.5, s"recall@5 collapsed to $recall")
    // widening the probe can only add candidates per query
    assert(recall2 >= recall, s"probe2 recall $recall2 < single-probe $recall")
  }
}
