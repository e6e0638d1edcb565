package graft.plans

import graft.{SparkSpec, Tables}
import graft.operators.DedupQueries
import graft.plans.HyperplaneBands.hyperplaneBands
import org.apache.spark.sql.functions._

/** Hyperplane-LSH band keys: structural contract of the fused expression,
  * plus end-to-end recall of the bucketed near-dup pipeline against the
  * exact all-pairs baseline. */
class HyperplaneBandsSpec extends SparkSpec {
  import spark.implicits._

  test("band keys: length planes/bandBits, range [0, 2^bandBits), scale-invariant") {
    val rows = Seq(
      (1L, Some(Seq(1.0f, -2.0f, 3.0f, 0.5f))),
      (2L, Some(Seq(2.0f, -4.0f, 6.0f, 1.0f))), // same direction as 1
      (3L, Some(Seq(-1.0f, 2.0f, -3.0f, -0.5f))), // antipode of 1
      (4L, Option.empty[Seq[Float]]))
      .toDF("id", "e")
      .select(col("id"), hyperplaneBands(col("e"), 16, 2).as("k"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Int](1)))
      .toMap
    assert(rows(1L).length == 8)
    assert(rows(1L).forall(k => k >= 0 && k < 4))
    // sign bits are invariant under positive scaling of the vector
    assert(rows(1L) == rows(2L))
    // the antipode flips every bit: each 2-bit key maps k -> 3 - k
    assert(rows(3L) == rows(1L).map(3 - _))
    assert(rows(4L) == null)
  }

  test("bucketed near-dup pipeline finds exactly the all-pairs result (recall 1.0)") {
    // sf0.001 has 500 vectors, all inside the exact baseline's bound
    assert(Tables.embeddings(spark, sf0001).filter(col("vec_id") >= 500).count() == 0)
    val lsh = DedupQueries.embeddingPairs.run(spark, sf0001)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    spark.catalog.clearCache()
    val exact = DedupQueries.embeddingPairsExact.run(spark, sf0001)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact, s"LSH missed ${(exact -- lsh).size} / found ${(lsh -- exact).size} extra")
    assert(exact.nonEmpty)
  }
}
