package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions._
import graft.plans.MinHashes.minhashes
import org.apache.spark.sql.functions._

/** Scale-shape smoke: the LSH pair generator must stay near-linear when
  * the corpus grows — candidate volume is bounded by band-bucket sizes,
  * never n². A 10× self-unioned corpus (5,000 docs at sf0.001) with
  * exact duplicates across replicas is the worst case for bucket
  * collisions: every replica of a doc shares all 8 band keys. */
class ScaleSmokeSpec extends SparkSpec {

  test("LSH pipeline completes on a 10x corpus with exact-dup clusters") {
    val base = Tables.documents(spark, sf0001).select("doc_id", "text")
    val x10 = (0 until 10).map { i =>
      base.select((col("doc_id") + lit(i * 100000L)).as("doc_id"), col("text"))
    }.reduce(_ unionByName _)

    val sh = x10
      .repartition(8)
      .select(col("doc_id"),
              array_distinct(wordShingles(tokens(col("text")), 3)).as("ss"))
      .cache()
    val bandRows = sh.select(col("doc_id"),
      posexplode(minhashes(col("ss"), 8)).as(Seq("band", "key")))
    val a = bandRows.select(col("doc_id").as("doc_a"), col("band"), col("key"))
    val b = bandRows.select(col("doc_id").as("doc_b"), col("band"), col("key"))
    val t0 = System.nanoTime()
    val pairs = a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("nbands"))
      .filter(col("nbands") >= 2)
    val nPairs = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9

    // every cross-replica pair of the same base doc collides on all 8
    // bands: 500 docs x C(10,2) = 22,500 guaranteed true pairs
    assert(nPairs >= 22500, s"expected at least the replica pairs, got $nPairs")
    // bounded: nothing near the 12.5M all-pairs blowup
    assert(nPairs < 200000, s"pair generation degenerated: $nPairs candidates")
    assert(secs < 120, s"LSH pair generation took ${secs}s on 5k docs")
    sh.unpersist()
  }

  test("embedding LSH candidate generation completes on a 10x corpus of near-dup replicas") {
    import graft.plans.HyperplaneBands.hyperplaneBands
    // 10 replicas of every vector: identical vectors share all band keys,
    // so every cross-replica pair is a guaranteed candidate — the worst
    // case for bucket sizes, like the text smoke above
    val base = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val x10 = (0 until 10).map { i =>
      base.select((col("vec_id") + lit(i * 100000L)).as("vec_id"), col("embedding"))
    }.reduce(_ unionByName _).repartition(8).cache()

    val bands = x10.select(col("vec_id"),
      posexplode(hyperplaneBands(col("embedding"), 16, 2)).as(Seq("band", "key")))
    val a = bands.select(col("vec_id").as("vec_a"), col("band"), col("key"))
    val b = bands.select(col("vec_id").as("vec_b"), col("band"), col("key"))
    val t0 = System.nanoTime()
    val nCand = a.join(b, Seq("band", "key"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
      .count()
    val secs = (System.nanoTime() - t0) / 1e9

    // 500 vectors x C(10,2) = 22,500 guaranteed replica pairs survive
    assert(nCand >= 22500, s"expected at least the replica pairs, got $nCand")
    // the equi-join shape must finish promptly even at 5k vectors
    assert(secs < 120, s"embedding candidate generation took ${secs}s on 5k vectors")
    x10.unpersist()
  }
}
