package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Null-cell totality over the document surface: the driver corpus has
  * no NULL text/lang/source, but a 100 TB crawl will — one null cell
  * must not kill a stage. Representative operators from each family run
  * over a fixture with null text, null lang, null source, and an empty
  * string, asserting no throw and deterministic null handling. */
class NullRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft_null_spec"

  private def writeFixture(): Unit =
    Seq[(java.lang.Long, String, String, String, java.lang.Long)](
      (0L, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60L),
      (1L, null, "en", "web", null),           // null text
      (2L, "plain words here and there and everywhere", null, "web", 41L), // null lang
      (3L, "more plain words scattered all over the place", "en", null, 45L), // null source
      (4L, "", "en", "web", 0L))               // empty text
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("representative operators survive null text/lang/source cells") {
    writeFixture()
    // exact dedup: md5(normalized(null)) must stay null-safe
    val exact = DedupQueries.exactSummary.run(spark, dir).collect()
    assert(exact.nonEmpty)
    // minhash signatures: the fused native expression over null shingles
    val sigs = DedupQueries.minhashSignature.run(spark, dir).collect()
    assert(sigs.length >= 3)
    // sequence packing: null text -> no tokens -> excluded, not a crash
    val seqs = CorpusQueries.packSequences.run(spark, dir).collect()
    assert(seqs.nonEmpty && seqs.map(_.getLong(2)).sum > 0)
    // curriculum packing (ADVICE r9): the null-text row must drop, not
    // flow null toks/score into the ordered prefix sums — every shard
    // row stays fully non-null and token totals cover the 4 real docs
    val cur = CorpusQueries.packCurriculum.run(spark, dir).collect()
    assert(cur.nonEmpty && cur.forall(r => !r.anyNull),
      "null text leaked a null into curriculum shards")
    // 12 + 7 + 8 tokens from docs 0/2/3 plus the empty doc's single
    // empty token (split("") = [""]); the null-text doc contributes 0
    assert(cur.map(_.getLong(2)).sum == 28L,
      "curriculum token total off: null row mis-handled")
    // quality + language heuristics over null/empty text
    val qual = TextQueries.quality.run(spark, dir).collect()
    assert(qual.nonEmpty)
    // mixture sampling: null source forms its own stratum or drops —
    // either way deterministic, no throw
    val mix = CorpusQueries.mixtureSample.run(spark, dir).collect()
    assert(mix.nonEmpty)
    // chunking: null text contributes no chunks
    val chunks = ChunkingQueries.chunkOverlap.run(spark, dir).collect()
    assert(chunks.nonEmpty)
  }

  test("IVF training survives null and empty embedding cells") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val good = (0L until 20L).map(i =>
      Row(i, Array.tabulate(8)(j => (i * 8 + j).toFloat / 100f - 0.5f)))
    val rows = good ++ Seq(Row(20L, null), Row(21L, Array.empty[Float]))
    val vectors = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        Row(r.get(0), Option(r.get(1)).map(_.asInstanceOf[Array[Float]].toSeq).orNull))),
      schema)
    val trained = IvfQuantizer.trainVectors(vectors, k = 4, iters = 1)
    val asn = IvfQuantizer.cellsOf(trained, 1).select("vec_id").distinct().collect()
    // every WELL-FORMED vector lands in a cell; degenerate cells don't throw
    assert(asn.length >= 20, s"only ${asn.length} vectors assigned")
  }
}
