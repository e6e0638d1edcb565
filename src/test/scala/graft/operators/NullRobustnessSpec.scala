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
}
