package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions

/** Context-window sequence packing: the global two-level token offset
  * must equal the single-window cumulative sum it decomposes, and the
  * chunked sequences must satisfy the loader contract — every sequence
  * except the last holds exactly L tokens, sequence ids are contiguous
  * from 0, and no token is lost or duplicated across the explode. */
class PackSequencesSpec extends SparkSpec {

  /** Reference: ONE unpartitioned window over (pack_bucket, doc_id) —
    * the semantics packGlobal decomposes. */
  private def referenceGlobal(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy(ShardPacking.bucketOf(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum("toks").over(w), lit(0L)))
      .select(col("doc_id"), col("cum_before"))
  }

  private def corpusToks = Tables.documents(spark, sf0001)
    .select(col("doc_id"),
      size(TextFunctions.tokens(col("text"))).cast("long").as("toks"))
    .filter(col("toks") > 0)

  test("packGlobal equals the single-window global cumsum exactly") {
    val got = ShardPacking.packGlobal(corpusToks).select("doc_id", "cum_before")
    val want = referenceGlobal(corpusToks)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "global two-level offsets diverged from the single-window reference")
  }

  test("every sequence but the last holds exactly L tokens; ids contiguous") {
    val seqs = CorpusQueries.packSequences.run(spark, sf0001)
      .select("seq", "toks", "n_docs", "n_full_docs")
      .collect().sortBy(_.getLong(0))
    assert(seqs.nonEmpty)
    // contiguous ids from 0
    seqs.map(_.getLong(0)).zipWithIndex.foreach { case (s, i) =>
      assert(s == i, s"sequence ids not contiguous: got $s at position $i")
    }
    // exact fill on all but the final chunk
    seqs.dropRight(1).foreach { r =>
      assert(r.getLong(1) == 512L,
        s"sequence ${r.getLong(0)} holds ${r.getLong(1)} tokens, not 512")
    }
    assert(seqs.last.getLong(1) <= 512L && seqs.last.getLong(1) > 0L)
    // full docs are a subset of contributing docs
    seqs.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2),
        s"sequence ${r.getLong(0)}: n_full_docs > n_docs")
    }
  }

  test("no token lost or duplicated by the boundary-span explode") {
    val total = corpusToks.agg(sum("toks")).collect()(0).getLong(0)
    val packed = CorpusQueries.packSequences.run(spark, sf0001)
      .agg(sum("toks")).collect()(0).getLong(0)
    assert(packed == total,
      s"chunked token count $packed != corpus token count $total")
  }

  test("BPE-packed sequences conserve the trained tokenizer's token count") {
    val counted = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .join(ChunkingQueries.bpeVocab(spark, sf0001).select("w", "n_tokens"), Seq("w"))
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    val seqs = ChunkingQueries.packSequencesBpe.run(spark, sf0001)
      .select("toks").collect().map(_.getLong(0))
    assert(seqs.sum == counted,
      s"BPE chunk total ${seqs.sum} != tokenizer count $counted")
    assert(seqs.dropRight(1).forall(_ == 512L),
      "a non-final BPE sequence is not exactly 512 tokens")
  }

  test("packGlobal on an empty frame returns empty, not a crash") {
    val empty = spark.range(0)
      .select(col("id").as("doc_id"), col("id").as("toks"))
    assert(ShardPacking.packGlobal(empty).count() == 0)
  }

  test("packGlobal's offsets re-attach as a broadcast, not a shuffle") {
    val plan = ShardPacking.packGlobal(corpusToks)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"offsets join is not a broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"bad join shape:\n$plan")
  }

  test("a document longer than L spans multiple sequences, fully accounted") {
    // 3 docs: 100, 1300 (spans >= 3 sequences at L=512), 50 tokens
    val docs = spark.range(3).select(col("id").as("doc_id"),
      when(col("id") === 1, 1300L).otherwise(
        when(col("id") === 0, 100L).otherwise(50L)).as("toks"))
    val c = ShardPacking.packGlobal(docs)
    val spans = c.select(col("doc_id"),
        explode(sequence(expr("cum_before div 512"),
          expr("(cum_before + toks - 1) div 512"))).as("seq"))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spans(1L) >= 3, s"1300-token doc spans ${spans(1L)} sequences, want >= 3")
    assert(spans(0L) >= 1 && spans(2L) >= 1)
  }
}
