package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.TextFunctions

/** Two-level shard packing must (a) equal the single-window cumulative
  * sum it decomposes — exactly, per document — and (b) bound every
  * cumsum window partition even when one source dominates the corpus
  * (the real pretraining shape the single-reducer window dies on). */
class ShardPackingSpec extends SparkSpec {
  import spark.implicits._

  /** The reference semantics: ONE window per source in (bucket, doc_id)
    * order — correct but serialized; the thing pack() must equal. */
  private def referencePack(df: org.apache.spark.sql.DataFrame, budget: Int) = {
    val w = Window.partitionBy("source")
      .orderBy(ShardPacking.bucketOf(col("doc_id")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum("toks").over(w), lit(0L)))
      .withColumn("shard", expr(s"cum_before div $budget"))
      .select(col("source"), col("doc_id"), col("cum_before"), col("shard"))
  }

  test("two-level pack equals the single-window cumsum exactly") {
    val t = Tables.documents(spark, sf0001)
      .select(col("source"), col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("toks"))
    val got = ShardPacking.pack(t, Seq("source"), budget = 2000)
      .select("source", "doc_id", "cum_before", "shard")
    val want = referencePack(t, budget = 2000)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "two-level packing diverged from the single-window reference")
  }

  test("a 90%-skewed source stays bounded per cumsum partition") {
    // one dominant source (the web-crawl shape): 9000 of 10000 docs
    val docs = spark.range(10000)
      .select(col("id").as("doc_id"),
        when(col("id") % 10 < 9, "crawl").otherwise(lit("books")).as("source"),
        (col("id") % 37 + 5).as("toks"))
    val packed = ShardPacking.pack(docs, Seq("source"), budget = 2000)

    // every (source, pack_bucket) cumsum partition is bounded well below
    // the dominant source's 9000 rows — 16 buckets ⇒ ~560 each; allow 2×
    val maxPartition = packed.groupBy("source", "pack_bucket")
      .count().agg(max("count")).collect()(0).getLong(0)
    assert(maxPartition <= 1125,
      s"a cumsum partition holds $maxPartition rows — skew not dispersed")

    // and the decomposition still matches the reference exactly
    val want = referencePack(docs, budget = 2000)
    val got = packed.select("source", "doc_id", "cum_before", "shard")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "skewed two-level packing diverged from the single-window reference")
  }

  /** The curriculum reference: ONE unpartitioned window in
    * (score, doc_id) order — the semantics packOrdered decomposes. */
  private def referenceOrdered(df: org.apache.spark.sql.DataFrame, budget: Int) = {
    val w = Window.orderBy("score", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum("toks").over(w), lit(0L)))
      .withColumn("shard", expr(s"cum_before div $budget"))
      .select(col("doc_id"), col("cum_before"), col("shard"))
  }

  test("range-bucketed curriculum pack equals the global ordered cumsum") {
    // scores spread over ~8 buckets at width 50; ties at every score
    val docs = spark.range(5000)
      .select(col("id").as("doc_id"),
        (col("id") % 400).as("score"),
        (col("id") % 23 + 3).as("toks"))
    val got = ShardPacking.packOrdered(docs, budget = 500, bucketWidth = 50)
      .select("doc_id", "cum_before", "shard")
    val want = referenceOrdered(docs, budget = 500)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "curriculum packing diverged from the global-window reference")
  }

  test("curriculum shards have monotone non-overlapping score ranges") {
    val docs = spark.range(3000)
      .select(col("id").as("doc_id"),
        (col("id") % 700 + 100).as("score"),
        lit(7L).as("toks"))
    val ranges = ShardPacking.packOrdered(docs, budget = 1000, bucketWidth = 100)
      .groupBy("shard")
      .agg(min("score").as("lo"), max("score").as("hi"))
      .orderBy("shard")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi0), (lo1, _)) =>
        assert(hi0 <= lo1, s"shard ranges overlap: hi=$hi0 > next lo=$lo1")
      case _ =>
    }
  }

  test("packOrdered on an empty frame returns empty, not a crash") {
    val empty = spark.range(0)
      .select(col("id").as("doc_id"), col("id").as("score"),
        col("id").as("toks"))
    assert(ShardPacking.packOrdered(empty, budget = 100, bucketWidth = 10)
      .count() == 0)
  }

  test("chunkSequences drops zero/null-toks rows itself (ADVICE r9)") {
    // a toks=0 row at a cum % L == 0 boundary would make the boundary
    // sequence(cum div L, (cum-1) div L) descend and emit spurious
    // spans; a NULL would poison the prefix sums — the guard lives
    // INSIDE chunkSequences, not in caller convention
    val clean = Seq((0L, 512L), (1L, 512L), (2L, 100L))
      .toDF("doc_id", "toks")
    val dirty = Seq[(Long, java.lang.Long)](
      (0L, 512L), (10L, 0L), (1L, 512L), (11L, null), (2L, 100L))
      .toDF("doc_id", "toks")
    val want = ShardPacking.chunkSequences(clean, L = 512L)
      .collect().map(_.toSeq).toSet
    val got = ShardPacking.chunkSequences(dirty, L = 512L)
      .collect().map(_.toSeq).toSet
    assert(got == want, "zero/null toks rows leaked into the sequence grid")
  }

  test("the offsets frame joins back as a broadcast, not a shuffle") {
    val t = Tables.documents(spark, sf0001)
      .select(col("source"), col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("toks"))
    val plan = ShardPacking.pack(t, Seq("source"), budget = 2000)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"offsets join is not a broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"bad join shape:\n$plan")
  }
}
