package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-consistency of the end-to-end corpus build with the
  * individually-verified operators: the manifest must hold EXACTLY the
  * funnel's final-stage survivors, split must partition them, and the
  * written layout must prune by split directory. */
class CorpusPipelineSpec extends SparkSpec {

  test("manifest row count and token total equal the funnel's final stage") {
    val funnel = graft.operators.CorpusQueries.curationFunnel
      .run(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m = CorpusPipeline.manifest(spark, sf0001)
      .agg(count(lit(1)), sum("toks")).collect()(0)
    assert((m.getLong(0), m.getLong(1)) == funnel("3_deduplicated"),
      s"manifest ${(m.getLong(0), m.getLong(1))} != funnel ${funnel("3_deduplicated")}")
  }

  test("splits partition the survivors and shards pack per (source, split)") {
    val m = CorpusPipeline.manifest(spark, sf0001).cache()
    try {
      assert(m.select("doc_id").distinct().count() == m.count())
      assert(m.select("split").distinct().collect().map(_.getString(0)).toSet
        .subsetOf(Set("train", "val", "test")))
      // Shard ids start at 0 and never decrease along the packing order
      // — which is (pack_bucket, doc_id) under two-level packing.
      // (NOT strict contiguity: a single document larger than the token
      // budget legitimately skips shard ids — floor(cum/budget) jumps.)
      val firstShard = m.groupBy("source", "split").agg(min("shard").as("mn"))
        .filter(col("mn") =!= 0).count()
      assert(firstShard == 0, "a (source, split) group does not start at shard 0")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source", "split")
        .orderBy(graft.operators.ShardPacking.bucketOf(col("doc_id")), col("doc_id"))
      val nonMonotone = m
        .withColumn("prev", lag("shard", 1).over(w))
        .filter(col("prev").isNotNull && col("shard") < col("prev"))
        .count()
      assert(nonMonotone == 0, "shard ids decrease along the packing order")
    } finally m.unpersist()
  }

  test("the written manifest prunes by split directory") {
    val out = "/tmp/graft_corpus_spec"
    val written = CorpusPipeline.writeManifest(spark, sf0001, out)
    assert(written.count() == CorpusPipeline.manifest(spark, sf0001).count())
    val scan = written.filter(col("split") === "val")
      .queryExecution.executedPlan.collectLeaves().mkString("\n")
    assert(!scan.contains("split=train"), s"split pruning failed:\n$scan")
  }

  test("the sequence stage conserves the train split's tokens exactly") {
    val m = CorpusPipeline.manifest(spark, sf0001).cache()
    try {
      val trainToks = m.filter(col("split") === "train")
        .agg(sum("toks")).collect()(0).getLong(0)
      val seqs = CorpusPipeline.sequences(m)
        .collect().sortBy(_.getLong(0))
      assert(seqs.map(_.getLong(2)).sum == trainToks,
        "sequence token total != train split token total")
      // loader contract: exact 512 fill everywhere but the tail,
      // contiguous ids from 0
      seqs.dropRight(1).foreach(r => assert(r.getLong(2) == 512L))
      seqs.map(_.getLong(0)).zipWithIndex.foreach { case (s, i) =>
        assert(s == i, "sequence ids not contiguous")
      }
      // only train docs contribute: id range within the train slice
      val trainIds = m.filter(col("split") === "train")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      seqs.foreach { r =>
        assert(trainIds(r.getLong(4)) && trainIds(r.getLong(5)),
          "a sequence references a non-train document")
      }
    } finally m.unpersist()
  }
}
