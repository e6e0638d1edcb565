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

  // ------------------------------------------------------------------
  // v2 (round-15 verdict item 1): the composed modern recipe
  // ------------------------------------------------------------------

  // lazy val: the three v2 tests read identical stage rows — run the
  // composed pipeline once, not per test (r15 advice)
  private lazy val funnelV2 = graft.operators.PipelineV2Queries.corpusPipelineV2
    .run(spark, sf0001).collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
    .toMap

  test("v2 funnel: stages lose monotonically and account tokens exactly") {
    val f = funnelV2
    assert(f.size == 8, s"expected 8 stage rows, got ${f.keySet}")
    // doc counts never increase along the funnel (soft dedup by
    // construction drops nothing: stage 4 equals stage 3)
    val order = Seq("0_raw", "1_excised", "2_quality", "3_lm_band",
      "4_softdedup", "5_dsir", "6_train_split")
    order.zip(order.drop(1)).foreach { case (a, b) =>
      assert(f(b)._1 <= f(a)._1, s"stage $b gained docs over $a: $f")
    }
    assert(f("4_softdedup")._1 == f("3_lm_band")._1,
      "soft dedup must not drop documents")
    assert(f("4_softdedup")._2 == f("3_lm_band")._2,
      "soft dedup must not change raw kept tokens")
    assert(f("4_softdedup")._3 < f("4_softdedup")._2,
      "soft dedup must shrink effective mass (near-dups exist at sf0.001)")
    // every stage is non-degenerate: something survives, something drops
    assert(f("6_train_split")._1 > 0, "funnel emptied before the train split")
    assert(f("2_quality")._1 < f("1_excised")._1, "quality gate dropped nothing")
    assert(f("3_lm_band")._1 < f("2_quality")._1, "LM band dropped nothing")
    assert(f("5_dsir")._1 < f("4_softdedup")._1, "DSIR admitted everything")
    // packing conserves the train tokens exactly
    assert(f("7_packed")._2 == f("6_train_split")._2,
      "packing changed the train token total")
    assert(f("7_packed")._3 == f("6_train_split")._3,
      "packing changed the effective token total")
  }

  test("v2 funnel's packed count equals the real chunker's output") {
    val f = funnelV2
    val sv = graft.operators.PipelineV2Queries.survivorFrame(spark, sf0001)
      .filter(col("level") >= 6)
      .select(col("doc_id"), col("kept").as("toks"))
      .filter(col("toks") > 0)
    val seqs = graft.operators.ShardPacking.chunkSequences(sv, 512L)
    assert(seqs.count() == f("7_packed")._1,
      "funnel's arithmetic sequence count != chunkSequences cardinality")
    val seqToks = seqs.agg(sum("toks")).collect()(0).getLong(0)
    assert(seqToks == f("7_packed")._2,
      "chunked sequences do not conserve the train token total")
  }

  test("v2 manifest holds exactly the funnel survivors with their weights") {
    val f = funnelV2
    val m = CorpusPipeline.manifestV2(spark, sf0001).cache()
    try {
      // manifest = all survivors (train + val + test); its train slice
      // matches the funnel's terminal stage in docs AND tokens
      assert(m.select("doc_id").distinct().count() == m.count())
      val train = m.filter(col("split") === "train")
        .agg(count(lit(1)), sum("toks"),
          sum(expr("toks * weight_ppm div 1000000"))).collect()(0)
      assert((train.getLong(0), train.getLong(1), train.getLong(2)) ==
        f("6_train_split"),
        s"manifest train slice != funnel stage 6: " +
          s"${(train.getLong(0), train.getLong(1), train.getLong(2))} vs " +
          s"${f("6_train_split")}")
      val all = m.agg(count(lit(1)), sum("toks")).collect()(0)
      assert((all.getLong(0), all.getLong(1)) ==
        (f("5_dsir")._1, f("5_dsir")._2),
        "manifest does not hold exactly the post-DSIR survivors")
      // the soft-dedup invariant: within any surviving cluster slice the
      // weights are equal and in (0, 10⁶]
      val bad = m.filter(col("weight_ppm") <= 0 || col("weight_ppm") > 1000000)
        .count()
      assert(bad == 0, "a manifest weight is outside (0, 1e6]")
      // toks is the EXCISED count: never above the raw token count
      val docs = graft.Tables.documents(spark, sf0001)
        .select(col("doc_id"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("raw_toks"))
      val inflated = m.join(docs, "doc_id")
        .filter(col("toks") > col("raw_toks")).count()
      assert(inflated == 0, "a manifest toks exceeds its raw token count")
    } finally m.unpersist()
  }

  test("the epoch schedule runs over exactly the manifest's train " +
    "effective mass and reconciles") {
    val sched = graft.operators.PipelineV2Queries.corpusSchedule
      .run(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6))))
      .toMap
    // available mass per source == the manifest's train effective mass
    val m = CorpusPipeline.manifestV2(spark, sf0001)
      .filter(col("split") === "train")
      .groupBy("source")
      .agg(sum(expr("toks * weight_ppm div 1000000")).as("eff"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .filter(_._2 > 0) // zero-mass sources have nothing to schedule
    assert(sched.keySet == m.keySet,
      s"schedule sources != manifest train sources: ${sched.keySet} vs ${m.keySet}")
    m.foreach { case (src, eff) =>
      val (avail, target, full, pToks, drawn) = sched(src)
      assert(avail == eff, s"$src: available $avail != manifest eff $eff")
      assert(drawn == full * avail + pToks && drawn <= target,
        s"$src: schedule does not reconcile: ${sched(src)}")
    }
    // the budget is one corpus-equivalent of TRAIN effective mass
    assert(sched.values.map(_._5).sum <= m.values.sum,
      "drawn total exceeds the one-corpus-equivalent budget")

    // the production form — schedule over the manifest (funnel runs
    // once) — is row-identical to the self-contained query
    val viaManifest = CorpusPipeline
      .epochSchedule(CorpusPipeline.manifestV2(spark, sf0001))
    val direct = graft.operators.PipelineV2Queries.corpusSchedule
      .run(spark, sf0001)
    assert(viaManifest.exceptAll(direct).isEmpty &&
      direct.exceptAll(viaManifest).isEmpty,
      "manifest-served schedule diverges from the self-contained query")

    // the REGISTERED artifact-served query (reads the idx_v2_manifest
    // catalog artifact, not a fresh manifestV2 plan) matches too
    val served = graft.operators.PipelineV2Queries.corpusScheduleServed
      .run(spark, sf0001)
    assert(served.exceptAll(direct).isEmpty &&
      direct.exceptAll(served).isEmpty,
      "artifact-served schedule diverges from the self-contained query")
  }

  test("the served funnel accounting matches the self-contained form, " +
    "both admission dials") {
    import graft.operators.PipelineV2Queries._
    // DSIR dial: the 8-stage accounting over the persisted lvl frame
    // must be row-identical to the full survivor join tree
    val direct = corpusPipelineV2.run(spark, sf0001)
    val served = corpusPipelineV2Served.run(spark, sf0001)
    assert(served.exceptAll(direct).isEmpty &&
      direct.exceptAll(served).isEmpty,
      "lvl-served v2 funnel diverges from the self-contained query")
    // Pareto dial: same over the v2manifest_pareto artifact
    val directP = corpusPipelinePareto.run(spark, sf0001)
    val servedP = corpusPipelineParetoServed.run(spark, sf0001)
    assert(servedP.exceptAll(directP).isEmpty &&
      directP.exceptAll(servedP).isEmpty,
      "lvl-served pareto funnel diverges from the self-contained query")
    // and the dials genuinely differ where the dial acts (stage 5+)
    val s5 = directP.filter(col("stage") === "5_pareto").count()
    assert(s5 == 1, "pareto funnel lost its dial-labeled stage row")
  }
}
