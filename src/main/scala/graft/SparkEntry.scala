package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * extension families) registers here as a named query over the sf-dir
  * parquet tables, paired with a DuckDB oracle where the semantics are
  * ANSI-SQL-expressible.
  */
object SparkEntry {

  /** The registered query inventory, in module groups. */
  def all: Seq[Q] = Seq(
    // core relational (SURVEY §2.1–§2.7)
    CoreQueries.s2ScanPushdown,
    SourceQueries.jsonMultiday,
    CoreQueries.p1StructFlatten,
    CoreQueries.p4RenameProject,
    CoreQueries.f1FilterSentinel,
    CoreQueries.q1Agg,
    CoreQueries.a3CountDistinct,
    CoreQueries.a4PivotCount,
    CoreQueries.a4PivotSum,
    CoreQueries.w1TopkPerGroup,
    CoreQueries.w2RunningSum,
    CoreQueries.w3LagDelta,
    CoreQueries.j1JoinUsing,
    CoreQueries.joinStar,
    CoreQueries.semiJoin,
    CoreQueries.antiJoin,
    CoreQueries.leftOuterJoin,
    CoreQueries.fullOuterJoin,
    CoreQueries.unpivotMetrics,
    CoreQueries.u1UnionAll,
    CoreQueries.setIntersect,
    CoreQueries.setExcept,
    CoreQueries.o2SortLimit,
    CoreQueries.rollup,
    // scalar functions (SURVEY §2.8)
    ScalarQueries.c1CasewhenMap,
    ScalarQueries.c2ArgmaxGreatest,
    ScalarQueries.c4ConcatWsTaste,
    ScalarQueries.c5Banding,
    ScalarQueries.c6c7TrendNulls,
    ScalarQueries.c8DateMonth,
    ScalarQueries.jsonExtract,
    ScalarQueries.mapOps,
    ScalarQueries.explodeWordcount,
    // X1 keyword classification + Pipeline B composition (SURVEY §2.10)
    ClassifyQueries.classifyKeywords,
    ClassifyQueries.behaviorTrend,
    // event-time analytics (streaming-parity batch)
    EventQueries.tumblingWindow,
    EventQueries.sessionize,
    EventQueries.intervalJoin,
    EventQueries.intervalJoinOuter,
    EventQueries.eventFunnel,
    EventQueries.retentionCohorts,
    EventQueries.approxDistinct,
    EventQueries.gapfillDaily,
    EventQueries.rolling7day,
    EventQueries.ewma,
    EventQueries.transitions,
    EventQueries.anomalies,
    SketchQueries.hllDistinct,
    SketchQueries.kmvDistinct,
    SketchQueries.kmvOverlap,
    SketchQueries.kmvDiff,
    SketchQueries.heavyHitters,
    SketchQueries.heavyHittersGrouped,
    SketchQueries.bloomPrefilter,
    SketchQueries.qtileSketch,
    SketchQueries.cmsCounts,
    // dedup family (training-data pipeline)
    DedupQueries.exactSummary,
    DedupQueries.exactKeepFirst,
    DedupQueries.minhashSignature,
    DedupQueries.minhashLshPairs,
    DedupQueries.crossSourcePairs,
    DedupQueries.incrementalPairs,
    DedupQueries.resolveClusters,
    DedupQueries.simhashBuckets,
    DedupQueries.simhashPairs,
    DedupQueries.jaccardAllPairs,
    DedupQueries.lshRecall,
    DedupQueries.containmentPairs,
    DedupQueries.corpusCuration,
    DedupQueries.embeddingPairs,
    DedupQueries.embeddingResolve,
    DedupQueries.embeddingPairsExact,
    DedupQueries.semanticPairs,
    DedupQueries.semanticPairs2,
    DedupQueries.semanticRecall,
    DedupQueries.semanticRecall2,
    DedupQueries.semanticResolve,
    DedupQueries.substringShare,
    // similarity search
    SimilarityQueries.bruteForceTopK,
    SimilarityQueries.int8TopK,
    SimilarityQueries.ivfTopK,
    SimilarityQueries.ivfFilteredTopK,
    SimilarityQueries.ivfFilteredRecall,
    SimilarityQueries.ivfTopKProbe2,
    SimilarityQueries.ivfRecall,
    SimilarityQueries.ivfCellStats,
    SimilarityQueries.embeddingOutliers,
    SimilarityQueries.ivfDrift,
    SimilarityQueries.ivfPqTopK,
    SimilarityQueries.ivfPqRecall,
    SimilarityQueries.knnGraph,
    SimilarityQueries.clusterPurity,
    GraphQueries.pagerank,
    GraphQueries.weightedPagerank,
    GraphQueries.triangles,
    GraphQueries.linkPredict,
    GraphQueries.mutualKnn,
    // text analysis
    TextQueries.langId,
    TextQueries.quality,
    TextQueries.tokenCounts,
    TextQueries.fingerprintQ,
    TextQueries.tfidfTerms,
    TextQueries.textSearch,
    TextQueries.bm25,
    TextQueries.phraseSearch,
    TextQueries.nearSearch,
    TextQueries.surprisal,
    TextQueries.collocations,
    LangModelQueries.lmBigram,
    LangModelQueries.sourceDivergence,
    LangModelQueries.trainedLangId,
    RetrievalQueries.hybridRrf,
    SampleQueries.hashSample,
    SampleQueries.stratifiedSample,
    SampleQueries.weightedSample,
    SampleQueries.perSourceSample,
    // corpus construction (contamination / repetition / split / packing / PII)
    CorpusQueries.contamination,
    CorpusQueries.repetition,
    CorpusQueries.splitAssign,
    CorpusQueries.mixtureWeights,
    CorpusQueries.packShards,
    CorpusQueries.piiScrub,
    CorpusQueries.curationFunnel,
    CorpusQueries.splitLeakfree,
    CorpusQueries.tokenBudget,
    ChunkingQueries.chunkOverlap,
    ChunkingQueries.lengthBuckets,
    ChunkingQueries.bpePairs,
    ChunkingQueries.bpeMergesQ,
    ChunkingQueries.bpeTokenize,
    ChunkingQueries.chunkDedup,
    // warehouse maintenance + data layout
    WarehouseQueries.scd2,
    WarehouseQueries.zorderKey,
    WarehouseQueries.zorder3,
    WarehouseQueries.tableChanges,
    WarehouseQueries.equidepthHist,
    DataQualityQueries.dataQuality,
    // multimodal plumbing
    MultimodalQueries.decodeMeta,
    MultimodalQueries.imageIoRoundTrip,
    MultimodalQueries.wavRoundTrip,
    MultimodalQueries.aviProbe,
    MultimodalQueries.mjpegFrames,
    MultimodalQueries.wavFeatures,
    // surface completion: full pipeline composition, salting, SQL layer,
    // window suite, ordered collections, percentiles
    ExtraQueries.engagementFull,
    ExtraQueries.saltedAgg,
    ExtraQueries.skewJoinSalted,
    ExtraQueries.histogram,
    // entity resolution (blocking → fuzzy match → clusters → golden)
    ResolutionQueries.blocking,
    ResolutionQueries.fuzzyMatch,
    ResolutionQueries.multiBlock,
    ResolutionQueries.clusters,
    ResolutionQueries.golden,
    ExtraQueries.sqlLayer,
    ExtraQueries.groupingSets,
    ExtraQueries.windowSuite,
    ExtraQueries.windowDist,
    ExtraQueries.topRevenue,
    ExtraQueries.collectSorted,
    ExtraQueries.topkAggregator,
    ExtraQueries.freqItems,
    ExtraQueries.medianAgg,
    ExtraQueries.modeAgg,
    ExtraQueries.statsSuite,
    ExtraQueries.analyticsSegments,
    ExtraQueries.rangeJoin,
    ExtraQueries.scalarSuite,
    ExtraQueries.dateSuite,
    ExtraQueries.cube2d,
    ExtraQueries.regexpNullSafe,
    ExtraQueries.asofJoin,
    ExtraQueries.asofForward,
    ExtraQueries.asofNearest,
    ExtraQueries.asofTolerance,
    ExtraQueries.slidingWindow,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.joinStar.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
