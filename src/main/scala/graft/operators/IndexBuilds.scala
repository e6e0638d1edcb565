package graft.operators

import org.apache.spark.sql.SparkSession

/** The complete set of [[graft.sources.IndexCatalog]] artifacts the
  * registered queries consume, as named build triggers.
  *
  * Why this exists (round-3 advice): Bench's min-of-two timing interacts
  * with per-application artifact memoization — the second attempt of an
  * LSH/IVF query only reads the persisted artifact, so the min would
  * systematically exclude pair-generation/training cost and bench totals
  * would drop for measurement reasons, not capability. Bench therefore
  * pre-builds every artifact ONCE through this registry, times each
  * build as its own `idx_*` entry, and the per-query numbers then
  * honestly measure serving cost — which is also what they mean in
  * production, where an index is built once and queried many times. */
object IndexBuilds {

  /** (artifact name, trigger). Each trigger materializes its artifact
    * eagerly (parquet write / bucketed table inside the builder) and
    * releases any builder caches before returning. */
  val all: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "idx_lsh_pairs"     -> ((s, d) => { DedupQueries.lshPairs(s, d); () }),
    "idx_lsh_keep"      -> ((s, d) => { DedupQueries.lshKeepList(s, d); () }),
    "idx_simhash_pairs" -> ((s, d) => { DedupQueries.simhashPairsArtifact(s, d); () }),
    "idx_bench_grams"   -> ((s, d) => { CorpusQueries.benchGrams(s, d); () }),
    "idx_emb_pairs"     -> ((s, d) => { DedupQueries.embPairs(s, d); () }),
    "idx_emb_keep"      -> ((s, d) => { DedupQueries.embKeepList(s, d); () }),
    "idx_ivf"           -> ((s, d) => {
      IvfIndex.assignments(s, d, SimilarityQueries.ivfK, SimilarityQueries.ivfIters); ()
    }),
    "idx_pq"            -> ((s, d) => {
      import SimilarityQueries._
      PqIndex.codes(s, d, ivfK, ivfIters, pqDsub, pqCodes, pqIters); ()
    }),
    "idx_binary"        -> ((s, d) => { BinaryIndex.words(s, d); () }),
    "idx_sem_pairs"     -> ((s, d) => { DedupQueries.semPairs(s, d); () }),
    "idx_sem_keep"      -> ((s, d) => { DedupQueries.semKeepList(s, d); () }),
    "idx_sem2_pairs"    -> ((s, d) => { DedupQueries.semPairs2(s, d); () }),
    "idx_knn"           -> ((s, d) => { SimilarityQueries.knnEdges(s, d); () }),
    "idx_inverted"      -> ((s, d) => { TextQueries.invertedIndex(s, d); () }),
    "idx_er_labels"     -> ((s, d) => { ResolutionQueries.erLabels(s, d); () }),
    "idx_er_mb_pairs"   -> ((s, d) => { ResolutionQueries.multiBlockPairs(s, d); () }),
    "idx_img_phash"     -> ((s, d) => { MultimodalQueries.phashFrame(s, d); () }),
    "idx_gif_phash"     -> ((s, d) => { MultimodalQueries.gifFrameTable(s, d); () }),
    "idx_wav_phash"     -> ((s, d) => { MultimodalQueries.wavPhashFrame(s, d); () }),
    "idx_communities"   -> ((s, d) => { GraphQueries.communityLabels(s, d); () }),
    "idx_bpe_merges"    -> ((s, d) => { ChunkingQueries.bpeMergeTable(s, d); () }),
    "idx_kn_scores"     -> ((s, d) => { LangModelQueries.knScores(s, d); () }),
    "idx_unigram"       -> ((s, d) => { UnigramQueries.unigramVocab(s, d); () }),
    "idx_wordpiece"     -> ((s, d) => { WordPieceQueries.wpVocab(s, d); () }),
    // avro FIXTURES pre-built here so q_s10/q_s11 serving passes are
    // read-only (round-10 verdict №2: the lazy in-serving build raced
    // its own directory overwrite once per ~hundred runs)
    "idx_winnow_fp"     -> ((s, d) => { WinnowQueries.fingerprintTable(s, d); () }),
    "idx_winnow_topk"   -> ((s, d) => { WinnowQueries.topkDir(s, d); () }),
    "idx_blob_chunks"   -> ((s, d) => { BlobQueries.chunkTable(s, d); () }),
    "idx_boilerplate"   -> ((s, d) => { BoilerplateQueries.boilerplateDir(s, d); () }),
    "idx_dsir_weights"  -> ((s, d) => { DsirQueries.weightsTable(s, d); () }),
    "idx_v2_manifest"   -> ((s, d) => { V2ManifestIndex.manifest(s, d); () }),
    "idx_v2_manifest_pareto" ->
      ((s, d) => { V2ManifestIndex.manifest(s, d, pareto = true); () }),
    "idx_avro_docs"     -> ((s, d) => { SourceQueries.avroDocsFixture(s, d); () }),
    "idx_avro_vecs"     -> ((s, d) => { SourceQueries.avroVecsFixture(s, d); () }))
}
