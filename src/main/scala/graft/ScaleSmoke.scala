package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke for the artifact tier (round-7 verdict item 5: the 100 TB
  * claims rested on plan shape alone — this main adds a measured point
  * one decade up from the bench SF).
  *
  * The driver ships sf0.001/0.01/0.1; there is no sf1 drop, so this
  * main DERIVES one: `documents` and `embeddings` replicated
  * `GRAFT_SMOKE_REPLICAS`× (default 10 ⇒ sf1-equivalent corpus volume
  * for the two tables the artifact tier indexes) with shifted ids, a
  * per-replica text token, and a per-replica jitter on the embedding —
  * so replicas are NEAR-duplicates (the adversarial shape for a dedup
  * tier: every document gains `replicas-1` near-dup partners and
  * LSH/simhash/IVF-cell candidate buckets grow ~replicas×), never
  * byte-identical rows that exact-dedup would trivially collapse. The
  * remaining tables copy through at source scale — the artifact tier
  * does not index them (`er_labels` blocks on `customer`; its build is
  * reported but its input did not scale, which the output notes).
  *
  * It then times (a) every [[graft.operators.IndexBuilds]] artifact
  * build COLD — build cost should grow ~linearly in corpus volume —
  * and (b) a serve pass over the artifact-backed query families, which
  * should stay near-flat vs the sf0.1 bench because serving reads
  * persisted candidates/cells/postings, not the corpus. Derived-corpus
  * queries have no DuckDB oracle run (the correctness gate stays at
  * sf0.001/0.01); this main is a PERFORMANCE instrument.
  *
  * Output: one JSON line on stdout (last) and `SCALE_SMOKE.json` in the
  * working directory: replicas, corpus row counts, per-build and
  * per-query seconds, build/serve totals.
  */
object ScaleSmoke {

  /** Derive a `replicas`×-volume near-duplicate corpus from `src` into
    * `out` (idempotent: the ready marker encodes the replica count, so
    * rerunning with a different count rebuilds instead of silently
    * reusing the old corpus under a new label). */
  def deriveCorpus(spark: SparkSession, src: String, out: String,
      replicas: Int): Unit = {
    val outPath = new org.apache.hadoop.fs.Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$out/_SMOKE_READY_$replicas")))
      return
    fs.delete(outPath, true)
    val reps = spark.range(replicas).select(col("id").as("rep"))
    val IdStride = 100000000L // far above any source id
    spark.read.parquet(s"$src/documents.parquet")
      .crossJoin(reps) // corpus × tiny literal frame: broadcast, map-only
      .select(
        (col("doc_id") + col("rep") * IdStride).as("doc_id"),
        // one extra token: replicas stay >0.5-Jaccard near-dups
        concat(col("text"), lit(" rep"), col("rep")).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + length(concat(lit(" rep"), col("rep"))))
          .as("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.read.parquet(s"$src/embeddings.parquet")
      .crossJoin(reps)
      .select(
        (col("vec_id") + col("rep") * IdStride).as("vec_id"),
        // jitter ONE component by rep/1000: distinct vectors, ~1.0
        // cosine within a replica group (semantic near-dups). The
        // arithmetic widens to double; cast back — the engine's
        // vector surface is array<float> by contract
        transform(col("embedding"),
          (x, i) => when(i === 0, x + col("rep").cast("float") / 1000f)
            .otherwise(x).cast("float")).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    fs.create(new org.apache.hadoop.fs.Path(s"$out/_SMOKE_READY_$replicas"), true).close()
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_scale_smoke/sf1"
    val replicas = sys.env.getOrElse("GRAFT_SMOKE_REPLICAS", "10").toInt
    val replicas30 = sys.env.getOrElse("GRAFT_SMOKE_REPLICAS30", "30").toInt
    val replicas100 = sys.env.getOrElse("GRAFT_SMOKE_REPLICAS100", "100").toInt
    val out30 = s"${out}_r$replicas30"
    val out100 = s"${out}_r$replicas100"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    deriveCorpus(spark, src, out, replicas)
    val nDocs = spark.read.parquet(s"$out/documents.parquet").count()
    val nVecs = spark.read.parquet(s"$out/embeddings.parquet").count()

    // ---- cold artifact builds (force: this is the build-cost probe) ----
    sys.props("graft.catalog.rebuild") = "1"
    val builds = graft.operators.IndexBuilds.all.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, out); true }
               catch { case e: Throwable =>
                 System.err.println(s"[smoke] $name failed: ${e.getMessage}"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (name, if (ok) Some(dt) else None)
    }
    sys.props.remove("graft.catalog.rebuild")

    // ---- embedding band-geometry dial (round-8 verdict item 3) ----
    // candidate-pair count vs corpus size per (planes, bandBits): the
    // measured tradeoff behind DedupQueries.embGeometry. The 2-bit rows
    // document the quadratic shape the corpus-scaled rule replaces.
    val dialSettings = Seq((16, 2), (32, 4), (48, 6))
    val dial = Seq(("1x", src), ("10x", out)).flatMap { case (tag, dd) =>
      val v = operators.DedupQueries.embeddingVectors(spark, dd).cache()
      try {
        val n = v.count()
        dialSettings.map { case (p, b) =>
          val t0 = System.nanoTime()
          val cand = operators.DedupQueries.embeddingCandidates(v, p, b).count()
          val pairs = operators.DedupQueries.embeddingPairsFrom(v, p, b).count()
          val sec = (System.nanoTime() - t0) / 1e9
          s"""{"corpus":"$tag","n_vecs":$n,"planes":$p,"bits":$b,""" +
            s""""cand":$cand,"pairs":$pairs,"sec":${math.rint(sec * 1000) / 1000}}"""
        }
      } finally v.unpersist()
    }

    // ---- serve pass over the artifact-backed families ----
    val serveNames = Seq(
      "q_dedup_minhash_lsh", "q_dedup_resolve", "q_dedup_cross_source",
      "q_dedup_simhash_pairs", "q_dedup_embedding", "q_dedup_semantic",
      "q_dedup_semantic2", "q_dedup_incremental",
      "q_ann_ivf", "q_ann_ivf_probe2", "q_ann_ivfpq", "q_ann_filtered",
      "q_ann_cells", "q_knn_graph", "q_pagerank", "q_graph_triangles",
      "q_graph_communities",
      "q_er_clusters", "q_er_golden", "q_er_multiblock",
      "q_text_bm25", "q_text_phrase", "q_text_near", "q_text_search",
      "q_tfidf_terms", "q_text_contamination", "q_corpus_curation",
      "q_chunk_dedup", "q_bpe_merges", "q_pack_curriculum",
      "q_pack_sequences", "q_pack_sequences_bpe", "q_dedup_verdict",
      "q_mixture_sample", "q_sample_per_cluster", "q_chunk_contamination",
      // round-12: soft-dedup weights compose the persisted keep-list
      "q_dedup_softweights",
      // round-10 surfaces: corpus-wide BPE encode, avro round trip
      // (first serve builds the container fixture — reported as-is),
      // and the three-artifact multimodal verdict composition
      "q_bpe_encode", "q_s10_avro", "q_mm_verdict",
      // round-11: span excision must stay gram-join-shaped (same two
      // g-shuffles as q_dedup_substring plus the linear rebuild), and
      // the unigram encode must stay vocabulary-joined like BPE's
      "q_dedup_excise", "q_unigram_encode",
      // round-11 KN family: bigram-vocabulary keyed windows + one
      // posting-sized join — expected near-linear in corpus volume
      "q_lm_kn", "q_quality_tertiles", "q_semantic_contamination",
      // round-12: boilerplate excision and DSIR weights are now
      // artifact-served (r11 verdict item 4) — these lines measure the
      // warm read; their _live twins below keep the construction curve
      "q_line_excise", "q_dsir_weights",
      "q_line_excise_live", "q_dsir_weights_live",
      // round-11 winnowing: per-doc window min (shuffle on doc_id) +
      // the capped fingerprint bucket join — near-dup replicas share
      // most fingerprints, so this is the adversarial shape for the
      // match join (buckets grow ~replicas×, pairs ~replicas²× within
      // the cap); the diversity audit is two count-distinct hash-aggs.
      // r12: the unbounded pair set stays as telemetry; the bounded
      // top-k surface is the contractual serving line
      "q_winnow_matches", "q_winnow_matches_topk", "q_ngram_diversity",
      // round-11 MMR: the candidate fetch is broadcast-queries × full
      // vector scan (expected linear); the greedy supersteps are
      // constant-size — serving should grow like one corpus pass
      "q_mmr_select",
      // round-11 retrieval additions: prefix-truncated two-stage rerank
      // (one truncated corpus scan + constant-size exact rerank),
      // margin mining (one cross-label corpus scan), and the hubness
      // audit (one hash-agg on the knn artifact) — all expected
      // linear-or-flat
      "q_ann_rerank", "q_bitext_mine", "q_knn_hubness",
      // round-15: the composed v2 curation funnel — five artifact joins
      // + one cleaned-token hash-agg; expected ~linear (the token-grain
      // Gopher agg dominates)
      "q_corpus_pipeline_v2",
      // round-16: markup extraction (map-only wrap+strip + doc agg —
      // expected linear), the Pareto quality classifier (map over the
      // served DSIR weights — expected flat-ish at artifact size),
      // WordPiece encode (vocabulary join, the bpe/unigram shape), and
      // image-grain contamination (eval-bounded pigeonhole join)
      "q_html_extract", "q_quality_classifier", "q_wordpiece_encode",
      "q_mm_contamination",
      // round-16: the binary (1-bit) serving stack — pack + Hamming
      // shortlist + exact rescoring over the bounded query batch
      // (expected linear in corpus, the bruteforce family's shape) —
      // and the per-source epoch schedule (one corpus hash-agg + a
      // |sources|-row frame, expected flat-ish after the agg)
      "q_ann_binary_rerank", "q_mixture_epochs",
      // round-16: layout clustering (pure map + 64-cell agg), its
      // skipping audit (two hash-aggs + metadata joins), the composed
      // schedule (funnel artifacts + one agg + bounded window), and
      // the artifact-pair threshold sweep (one conditional-sum pass)
      "q_zorder_layout", "q_zorder_prune", "q_corpus_schedule",
      "q_filter_sweep", "q_hilbert_layout", "q_curve_compare",
      // round-17: the manifest-served schedule (artifact read + the
      // bounded kernel — expected flat-ish; on THIS corpus the funnel
      // rejects everything, so it also proves the zero-survivor path
      // serves instead of erroring) and the Pareto-admission funnel
      // (a second full funnel pass — the v2 growth shape)
      "q_corpus_schedule_served", "q_corpus_pipeline_pareto",
      // round-18: the drawn-set materialization (r17 verdict item 3 —
      // the loader-facing surface; output is O(train-survivors), so
      // expected near-flat like its schedule sibling, and zero-row on
      // this wholesale-rejected corpus), and the lvl-served funnel
      // accountings for both dials (one artifact scan + one hash-agg
      // each — r17 item 4; the self-contained pareto form above stays
      // as the honesty twin)
      "q_mixture_draws", "q_corpus_draws_served",
      "q_corpus_pipeline_v2_served", "q_corpus_pipeline_pareto_served",
      // round-18: the Pareto dial's loader-facing schedule (pruned
      // artifact read + bounded kernel, the schedule_served shape), the
      // binary tier's drift gauge (one corpus posexplode to |dims|
      // rows — expected linear, the packing pass's own growth), and the
      // winnow bucket histogram (the r17-item-8 decomposition's
      // permanent observable: bucket COUNT stays ~flat on the replica
      // corpus while sizes scale with replicas — output-quadratic pair
      // growth with zero cap exclusions)
      "q_corpus_schedule_pareto_served", "q_binary_drift",
      "q_winnow_buckets",
      // round-19: the text-tier drift gauges (r18 verdict item 1) — all
      // live corpus-linear measurement passes like q_binary_drift: the
      // DSIR gauge is one token explode into three 256-row hash-aggs,
      // the KN gauge is the frozen-model scoring joins aggregated to
      // |sources| rows, the tokenizer gauge one vocabulary-sized left
      // join (the artifact's bpeTokenize plan)
      // (q_bp_drift completes the text gauges: one segment hash-agg —
      // the list trainer's own shape — plus a list-sized left join)
      "q_dsir_drift", "q_kn_drift", "q_tok_drift", "q_bp_drift")
    // a misspelled/renamed name must FAIL the smoke, not silently vanish
    // from SCALE_SMOKE.json (r11 advice)
    val unknown = serveNames.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"smoke serve list names unknown queries: $unknown")
    val serve = serveNames.map(n => n -> SparkEntry.queries(n))
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, out).queryExecution.toRdd.count(); true }
                 catch { case e: Throwable =>
                   System.err.println(s"[smoke] $name failed: ${e.getMessage}"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (name, if (ok) Some(dt) else None)
      }

    // ---- growth exponents for the steepest smoke lines (round-10
    // verdict item 5): a third tier turns the two-point 1×/10× slopes
    // into measured curves. Each (query, tier) is timed twice and the
    // MIN recorded — the first run absorbs any lazy artifact build and
    // co-tenant burst (the r9 "ANN drift" lesson), so the min is the
    // serve-only number the cost models claim. Exponents are reported
    // per decade: e = ln(t_hi/t_lo)/ln(vol_hi/vol_lo).
    deriveCorpus(spark, src, out30, replicas30)
    val growthNames = Seq("q_dedup_incremental", "q_dedup_verdict",
      "q_tfidf_terms",
      // the excision CONSTRUCTION curve (the serve line is now a warm
      // artifact read — r11 item 4), the unbounded winnow pair set
      // (output-quadratic in replica density within the cap — kept as
      // the telemetry curve), and the bounded top-k surface whose
      // output is corpus-linear by contract (r11 item 5)
      "q_line_excise_live", "q_winnow_matches", "q_winnow_matches_topk",
      // round-15 verdict item 1: the v2 funnel's growth curve
      "q_corpus_pipeline_v2",
      // round-16: the markup tier starts from raw text (no artifacts),
      // so its growth curve measures the wrap+extract pass cleanly
      "q_html_extract",
      // round-17 (r16 verdict item 6): the binary tier's growth curve —
      // now artifact-served, so cold absorbs the pack build and the min
      // measures the Hamming-shortlist + exact-rescore serve (expected
      // ~linear in corpus: one code-table scan per bounded query batch);
      // and the layout audits — q_zorder_prune is two metadata hash-aggs
      // over the assignment map (expected ~linear in rows), the curve
      // comparison adds the Hilbert/seam passes over the same map
      "q_ann_binary_rerank", "q_zorder_prune", "q_curve_compare",
      // round-18 (r17 verdict item 3): the drawn-set materialization's
      // growth curves — the served form is a pruned artifact read +
      // bounded kernel (expected near-flat; zero rows on this
      // wholesale-rejected corpus, so the curve also proves the
      // zero-survivor path), the raw kernel recomputes the funnel
      // (the q_corpus_pipeline_v2 growth shape)
      "q_mixture_draws", "q_corpus_draws_served")
    val unknownGrowth = growthNames.filterNot(SparkEntry.queries.contains)
    require(unknownGrowth.isEmpty,
      s"smoke growth list names unknown queries: $unknownGrowth")
    // Deliberately-live builders are honesty twins of served artifacts:
    // their cost is corpus-linear BY DESIGN (proven across the 1×/10×
    // decade), and at 30× they dominate the smoke's wall-clock
    // (q_line_excise_live alone was 41.9 s of the r17 30× pass — r17
    // verdict item 7). Cap them to the first two tiers: the served
    // twins carry the 30× line for the same family.
    val liveCapped10 = Set("q_line_excise_live")
    // The 100× tier (round-18 verdict item 6): one more decade — 500k
    // docs / 200k vectors — for the families whose 10×/30× exponents
    // claim flat-or-sublinear SERVING, so a bend co-tenant noise could
    // hide at 30× becomes measurable. Served twins only (the r17
    // lesson): every name here reads persisted artifacts; the cold run
    // absorbs the 100× artifact build, the min is the serve claim.
    val tier100 = Set("q_ann_binary_rerank", "q_corpus_draws_served",
      "q_winnow_matches_topk", "q_zorder_prune", "q_curve_compare")
    def maxVol(name: String): Int =
      if (liveCapped10.contains(name)) replicas
      else if (tier100.contains(name)) replicas100
      else replicas30
    if (growthNames.exists(n => maxVol(n) >= replicas100))
      deriveCorpus(spark, src, out100, replicas100)
    val growthTiers = Seq(("1x", src, 1), ("10x", out, replicas),
      (s"${replicas30}x", out30, replicas30),
      (s"${replicas100}x", out100, replicas100))
    val growth = growthNames.flatMap { name =>
      Seq(SparkEntry.queries(name)).flatMap { fn =>
        growthTiers.filter { case (_, _, vol) =>
          vol <= maxVol(name)
        }.map { case (tag, dd, vol) =>
          def once(): Option[Double] =
            try {
              val t0 = System.nanoTime()
              fn(spark, dd).queryExecution.toRdd.count()
              Some((System.nanoTime() - t0) / 1e9)
            } catch { case e: Throwable =>
              System.err.println(s"[smoke] growth $name@$tag failed: ${e.getMessage}")
              None
            }
          val cold = once()
          spark.catalog.clearCache()
          val warm = once()
          spark.catalog.clearCache()
          val best: Option[Double] =
            Seq(cold, warm).flatten.reduceOption((a, b) => math.min(a, b))
          (name, tag, vol, cold, best)
        }
      }
    }
    spark.stop()

    def r3(v: Double) = math.rint(v * 1000) / 1000
    def obj(xs: Seq[(String, Option[Double])]) =
      xs.collect { case (k, Some(v)) => s"\"$k\":${r3(v)}" }
        .mkString("{", ",", "}")
    val failed = (builds ++ serve).collect { case (k, None) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val buildTotal = r3(builds.flatMap(_._2).sum)
    val serveTotal = r3(serve.flatMap(_._2).sum)
    val json =
      s"""{"metric":"scale_smoke","replicas":$replicas,"n_docs":$nDocs,""" +
      s""""n_vecs":$nVecs,"index_build_sec":$buildTotal,""" +
      s""""serve_sec":$serveTotal,"n_serve":${serve.count(_._2.isDefined)},""" +
      s""""builds":${obj(builds)},"queries":${obj(serve)},""" +
      s""""emb_dial":${dial.mkString("[", ",", "]")},""" +
      s""""growth":${growth.map { case (q, tag, vol, cold, best) =>
        s"""{"q":"$q","tier":"$tag","vol":$vol""" +
          cold.map(c => s""","cold":${r3(c)}""").getOrElse("") +
          best.map(b => s""","sec":${r3(b)}""").getOrElse("") + "}"
      }.mkString("[", ",", "]")},""" +
      s""""growth_exp":${growthNames.map { q =>
        val pts = growth.collect { case (`q`, _, vol, _, Some(b)) => (vol, b) }
          .sortBy(_._1)
        val es = pts.zip(pts.drop(1)).map { case ((v0, t0), (v1, t1)) =>
          s""""e_${v1}_$v0":${r3(math.log(t1 / t0) / math.log(v1.toDouble / v0))}"""
        }
        s"""{"q":"$q",${es.mkString(",")}}"""
      }.mkString("[", ",", "]")},""" +
      s""""failed":$failed,"src":"$src"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_SMOKE.json"), json.getBytes("UTF-8"))
    println(json)
  }
}
