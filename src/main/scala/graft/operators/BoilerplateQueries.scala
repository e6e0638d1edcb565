package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Line-grain boilerplate removal — the CCNet / RefinedWeb curation move
  * the corpus was still missing: a LINE duplicated across many documents
  * (nav menus, cookie banners, footers) is boilerplate and is dropped
  * from every document that carries it, while doc- and span-grain dedup
  * (q_dedup_exact / q_dedup_excise) would either keep it (doc differs
  * elsewhere) or remove only intra-doc repeats.
  *
  * The synthetic corpus has no newlines, so a "line" is the natural
  * fixed-width surrogate: consecutive 8-word segments (segment i = words
  * [8i, 8i+8)). A segment appearing in >= 3 DISTINCT documents is
  * boilerplate. Semantics follow the published pipelines (CCNet's
  * per-shard duplicated-paragraph removal; RefinedWeb §3 line-level
  * exact dedup) re-expressed relationally:
  *
  *  - segmentation is a per-row `transform(sequence, ...)` over the word
  *    array — no shuffle, linear in corpus size;
  *  - the boilerplate list is ONE hash-agg on segment text (count
  *    DISTINCT doc_id per segment) — the only corpus-wide exchange;
  *  - excision re-walks the segments against the boilerplate list —
  *    small in the typical case (only genuinely duplicated content
  *    survives the >=3 filter), so AQE plans the join as a broadcast
  *    and the second pass is shuffle-free up to the final per-doc
  *    hash-agg.
  *
  * At 100 TB the boilerplate list grows with the volume of *duplicated*
  * content, not the corpus (CCNet reports a few percent) — but a few
  * percent of 100 TB is far past any broadcast cap, so the join MUST
  * NOT pin a static `broadcast()` hint (a hint is not advisory: Spark
  * attempts the exchange regardless of size and fails hard at the 8 GB
  * cap instead of demoting). Unhinted, AQE broadcasts while the list
  * measures small — the plan at every tested SF — and degrades to a
  * sort-merge on seg past the threshold: still linear, never pairwise.
  * (r15 verdict item 2; PlanHygieneSpec forbids re-pinning it.)
  */
object BoilerplateQueries {

  private val W = """string_split_regex(trim(text), '\s+')"""

  /** Words per segment / distinct-doc threshold for "boilerplate". */
  private[graft] val SegWords = 8
  private[graft] val MinDocs  = 3

  /** DuckDB CTEs: per-(doc, seg_idx) 8-word segments. */
  private val segCte =
    s"""base AS (SELECT doc_id, $W AS w FROM documents WHERE len($W) >= 1),
       |ds AS (SELECT doc_id, w,
       |         unnest(range((len(w) + ${SegWords - 1}) // $SegWords)) AS seg_idx
       |       FROM base),
       |seg AS (SELECT doc_id, seg_idx,
       |          array_to_string(
       |            w[(seg_idx*$SegWords+1):(seg_idx*$SegWords+$SegWords)],
       |            ' ') AS seg
       |        FROM ds)""".stripMargin

  /** Spark frame of (doc_id, seg_idx, seg): per-row segmentation via
    * `transform(sequence(...))` + posexplode — the array never leaves the
    * row until the explode, so there is no shuffle in this stage.
    * (Shared with [[graft.streaming.BoilerplateStreams]].) */
  private[graft] def segmentsOf(docs: org.apache.spark.sql.DataFrame) =
    docs
      .withColumn("w", graft.functions.TextFunctions.tokens(col("text")))
      .filter(size(col("w")) >= 1)
      .withColumn("segs", expr(
        s"transform(sequence(0, (size(w) + ${SegWords - 1}) div $SegWords - 1), " +
          s"i -> array_join(slice(w, i*$SegWords + 1, $SegWords), ' '))"))
      .select(col("doc_id"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))

  private[graft] def segments(s: org.apache.spark.sql.SparkSession, d: String) =
    segmentsOf(Tables.documents(s, d))

  /** The trained boilerplate-list frame (seg, n_docs, first_doc) —
    * the artifact's `list` relation, shared by the builder and the
    * [[graft.sources.ArtifactSentinel]] live recompute. */
  private[graft] def listOf(seg: org.apache.spark.sql.DataFrame) =
    seg.groupBy("seg")
      .agg(countDistinct("doc_id").as("n_docs"),
        min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= MinDocs)

  /** The corpus boilerplate list: segments carried by >= MinDocs
    * distinct documents (one column `bseg`). */
  private[graft] def boilerplateOf(seg: org.apache.spark.sql.DataFrame) =
    seg.groupBy("seg")
      .agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") >= MinDocs)
      .select(col("seg").as("bseg"))

  /** Per-document excision over a segment frame against the boilerplate
    * list — the shared batch/stream kernel. No static broadcast hint
    * (see the object scaladoc): AQE broadcasts the list while it
    * measures small, demotes to SMJ when it doesn't. Unordered; callers
    * order. */
  private[graft] def exciseFrom(
      seg: org.apache.spark.sql.DataFrame,
      bp: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    seg.join(bp, seg("seg") === bp("bseg"), "left")
      .withColumn("isbp", col("bseg").isNotNull)
      .withColumn("nw", size(split(col("seg"), " ")).cast("long"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("segs_total"),
        sum(when(col("isbp"), 1L).otherwise(0L)).as("segs_removed"),
        sum(col("nw")).as("words_total"),
        sum(when(!col("isbp"), col("nw")).otherwise(0L)).as("words_kept"),
        sort_array(collect_list(
          when(!col("isbp"), struct(col("seg_idx"), col("seg"))))).as("ps"))
      .withColumn("cleaned_fp",
        when(col("words_kept") === 0, lit(null).cast("string"))
          .otherwise(md5(array_join(
            transform(col("ps"), p => p.getField("seg")), " "))))
      .select("doc_id", "segs_total", "segs_removed", "words_total",
        "words_kept", "cleaned_fp")

  /** Persisted boilerplate artifact — TWO relations, built in one corpus
    * pass: `list` (seg, n_docs, first_doc — the trained boilerplate
    * list) and `excised` (the doc-grain excision result). The
    * kn_scores train-once/serve-many shape (r11 verdict item 4: these
    * were the two steepest absolute smoke lines — a production curation
    * tier trains the list once per corpus snapshot and reads the
    * excision result many times). The live construction plan stays
    * registered and swept as [[lineExciseLive]]; the streaming twin
    * excises live by construction. Both relations' doc-id columns are
    * declared for the delete audit (`first_doc` is a doc id — the
    * list's min carrier). */
  private[graft] def boilerplateDir(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    import graft.sources.IndexCatalog
    IndexCatalog.ensure(s, s"boilerplate_${IndexCatalog.tag(d)}",
        inputs = Seq(d),
        owners = Seq(BoilerplateQueries.getClass, graft.Tables.getClass,
          graft.functions.TextFunctions.getClass)) { dir =>
      // segment frame read twice within the one materializing pass
      // (list agg + excise walk): cache, write, unpersist
      val seg = segments(s, d).cache()
      try {
        listOf(seg)
          .write.mode("overwrite").parquet(s"$dir/list")
        IndexCatalog.declareIds("path", "list", Seq("first_doc"))
        exciseFrom(seg,
            s.read.parquet(s"$dir/list").select(col("seg").as("bseg")))
          .write.mode("overwrite").parquet(s"$dir/excised")
        IndexCatalog.declareIds("path", "excised", Seq("doc_id"))
      } finally seg.unpersist()
    }
  }

  private val dupesSql =
    s"""WITH $segCte
       |SELECT md5(seg) AS seg_fp, n_docs, first_doc FROM (
       |  SELECT seg, count(DISTINCT doc_id) AS n_docs,
       |         min(doc_id) AS first_doc
       |  FROM seg GROUP BY seg
       |) WHERE n_docs >= $MinDocs
       |ORDER BY seg_fp""".stripMargin

  private val exciseSql =
    s"""WITH $segCte,
       |bp AS (SELECT seg FROM seg GROUP BY seg
       |       HAVING count(DISTINCT doc_id) >= $MinDocs)
       |SELECT doc_id, segs_total, segs_removed, words_total, words_kept,
       |  CASE WHEN words_kept = 0 THEN NULL ELSE md5(cleaned) END AS cleaned_fp
       |FROM (
       |  SELECT s.doc_id,
       |    count(*) AS segs_total,
       |    CAST(sum(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS segs_removed,
       |    CAST(sum(len(string_split(s.seg, ' '))) AS BIGINT) AS words_total,
       |    CAST(sum(CASE WHEN b.seg IS NULL
       |                  THEN len(string_split(s.seg, ' ')) ELSE 0 END) AS BIGINT)
       |      AS words_kept,
       |    string_agg(s.seg, ' ' ORDER BY s.seg_idx)
       |      FILTER (WHERE b.seg IS NULL) AS cleaned
       |  FROM seg s LEFT JOIN bp b ON s.seg = b.seg
       |  GROUP BY s.doc_id
       |) ORDER BY doc_id""".stripMargin

  /** Corpus boilerplate profile: every segment shared by >= 3 distinct
    * docs, fingerprinted (md5 — the emitted column stays narrow at any
    * scale), with its spread and first carrier. Served from the
    * persisted list. */
  val lineDupes = Q("q_line_dupes", dupesSql) { (s, d) =>
    s.read.parquet(s"${boilerplateDir(s, d)}/list")
      .select(md5(col("seg")).as("seg_fp"), col("n_docs"), col("first_doc"))
      .orderBy("seg_fp")
  }

  /** Per-document boilerplate excision: drop every boilerplate segment,
    * re-assemble the survivors in order, and account for the removal —
    * `words_kept + (words_total - words_kept)` is the conservation law
    * BoilerplateSpec checks. `cleaned_fp` is NULL when the whole doc was
    * boilerplate (both engines agree: md5 of no content is no content,
    * not md5('')). Served from the persisted doc-grain result. */
  val lineExcise = Q("q_line_excise", exciseSql) { (s, d) =>
    s.read.parquet(s"${boilerplateDir(s, d)}/excised")
      .select("doc_id", "segs_total", "segs_removed", "words_total",
        "words_kept", "cleaned_fp")
      .orderBy("doc_id")
  }

  /** The UNSERVED live train+excise plan (the artifact builder's shape),
    * kept registered so the construction plan stays correctness-checked
    * and plan-swept — the kn_scores / q_lm_kn_heldout discipline. */
  val lineExciseLive = Q("q_line_excise_live", exciseSql) { (s, d) =>
    // the segment frame is consumed twice (list agg + excision walk);
    // the artifact builder caches it for exactly this reason — the live
    // plan materializes it once per run too (eager localCheckpoint, the
    // disk-backed equivalent of the builder's cache), so the corpus is
    // tokenized+segmented once instead of twice
    val seg = segments(s, d).localCheckpoint(true)
    exciseFrom(seg, boilerplateOf(seg)).orderBy("doc_id")
  }

  /** The boilerplate drift gauge's measurement frame
    * ([[BoilerplateLifecycle]], round-19): the corpus's segment
    * instances joined against the list (LEFT, so the accounting is
    * structural), aggregated to one row — total instances, instances
    * the list excises (hit rate in exact ppm), and instances of
    * NOVEL-DUP segments (≥ MinDocs distinct docs in the current corpus
    * but missing from the list — the frozen-list caveat quantified).
    * Registered self-gauged (list and stream from the same corpus, the
    * `q_binary_drift` discipline): novel is zero by construction and
    * the hit rate equals the training excision rate, so the oracle
    * pins the measurement plumbing end to end.
    *
    * Plan: one segment explode + one segment-keyed hash-agg (the list
    * trainer's own shape) + a list-sized left join → 1 row. */
  val bpDrift = Q(
    "q_bp_drift",
    s"""WITH $segCte,
       |cs AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
       |         count(DISTINCT doc_id) AS nd
       |       FROM seg GROUP BY seg),
       |bp AS (SELECT seg FROM cs WHERE nd >= $MinDocs),
       |j AS (SELECT cs.n, cs.nd, (b.seg IS NOT NULL) AS hit
       |      FROM cs LEFT JOIN bp b USING (seg))
       |SELECT CAST(sum(n) AS BIGINT) AS n_segments,
       |  CAST(sum(CASE WHEN hit THEN n ELSE 0 END) AS BIGINT)
       |    AS hit_segments,
       |  CAST((1000000 * sum(CASE WHEN hit THEN n ELSE 0 END)) // sum(n)
       |       AS BIGINT) AS hit_ppm,
       |  CAST(sum(CASE WHEN nd >= $MinDocs AND NOT hit THEN n ELSE 0 END)
       |       AS BIGINT) AS novel_dup_segments,
       |  CAST((1000000 *
       |        sum(CASE WHEN nd >= $MinDocs AND NOT hit THEN n ELSE 0 END))
       |       // sum(n) AS BIGINT) AS novel_ppm
       |FROM j""".stripMargin) { (s, d) =>
    // cs is consumed twice (probe side + the derived list); checkpoint
    // the |distinct segs|-row agg so the segment explode+agg runs once
    val cs = segments(s, d).groupBy("seg")
      .agg(count(lit(1)).as("n"), countDistinct("doc_id").as("nd"))
      .localCheckpoint(true)
    val bp = cs.filter(col("nd") >= MinDocs)
      .select(col("seg"), lit(true).as("hit"))
    cs.join(bp, Seq("seg"), "left")
      .na.fill(false, Seq("hit"))
      .agg(sum("n").as("n_segments"),
        sum(when(col("hit"), col("n")).otherwise(0L)).as("hit_segments"),
        sum(when(col("nd") >= MinDocs && !col("hit"), col("n"))
          .otherwise(0L)).as("novel_dup_segments"))
      .select(col("n_segments"), col("hit_segments"),
        expr("(1000000 * hit_segments) div n_segments").as("hit_ppm"),
        col("novel_dup_segments"),
        expr("(1000000 * novel_dup_segments) div n_segments").as("novel_ppm"))
  }
}
