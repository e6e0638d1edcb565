package graft

/** Whole-inventory plan hygiene: NO registered query may plan a
  * CartesianProduct or BroadcastNestedLoopJoin — the two shapes that
  * silently turn into n² at 100 TB — except the documented, hard-bounded
  * recall baselines. Planning-only (no execution), so the sweep stays
  * cheap and new queries are guarded automatically on registration. */
class PlanHygieneSpec extends SparkSpec {

  /** Documented bounded O(n²) recall oracles (each caps its input to
    * <500 ids), plus the brute-force ANN baseline whose
    * BroadcastNestedLoopJoin is the intended shape: a bounded query
    * batch (10 rows) broadcast against one corpus scan IS brute force —
    * 10·n by construction, not n². */
  private val boundedBaselines = Set(
    "q_dedup_jaccard_pairs", "q_dedup_embedding_exact", "q_ann_bruteforce")

  /** Queries whose CONSTRUCTION already runs Spark jobs (iterative
    * training/resolution, eager sketches) — too heavy for a sweep that
    * should stay planning-only; their plan shapes are pinned by their
    * own specs and oracles. */
  private val constructionEager = Set(
    "q_dedup_resolve", "q_dedup_embedding_resolve", "q_corpus_curation",
    "q_ann_ivf", "q_ann_ivf_probe2", "q_freq_items")

  test("no registered query plans a cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if boundedBaselines(name) || constructionEager(name) => None
      case (name, fn) =>
        val plan = fn(spark, sf0001).queryExecution.sparkPlan.toString
        if (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")) Some(name) else None
    }
    spark.catalog.clearCache() // some queries cache their inputs
    assert(offenders.isEmpty,
      s"unbounded join shapes in: ${offenders.mkString(", ")}")
  }
}
