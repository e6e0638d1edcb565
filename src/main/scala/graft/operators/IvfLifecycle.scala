package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.GenerationedTable

/** IVF drift → retrain lifecycle (round-7 verdict item 4: centroids were
  * trained once and frozen forever — `q_embedding_outliers` gauged drift
  * with no consumer, and the streaming assigner served stale cells
  * indefinitely).
  *
  * A 100 TB deployment's coarse quantizer ages as the corpus drifts:
  * quantization error rises (vectors land far from every trained
  * centroid) and cell balance decays (new content piles into few cells,
  * making those cells' candidate joins quadratic-ish while others
  * starve). This module closes the loop:
  *
  *  - centroid sets are a [[GenerationedTable]] under
  *    `<store>/centroids` — a retrain lands a COMPLETE new generation
  *    beside the old one and swings the `_LATEST` pointer; a reader
  *    pinned to generation g keeps reading generation g's bytes
  *    untouched (snapshot isolation, no coordination);
  *  - every generation persists its TRAINING-TIME telemetry
  *    ([[DriftStats]]: mean assigned distance, cell balance) as a
  *    sibling [[GenerationedTable]] under `<store>/stats`, written with
  *    the same generation number — the baseline the drift gauge
  *    compares against (recomputing it later is impossible: the corpus
  *    behind the path has drifted, that being the point);
  *  - [[driftCheck]] reruns the same telemetry over the CURRENT corpus
  *    against the pointed generation and returns a [[DriftDecision]]
  *    with the measured ratios — the `q_embedding_outliers` /
  *    cell-balance signal turned into an actionable verdict;
  *  - [[maybeRetrain]] is the nightly maintenance entry: check, and if
  *    (and only if) drift exceeds the thresholds, train the next
  *    generation on the current corpus. Readers and the streaming
  *    assigner ([[graft.streaming.SemanticStreams]]) observe the new
  *    generation at their next pointer resolution — the generation
  *    boundary — and switch; nothing running mid-plan is disturbed.
  *
  * Scale shape: telemetry is one map-only quantize pass + broadcast
  * join against k·dim centroid rows, aggregated to k+1 rows — the same
  * shape as assignment, no training. The only driver-side data are
  * those k+1 aggregate rows. Training cost is paid exactly when the
  * gauge says the index is stale, never per deploy (the IndexCatalog
  * fingerprint fix) and never per process (the manifest fix).
  *
  * Dependent-artifact coupling: [[PqQuantizer]] codebooks train on
  * RESIDUALS against the coarse centroids, so a coarse retrain stales
  * the PQ tier — a deployment retrains PQ into the same generation
  * boundary (its [[graft.sources.IndexCatalog]] artifact already keys
  * on its inputs, so the next build after a centroid change recomputes;
  * the generationed store here covers the coarse tier the streaming
  * assigner consumes).
  */
object IvfLifecycle {

  def centroidsDir(store: String): String = s"$store/centroids"
  def statsDir(store: String): String = s"$store/stats"

  /** Corpus-level quantization telemetry against one centroid set.
    * `meanDist` is the mean assigned squared-L2 distance (integer
    * space — the `q_embedding_outliers` gauge aggregated); rising means
    * the corpus has moved away from every trained centroid.
    * `maxCellShare` is the largest cell's fraction of all vectors (the
    * balance gauge; 1/k is perfect, →1 is degenerate); `liveCells` the
    * number of non-empty cells. */
  final case class DriftStats(nVectors: Long, meanDist: Double,
                              maxCellShare: Double, liveCells: Long)

  /** One aggregation pass: (vec_id, cell, dist) → k cell rows → 1 row. */
  def driftStats(vectors: DataFrame, centroids: DataFrame): DriftStats = {
    // double sums: this is telemetry (ratios), and BIGINT dist sums
    // could overflow long at corpus scale
    val byCell = IvfQuantizer.assignedDistances(vectors, centroids)
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sum(col("dist").cast("double")).as("sd"))
    val r = byCell
      .agg(sum(col("n")).as("nv"),
           (sum(col("sd")) / sum(col("n"))).as("md"),
           (max(col("n")).cast("double") / sum(col("n"))).as("ms"),
           count(lit(1)).as("lc"))
      .collect().head // k+1 aggregate rows end at 1 — telemetry, not data
    require(!r.isNullAt(0) && r.getLong(0) > 0,
      "driftStats over an empty corpus — the vectors frame produced no " +
        "assignments (empty source or a filter that dropped every row); " +
        "drift against nothing is undefined, refusing to gauge")
    DriftStats(r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
  }

  private def statsToDf(s: SparkSession, st: DriftStats): DataFrame = {
    import s.implicits._
    Seq((st.nVectors, st.meanDist, st.maxCellShare, st.liveCells))
      .toDF("n_vectors", "mean_dist", "max_cell_share", "live_cells")
  }

  /** Training-time baseline of generation `gen`. */
  def baselineStats(s: SparkSession, store: String, gen: Int): DriftStats = {
    val r = GenerationedTable.read(s, statsDir(store), Some(gen))
      .select("n_vectors", "mean_dist", "max_cell_share", "live_cells")
      .collect().head
    DriftStats(r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
  }

  /** The drift gauge's verdict: retrain or not, with every measured
    * ratio exposed so an operator (or a test) can see WHY. */
  final case class DriftDecision(retrain: Boolean, reasons: Seq[String],
                                 generation: Int, current: DriftStats,
                                 baseline: DriftStats)

  /** Train the FIRST generation (or unconditionally force the next one)
    * from the current corpus; returns the new generation number. The
    * new centroids and their training-time stats land under the same
    * generation number before the pointer swings readers onto them. */
  def retrain(vectors: DataFrame, k: Int, iters: Int, store: String): Int = {
    val s = vectors.sparkSession
    val t = IvfQuantizer.trainVectors(vectors, k, iters)
    try {
      val st = driftStats(vectors, t.centroids)
      // One generation number for both tables, chosen from the CENTROID
      // dir (the pointer readers resolve), stats committed FIRST: a
      // crash between the two writes leaves only an orphan stats
      // generation, which is harmless (stats are read by explicit gen
      // via the centroid pointer, never by their own) and gets
      // overwritten by the next retrain, which re-derives the same
      // number from the unchanged centroid dir. The old order (centroids
      // first) wedged the store: a centroid gen with no stats twin made
      // baselineStats throw and every later retrain fail its
      // lockstep check.
      val next = GenerationedTable.generations(s, centroidsDir(store))
        .lastOption.getOrElse(0) + 1
      GenerationedTable.writeAs(statsToDf(s, st), statsDir(store), next)
      GenerationedTable.writeAs(t.centroids, centroidsDir(store), next)
      next
    } finally t.quantized.unpersist()
  }

  /** Measure the current corpus against the pointed generation. Default
    * thresholds: retrain when mean quantization error grew ≥ 1.5× the
    * training-time baseline, or the biggest cell holds ≥ 50% of the
    * corpus (candidate-join degeneracy). */
  def driftCheck(vectors: DataFrame, store: String,
                 distRatio: Double = 1.5,
                 cellShare: Double = 0.5): DriftDecision = {
    val s = vectors.sparkSession
    val gen = GenerationedTable.latest(s, centroidsDir(store)).getOrElse(
      throw new IllegalStateException(s"$store has no trained generation"))
    val cent = GenerationedTable.read(s, centroidsDir(store), Some(gen))
    val cur = driftStats(vectors, cent)
    val base = baselineStats(s, store, gen)
    val reasons = Seq.newBuilder[String]
    if (base.meanDist > 0 && cur.meanDist >= distRatio * base.meanDist)
      reasons += f"mean assigned distance ${cur.meanDist}%.0f is " +
        f"${cur.meanDist / base.meanDist}%.2fx the gen-$gen baseline ${base.meanDist}%.0f"
    if (cur.maxCellShare >= cellShare)
      reasons += f"largest cell holds ${cur.maxCellShare * 100}%.1f%% of the corpus"
    val rs = reasons.result()
    DriftDecision(rs.nonEmpty, rs, gen, cur, base)
  }

  /** Nightly maintenance entry: retrain the next generation iff the
    * drift gauge says so. Returns the decision and the new generation
    * (None when the current one still serves). */
  def maybeRetrain(vectors: DataFrame, k: Int, iters: Int, store: String,
                   distRatio: Double = 1.5,
                   cellShare: Double = 0.5): (DriftDecision, Option[Int]) = {
    val d = driftCheck(vectors, store, distRatio, cellShare)
    if (d.retrain) (d, Some(retrain(vectors, k, iters, store)))
    else (d, None)
  }
}
