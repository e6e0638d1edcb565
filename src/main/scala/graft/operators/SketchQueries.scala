package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.plans.Hll.{hllEstimate, hllMerge, hllSketch}

/** Mergeable-sketch queries (SURVEY §7.3 sketch tier): cardinality via
  * [[graft.plans.HllSketchAgg]] — sketches as first-class values that
  * merge across groups, jobs, and shards. */
object SketchQueries {

  /** Distinct-text estimate per source AND for the whole corpus, in ONE
    * linear plan that exercises the full sketch algebra:
    *
    *   documents → per-source HLL sketches (hll_sketch, map-side
    *   combinable) → each sketch row fans out to its own group plus the
    *   `~all~` group → hll_merge folds each group's sketches → estimate.
    *
    * The `~all~` row is a MERGE of the five per-source sketches, not a
    * re-aggregation of raw data — the cross-shard workflow (per-shard
    * jobs emit sketch rows; a rollup merges them without re-reading the
    * corpus). `~all~` sorts after the lowercase source names, keeping
    * the order deterministic. Rows-only: HLL implementations differ by
    * design, so there is no DuckDB oracle; HllSketchSpec pins the
    * algebra (merge-of-shards ≡ whole corpus, repartition invariance)
    * and the estimate's accuracy against exact distinct counts. */
  val hllDistinct = Q.rowsOnly("q_hll_distinct") { (s, d) =>
    Tables.documents(s, d)
      .groupBy("source")
      .agg(hllSketch(col("text"), 12).as("sk"), count(lit(1)).as("n_docs"))
      .select(explode(array(col("source"), lit("~all~"))).as("source"),
              col("sk"), col("n_docs"))
      .groupBy("source")
      .agg(hllEstimate(hllMerge(col("sk"))).as("est_distinct"),
           sum(col("n_docs")).cast("long").as("n_docs"))
      .orderBy("source")
  }
}
