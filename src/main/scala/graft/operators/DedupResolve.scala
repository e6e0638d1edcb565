package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-dup PAIRS (the output of the
  * LSH/Jaccard detectors) into connected components and a keep-list —
  * the step that actually deletes duplicates from a corpus.
  *
  * Algorithm: iterative min-label propagation over the undirected pair
  * graph (each node adopts the smallest id reachable in ≤ 2^k hops after
  * k rounds). Converges in O(log(longest path)) joins — all shuffle-on-
  * key equi-joins, no driver state, so it scales like any other
  * aggregation. Dup clusters in practice are tiny (2–100 docs), so 5–10
  * rounds is far beyond convergence; `resolve` stops early when a round
  * changes nothing.
  */
object DedupResolve {

  /** (id, cluster) for every id appearing in `pairs`; cluster = min id
    * of its connected component. `pairs` columns: doc_a, doc_b.
    *
    * Each round does a 1-hop neighbor-min step plus a pointer-jumping
    * step (`cluster := cluster(cluster)`, path compression), giving
    * O(log diameter) convergence — a 33-node chain resolves in 5 rounds,
    * not 32. */
  def resolve(pairs: DataFrame, maxIter: Int = 15): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("cluster", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      // 1-hop: each node adopts min(own cluster, neighbors' clusters)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst")
                    .withColumnRenamed("cluster", "ncluster"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("ncluster")).as("nmin"))
      val hop = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
                least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"))
      // jump: cluster := cluster's own cluster (path compression)
      val parents = hop.select(col("id").as("cluster"), col("cluster").as("pcluster"))
      // eager localCheckpoint truncates the iterative lineage — cached
      // plans still GROW logically each round and blow up the optimizer
      val next = hop.join(parents, Seq("cluster"), "left")
        .select(col("id"),
                least(col("cluster"), coalesce(col("pcluster"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("cluster", "old"), Seq("id"))
        .filter(col("cluster") =!= col("old")).limit(1).count() > 0
      labels = next
      converged = !changed
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** Keep-list semantics: every clustered doc marked keep/drop (keep =
    * the cluster's min id). Docs not in any pair are implicitly kept. */
  def keepList(pairs: DataFrame): DataFrame =
    resolve(pairs)
      .withColumn("keep", col("id") === col("cluster"))
      .select(col("id").as("doc_id"), col("cluster"), col("keep"))
}
