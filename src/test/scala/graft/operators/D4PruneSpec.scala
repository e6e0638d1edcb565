package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D4 prototypicality pruning semantics: the flag must select exactly
  * the floor-25% most prototypical (smallest own-centroid distance)
  * prefix of each cell's ranking — per-cell, never a global
  * threshold — and cover every corpus vector exactly once. */
class D4PruneSpec extends SparkSpec {

  test("pruned = the per-cell floor-25% closest-to-centroid prefix") {
    val out = SimilarityQueries.d4Prune.run(spark, sf0001)
      .select("vec_id", "cell", "dist", "proto_rank", "cell_n", "pruned")
      .collect()
    val nVecs = graft.Tables.embeddings(spark, sf0001).count()
    assert(out.length == nVecs, "one row per corpus vector")
    val byCell = out.groupBy(_.getAs[Number]("cell").longValue)
    assert(byCell.size > 1, "premise: more than one trained cell")
    for ((cell, rows) <- byCell) {
      val n = rows.length
      assert(rows.forall(_.getLong(4) == n), s"cell $cell: cell_n mismatch")
      // ranking is the (dist, vec_id) total order
      val sorted = rows.sortBy(r => (r.getLong(2), r.getLong(0)))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to n).toSeq,
        s"cell $cell: proto_rank is not the dense (dist, vec_id) rank")
      // the flag selects exactly the floor-quarter prefix
      val pruned = rows.filter(_.getBoolean(5))
      assert(pruned.length == n / 4,
        s"cell $cell: ${pruned.length} pruned, want ${n / 4} of $n")
      assert(pruned.map(_.getLong(3)).sorted.toSeq == (1L to n / 4).toSeq,
        s"cell $cell: pruned rows are not the most-prototypical prefix")
    }
    // a dense cell prunes more than a sparse one (the point of the
    // per-cell rule): the largest cell's pruned count strictly exceeds
    // the smallest's when their sizes differ by 4+
    val sizes = byCell.view.mapValues(_.length).values.toSeq.sorted
    if (sizes.last - sizes.head >= 4)
      assert(sizes.last / 4 > sizes.head / 4,
        s"a cell ${sizes.last - sizes.head} vectors denser must prune more")
  }
}
