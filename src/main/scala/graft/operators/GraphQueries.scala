package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q

/** Iterative graph analytics over the engine's own similarity graph.
  *
  * The kNN graph ([[SimilarityQueries.knnEdges]]) is the substrate
  * graph-shaped corpus passes run on — centrality for coreset
  * selection, components for cluster resolution (already covered by
  * [[DedupResolve]]'s pointer jumping). PageRank is the canonical
  * bulk-iterative member: each iteration is one shuffle-on-key join +
  * one aggregation, the BSP superstep shape, expressed as K unrolled
  * DataFrame stages so Catalyst sees a single DAG (no driver-side
  * data, no collect — only plan construction loops).
  *
  * Exactness contract: ranks live in INTEGER space (scale 10^12) and
  * every step is integer multiply / floor-divide / long sum — a long
  * sum is order-independent, unlike the float sums textbook PageRank
  * would need, so the result is bit-identical on any partitioning and
  * the DuckDB oracle replays it exactly (with the engine's BIGINT-cast
  * convention on SUM).
  *
  * Scale design: contributions shuffle on vec_a (join) then vec_b
  * (agg) — 2 exchanges per superstep, both keyed; the node set is
  * closed under the symmetric cell-mate candidate relation, so no
  * dangling-mass correction term is needed; at 100 TB the edge set
  * would be a persisted IndexCatalog artifact (here it's recomputed
  * from the persisted IVF assignment table, which is itself the
  * artifact — the scan per superstep is of index-sized data, not the
  * corpus).
  */
object GraphQueries {

  /** Rank scale: 10^12 ≈ 40 bits, leaving 85×(in-degree×scale) far
    * below 2^63 even for a full 500-cap cell's in-degree. */
  val prScale = 1000000000000L
  val prBase: Long = prScale * 15 / 100 // (1-d) mass, d = 0.85
  val prIters = 3

  private def oneIter(edges: DataFrame, deg: DataFrame, ranks: DataFrame): DataFrame = {
    val contrib = edges
      .join(deg, Seq("vec_a"))
      .join(ranks.withColumnRenamed("vec_id", "vec_a"), Seq("vec_a"))
      .select(col("vec_b").as("vec_id"), expr("pr DIV outdeg").as("c"))
    val inSum = contrib.groupBy("vec_id").agg(sum("c").as("in_sum"))
    deg.select(col("vec_a").as("vec_id"))
      .join(inSum, Seq("vec_id"), "left")
      .select(col("vec_id"),
        (lit(prBase) + expr("(85 * coalesce(in_sum, 0)) DIV 100")).as("pr"))
  }

  val pagerank = Q(
    "q_pagerank",
    s"""WITH ${SimilarityQueries.knnEdgesCtes},
       |e AS (SELECT vec_a, vec_b FROM knn),
       |deg AS (SELECT vec_a, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM e GROUP BY 1),
       |r0 AS (SELECT vec_a AS vec_id, CAST($prScale AS BIGINT) AS pr FROM deg),
       |${(1 to prIters).map { i =>
         s"""r$i AS (
            |  SELECT d.vec_a AS vec_id,
            |    CAST($prBase + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS pr
            |  FROM deg d LEFT JOIN (
            |    SELECT e.vec_b, CAST(SUM(r.pr // dg.outdeg) AS BIGINT) AS c
            |    FROM e JOIN r${i - 1} r ON r.vec_id = e.vec_a
            |           JOIN deg dg ON dg.vec_a = e.vec_a
            |    GROUP BY e.vec_b) s ON s.vec_b = d.vec_a)""".stripMargin
       }.mkString(",\n")}
       |SELECT vec_id, pr FROM r$prIters ORDER BY vec_id""".stripMargin) { (s, d) =>
    val edges = SimilarityQueries.knnEdges(s, d).select("vec_a", "vec_b")
    val deg = edges.groupBy("vec_a").agg(count(lit(1)).as("outdeg"))
    val r0 = deg.select(col("vec_a").as("vec_id"), lit(prScale).as("pr"))
    val rk = (1 to prIters).foldLeft(r0)((r, _) => oneIter(edges, deg, r))
    rk.orderBy("vec_id")
  }
}
