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

  /** Weighted-variant rank scale: smaller than [[prScale]] because each
    * contribution multiplies rank by an edge weight ≤ [[wMax]] before
    * the divide — worst-case mass concentration (every node's full
    * N×scale mass on one vertex) times wMax must stay below 2^63;
    * 10^9 × 10^4 nodes × 10^3 ≈ 10^16 leaves 600× headroom. */
  val wprScale = 1000000000L
  val wprBase: Long = wprScale * 15 / 100

  /** Edge weight: cosine ∈ [-1,1] affine-mapped to the integer range
    * [1, 1001] — strictly positive (a negative-cosine edge must not
    * push negative mass) and exact (the cosine doubles are bit-equal
    * across engines — q_knn_graph pins that — so floor lands the same
    * side of every boundary). */
  val wMax = 1001L
  private val edgeWeight = (floor((col("cosine") + 1) * 500) + 1).cast("long")
  private val edgeWeightSql = "CAST(floor((cosine + 1) * 500) AS BIGINT) + 1"

  private def oneWeightedIter(ew: DataFrame, wdeg: DataFrame, ranks: DataFrame): DataFrame = {
    val contrib = ew
      .join(wdeg, Seq("vec_a"))
      .join(ranks.withColumnRenamed("vec_id", "vec_a"), Seq("vec_a"))
      .select(col("vec_b").as("vec_id"), expr("(pr * w) DIV wsum").as("c"))
    val inSum = contrib.groupBy("vec_id").agg(sum("c").as("in_sum"))
    wdeg.select(col("vec_a").as("vec_id"))
      .join(inSum, Seq("vec_id"), "left")
      .select(col("vec_id"),
        (lit(wprBase) + expr("(85 * coalesce(in_sum, 0)) DIV 100")).as("pr"))
  }

  /** Similarity-weighted PageRank over the kNN graph: a node's rank
    * flows to its neighbors PROPORTIONALLY to edge cosine rather than
    * uniformly — the centrality a coreset-selection pass wants, where a
    * node tightly coupled to its cell-mates outranks one with the same
    * degree but weaker ties. Same superstep shape as [[pagerank]]
    * (2 keyed exchanges per iteration: join on vec_a, agg on vec_b);
    * the only new per-edge state is the integer weight and the
    * precomputed per-source weight total `wsum` replacing `outdeg`. */
  val weightedPagerank = Q(
    "q_pagerank_weighted",
    s"""WITH ${SimilarityQueries.knnEdgesCtes},
       |ew AS (SELECT vec_a, vec_b, $edgeWeightSql AS w FROM knn),
       |wdeg AS (SELECT vec_a, CAST(SUM(w) AS BIGINT) AS wsum
       |         FROM ew GROUP BY 1),
       |r0 AS (SELECT vec_a AS vec_id, CAST($wprScale AS BIGINT) AS pr FROM wdeg),
       |${(1 to prIters).map { i =>
         s"""r$i AS (
            |  SELECT d.vec_a AS vec_id,
            |    CAST($wprBase + (85 * COALESCE(s.c, 0)) // 100 AS BIGINT) AS pr
            |  FROM wdeg d LEFT JOIN (
            |    SELECT ew.vec_b, CAST(SUM((r.pr * ew.w) // dg.wsum) AS BIGINT) AS c
            |    FROM ew JOIN r${i - 1} r ON r.vec_id = ew.vec_a
            |            JOIN wdeg dg ON dg.vec_a = ew.vec_a
            |    GROUP BY ew.vec_b) s ON s.vec_b = d.vec_a)""".stripMargin
       }.mkString(",\n")}
       |SELECT vec_id, pr FROM r$prIters ORDER BY vec_id""".stripMargin) { (s, d) =>
    val ew = SimilarityQueries.knnEdges(s, d)
      .select(col("vec_a"), col("vec_b"), edgeWeight.as("w"))
    val wdeg = ew.groupBy("vec_a").agg(sum("w").as("wsum"))
    val r0 = wdeg.select(col("vec_a").as("vec_id"), lit(wprScale).as("pr"))
    val rk = (1 to prIters).foldLeft(r0)((r, _) => oneWeightedIter(ew, wdeg, r))
    rk.orderBy("vec_id")
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
