package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew guard for the PageRank superstep (round-8 verdict item 7): at
  * 100× scale a popular document's in-degree — or a hub source's
  * out-degree — must not serialize a superstep into one straggler task.
  * Two mechanisms carry that, each pinned here over a 90%-hot graph
  * with the exact integer ranks cross-checked against a plain Scala
  * replay of the arithmetic:
  *
  *  - IN-degree skew: the in-sum aggregation runs a partial (map-side)
  *    combine, so the hot vertex ships one row per map partition
  *    through the exchange, never its full contribution list;
  *  - OUT-degree skew: the contribution join shuffles on vec_a. AQE's
  *    skew split structurally CANNOT fire inside the superstep (the
  *    edges⋈deg⋈ranks multi-join is co-partitioned on one key, and the
  *    skew rule only matches a join over two bare shuffle reads), so
  *    the guards are (a) the production bound — kNN edges carry at most
  *    k per source by construction, asserted against the real artifact —
  *    and (b) for generic graphs, the salted contribution join
  *    ([[Salting.saltedJoin]]), whose superstep result is proven equal
  *    with the hot source spread across all salt lanes.
  */
class PagerankSkewGuardSpec extends SparkSpec {
  import spark.implicits._
  import GraphQueries.{prBase, prScale}

  /** The superstep's integer arithmetic replayed in plain Scala. Ranks
    * exist for SOURCE vertices (deg's keys), matching the engine. */
  private def refRanks(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val inSum = edges
      .map { case (a, b) => b -> (prScale / outdeg(a)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    outdeg.keys.map(v => v -> (prBase + 85 * inSum.getOrElse(v, 0L) / 100)).toMap
  }

  private def runIter(e: DataFrame): (Map[Long, Long], String) = {
    val deg = e.groupBy("vec_a").agg(count(lit(1)).as("outdeg"))
    val r0 = deg.select(col("vec_a").as("vec_id"), lit(prScale).as("pr"))
    val out = GraphQueries.oneIter(e, deg, r0)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (got, out.queryExecution.executedPlan.toString)
  }

  test("90%-hot IN-degree: partial aggregation absorbs the hot key; ranks exact") {
    // 9000 sources all pointing at vertex 0 (90% of in-edges) + a tail
    val edges = (1L to 9000L).map(i => (i, 0L)) ++
      (1L to 999L).map(i => (i, i + 1)) :+ (0L, 1L)
    val (got, plan) = runIter(
      edges.toDF("vec_a", "vec_b").repartition(4))
    assert(got == refRanks(edges))
    // the hot vertex's mass collapses map-side: a partial_sum below the
    // exchange is the structural guarantee no reduce task receives the
    // 9000-row contribution list
    assert(plan.contains("partial_sum"),
      s"no partial aggregate in the superstep plan:\n${plan.take(2000)}")
    // and the hot vertex actually aggregated 9000 contributions
    assert(got(0L) > prBase + 85L * (prScale / 2) / 100,
      "hot vertex should hold most of the graph's rank mass")
  }

  test("the production graph bounds out-degree at k by construction") {
    // q_pagerank's edge source is the kNN artifact: top-3 cell-mates per
    // node — a hub SOURCE cannot exist, whatever the corpus looks like
    val maxOut = SimilarityQueries.knnEdges(spark, sf0001)
      .groupBy("vec_a").agg(count(lit(1)).as("outdeg"))
      .agg(max(col("outdeg"))).collect().head.getLong(0)
    assert(maxOut <= 3, s"kNN out-degree should be capped at k=3, got $maxOut")
  }

  test("90%-hot OUT-degree (generic graph): salted superstep equal, hot source spread") {
    // hub vertex 0 sources 90% of 100k edges — the shape a generic
    // (non-kNN) graph could present. AQE's skew split cannot fire in
    // the co-partitioned multi-join, so the mitigation is the salted
    // contribution join: identical ranks, hot key spread over 8 lanes.
    val edges = (1L to 90000L).map(i => (0L, i % 1000 + 1)) ++
      (1L to 10000L).map(i => (i % 1000 + 1, 0L))
    val e = edges.toDF("vec_a", "vec_b")
    val deg = e.groupBy("vec_a").agg(count(lit(1)).as("outdeg"))
    val dim = deg.select(col("vec_a").as("dvec"), col("outdeg"))
    // salt from vec_b: deterministic per edge, spreads the hub's edges
    val salted = Salting.saltedJoin(e, "vec_a", "vec_b", dim, "dvec", nSalts = 8)
      .select(col("vec_b").as("vec_id"),
        expr(s"$prScale DIV outdeg").as("c"))
    val inSum = salted.groupBy("vec_id").agg(sum("c").as("in_sum"))
    val ranks = deg.select(col("vec_a").as("vec_id"))
      .join(inSum, Seq("vec_id"), "left")
      .select(col("vec_id"),
        (lit(prBase) + expr("(85 * coalesce(in_sum, 0)) DIV 100")).as("pr"))
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refRanks(edges),
      "salted superstep must equal the plain integer arithmetic")
    // the hot key's shuffle rows actually occupy every salt lane
    val lanes = e.filter(col("vec_a") === 0)
      .select(Salting.salt(col("vec_b"), 8).as("lane"))
      .groupBy("lane").count().collect().map(r => r.getLong(1))
    assert(lanes.length == 8 && lanes.min >= 90000 / 8 / 2,
      s"hot source should spread across all 8 lanes, got ${lanes.toSeq}")
  }
}
