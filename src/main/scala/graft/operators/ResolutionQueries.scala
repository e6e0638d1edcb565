package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Entity resolution (record linkage) over the `customer` table — the
  * Customer360 move the reference's ETL stops short of: finding rows
  * that refer to the SAME real-world entity despite textual drift, then
  * electing one golden record per entity.
  *
  * Classic three-stage shape, each stage a scale-safe Spark plan:
  *
  *  1. BLOCKING — candidate pairs only within a cheap equality block
  *     (here `(c_nationkey, c_mktsegment)`), turning O(n²) comparisons
  *     into Σ nᵢ² over block sizes. The block key is a plain shuffle
  *     key: a sort-merge self-join, no cartesian anywhere. Recall
  *     contract: matches that disagree on the block key are missed by
  *     construction — production systems run several complementary
  *     blocking passes and union the candidates (exactly the multi-pass
  *     pattern of [[DedupQueries]]' LSH bands).
  *  2. MATCHING — a similarity predicate on candidates; here
  *     `levenshtein(name_a, name_b) <= 2`, Spark's codegen'd edit
  *     distance (identical DP definition in DuckDB, so the oracle is
  *     engine-exact).
  *  3. RESOLUTION + SURVIVORSHIP — matched pairs → connected components
  *     via [[DedupResolve]] (the same O(log diameter) pointer-jumping
  *     loop the dedup tier uses), then one golden record per entity by
  *     a deterministic rule (max `c_acctbal`, ties → min key).
  *
  * At 100 TB: blocking and matching are one equi-join whose cost is
  * bounded by the largest block (monitor block sizes with
  * `q_er_blocking`; cap or sub-block hot blocks exactly like the LSH
  * bucket caps); resolution is iterative equi-joins over match pairs
  * only — pairs are rare, so the loop runs on a tiny fraction of the
  * input.
  */
object ResolutionQueries {

  /** DuckDB CTE: blocked fuzzy-match pairs, optionally key-bounded. */
  private def matchCte(bound: Option[Int]): String = {
    val slice = bound.map(b => s"AND a.c_custkey < $b AND b.c_custkey < $b").getOrElse("")
    s"""m AS (
       |  SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       |    levenshtein(a.c_name, b.c_name) AS dist
       |  FROM customer a JOIN customer b
       |    ON a.c_nationkey = b.c_nationkey
       |    AND a.c_mktsegment = b.c_mktsegment
       |    AND a.c_custkey < b.c_custkey $slice
       |  WHERE levenshtein(a.c_name, b.c_name) <= 2
       |)""".stripMargin
  }

  /** Spark side of the shared match stage. `bound` trims both sides
    * BEFORE the join (pushed to the scan) so the resolution queries'
    * recursive-CTE oracle stays cheap; the unbounded match itself is
    * verified by q_er_fuzzy_match. */
  private[graft] def matchPairs(s: SparkSession, d: String,
                                bound: Option[Int]): DataFrame = {
    val base0 = Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    val base = bound.map(b => base0.filter(col("c_custkey") < b)).getOrElse(base0)
    // spread the probe side: the whole customer table is one parquet
    // split at bench scale, and the blocked match would otherwise run
    // its levenshtein loop as a single task
    val a = base.toDF("cust_a", "name_a", "nat", "seg")
      .repartition(s.sparkContext.defaultParallelism, col("cust_a"))
    val b = base.toDF("cust_b", "name_b", "nat", "seg")
    a.join(b, Seq("nat", "seg"))
      .filter(col("cust_a") < col("cust_b"))
      // 3-arg banded variant: O(threshold·n) early-exit DP per pair
      // (vs the full O(n²) table), -1 when the band is exceeded —
      // same surviving pairs and distances as the unbounded form
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
      .filter(col("dist") >= 0)
      .select("cust_a", "cust_b", "dist")
  }

  /** Block-size profile: members and candidate pairs per block — the
    * dial that tells an operator whether a blocking key is selective
    * enough (a hot block's nᵢ² is the whole cost of stage 2). */
  val blocking = Q(
    "q_er_blocking",
    """SELECT c_nationkey, c_mktsegment, count(*) AS n_members,
      |  CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs
      |FROM customer
      |GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n_members"))
      .withColumn("n_pairs",
        (col("n_members") * (col("n_members") - 1) / 2).cast("long"))
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** Stage-2 output: all blocked match pairs at edit distance ≤ 2,
    * over the FULL table (no slice) — one sort-merge self-join. */
  val fuzzyMatch = Q(
    "q_er_fuzzy_match",
    s"""WITH ${matchCte(None)}
       |SELECT cust_a, cust_b, dist FROM m
       |ORDER BY cust_a, cust_b""".stripMargin) { (s, d) =>
    matchPairs(s, d, None).orderBy("cust_a", "cust_b")
  }

  /** Resolution slice bound: keeps the DuckDB recursive-CTE oracle
    * (quadratic in component walk length) tractable at sf0.1 while the
    * Spark path runs the identical plan it runs unbounded. */
  private val ResolveBound = 3000

  /** Resolved entity labels (cust_id, entity) over the bounded match
    * slice — the pointer-jumping loop runs ONCE per (run, corpus) and
    * persists through [[graft.sources.IndexCatalog]]; `q_er_clusters`
    * and `q_er_golden` both serve from the stored artifact (the
    * keep-list discipline of the dedup tier). */
  private[graft] def erLabels(s: SparkSession, d: String): DataFrame = {
    import graft.sources.IndexCatalog
    val dir = IndexCatalog.ensure(s, s"er_labels_${IndexCatalog.tag(d)}",
                                  inputs = Seq(d),
                                  owners = Seq(ResolutionQueries.getClass,
                                    graft.Tables.getClass,
                                    DedupResolve.getClass)) { dir =>
      val pairs = matchPairs(s, d, Some(ResolveBound))
        .select(col("cust_a").as("doc_a"), col("cust_b").as("doc_b"))
      DedupResolve.resolve(pairs)
        .select(col("id").as("cust_id"), col("cluster").as("entity"))
        .write.mode("overwrite").parquet(s"$dir/labels")
    }
    s.read.parquet(s"$dir/labels")
  }

  /** Stage-3a: entity ids (connected components) for every customer in
    * a match pair; `keep` marks the canonical min-key member. Spark
    * side is [[DedupResolve]]'s pointer-jumping loop; the oracle walks
    * the same graph with a recursive CTE. */
  val clusters = Q(
    "q_er_clusters",
    s"""WITH RECURSIVE ${matchCte(Some(ResolveBound))},
       |edges AS (
       |  SELECT cust_a AS src, cust_b AS dst FROM m
       |  UNION
       |  SELECT cust_b, cust_a FROM m
       |), walk(id, reach) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach
       |)
       |SELECT id AS cust_id, min(reach) AS entity, id = min(reach) AS keep
       |FROM walk GROUP BY id ORDER BY cust_id""".stripMargin) { (s, d) =>
    erLabels(s, d)
      .select(col("cust_id"), col("entity"),
              (col("cust_id") === col("entity")).as("keep"))
      .orderBy("cust_id")
  }

  /** Multi-pass blocking — the production answer to single-key recall
    * loss: a second, INDEPENDENT blocking pass (here the last 3 name
    * characters) catches matches the demographic block key misses
    * (same-name customers filed under different nation/segment), and
    * the candidate sets union before matching. Each pass stays an
    * equi-join on its own block key; the union dedups on the pair, so
    * a candidate found by both passes is matched once. Recall grows
    * pass by pass while cost stays Σ (per-pass block sizes)² — the
    * same additive-recall shape as the LSH band union in
    * [[DedupQueries]]. */
  val multiBlock = Q(
    "q_er_multiblock",
    """WITH cand AS (
      |  SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
      |    a.c_name AS name_a, b.c_name AS name_b
      |  FROM customer a JOIN customer b
      |    ON a.c_nationkey = b.c_nationkey
      |    AND a.c_mktsegment = b.c_mktsegment
      |    AND a.c_custkey < b.c_custkey
      |  UNION
      |  SELECT a.c_custkey, b.c_custkey, a.c_name, b.c_name
      |  FROM customer a JOIN customer b
      |    ON right(a.c_name, 3) = right(b.c_name, 3)
      |    AND a.c_custkey < b.c_custkey
      |)
      |SELECT cust_a, cust_b, levenshtein(name_a, name_b) AS dist
      |FROM cand WHERE levenshtein(name_a, name_b) <= 2
      |ORDER BY cust_a, cust_b""".stripMargin) { (s, d) =>
    val base = Tables.customer(s, d)
      .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
    def pass(blockCols: DataFrame => DataFrame): DataFrame = {
      val a = blockCols(base).toDF("cust_a", "name_a", "blk")
        .repartition(s.sparkContext.defaultParallelism,
                     col("cust_a")) // spread the probe side (see matchPairs)
      val b = blockCols(base).toDF("cust_b", "name_b", "blk")
      a.join(b, Seq("blk")).filter(col("cust_a") < col("cust_b"))
        .select("cust_a", "cust_b", "name_a", "name_b")
    }
    val demographic = pass(df => df.select(col("c_custkey"), col("c_name"),
      concat_ws("|", col("c_nationkey"), col("c_mktsegment")).as("blk")))
    val suffix = pass(df => df.select(col("c_custkey"), col("c_name"),
      substring(col("c_name"), -3, 3).as("blk")))
    demographic.union(suffix).distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 2))
      .filter(col("dist") >= 0) // banded early-exit DP (see matchPairs)
      .select("cust_a", "cust_b", "dist")
      .orderBy("cust_a", "cust_b")
  }

  /** Stage-3b survivorship: one golden record per entity by the
    * deterministic rule (max acctbal, ties → min custkey) — a
    * rank-1-per-group window over the resolved clusters joined back to
    * the source rows. Singletons (customers in no match pair) keep
    * themselves by definition and are not re-listed. */
  val golden = Q(
    "q_er_golden",
    s"""WITH RECURSIVE ${matchCte(Some(ResolveBound))},
       |edges AS (
       |  SELECT cust_a AS src, cust_b AS dst FROM m
       |  UNION
       |  SELECT cust_b, cust_a FROM m
       |), walk(id, reach) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.reach
       |), labeled AS (
       |  SELECT id AS cust_id, min(reach) AS entity FROM walk GROUP BY id
       |)
       |SELECT entity, n_members, c_custkey AS golden_custkey,
       |  c_acctbal AS golden_acctbal
       |FROM (
       |  SELECT l.entity, c.c_custkey, c.c_acctbal,
       |    count(*) OVER (PARTITION BY l.entity) AS n_members,
       |    row_number() OVER (PARTITION BY l.entity
       |                       ORDER BY c.c_acctbal DESC, c.c_custkey) AS rk
       |  FROM labeled l JOIN customer c ON l.cust_id = c.c_custkey
       |) WHERE rk = 1 ORDER BY entity""".stripMargin) { (s, d) =>
    val labeled = erLabels(s, d)
    val w = Window.partitionBy("entity")
    val joined = labeled.join(
      Tables.customer(s, d).select("c_custkey", "c_acctbal"),
      col("cust_id") === col("c_custkey"))
    joined
      .withColumn("n_members", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("c_acctbal").desc, col("c_custkey"))))
      .filter(col("rk") === 1)
      .select(col("entity"), col("n_members"),
              col("c_custkey").as("golden_custkey"),
              col("c_acctbal").as("golden_acctbal"))
      .orderBy("entity")
  }
}
