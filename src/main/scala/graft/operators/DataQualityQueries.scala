package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Data-quality validation — the gate a 100 TB pipeline runs BEFORE the
  * corpus build or warehouse load consumes a day's landing data: key
  * uniqueness, referential integrity, completeness, and domain checks,
  * each expressed as a count of violations so the report is one tiny
  * frame regardless of input size.
  *
  * Scale shape: every check is a single-pass aggregate or an anti-join
  * on a key (shuffle-on-key, AQE-broadcastable dimension side) — the
  * checks compose into ONE plan via union of 1-row aggregates, so a
  * scheduler runs the whole suite as one job and alerts on any
  * `pass = false` row. */
object DataQualityQueries {

  private def check(name: String, violations: DataFrame): DataFrame =
    violations.select(
      lit(name).as("check_name"),
      col("n_violations").cast("long").as("n_violations"),
      (col("n_violations") === 0).as("pass"))

  val dataQuality = Q(
    "q_data_quality",
    """SELECT * FROM (
      |  SELECT 'customer_custkey_unique' AS check_name,
      |    CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_violations,
      |    count(*) = count(DISTINCT c_custkey) AS pass
      |  FROM customer
      |  UNION ALL
      |  SELECT 'documents_text_complete',
      |    CAST(sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT),
      |    sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) = 0
      |  FROM documents
      |  UNION ALL
      |  SELECT 'events_event_id_unique',
      |    CAST(count(*) - count(DISTINCT event_id) AS BIGINT),
      |    count(*) = count(DISTINCT event_id)
      |  FROM events
      |  UNION ALL
      |  SELECT 'events_value_nonnegative',
      |    CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
      |    sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) = 0
      |  FROM events
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_fk',
      |    CAST((SELECT count(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                            WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
      |    (SELECT count(*) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                       WHERE o.o_orderkey = l.l_orderkey)) = 0
      |  UNION ALL
      |  SELECT 'orders_custkey_fk',
      |    CAST((SELECT count(*) FROM orders o
      |          WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                            WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
      |    (SELECT count(*) FROM orders o
      |     WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                       WHERE c.c_custkey = o.o_custkey)) = 0
      |)
      |ORDER BY check_name""".stripMargin) { (s, d) =>
    val uniqueCust = check("customer_custkey_unique",
      Tables.customer(s, d)
        .agg((count(lit(1)) - countDistinct(col("c_custkey"))).as("n_violations")))
    val docText = check("documents_text_complete",
      Tables.documents(s, d)
        .agg(sum(when(col("text").isNull || trim(col("text")) === "", 1)
          .otherwise(0)).as("n_violations")))
    val uniqueEvent = check("events_event_id_unique",
      Tables.events(s, d)
        .agg((count(lit(1)) - countDistinct(col("event_id"))).as("n_violations")))
    val valueDomain = check("events_value_nonnegative",
      Tables.events(s, d)
        .agg(sum(when(col("value") < 0, 1).otherwise(0)).as("n_violations")))
    val lineFk = check("lineitem_orderkey_fk",
      Tables.lineitem(s, d).select("l_orderkey")
        .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations")))
    val orderFk = check("orders_custkey_fk",
      Tables.orders(s, d).select("o_custkey")
        .join(Tables.customer(s, d).select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations")))
    Seq(uniqueCust, docText, uniqueEvent, valueDomain, lineFk, orderFk)
      .reduce(_ unionByName _)
      .orderBy("check_name")
  }

  /** k-anonymity generalization over the customer quasi-identifiers
    * (nation, market segment) — the governance pass a corpus publisher
    * runs before releasing attribute tables: a QI group smaller than
    * k = 3 would re-identify its members, so it climbs the
    * generalization hierarchy (Sweeney 2002): full grain → nation
    * generalized to '*' → fully suppressed residual. Row conservation
    * (Σ n_rows = |customer|) is the spec-pinned invariant.
    *
    * Plan: one grouped count at QI grain, then the (tiny — only
    * sub-k groups survive) remainder re-grouped at coarser grain; the
    * big table is scanned once, every later frame is group-sized. */
  val kAnonymity = Q(
    "q_k_anonymity",
    """WITH g AS (
      |  SELECT CAST(c_nationkey AS VARCHAR) AS nat, c_mktsegment AS seg,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1, 2),
      |rest AS (SELECT seg, CAST(sum(n) AS BIGINT) AS n
      |         FROM g WHERE n < 3 GROUP BY seg)
      |SELECT nat AS nation_qi, seg AS segment_qi, n AS n_rows, tier FROM (
      |  SELECT nat, seg, n, 'full' AS tier FROM g WHERE n >= 3
      |  UNION ALL
      |  SELECT '*', seg, n, 'nation_generalized' FROM rest WHERE n >= 3
      |  UNION ALL
      |  SELECT '*', '*', CAST(sum(n) AS BIGINT), 'suppressed'
      |  FROM rest WHERE n < 3 HAVING count(*) > 0
      |) ORDER BY tier, nation_qi, segment_qi""".stripMargin) { (s, d) =>
    val g = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("string").as("nat"),
        col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"))
    val rest = g.filter(col("n") < 3)
      .groupBy("seg").agg(sum("n").as("n"))
    val full = g.filter(col("n") >= 3)
      .select(col("nat"), col("seg"), col("n"), lit("full").as("tier"))
    val gen = rest.filter(col("n") >= 3)
      .select(lit("*").as("nat"), col("seg"), col("n"),
        lit("nation_generalized").as("tier"))
    val supp = rest.filter(col("n") < 3)
      .agg(sum("n").as("n"), count(lit(1)).as("k"))
      .filter(col("k") > 0)
      .select(lit("*").as("nat"), lit("*").as("seg"), col("n"),
        lit("suppressed").as("tier"))
    full.unionByName(gen).unionByName(supp)
      .select(col("nat").as("nation_qi"), col("seg").as("segment_qi"),
        col("n").as("n_rows"), col("tier"))
      .orderBy("tier", "nation_qi", "segment_qi")
  }

  /** l-diversity audit (Machanavajjhala et al. 2007) — the gate
    * k-anonymity alone cannot close: a QI group can be k-large yet
    * carry ONE sensitive value, so membership still discloses it
    * (the homogeneity attack). Sensitive attribute here is the account
    * balance band `floor(c_acctbal / 2000)` (both engines FLOOR the
    * exact decimal quotient, so negative balances band identically);
    * a (nation, segment) group is l-diverse when it carries ≥ l = 3
    * distinct bands. Output is the full per-group audit frame plus its
    * verdict — the table a publisher reviews before release, the
    * companion to [[kAnonymity]]'s generalization pass.
    *
    * Plan: ONE grouped count-distinct on the big table (two-phase
    * hash-agg on the QI key); nothing after it exceeds group count. */
  val lDiversity = Q(
    "q_l_diversity",
    """SELECT CAST(c_nationkey AS VARCHAR) AS nation_qi,
      |  c_mktsegment AS segment_qi,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) AS BIGINT)
      |    AS n_sensitive,
      |  count(DISTINCT CAST(floor(c_acctbal / 2000) AS BIGINT)) >= 3 AS diverse
      |FROM customer
      |GROUP BY 1, 2
      |ORDER BY nation_qi, segment_qi""".stripMargin) { (s, d) =>
    val band = floor(col("c_acctbal") / 2000).cast("long")
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("string").as("nation_qi"),
        col("c_mktsegment").as("segment_qi"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(band).as("n_sensitive"))
      .select(col("nation_qi"), col("segment_qi"), col("n_rows"),
        col("n_sensitive"), (col("n_sensitive") >= 3).as("diverse"))
      .orderBy("nation_qi", "segment_qi")
  }

  /** Null-rate profile per column of a frame — the completeness summary
    * a landing-zone monitor tracks day over day (one pass, one row). */
  def nullProfile(df: DataFrame): DataFrame = {
    val total = count(lit(1))
    df.agg(total.as("n_rows"),
      df.columns.toSeq.map(c =>
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"nulls_$c")): _*)
  }
}
