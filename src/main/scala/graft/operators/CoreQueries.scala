package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Core relational operator inventory (SURVEY.md §2.1–§2.8) re-expressed
  * over the synthetic star schema. Every query is paired with a DuckDB
  * oracle and is hash-stable by construction:
  *
  *  - monetary aggregation goes through exact `decimal` arithmetic (a
  *    shuffled double sum is order-dependent and would hash-mismatch the
  *    oracle's sequential sum);
  *  - every result carries a deterministic total order (tie-broken), with
  *    `NULLS FIRST` spelled out on the DuckDB side to match Spark's
  *    ascending default;
  *  - window top-1 selection always tie-breaks on a unique column (the
  *    reference's `row_number` over a non-total order at
  *    ETL_customer_behavior.py:13 is nondeterministic — see SURVEY §2.5 W1).
  */
object CoreQueries {

  private val dec = "decimal(18,2)"

  // ---------------------------------------------------------------- scans

  /** S2 + column pruning + predicate pushdown: both the filter and the
    * 3-column read schema must reach the parquet scan. */
  val s2ScanPushdown = Q(
    "q_s2_scan_pushdown",
    """SELECT l_orderkey, l_linenumber, l_quantity
      |FROM lineitem WHERE l_quantity >= 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 45)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** P1: struct-flattening projection (`select($"s.*")`), the ES-envelope
    * unpack of ETL_customer_interaction.py:66 rebuilt on `customer`. */
  val p1StructFlatten = Q(
    "q_p1_struct_flatten",
    "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey") { (s, d) =>
    Tables.customer(s, d)
      .select(struct(col("c_custkey"), col("c_name")).as("s"))
      .select("s.*")
      .orderBy("c_custkey")
  }

  /** P2/P4/P5: projection + rename + drop. */
  val p4RenameProject = Q(
    "q_p4_rename_project",
    """SELECT p_partkey AS part_id, p_brand AS brand, p_size AS size
      |FROM part WHERE p_size > 25 ORDER BY part_id""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_size") > 25)
      .withColumnRenamed("p_partkey", "part_id")
      .withColumnRenamed("p_brand", "brand")
      .withColumn("size", col("p_size"))
      .drop("p_name", "p_type", "p_retailprice", "p_size")
      .select("part_id", "brand", "size")
      .orderBy("part_id")
  }

  /** F1: sentinel inequality filter (`Contract != '0'` analog; SQL 3VL
    * would also drop NULLs — semantics preserved). */
  val f1FilterSentinel = Q(
    "q_f1_filter_sentinel",
    """SELECT o_orderstatus, count(*) AS n
      |FROM orders WHERE o_orderstatus <> 'F'
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus") =!= "F")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  // ----------------------------------------------------------------- aggs

  /** A2 flagship: TPC-H-Q1-shaped multi-aggregate. Exact decimal math
    * internally so partial/final hash-agg order can't perturb the result;
    * the FINAL columns are cast to DOUBLE on both engines (identical exact
    * decimals → identical float64 bits), because the two engines render
    * decimal values differently and would hash-mismatch on repr alone. */
  val q1Agg = Q(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(dec)).cast(dec).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast(dec).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
          .cast("decimal(18,4)").cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A3: exact distinct count (reference `countDistinct("Date")` at
    * ETL_customer_interaction.py:50). The 100 TB path swaps in
    * `approx_count_distinct` (HLL) behind the same call site. */
  val a3CountDistinct = Q(
    "q_a3_count_distinct",
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"), count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Distinct event types in `events` — pinned so pivots below can pass an
    * explicit value list (SURVEY §2.4 A4: value-less pivot = extra distinct
    * job + data-dependent schema). */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** A4 + C10: pivot with explicit values, then fill 0 (Spark's pivot-count
    * yields NULL for absent cells; the reference's fillna at
    * ETL_customer_interaction.py:69,94 is load-bearing). */
  val a4PivotCount = Q(
    "q_a4_pivot_count",
    """SELECT user_id,
      |  count(*) FILTER (WHERE event_type = 'click')    AS click,
      |  count(*) FILTER (WHERE event_type = 'error')    AS error,
      |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  count(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |  count(*) FILTER (WHERE event_type = 'view')     AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .count()
      .na.fill(0, EventTypes)
      .orderBy("user_id")
  }

  /** A4 variant: pivot-sum over exact decimals; final cells cast to
    * DOUBLE on both engines (decimal repr differs across engines). */
  val a4PivotSum = Q(
    "q_a4_pivot_sum",
    """SELECT user_id,
      |  CAST(COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click')    AS DECIMAL(18,2)), 0) AS DOUBLE) AS click,
      |  CAST(COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'error')    AS DECIMAL(18,2)), 0) AS DOUBLE) AS error,
      |  CAST(COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DECIMAL(18,2)), 0) AS DOUBLE) AS purchase,
      |  CAST(COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'signup')   AS DECIMAL(18,2)), 0) AS DOUBLE) AS signup,
      |  CAST(COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'view')     AS DECIMAL(18,2)), 0) AS DOUBLE) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(sum(col("value").cast(dec)).cast(dec))
      .na.fill(0, EventTypes)
      .select(col("user_id") +: EventTypes.map(t => col(t).cast("double").as(t)): _*)
      .orderBy("user_id")
  }

  // -------------------------------------------------------------- windows

  /** W1+F3: deterministic top-1 per group (rank==1 after `row_number` with
    * an explicit tie-break — the fix for SURVEY §2.5 W1). */
  val w1TopkPerGroup = Q(
    "q_w1_topk_per_group",
    """SELECT user_id, event_type AS top_type, n FROM (
      |  SELECT user_id, event_type, n,
      |    row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rnk
      |  FROM (SELECT user_id, event_type, count(*) AS n
      |        FROM events GROUP BY user_id, event_type)
      |) WHERE rnk = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    val counts = Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("user_id").orderBy(col("n").desc, col("event_type"))
    counts
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("user_id"), col("event_type").as("top_type"), col("n"))
      .orderBy("user_id")
  }

  /** Aggregate-over-window: per-user running decimal total in event order. */
  val w2RunningSum = Q(
    "q_w2_running_sum",
    """SELECT event_id, user_id,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS running_total
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        sum(col("value").cast(dec)).over(w).cast(dec).cast("double").as("running_total"))
      .orderBy("event_id")
  }

  /** lag/lead analytics: inter-event gap per user in milliseconds. */
  val w3LagDelta = Q(
    "q_w3_lag_delta",
    """SELECT event_id, user_id,
      |  epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"),
        (unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(w)).as("gap_ms"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- joins

  /** J1: inner equi-join then aggregate. The customer side is the
    * smaller relation but SF-PROPORTIONAL (1.5M rows/TPC-H-SF), so it
    * carries no static broadcast hint — AQE broadcasts it while it
    * measures small and shuffles both sides on the key past the cap
    * (a pinned hint fails hard at 8 GB instead; r15 verdict item 2). */
  val j1JoinUsing = Q(
    "q_j1_join_using",
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(dec)).cast(dec).as("total"))
      .orderBy("c_mktsegment")
  }

  /** Multi-way star join (TPC-H-Q5-shaped): fact table joined through
    * the dimension chain; revenue in exact decimals. nation (25 rows)
    * and region (5) are schema-bounded at every SF, so their broadcast
    * hints are honest; customer is SF-proportional and stays unhinted
    * (AQE broadcasts it at small SF, demotes past the cap). */
  val joinStar = Q(
    "q_join_star",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey  = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(
        sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
          .cast("decimal(18,4)").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Left-semi join (EXISTS): orders containing any max-quantity line. */
  val semiJoin = Q(
    "q_semi_join",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 50)
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 50)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no pending order. */
  val antiJoin = Q(
    "q_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-outer join keeping zero-order customers (COALESCE over the null
    * side — C10 family). */
  val leftOuterJoin = Q(
    "q_left_outer_join",
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      |  CAST(COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)), 0) AS DOUBLE) AS total
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast(dec)).cast(dec), lit(0).cast(dec))
          .cast("double").as("total"))
      .orderBy("c_custkey")
  }

  /** Full-outer join with genuinely unmatched rows on BOTH sides:
    * per-customer open-order counts vs finished-order counts — a
    * customer with only open or only finished orders appears on exactly
    * one side. The coalesced key + zero-filled counts are the canonical
    * full-outer reconciliation shape. */
  val fullOuterJoin = Q(
    "q_full_outer_join",
    """SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
      |  CAST(COALESCE(n_open, 0) AS BIGINT) AS n_open,
      |  CAST(COALESCE(n_fin, 0) AS BIGINT) AS n_fin
      |FROM (SELECT o_custkey, count(*) AS n_open FROM orders
      |      WHERE o_orderstatus = 'O' GROUP BY o_custkey) a
      |FULL JOIN (SELECT o_custkey, count(*) AS n_fin FROM orders
      |           WHERE o_orderstatus = 'F' GROUP BY o_custkey) b
      |  ON a.o_custkey = b.o_custkey
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val open = o.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("ck_a"))
      .agg(count(lit(1)).as("n_open"))
    val fin = o.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("ck_b"))
      .agg(count(lit(1)).as("n_fin"))
    open.join(fin, col("ck_a") === col("ck_b"), "full")
      .select(
        coalesce(col("ck_a"), col("ck_b")).as("custkey"),
        coalesce(col("n_open"), lit(0L)).as("n_open"),
        coalesce(col("n_fin"), lit(0L)).as("n_fin"))
      .orderBy("custkey")
  }

  /** Unpivot (melt): wide per-flag aggregates back to long
    * (metric, value) form — the inverse of the pivot operator, via
    * Spark's native `Dataset.unpivot` (oracle = UNION ALL re-longing).
    * Values go through exact decimal sums before one final DOUBLE
    * cast, per the engine's hash-stability rule. */
  val unpivotMetrics = Q(
    "q_unpivot",
    """WITH t AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, metric, value FROM (
      |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM t
      |  UNION ALL
      |  SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM t
      |) ORDER BY l_returnflag, metric""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_price"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")),
        "metric", "value")
      .orderBy("l_returnflag", "metric")
  }

  // -------------------------------------------------------------- set ops

  /** U1/U2: union-all of two homogeneous slices (by name, like the
    * reference's unionByName at ETL_customer_interaction.py:92). */
  val u1UnionAll = Q(
    "q_u1_union_all",
    """SELECT src, count(*) AS n FROM (
      |  SELECT 'open'     AS src FROM orders WHERE o_orderstatus = 'O'
      |  UNION ALL
      |  SELECT 'finished' AS src FROM orders WHERE o_orderstatus = 'F'
      |) GROUP BY src ORDER BY src""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val open = o.filter(col("o_orderstatus") === "O").select(lit("open").as("src"))
    val fin  = o.filter(col("o_orderstatus") === "F").select(lit("finished").as("src"))
    open.unionByName(fin)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .orderBy("src")
  }

  /** INTERSECT (distinct set semantics on both engines). */
  val setIntersect = Q(
    "q_set_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  /** EXCEPT (distinct set semantics). */
  val setExcept = Q(
    "q_set_except",
    """SELECT n_nationkey AS nationkey FROM nation
      |EXCEPT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin) { (s, d) =>
    Tables.nation(s, d).select(col("n_nationkey").as("nationkey"))
      .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  // ------------------------------------------------------ sorts / limits

  /** O2 fixed: limit WITH a total order (the reference's bare
    * `limit(10000)` at ETL_customer_behavior.py:33 samples arbitrary rows). */
  val o2SortLimit = Q(
    "q_o2_sort_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
  }

  // ------------------------------------------------- grouping extensions

  /** ROLLUP + GROUPING (superset of the reference's plain groupBy —
    * exposed because Catalyst gives it for free). */
  val rollup = Q(
    "q_rollup",
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
           (grouping(col("l_returnflag")) + lit(2) * grouping(col("l_linestatus"))).as("gid"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }
}
