package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.sources.GraftSql

/** Surface-completion queries: the full pipeline-A composition on the
  * synthetic tables, skew-salted aggregation, the SQL-text layer (one
  * string runs on both engines), the extended window-function suite,
  * ordered collections, and interpolated percentiles. */
object ExtraQueries {

  private val dec = "decimal(18,2)"

  /** The whole Customer360 engagement profile (pipeline A end to end) on
    * `events`: explicit-value pivot sums → fill 0 → distinct active days
    * → priority argmax → null-skipping taste → activeness bands. One
    * query exercising A2+A3+A4+C2+C3+C4+C5+C10 together. */
  val engagementFull = {
    val types = CoreQueries.EventTypes // click, error, purchase, signup, view
    val priority = Seq("view", "click", "purchase", "signup", "error")
    def tot(t: String) = s"total_$t"
    val sqlTotals = types.map(t =>
      s"""COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2)))
         |  FILTER (WHERE event_type = '$t') AS DECIMAL(18,2)), 0) AS total_$t""".stripMargin)
      .mkString(",\n  ")
    val sqlChain = priority.init.map(t =>
      s"WHEN best = total_$t THEN '$t'").mkString(" ")
    val sqlTaste = types.map(t =>
      s"CASE WHEN total_$t > 0 THEN '$t' END").mkString(", ")
    Q(
      "q_engagement_full",
      s"""SELECT user_id, ${types.map(t => s"CAST(${tot(t)} AS DOUBLE) AS ${tot(t)}").mkString(", ")}, active,
         |  CASE $sqlChain ELSE '${priority.last}' END AS most_active,
         |  concat_ws('-', $sqlTaste) AS taste,
         |  CASE WHEN active > 27 THEN 'High'
         |       WHEN active BETWEEN 25 AND 27 THEN 'Medium'
         |       ELSE 'Low' END AS level_activeness
         |FROM (
         |  SELECT user_id, $sqlTotals,
         |    count(DISTINCT date_trunc('day', ts)) AS active,
         |    greatest(${types.map(t => s"COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = '$t') AS DECIMAL(18,2)), 0)").mkString(", ")}) AS best
         |  FROM events GROUP BY user_id
         |) ORDER BY user_id""".stripMargin) { (s, d) =>
      // one scan, one shuffle: conditional sums play the pivot (the
      // dedicated pivot operator is covered by q_a4_*; composing it here
      // would scan events twice and add a join)
      val condSums = types.map(t =>
        coalesce(sum(when(col("event_type") === t, col("value").cast(dec))).cast(dec),
                 lit(0).cast(dec)).as(tot(t)))
      val renamed = Tables.events(s, d)
        .groupBy("user_id")
        .agg(condSums.head,
             condSums.tail :+ countDistinct(date_trunc("day", col("ts"))).as("active"): _*)
      val best = greatest(priority.map(t => col(tot(t))): _*)
      val mostActive = priority.init.foldRight(lit(priority.last)) { (t, rest) =>
        when(best === col(tot(t)), t).otherwise(rest)
      }
      renamed
        .withColumn("most_active", mostActive)
        .withColumn("taste",
          concat_ws("-", types.map(t => when(col(tot(t)) > 0, lit(t))): _*))
        .withColumn("level_activeness",
          when(col("active") > 27, "High")
            .when(col("active").between(25, 27), "Medium")
            .otherwise("Low"))
        .select(col("user_id") +:
                types.map(t => col(tot(t)).cast("double").as(tot(t))) :+ col("active") :+
                col("most_active") :+ col("taste") :+ col("level_activeness"): _*)
        .orderBy("user_id")
    }
  }

  /** Skew-salted two-stage aggregation — result identical to the plain
    * groupBy (the oracle), only the shuffle layout differs. */
  val saltedAgg = Q(
    "q_salted_agg",
    """SELECT event_type, count(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    Salting
      .saltedCountSum(Tables.events(s, d), "event_type", "event_id",
                      col("value").cast(dec), nSalts = 16)
      .select(col("event_type"), col("n"), col("total").cast(dec).cast("double").as("total"))
      .orderBy("event_type")
  }

  /** Skew-salted fact↔dim equi-join: events.user_id is 15 distinct
    * values over 32 shuffle partitions — the textbook hot-key join.
    * [[Salting.saltedJoin]] spreads each key over 8 salt lanes; the
    * merge hint forces the sort-merge (shuffled) path so the salted
    * layout is what actually executes — with broadcast the salt would
    * be a no-op, and at 100 TB the dim that matters is the one too big
    * to broadcast. Result identical to the plain join (the oracle). */
  val skewJoinSalted = Q(
    "q_skew_join_salted",
    """SELECT c_mktsegment, count(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val dim = Tables.customer(s, d)
      .select("c_custkey", "c_mktsegment").hint("merge")
    Salting
      .saltedJoin(Tables.events(s, d), "user_id", "event_id", dim, "c_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("_t"))
      .select(col("c_mktsegment"), col("n"),
              col("_t").cast(dec).cast("double").as("total"))
      .orderBy("c_mktsegment")
  }

  /** Equi-width histogram of events.value over 20 buckets sized from
    * the observed [min, max] — the one-pass profile step before
    * binning features or choosing sketch params. Two scans (bounds,
    * then bucketing against the ONE-row bounds frame broadcast onto
    * the scan — the q_ann_int8 stats-frame pattern); float bucket
    * arithmetic is written operation-for-operation identically in both
    * engines, so the bucket ids are IEEE-exact. */
  val histogram = Q(
    "q_histogram",
    """WITH b AS (
      |  SELECT min(value) AS lo, (max(value) - min(value)) / 20.0 AS width
      |  FROM events WHERE value IS NOT NULL
      |)
      |SELECT LEAST(CAST(FLOOR((value - lo) / width) AS INT), 19) AS bucket,
      |  count(*) AS n, min(value) AS v_min, max(value) AS v_max
      |FROM events, b WHERE value IS NOT NULL
      |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).filter(col("value").isNotNull)
    val bounds = ev.agg(min("value").as("lo"), max("value").as("hi"))
      .select(col("lo"), ((col("hi") - col("lo")) / lit(20.0)).as("width"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(floor((col("value") - col("lo")) / col("width")).cast("int"),
              lit(19)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
           min("value").as("v_min"), max("value").as("v_max"))
      .orderBy("bucket")
  }

  /** SQL-text layer: this exact string runs on Spark (via temp views)
    * AND on DuckDB — one dialect-neutral source of truth. */
  private val q3Sql =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val sqlLayer = Q("q_sql_layer", q3Sql) { (s, d) => GraftSql.run(s, d, q3Sql) }

  /** GROUPING SETS through the SQL layer (same text both engines). */
  private val gsSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  val groupingSets = Q("q_grouping_sets", gsSql) { (s, d) => GraftSql.run(s, d, gsSql) }

  /** Extended ranking-window suite: rank / dense_rank / ntile / lead /
    * first & last value with explicit frames, over a total order. */
  val windowSuite = Q(
    "q_window_suite",
    """SELECT o_custkey, o_orderkey,
      |  rank()       OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  ntile(4)     OVER w AS quartile,
      |  lead(o_orderkey) OVER w AS next_order,
      |  first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |                                AND UNBOUNDED FOLLOWING) AS biggest,
      |  last_value(o_orderkey)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |                                AND UNBOUNDED FOLLOWING) AS smallest
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        first_value(col("o_orderkey")).over(wFull).as("biggest"),
        last_value(col("o_orderkey")).over(wFull).as("smallest"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Shipping-priority revenue top-10 — the classic three-table
    * fact/dim join profile (TPC-H Q3 shape) over the synthetic tables,
    * here as the flagship MULTI-JOIN plan audit: the filtered
    * `customer` dim is broadcast (AQE sizes it), `orders`×`lineitem`
    * shuffle on the order key, revenue accumulates in exact DECIMAL
    * (the q1_agg convention — double sums would be merge-order
    * noise), and the top-10 is a TakeOrderedAndProject, never a global
    * sort. Deterministic: revenue is a decimal→double exact value and
    * ties break by order key, so both engines pick the same 10 rows. */
  val topRevenue = Q(
    "q_top_revenue",
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * (1 - CAST(l_discount AS DECIMAL(18,2))))
      |       AS DECIMAL(18,4)) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate  > TIMESTAMP '1998-06-01'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    val dec = "decimal(18,2)"
    val cut = lit("1998-06-01").cast("timestamp")
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < cut),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cut),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(col("l_extendedprice").cast(dec)
          * (lit(1) - col("l_discount").cast(dec)))
        .cast("decimal(18,4)").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Distribution-position window functions completing [[windowSuite]]:
    * percent_rank, cume_dist, nth_value. The two ratios are a single
    * small-integer division ((rank-1)/(n-1), rows≤current/n) — the same
    * IEEE op on both engines, so bits match; nth_value's frame is
    * pinned to ROWS UNBOUNDED-PRECEDING..CURRENT explicitly (the ANSI
    * default, spelled out so neither engine's shorthand can drift), and
    * the ORDER BY is total (price ties broken by key), so peer groups
    * are single rows. */
  val windowDist = Q(
    "q_window_dist",
    """SELECT o_custkey, o_orderkey,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist()    OVER w AS cume,
      |  nth_value(o_orderkey, 2) OVER
      |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_best
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        nth_value(col("o_orderkey"), 2).over(wRows).as("second_best"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Ordered collection aggregate (sorted set per group). The collection
    * is rendered as a '|'-joined string on BOTH engines: the verification
    * harness can't sort/hash list-typed cells, and a delimited rendering
    * of a sorted set is lossless for comparison. */
  val collectSorted = Q(
    "q_collect_sorted",
    """SELECT l_returnflag,
      |  array_to_string(list_sort(list(DISTINCT l_linestatus)), '|') AS statuses,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        array_join(sort_array(collect_set(col("l_linestatus"))), "|").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Per-group top-1 via the typed Aggregator (bounded partial buffers,
    * pure hash-agg — no per-group sort shuffle). Same contract and same
    * oracle as the window-function form (q_w1_topk_per_group). */
  val topkAggregator = Q(
    "q_topk_aggregator",
    """SELECT user_id, event_type AS top_type, n FROM (
      |  SELECT user_id, event_type, n,
      |    row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rnk
      |  FROM (SELECT user_id, event_type, count(*) AS n
      |        FROM events GROUP BY user_id, event_type)
      |) WHERE rnk = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val agg = graft.functions.TopKAggregator.topKByCount(1).toColumn
    Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .select(col("user_id").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)]
      .map { case (u, k, n) => (u, (k, n)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("top"))
      .map { case (u, top) => (u.toLong, top.head._1, top.head._2) }
      .toDF("user_id", "top_type", "n")
      .orderBy("user_id")
  }

  /** Frequent-items sketch (approximate heavy hitters) over the word
    * stream — deterministic only up to partitioning, hence rows-only. */
  val freqItems = Q.rowsOnly("q_freq_items") { (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .stat.freqItems(Seq("word"), 0.05)
  }

  /** Scalar-function suite beyond the reference's C1–C11: string ops,
    * date parts, null handling — the common ANSI surface users expect. */
  val scalarSuite = Q(
    "q_scalar_suite",
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_uc,
      |  substr(p_name, 1, 8) AS name_prefix,
      |  replace(p_type, ' ', '_') AS type_id,
      |  length(p_name) AS name_len,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
      |  COALESCE(NULLIF(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other,
      |  least(p_size, 25) AS size_capped,
      |  CAST(p_size % 7 AS INTEGER) AS size_mod
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        regexp_replace(col("p_type"), " ", "_").as("type_id"),
        length(col("p_name")).as("name_len"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
        coalesce(nullif(col("p_brand"), lit("Brand#1")), lit("OTHER")).as("brand_or_other"),
        least(col("p_size"), lit(25)).as("size_capped"),
        (col("p_size") % 7).cast("int").as("size_mod"))
      .orderBy("p_partkey")
  }

  /** Date-part extraction suite (year/month/day/quarter + truncation). */
  val dateSuite = Q(
    "q_date_suite",
    """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
      |  quarter(o_orderdate) AS q, day(o_orderdate) AS d,
      |  count(*) AS n
      |FROM orders GROUP BY 1, 2, 3, 4 ORDER BY y, m, q, d""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
        quarter(col("o_orderdate")).as("q"), dayofmonth(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"))
      .orderBy("y", "m", "q", "d")
  }

  /** CUBE (all grouping combinations — complements rollup). */
  val cube2d = Q(
    "q_cube",
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Shared oracle CTEs for the as-of family: purchases as the left
    * side, clicks deduplicated per (user, instant) to the greatest
    * event_id — DuckDB's ASOF leaves the duplicate choice unspecified,
    * so both engines pin it identically (AsOfJoin dedups the same way). */
  private val asofCtes =
    """p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
      |     c AS (SELECT user_id, click_id, click_ts FROM (
      |             SELECT user_id, event_id AS click_id, ts AS click_ts,
      |               row_number() OVER (PARTITION BY user_id, ts
      |                                  ORDER BY event_id DESC) AS rn
      |             FROM events WHERE event_type = 'click') WHERE rn = 1)""".stripMargin

  private def asofInputs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"))
    (purchases, clicks)
  }

  /** Backward as-of join: each purchase matched to the user's most
    * recent prior (or simultaneous) click. Oracle = DuckDB's native
    * ASOF JOIN; the Spark side is graft.operators.AsOfJoin (one
    * window pass, no range explosion). */
  val asofJoin = Q(
    "q_asof_join",
    s"""WITH $asofCtes
      |SELECT p.event_id, p.user_id, c.click_id,
      |  epoch_ms(p.ts) - epoch_ms(c.click_ts) AS gap_ms
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val (purchases, clicks) = asofInputs(s, d)
    AsOfJoin.backward(purchases, clicks, "user_id", "ts", "click_ts",
                      Seq("click_id", "click_ts"))
      .select(
        col("event_id"), col("user_id"), col("click_id"),
        (unix_millis(col("ts")) - unix_millis(col("click_ts"))).as("gap_ms"))
      .orderBy("event_id")
  }

  /** Forward as-of join: each purchase matched to the user's next
    * (or simultaneous) click. */
  val asofForward = Q(
    "q_asof_forward",
    s"""WITH $asofCtes
      |SELECT p.event_id, p.user_id, c.click_id,
      |  epoch_ms(c.click_ts) - epoch_ms(p.ts) AS gap_ms
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts <= c.click_ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val (purchases, clicks) = asofInputs(s, d)
    AsOfJoin.forward(purchases, clicks, "user_id", "ts", "click_ts",
                     Seq("click_id", "click_ts"))
      .select(
        col("event_id"), col("user_id"), col("click_id"),
        (unix_millis(col("click_ts")) - unix_millis(col("ts"))).as("gap_ms"))
      .orderBy("event_id")
  }

  /** Nearest as-of join: the closer of the backward/forward matches
    * (microsecond-exact comparison, ties → backward). gap_ms is signed:
    * positive when the click preceded the purchase. */
  val asofNearest = Q(
    "q_asof_nearest",
    s"""WITH $asofCtes,
      |b AS (SELECT p.event_id, p.user_id, p.ts, c.click_id AS b_id, c.click_ts AS b_ts
      |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.click_ts),
      |f AS (SELECT p.event_id, c.click_id AS f_id, c.click_ts AS f_ts
      |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.click_ts)
      |SELECT b.event_id, b.user_id,
      |  CASE WHEN b_id IS NULL THEN f_id
      |       WHEN f_id IS NULL THEN b_id
      |       WHEN epoch_us(b.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(b.ts)
      |         THEN b_id ELSE f_id END AS click_id,
      |  CASE WHEN b_id IS NULL THEN epoch_ms(b.ts) - epoch_ms(f_ts)
      |       WHEN f_id IS NULL THEN epoch_ms(b.ts) - epoch_ms(b_ts)
      |       WHEN epoch_us(b.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(b.ts)
      |         THEN epoch_ms(b.ts) - epoch_ms(b_ts)
      |       ELSE epoch_ms(b.ts) - epoch_ms(f_ts) END AS gap_ms
      |FROM b JOIN f USING (event_id)
      |ORDER BY b.event_id""".stripMargin) { (s, d) =>
    val (purchases, clicks) = asofInputs(s, d)
    AsOfJoin.nearest(purchases, clicks, "user_id", "ts", "click_ts",
                     Seq("click_id", "click_ts"))
      .select(
        col("event_id"), col("user_id"), col("click_id"),
        (unix_millis(col("ts")) - unix_millis(col("click_ts"))).as("gap_ms"))
      .orderBy("event_id")
  }

  /** Backward as-of join with a 24-hour attribution window (the
    * `maxGap` dial): a click more than a day before the purchase no
    * longer attributes — its match columns null out, exactly as if no
    * click qualified. The carried match is always the nearest prior
    * one, so the gate is a map-only projection on top of the same
    * one-shuffle window pass. Oracle = DuckDB ASOF + the identical gap
    * predicate. */
  val asofTolerance = Q(
    "q_asof_tolerance",
    s"""WITH $asofCtes
      |SELECT p.event_id, p.user_id,
      |  CASE WHEN epoch_us(p.ts) - epoch_us(c.click_ts) <= 86400000000
      |       THEN c.click_id END AS click_id,
      |  CASE WHEN epoch_us(p.ts) - epoch_us(c.click_ts) <= 86400000000
      |       THEN epoch_ms(p.ts) - epoch_ms(c.click_ts) END AS gap_ms
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val (purchases, clicks) = asofInputs(s, d)
    AsOfJoin.backward(purchases, clicks, "user_id", "ts", "click_ts",
                      Seq("click_id", "click_ts"),
                      maxGap = Some(86400000000L)) // 24 h in µs
      .select(
        col("event_id"), col("user_id"), col("click_id"),
        (unix_millis(col("ts")) - unix_millis(col("click_ts"))).as("gap_ms"))
      .orderBy("event_id")
  }

  /** Sliding 2-hour windows advancing hourly — each event lands in two
    * windows (Spark's native window(); oracle unnests both candidate
    * window starts). */
  val slidingWindow = Q(
    "q_window_sliding",
    """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
      |  count(*) AS n
      |FROM (
      |  SELECT unnest([date_trunc('hour', ts),
      |                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
      |         event_type
      |  FROM events
      |) GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))
      .orderBy("window_start", "event_type")
  }

  /** Regex extraction + null-safe equality (IS NOT DISTINCT FROM /
    * Spark's <=>): group keys that may be NULL compare as values. */
  val regexpNullSafe = Q(
    "q_regexp_nullsafe",
    """SELECT id_digits, count(*) AS n,
      |  count(*) FILTER (WHERE id_digits IS NOT DISTINCT FROM NULL) AS n_null
      |FROM (
      |  SELECT NULLIF(regexp_extract(c_name, '([0-9]+)', 1), '') AS id_digits
      |  FROM customer
      |) GROUP BY id_digits ORDER BY id_digits NULLS FIRST LIMIT 30""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(nullif(regexp_extract(col("c_name"), "([0-9]+)", 1), lit("")).as("id_digits"))
      .groupBy("id_digits")
      .agg(count(lit(1)).as("n"),
           count(when(col("id_digits") <=> lit(null), 1)).as("n_null"))
      .orderBy(col("id_digits").asc_nulls_first)
      .limit(30)
  }

  /** SURVEY §2.11 dashboard layer: per-activeness-segment rollup of the
    * engagement profile (user counts, exact totals, hours as a derived
    * double over the exact decimal — deterministic division). */
  val analyticsSegments = Q(
    "q_analytics_segments",
    """SELECT level_activeness, count(*) AS n_users,
      |  CAST(SUM(total) AS DECIMAL(18,2)) AS total_value,
      |  CAST(SUM(total) AS DOUBLE) / 3600 AS value_hours
      |FROM (
      |  SELECT user_id,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total,
      |    CASE WHEN count(DISTINCT date_trunc('day', ts)) > 27 THEN 'High'
      |         WHEN count(DISTINCT date_trunc('day', ts)) BETWEEN 25 AND 27 THEN 'Medium'
      |         ELSE 'Low' END AS level_activeness
      |  FROM events GROUP BY user_id
      |) GROUP BY level_activeness ORDER BY level_activeness""".stripMargin) { (s, d) =>
    val profile = Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        sum(col("value").cast(dec)).cast(dec).as("total"),
        countDistinct(date_trunc("day", col("ts"))).as("active"))
      .withColumn("level_activeness",
        when(col("active") > 27, "High")
          .when(col("active").between(25, 27), "Medium")
          .otherwise("Low"))
    profile
      .groupBy("level_activeness")
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("total")).cast(dec).as("total_value"),
        (sum(col("total")).cast("double") / 3600).as("value_hours"))
      .orderBy("level_activeness")
  }

  /** Date-range predicate join: lineitems shipped within 30 days of
    * their order, per month — equi-join + day-difference filter. */
  val rangeJoin = Q(
    "q_range_join",
    """SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |  count(*) AS n_items,
      |  count(*) FILTER (WHERE date_diff('day', CAST(o_orderdate AS DATE),
      |                                   CAST(l_shipdate AS DATE)) <= 30) AS shipped_30d
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY month""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        count(lit(1)).as("n_items"),
        count(when(datediff(col("l_shipdate"), col("o_orderdate")) <= 30, 1))
          .as("shipped_30d"))
      .orderBy("month")
  }

  /** Statistical aggregate surface (stddev/variance/correlation/skew/
    * exact percentiles), HASH-EXACT (round-10 verdict item 3: this was
    * the one rows-only member whose inputs are exact scaled decimals).
    *
    * The float trap was never the math, it was the AGGREGATION: float
    * partial-merge order differs between engines, so `stddev_samp`
    * over doubles has no cross-engine hash. The fix is the
    * `q_text_surprisal`/`q_mixture_weights` discipline: every SUM runs
    * in exact integer space (price → cents, discount → percent,
    * quantity is already integral — all order-independent BIGINTs),
    * and the derived statistics are a fixed DAG of IEEE
    * correctly-rounded double ops (+ − × ÷ sqrt, identical
    * parenthesization on both engines) over those exact sums, floored
    * to scaled BIGINTs. Σp² would overflow both long and the 2^53
    * double-exact range at scale, so it is summed in SPLIT form
    * (p = a·10⁴ + b → Σa², Σab, Σb², each an exact long even at sf1)
    * and recombined in the deterministic double DAG. Percentiles are
    * exact order statistics (value at rank ceil(q·n)), not
    * interpolations — integer logic end to end. StatsSuiteSpec pins
    * the derived values against Spark's own stddev_samp / var_samp /
    * corr / skewness builtins, so the builtin surface stays covered
    * while the registry row is oracle-checked. */
  val statsSuite = Q(
    "q_stats_suite",
    """WITH b AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p,
      |    CAST(l_quantity AS BIGINT) AS q,
      |    CAST(round(l_discount * 100, 0) AS BIGINT) AS dsc
      |  FROM lineitem
      |), m AS (
      |  SELECT flag, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(p) AS BIGINT) AS sp,
      |    CAST(sum((p // 10000) * (p // 10000)) AS BIGINT) AS saa,
      |    CAST(sum((p // 10000) * (p % 10000)) AS BIGINT) AS sab,
      |    CAST(sum((p % 10000) * (p % 10000)) AS BIGINT) AS sbb,
      |    CAST(sum(q) AS BIGINT) AS sq,
      |    CAST(sum(q * q) AS BIGINT) AS sq2,
      |    CAST(sum(q * p) AS BIGINT) AS sqp,
      |    CAST(sum(dsc) AS BIGINT) AS sd1,
      |    CAST(sum(dsc * dsc) AS BIGINT) AS sd2,
      |    CAST(sum(dsc * dsc * dsc) AS BIGINT) AS sd3
      |  FROM b GROUP BY flag
      |), r AS (
      |  SELECT flag, p,
      |    row_number() OVER (PARTITION BY flag ORDER BY p) AS rn,
      |    count(*) OVER (PARTITION BY flag) AS ng
      |  FROM b
      |), qs AS (
      |  SELECT flag,
      |    max(CASE WHEN rn = CAST(ceil(ng * 0.5) AS BIGINT) THEN p END) AS p50_cents,
      |    max(CASE WHEN rn = CAST(ceil(ng * 0.95) AS BIGINT) THEN p END) AS p95_cents
      |  FROM r GROUP BY flag
      |)
      |SELECT m.flag AS l_returnflag, m.n,
      |  CAST(floor(sqrt(
      |    ((((100000000.0 * CAST(saa AS DOUBLE)) + (20000.0 * CAST(sab AS DOUBLE))) + CAST(sbb AS DOUBLE))
      |      - ((CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) / CAST(n AS DOUBLE)))
      |    / (CAST(n AS DOUBLE) - 1.0))) AS BIGINT) AS sd_price_cents,
      |  CAST(floor(10000.0 * (
      |    (CAST(sq2 AS DOUBLE) - ((CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) / CAST(n AS DOUBLE)))
      |    / (CAST(n AS DOUBLE) - 1.0))) AS BIGINT) AS var_qty_e4,
      |  CAST(floor(1000000.0 * (
      |    ((CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)) - (CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)))
      |    / (sqrt((CAST(n AS DOUBLE) * CAST(sq2 AS DOUBLE)) - (CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)))
      |       * sqrt((CAST(n AS DOUBLE) * (((100000000.0 * CAST(saa AS DOUBLE)) + (20000.0 * CAST(sab AS DOUBLE))) + CAST(sbb AS DOUBLE)))
      |              - (CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))))) AS BIGINT) AS corr_ppm,
      |  CAST(floor(1000000.0 * (
      |    (((CAST(sd3 AS DOUBLE) / CAST(n AS DOUBLE))
      |       - ((3.0 * (CAST(sd1 AS DOUBLE) / CAST(n AS DOUBLE))) * (CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE))))
      |      + (((2.0 * (CAST(sd1 AS DOUBLE) / CAST(n AS DOUBLE))) * (CAST(sd1 AS DOUBLE) / CAST(n AS DOUBLE))) * (CAST(sd1 AS DOUBLE) / CAST(n AS DOUBLE))))
      |    / (((CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE))
      |         - ((CAST(sd1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sd1 AS DOUBLE) / CAST(n AS DOUBLE))))
      |       * sqrt((CAST(sd2 AS DOUBLE) / CAST(n AS DOUBLE))
      |              - ((CAST(sd1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sd1 AS DOUBLE) / CAST(n AS DOUBLE))))))) AS BIGINT) AS skew_ppm,
      |  qs.p50_cents, qs.p95_cents
      |FROM m JOIN qs ON m.flag = qs.flag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val base = Tables.lineitem(s, d).select(
      col("l_returnflag").as("flag"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("p"),
      col("l_quantity").cast("long").as("q"),
      round(col("l_discount") * 100, 0).cast("long").as("dsc"))
    val a = (col("p") / 10000).cast("long") // p ≥ 0: floor == truncate
    val bb = pmod(col("p"), lit(10000L))
    // ONE pass: the rank windows and the moment sums are both keyed by
    // flag, so they share a single exchange (guide §2.4 — a window
    // followed by a groupBy on its own partition key needs no second
    // shuffle); previously `base` was scanned and shuffled twice and
    // the two halves re-joined. Exact order-statistic percentiles:
    // rank ceil(q·n) under a value-ordered row_number — tie assignment
    // is arbitrary but the value AT any rank inside a tie run is
    // unique, so deterministic.
    val wRank = Window.partitionBy("flag").orderBy("p")
    val wAll = Window.partitionBy("flag")
    val stats = base
      .withColumn("rn", row_number().over(wRank))
      .withColumn("ng", count(lit(1)).over(wAll))
      .groupBy("flag").agg(
        count(lit(1)).as("n"),
        sum(col("p")).as("sp"),
        sum(a * a).as("saa"),
        sum(a * bb).as("sab"),
        sum(bb * bb).as("sbb"),
        sum(col("q")).as("sq"),
        sum(col("q") * col("q")).as("sq2"),
        sum(col("q") * col("p")).as("sqp"),
        sum(col("dsc")).as("sd1"),
        sum(col("dsc") * col("dsc")).as("sd2"),
        sum(col("dsc") * col("dsc") * col("dsc")).as("sd3"),
        max(when(col("rn") === ceil(col("ng") * 0.5), col("p"))).as("p50_cents"),
        max(when(col("rn") === ceil(col("ng") * 0.95), col("p"))).as("p95_cents"))
    // deterministic double DAG over the exact sums — parenthesization
    // mirrors the oracle SQL token for token
    def D(c: String) = col(c).cast("double")
    val nD = D("n")
    val sp2d = ((lit(100000000.0) * D("saa")) + (lit(20000.0) * D("sab"))) + D("sbb")
    val varP = (sp2d - ((D("sp") * D("sp")) / nD)) / (nD - lit(1.0))
    val varQ = (D("sq2") - ((D("sq") * D("sq")) / nD)) / (nD - lit(1.0))
    val corrN = (nD * D("sqp")) - (D("sq") * D("sp"))
    val corrD = sqrt((nD * D("sq2")) - (D("sq") * D("sq"))) *
      sqrt((nD * sp2d) - (D("sp") * D("sp")))
    val muD = D("sd1") / nD
    val m2 = (D("sd2") / nD) - (muD * muD)
    val m3 = ((D("sd3") / nD) - ((lit(3.0) * muD) * (D("sd2") / nD))) +
      (((lit(2.0) * muD) * muD) * muD)
    stats
      .select(
        col("flag").as("l_returnflag"),
        col("n"),
        floor(sqrt(varP)).cast("long").as("sd_price_cents"),
        floor(lit(10000.0) * varQ).cast("long").as("var_qty_e4"),
        floor(lit(1000000.0) * (corrN / corrD)).cast("long").as("corr_ppm"),
        floor(lit(1000000.0) * (m3 / (m2 * sqrt(m2)))).cast("long").as("skew_ppm"),
        col("p50_cents"), col("p95_cents"))
      .orderBy("l_returnflag")
  }

  /** Interpolated median (percentile_cont semantics): order-insensitive
    * (computed from fully sorted values), so cross-engine deterministic. */
  val medianAgg = Q(
    "q_median",
    """SELECT l_returnflag,
      |  median(l_quantity) AS med_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(median(col("l_quantity")).as("med_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Grouped mode with a DETERMINISTIC tie-break (max count, then min
    * value) — built-in `mode()` breaks ties arbitrarily on both
    * engines, so the hash-stable form is count + rank-1 window: one
    * hash-agg to (group, value) cardinality, one window over it. */
  val modeAgg = Q(
    "q_mode",
    """SELECT event_type, user_id AS modal_user, n FROM (
      |  SELECT event_type, user_id, count(*) AS n,
      |    row_number() OVER (PARTITION BY event_type
      |                       ORDER BY count(*) DESC, user_id) AS rk
      |  FROM events GROUP BY event_type, user_id
      |) WHERE rk = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    val counts = Tables.events(s, d)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("n").desc, col("user_id"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("user_id").as("modal_user"), col("n"))
      .orderBy("event_type")
  }
}
