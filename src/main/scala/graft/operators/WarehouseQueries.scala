package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Warehouse-maintenance operators: the dimension-table lifecycle work a
  * Customer-360 ETL runs around its analytics queries (the reference's
  * pipelines rebuild dimensions from scratch each day; these are the
  * incremental-warehouse equivalents).
  *
  * Scale design: everything here is a PARTITIONED window (by entity key)
  * — change detection and interval stitching shuffle once on the key and
  * then stream each entity's history in order; no global sorts, no
  * self-joins over history length.
  */
object WarehouseQueries {

  /** Slowly-changing-dimension (type 2) build: compress each customer's
    * order-priority history into validity intervals
    * `[valid_from, valid_to)` with an is_current flag — the classic
    * "snapshot stream → SCD2 dimension" ETL. Change detection is
    * lag-based (one window), interval stitching is lead-based (second
    * window over the change rows only); ties on a date are broken by
    * order key so the result is engine-exact. */
  val scd2 = Q(
    "q_scd2",
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |    lag(o_orderpriority) OVER
      |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders
      |), chg AS (
      |  SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate AS valid_from
      |  FROM o WHERE prev IS NULL OR prev <> o_orderpriority
      |), scd AS (
      |  SELECT o_custkey AS custkey, o_orderpriority AS priority, valid_from,
      |    lead(valid_from) OVER
      |      (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey) AS valid_to
      |  FROM chg
      |)
      |SELECT custkey, priority, valid_from, valid_to,
      |  CAST(valid_to IS NULL AS INTEGER) AS is_current
      |FROM scd ORDER BY custkey, valid_from""".stripMargin) { (s, d) =>
    val byOrder = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val byChange = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    Tables.orders(s, d)
      .withColumn("prev", lag(col("o_orderpriority"), 1).over(byOrder))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byChange))
      .select(
        col("o_custkey").as("custkey"), col("o_orderpriority").as("priority"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
      .orderBy("custkey", "valid_from")
  }

  /** Z-order clustering key: the Morton interleave of (part, supplier)
    * that [[graft.plans.ZOrder.writeLayout]] range-partitions by — the
    * multi-dimensional layout key of a 100 TB fact table. The query
    * surfaces the key itself (closed-form bit arithmetic, so the oracle
    * recomputes it exactly); ZOrderLayoutSpec proves the layout property
    * it buys (tight per-file bounding boxes → file skipping). */
  val zorderKey = {
    import graft.plans.ZOrder
    Q(
      "q_zorder_key",
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(l_partkey % 256 AS BIGINT) AS x,
         |  CAST(l_suppkey % 256 AS BIGINT) AS y,
         |  CAST(${ZOrder.zSql("(l_partkey % 256)", "(l_suppkey % 256)", 8)}
         |       AS BIGINT) AS z
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_partkey") % 256).as("x"),
          (col("l_suppkey") % 256).as("y"),
          ZOrder.zValue(col("l_partkey") % 256, col("l_suppkey") % 256, 8).as("z"))
        .orderBy("l_orderkey", "l_linenumber")
    }
  }

  /** 3-dimensional Morton key — the multi-column OPTIMIZE ZORDER shape
    * (round-robin bit interleave generalizes the 2-D layout; each file
    * in a layout range-partitioned by z3 covers a tight 3-D box). */
  val zorder3 = {
    import graft.plans.ZOrder
    val dims = Seq("(l_partkey % 256)", "(l_suppkey % 256)", "(l_linenumber % 16)")
    Q(
      "q_zorder3",
      s"""SELECT l_orderkey, l_linenumber,
         |  CAST(${ZOrder.zSqlN(dims, 8)} AS BIGINT) AS z3
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          ZOrder.zValueN(Seq(col("l_partkey") % 256, col("l_suppkey") % 256,
            col("l_linenumber") % 16), 8).as("z3"))
        .orderBy("l_orderkey", "l_linenumber")
    }
  }

  /** Equi-DEPTH histogram (decile profile) per order priority — the
    * optimizer-statistics twin of `q_histogram`'s equi-width buckets
    * (equi-depth is what a cost model actually wants: every bucket
    * holds the same row count, so selectivity per bucket is constant).
    * The ntile window is PARTITIONED by priority — the scale dial: a
    * 100 TB profile runs per partition/segment, never as one global
    * sort (an unpartitioned ntile is exactly the single-reducer shape
    * PlanHygieneSpec forbids). Total order inside each partition
    * (price, then key) makes the ANSI remainder-to-early-buckets split
    * identical on both engines. */
  val equidepthHist = Q(
    "q_histogram_equidepth",
    """WITH t AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    ntile(10) OVER (PARTITION BY o_orderpriority
      |                    ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |SELECT o_orderpriority, decile, CAST(count(*) AS BIGINT) AS n,
      |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |FROM t GROUP BY o_orderpriority, decile
      |ORDER BY o_orderpriority, decile""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy("o_totalprice", "o_orderkey")
    Tables.orders(s, d)
      .withColumn("decile", ntile(10).over(w))
      .groupBy("o_orderpriority", "decile")
      .agg(count(lit(1)).as("n"),
        min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .orderBy("o_orderpriority", "decile")
  }

  /** CDC change feed between two keyed snapshots via
    * [[TableChanges.diff]]: day-1 load vs day-2 load of an `orders`
    * dimension, where day 2 adds the `%10==7` keys, drops the `%10==9`
    * keys, and reprices the `%10==3` keys — so all three change classes
    * appear deterministically. The oracle replays both snapshot
    * derivations and the full-outer classification; the `+1.0` reprice
    * is the same IEEE op on the same input bits on both engines.
    * TableChangesSpec drives the same operator over REAL
    * [[graft.sources.GenerationedTable]] generations (incl. null-edit
    * classes the modulo snapshots can't produce). */
  val tableChanges = Q(
    "q_table_changes",
    """WITH b AS (
      |  SELECT o_orderkey, o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 10 <> 7
      |), a AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 10 <> 9
      |)
      |SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
      |  CASE WHEN b.o_orderkey IS NULL THEN 'insert'
      |       WHEN a.o_orderkey IS NULL THEN 'delete'
      |       ELSE 'update' END AS change_type,
      |  b.o_orderstatus AS old_o_orderstatus,
      |  a.o_orderstatus AS new_o_orderstatus,
      |  b.o_totalprice AS old_o_totalprice,
      |  a.o_totalprice AS new_o_totalprice
      |FROM b FULL OUTER JOIN a ON b.o_orderkey = a.o_orderkey
      |WHERE b.o_orderkey IS NULL OR a.o_orderkey IS NULL
      |   OR b.o_orderstatus IS DISTINCT FROM a.o_orderstatus
      |   OR b.o_totalprice  IS DISTINCT FROM a.o_totalprice
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val before = base.filter(col("o_orderkey") % 10 =!= 7)
    val after = base.filter(col("o_orderkey") % 10 =!= 9)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 10 === 3, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    TableChanges.diff(before, after, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }
}
