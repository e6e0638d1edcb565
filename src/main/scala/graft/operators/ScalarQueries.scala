package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Scalar-function inventory (SURVEY.md §2.8 C1–C11) re-expressed on the
  * synthetic tables, preserving the reference's user-visible semantics:
  * when-chain priority order, concat_ws null-skipping, 3VL asymmetries.
  */
object ScalarQueries {

  private val dec = "decimal(18,2)"

  /** C1: the 11-way CASE WHEN mapping chain (AppName→content-type analog:
    * event_type→funnel stage, unknowns→'Error' then filtered — F2). */
  val c1CasewhenMap = Q(
    "q_c1_casewhen_map",
    """SELECT stage, count(*) AS n FROM (
      |  SELECT CASE
      |    WHEN event_type = 'view' OR event_type = 'click' THEN 'browse'
      |    WHEN event_type = 'signup'                        THEN 'convert'
      |    WHEN event_type = 'purchase'                      THEN 'transact'
      |    ELSE 'Error' END AS stage
      |  FROM events
      |) WHERE stage <> 'Error' GROUP BY stage ORDER BY stage""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("stage",
        when(col("event_type") === "view" || col("event_type") === "click", "browse")
          .when(col("event_type") === "signup", "convert")
          .when(col("event_type") === "purchase", "transact")
          .otherwise("Error"))
      .filter(col("stage") =!= "Error")
      .groupBy("stage").agg(count(lit(1)).as("n"))
      .orderBy("stage")
  }

  /** C2+C3: greatest() argmax mapped back to its label by a priority-ordered
    * when-chain (ties resolve by chain order, exactly like the reference's
    * most-watched at ETL_customer_interaction.py:25-31). */
  val c2ArgmaxGreatest = Q(
    "q_c2_argmax_greatest",
    """SELECT user_id,
      |  CASE
      |    WHEN best = click    THEN 'click'
      |    WHEN best = error    THEN 'error'
      |    WHEN best = purchase THEN 'purchase'
      |    WHEN best = signup   THEN 'signup'
      |    ELSE 'view' END AS most_active
      |FROM (
      |  SELECT user_id, click, error, purchase, signup, view,
      |         greatest(click, error, purchase, signup, view) AS best
      |  FROM (SELECT user_id,
      |    count(*) FILTER (WHERE event_type = 'click')    AS click,
      |    count(*) FILTER (WHERE event_type = 'error')    AS error,
      |    count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |    count(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |    count(*) FILTER (WHERE event_type = 'view')     AS view
      |   FROM events GROUP BY user_id)
      |) ORDER BY user_id""".stripMargin) { (s, d) =>
    val types = CoreQueries.EventTypes
    val pivoted = Tables.events(s, d)
      .groupBy("user_id").pivot("event_type", types).count()
      .na.fill(0, types)
    pivoted
      .withColumn("best", greatest(types.map(col): _*))
      .withColumn("most_active",
        when(col("best") === col("click"), "click")
          .when(col("best") === col("error"), "error")
          .when(col("best") === col("purchase"), "purchase")
          .when(col("best") === col("signup"), "signup")
          .otherwise("view"))
      .select("user_id", "most_active")
      .orderBy("user_id")
  }

  /** C4: concat_ws over no-otherwise whens — NULLs from non-matching whens
    * are silently skipped, building the fixed-order "taste" string
    * (ETL_customer_interaction.py:34-41 semantics). */
  val c4ConcatWsTaste = Q(
    "q_c4_concat_ws_taste",
    """SELECT user_id, concat_ws('-',
      |    CASE WHEN click    > 0 THEN 'click'    END,
      |    CASE WHEN error    > 0 THEN 'error'    END,
      |    CASE WHEN purchase > 0 THEN 'purchase' END,
      |    CASE WHEN signup   > 0 THEN 'signup'   END,
      |    CASE WHEN view     > 0 THEN 'view'     END) AS taste
      |FROM (SELECT user_id,
      |    count(*) FILTER (WHERE event_type = 'click')    AS click,
      |    count(*) FILTER (WHERE event_type = 'error')    AS error,
      |    count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |    count(*) FILTER (WHERE event_type = 'signup')   AS signup,
      |    count(*) FILTER (WHERE event_type = 'view')     AS view
      |  FROM events GROUP BY user_id)
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val types = CoreQueries.EventTypes
    Tables.events(s, d)
      .groupBy("user_id").pivot("event_type", types).count()
      .na.fill(0, types)
      .withColumn("taste", concat_ws("-",
        types.map(t => when(col(t) > 0, lit(t))): _*))
      .select("user_id", "taste")
      .orderBy("user_id")
  }

  /** C5+A3: activeness banding over exact distinct active days
    * (ETL_customer_interaction.py:54-57 semantics; thresholds tuned to the
    * events table's 22–30 active-day spread). */
  val c5Banding = Q(
    "q_c5_banding",
    """SELECT user_id, active_days,
      |  CASE WHEN active_days > 27 THEN 'High'
      |       WHEN active_days BETWEEN 25 AND 27 THEN 'Medium'
      |       ELSE 'Low' END AS level_activeness
      |FROM (SELECT user_id, count(DISTINCT date_trunc('day', ts)) AS active_days
      |      FROM events GROUP BY user_id)
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(countDistinct(date_trunc("day", col("ts"))).as("active_days"))
      .withColumn("level_activeness",
        when(col("active_days") > 27, "High")
          .when(col("active_days").between(25, 27), "Medium")
          .otherwise("Low"))
      .select("user_id", "active_days", "level_activeness")
      .orderBy("user_id")
  }

  /** C6+C7+J1: the month-over-month trend compare with its deliberate 3VL
    * asymmetry — a NULL side makes `trending_type`='Changed' but
    * `category_change`='Unchanged' (ETL_customer_behavior.py:21-25,138-143).
    * A sparse deterministic sample (event_id % 97 = 0, ~1% at every scale
    * factor) guarantees genuinely NULL sides in the full-outer join. */
  val c6c7TrendNulls = Q(
    "q_c6c7_trend_nulls",
    """WITH ranked AS (
      |  SELECT CASE WHEN day(ts) <= 15 THEN 'H1' ELSE 'H2' END AS half,
      |         user_id, event_type, count(*) AS n
      |  FROM events WHERE event_id % 97 = 0
      |  GROUP BY 1, 2, 3
      |), top1 AS (
      |  SELECT half, user_id, event_type FROM (
      |    SELECT half, user_id, event_type,
      |      row_number() OVER (PARTITION BY half, user_id ORDER BY n DESC, event_type) AS rnk
      |    FROM ranked) WHERE rnk = 1
      |)
      |SELECT COALESCE(a.user_id, b.user_id) AS user_id,
      |  a.event_type AS type_h1, b.event_type AS type_h2,
      |  CASE WHEN a.event_type = b.event_type THEN 'Unchanged' ELSE 'Changed' END AS trending_type,
      |  CASE WHEN a.event_type <> b.event_type
      |       THEN concat_ws('-', a.event_type, b.event_type)
      |       ELSE 'Unchanged' END AS category_change
      |FROM (SELECT user_id, event_type FROM top1 WHERE half = 'H1') a
      |FULL OUTER JOIN (SELECT user_id, event_type FROM top1 WHERE half = 'H2') b
      |  ON a.user_id = b.user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ranked = Tables.events(s, d)
      .filter(col("event_id") % 97 === 0)
      .withColumn("half", when(dayofmonth(col("ts")) <= 15, "H1").otherwise("H2"))
      .groupBy("half", "user_id", "event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("half", "user_id")
      .orderBy(col("n").desc, col("event_type"))
    val top1 = ranked.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
    // top1 holds ≤1 row per (half, user): a conditional aggregation is
    // the full-outer join of the two halves, in one pass with no join
    top1
      .groupBy("user_id")
      .agg(
        max(when(col("half") === "H1", col("event_type"))).as("type_h1"),
        max(when(col("half") === "H2", col("event_type"))).as("type_h2"))
      .select(
        col("user_id"),
        col("type_h1"), col("type_h2"),
        when(col("type_h1") === col("type_h2"), "Unchanged").otherwise("Changed").as("trending_type"),
        when(col("type_h1") =!= col("type_h2"),
             concat_ws("-", col("type_h1"), col("type_h2")))
          .otherwise("Unchanged").as("category_change"))
      .orderBy("user_id")
  }

  /** C8+C9: to_date/date_format with literal formats; monthly order stats. */
  val c8DateMonth = Q(
    "q_c8_date_month",
    """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"),
           sum(col("o_totalprice").cast(dec)).cast(dec).cast("double").as("total"))
      .orderBy("month")
  }

  /** JSON scalar extraction from the `props` string column (get_json_object
    * analog — capability the reference's `userPlansMap` would need). */
  val jsonExtract = Q(
    "q_json_extract",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  count(*) AS n
      |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .withColumn("k_mod", get_json_object(col("props"), "$.k").cast("bigint") % 10)
      .groupBy("k_mod").agg(count(lit(1)).as("n"))
      .orderBy("k_mod")
  }

  /** Map-typed surface in the harness (str_to_map → element_at → size):
    * a "k:v,k:v" string column round-trips through a real MapType and
    * back out to scalars. The oracle re-derives the same scalars from
    * the source columns — an identity check that the map semantics
    * (parse, lookup, cardinality) are faithful. */
  val mapOps = Q(
    "q_map_ops",
    """SELECT p_partkey, p_brand AS brand, p_size AS size, 2 AS n_entries
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .withColumn("kv",
        concat(lit("brand:"), col("p_brand"), lit(",size:"), col("p_size")))
      .withColumn("m", expr("str_to_map(kv, ',', ':')"))
      .select(
        col("p_partkey"),
        element_at(col("m"), "brand").as("brand"),
        element_at(col("m"), "size").cast("int").as("size"),
        size(col("m")).as("n_entries"))
      .orderBy("p_partkey")
  }

  /** Array ops: split → explode → word count → deterministic top-25
    * (explode/str_to_map family from SURVEY §2.8's extension list). */
  val explodeWordcount = Q(
    "q_explode_wordcount",
    """SELECT word, count(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
      |) WHERE word <> '' GROUP BY word
      |ORDER BY n DESC, word LIMIT 25""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(25)
  }
}
