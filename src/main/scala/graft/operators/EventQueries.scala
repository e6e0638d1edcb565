package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Event-time analytics over the `events` table — the batch expression of
  * the streaming semantics in graft.streaming (tumbling windows,
  * gap-based sessionization). Batch and stream share the same logical
  * shape, so these queries double as oracles for the streaming suite.
  */
object EventQueries {

  private val dec = "decimal(18,2)"

  /** Ordered conversion funnel view → click → purchase: a user converts
    * at stage k only by events in SEQUENCE (first click strictly after
    * the first view, first purchase strictly after that click) — the
    * product-analytics semantics a bare per-type count gets wrong.
    * Timestamps are exact microseconds on both engines, so the strict
    * inequalities are engine-exact. Plan: three shuffle-on-user_id
    * hash-aggs/joins — user cardinality work, no event-pair blowup. */
  val eventFunnel = Q(
    "q_event_funnel",
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, min(e.ts) AS t
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, min(e.ts) AS t
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id
      |)
      |SELECT stage, n_users FROM (
      |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
      |  UNION ALL SELECT '2_click_after_view', count(*) FROM c
      |  UNION ALL SELECT '3_purchase_after_click', count(*) FROM p
      |) ORDER BY stage""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    def firstAfter(types: String, prev: org.apache.spark.sql.DataFrame) =
      ev.filter(col("event_type") === types)
        .join(prev.select(col("user_id"), col("t").as("t0")), "user_id")
        .filter(col("ts") > col("t0"))
        .groupBy("user_id").agg(min(col("ts")).as("t"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t"))
    val c = firstAfter("click", v)
    val p = firstAfter("purchase", c)
    // three single-row aggregates unioned (a global agg emits exactly
    // one row even over an empty input, matching the oracle's count(*)
    // subqueries; no join shapes anywhere near the hygiene sweep)
    def staged(name: String, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    staged("1_view", v)
      .unionByName(staged("2_click_after_view", c))
      .unionByName(staged("3_purchase_after_click", p))
      .orderBy("stage")
  }

  /** Retention cohorts: users grouped by first-seen date, distinct
    * active users per (cohort, day offset ≤ 7) — the activation grid a
    * Customer360 dashboard plots. Shuffle on user_id for the cohort
    * assignment, then one hash-agg on (cohort, offset); both keys are
    * bounded-cardinality dimensions at any corpus size. */
  val retentionCohorts = Q(
    "q_retention",
    """WITH first_seen AS (
      |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort FROM events
      |  GROUP BY user_id
      |)
      |SELECT CAST(cohort AS VARCHAR) AS cohort,
      |  date_diff('day', cohort, CAST(e.ts AS DATE)) AS day_offset,
      |  count(DISTINCT e.user_id) AS n_users
      |FROM events e JOIN first_seen f ON e.user_id = f.user_id
      |WHERE date_diff('day', cohort, CAST(e.ts AS DATE)) <= 7
      |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val firstSeen = ev.groupBy("user_id")
      .agg(to_date(min(col("ts"))).as("cohort"))
    ev.join(firstSeen, "user_id")
      .withColumn("day_offset", datediff(to_date(col("ts")), col("cohort")))
      .filter(col("day_offset") <= 7)
      .groupBy(col("cohort").cast("string").as("cohort"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  /** Tumbling 1-hour windows per event type (the batch twin of a
    * Structured Streaming `window($"ts", "1 hour")` aggregation). */
  val tumblingWindow = Q(
    "q_window_tumbling",
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
    // window_start rendered as a string: Spark writes tz-aware parquet
    // timestamps, DuckDB naive ones -- a raw timestamp output column
    // would compare unequal in tz-strict readers
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(dec)).cast(dec).cast("double").as("total"))
      .orderBy("window_start", "event_type")
  }

  /** Gap-based sessionization (6-hour inactivity gap): a new session
    * starts when the gap from the previous event exceeds the threshold;
    * session_id = running count of session starts. Pure window algebra —
    * the batch twin of flatMapGroupsWithState sessionization. */
  val sessionize = Q(
    "q_sessionize",
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 21600000
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |), sessions AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS session_id
      |  FROM marked
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(event_id) AS first_event,
      |  epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byTime))
      .withColumn("is_start",
        when(col("prev_ms").isNull ||
             unix_millis(col("ts")) - col("prev_ms") > 21600000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_start")).over(running))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        (unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))).as("duration_ms"))
      .orderBy("user_id", "session_id")
  }

  /** Interval (time-range) join: each purchase paired with every click
    * by the same user in the preceding hour (inclusive both ends) — the
    * batch twin of the watermarked stream-stream attribution join in
    * graft.streaming.EventStreams.attributionJoin, and the oracle its
    * parity test checks against. */
  val intervalJoin = Q(
    "q_interval_join",
    """SELECT p.event_id, p.user_id, c.event_id AS click_id,
      |  epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY p.event_id, click_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
              col("ts").as("click_ts"))
    p.join(c,
        col("user_id") === col("c_user") &&
        col("click_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("ts"))
      .select(col("event_id"), col("user_id"), col("click_id"),
              (unix_millis(col("ts")) - unix_millis(col("click_ts"))).as("gap_ms"))
      .orderBy("event_id", "click_id")
  }

  /** Left-outer interval join: every purchase, attributed clicks where
    * they exist, nulls where none — the batch twin of the streaming
    * left-outer attribution join (which emits the null rows once the
    * watermark proves no in-range click can still arrive). */
  val intervalJoinOuter = Q(
    "q_interval_join_outer",
    """SELECT p.event_id, p.user_id, c.event_id AS click_id,
      |  epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY p.event_id, click_id NULLS FIRST""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
              col("ts").as("click_ts"))
    p.join(c,
        col("user_id") === col("c_user") &&
        col("click_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
        col("click_ts") <= col("ts"), "left")
      .select(col("event_id"), col("user_id"), col("click_id"),
              (unix_millis(col("ts")) - unix_millis(col("click_ts"))).as("gap_ms"))
      .orderBy(col("event_id"), col("click_id").asc_nulls_first)
  }

  /** Approximate distinct users per event type — the HLL sketch path for
    * 100 TB cardinality work, pinned against its own determinism (same
    * data, same sketch → same estimate) rather than a DuckDB oracle
    * (different HLL implementations disagree by design). */
  val approxDistinct = Q.rowsOnly("q_approx_distinct") { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.05).as("approx_users"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Time-series gap fill: daily event counts per type on a DENSE
    * calendar spine — days with no events appear as explicit zeros
    * (dashboards and trend models both need the zeros; a bare groupBy
    * silently drops them). The spine is `sequence(min_day, max_day)`
    * exploded from a one-row bounds aggregate, crossed with the
    * distinct types — both metadata-sized frames (|days| × |types|,
    * ~150 rows here), so the cross is a broadcast of nothing; the only
    * data-sized work is the daily hash-agg and the left join back,
    * both shuffle-on-(day, type). */
  /** Shared DuckDB CTE chain: the dense (day × event_type) spine with
    * explicit zero counts. */
  private val denseCte =
    """ev AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      |b AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
      |days AS (
      |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
      |    AS day FROM b
      |),
      |types AS (SELECT DISTINCT event_type FROM ev),
      |actual AS (SELECT day, event_type, count(*) AS n_events
      |           FROM ev GROUP BY day, event_type),
      |dense AS (
      |  SELECT d.day, t.event_type, coalesce(a.n_events, 0) AS n_events
      |  FROM days d CROSS JOIN types t
      |  LEFT JOIN actual a ON a.day = d.day AND a.event_type = t.event_type
      |)""".stripMargin

  /** Spark side of the shared spine: daily counts per type on a dense
    * calendar, zeros explicit. */
  private def denseDaily(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("event_type"))
    val actual = ev.groupBy("day", "event_type")
      .agg(count(lit(1)).as("n_events"))
    val days = ev.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    days.crossJoin(ev.select("event_type").distinct())
      .join(actual, Seq("day", "event_type"), "left")
      .na.fill(0L, Seq("n_events"))
  }

  val gapfillDaily = Q(
    "q_gapfill_daily",
    s"""WITH $denseCte
       |SELECT day, event_type, n_events FROM dense
       |ORDER BY day, event_type""".stripMargin) { (s, d) =>
    denseDaily(s, d).orderBy("day", "event_type")
  }

  /** Rolling 7-day mean of daily counts per type — the trend feature a
    * dashboard or forecaster reads. Composes on the DENSE spine (a
    * rolling frame over a gappy series silently averages the wrong
    * days — gap fill is what makes ROWS BETWEEN 6 PRECEDING correct).
    * Exactness: each frame sums ≤ 7 long counts (exact in double at any
    * magnitude that fits 2^53) then divides once — identical on both
    * engines regardless of accumulation order. */
  val rolling7day = Q(
    "q_rolling_7day",
    s"""WITH $denseCte
       |SELECT day, event_type, n_events,
       |  avg(n_events) OVER (PARTITION BY event_type ORDER BY day
       |                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
       |    AS avg_7d
       |FROM dense ORDER BY day, event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    denseDaily(s, d)
      .withColumn("avg_7d", avg("n_events").over(w))
      .orderBy("day", "event_type")
  }

  /** Exponentially-weighted moving average of `value` per user — the
    * recency-biased smoother (α = 1/2) next to [[rolling7day]]'s flat
    * kernel. The recursion is truncated at 8 taps, which turns it into
    * a fixed-weight rolling dot product over lag columns: one
    * partitioned window, no recursion, no state. Exactness: every
    * weight is a power of two (multiplying by 2^-k only decrements the
    * exponent), missing history coalesces to 0.0, and both engines
    * evaluate the same left-associated sum — so the float result is
    * bit-identical despite 8 roundings per row. At 100 TB this is one
    * shuffle on user_id and a streamed 8-row frame per user. */
  val ewma = Q(
    "q_ewma",
    """SELECT user_id, event_id, value,
      |  coalesce(lag(value, 0) OVER w, 0) * 0.5
      |  + coalesce(lag(value, 1) OVER w, 0) * 0.25
      |  + coalesce(lag(value, 2) OVER w, 0) * 0.125
      |  + coalesce(lag(value, 3) OVER w, 0) * 0.0625
      |  + coalesce(lag(value, 4) OVER w, 0) * 0.03125
      |  + coalesce(lag(value, 5) OVER w, 0) * 0.015625
      |  + coalesce(lag(value, 6) OVER w, 0) * 0.0078125
      |  + coalesce(lag(value, 7) OVER w, 0) * 0.00390625 AS ewma
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val weights = Seq(0.5, 0.25, 0.125, 0.0625,
      0.03125, 0.015625, 0.0078125, 0.00390625)
    val ewmaCol = weights.zipWithIndex.map { case (wt, i) =>
      coalesce(lag(col("value"), i).over(w), lit(0.0)) * lit(wt)
    }.reduceLeft(_ + _)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("value"),
        ewmaCol.as("ewma"))
      .orderBy("user_id", "event_id")
  }

  /** Markov transition counts — how often each event type follows each
    * other type within a user's activity stream, the first-order model
    * a next-action predictor or funnel-drift monitor trains on.
    * Transitions crossing a [[sessionize]]-style 6-hour inactivity gap
    * don't count (a new session has no meaningful predecessor). One
    * window pass (same partition/order/tie-break as sessionize) + one
    * hash agg; the output is at most |types|² rows. */
  val transitions = Q(
    "q_event_transitions",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type,
      |    epoch_ms(ts) - lag(epoch_ms(ts))
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
      |  FROM events)
      |SELECT prev_type, event_type AS next_type,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM seq
      |WHERE prev_type IS NOT NULL AND gap_ms <= 21600000
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byTime))
      .withColumn("gap_ms",
        unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(byTime))
      .filter(col("prev_type").isNotNull && col("gap_ms") <= 21600000L)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  /** 3σ outlier events per (user, event type), z-scored ENTIRELY in
    * integer space: with cents x, group count n, sum S and sum-of-squares
    * Q, z² > 9 rewrites to (n·x − S)² > 9·(n·Q − S²) — no float mean, no
    * sqrt, so both engines flag bit-identical rows (the float-algebra
    * trap that forced q_stats_suite to rows-only doesn't apply).
    * Overflow headroom: group sizes stay O(events-per-user) as the
    * corpus scales (users scale with data), so terms are ~(30·6e4)²,
    * 10^5 below 2^63; a fatter deployment groups by a finer window or
    * promotes to DECIMAL(38,0). Zero-variance groups flag nothing
    * (n·x ≡ S exactly when all values equal). */
  val anomalies = Q(
    "q_event_anomalies",
    """WITH c AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |g AS (
      |  SELECT user_id, event_type,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(cents) AS BIGINT) AS s,
      |    CAST(sum(cents * cents) AS BIGINT) AS q
      |  FROM c GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id, c.event_type, c.cents, g.n
      |FROM c JOIN g USING (user_id, event_type)
      |WHERE (g.n * c.cents - g.s) * (g.n * c.cents - g.s)
      |      > 9 * (g.n * g.q - g.s * g.s)
      |ORDER BY c.event_id""".stripMargin) { (s, d) =>
    val cents = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val g = cents.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"),
        sum(col("cents") * col("cents")).as("q"))
    cents.join(g, Seq("user_id", "event_type"))
      .filter((col("n") * col("cents") - col("s")) *
              (col("n") * col("cents") - col("s")) >
              lit(9) * (col("n") * col("q") - col("s") * col("s")))
      .select("event_id", "user_id", "event_type", "cents", "n")
      .orderBy("event_id")
  }
}
