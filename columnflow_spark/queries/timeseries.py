"""Event-stream / time-series operators over the ``events`` table.

The reference is strictly batch (SURVEY §2.9), so these go beyond parity:
sessionization, as-of joins, tumbling windows, JSON extraction and
running aggregates — the standard event-analytics surface a Spark-native
engine must cover.  All are window/groupBy compositions (no UDFs); each
has an exact DuckDB oracle.

Ordering note: event timestamps can collide, so every window ORDER BY
carries ``event_id`` as a total tie-break (driver hash-compare needs
determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from columnflow_spark.core.state import checkpoint_df

from columnflow_spark.queries import query
from columnflow_spark.sources import load_table

SESSION_GAP_MIN = 30


# --- sessionization: gap-based sessions via lag + cumulative sum ---
#: per-(session, sf_dir) cached events row count — the incremental
#: store twins (KMV, quantile) derive their synthetic ingest cut points
#: from it; one scan serves both (ADVICE r10 nit)
_EV_COUNT_CACHE: dict = {}


def _events_count(spark: SparkSession, sf_dir: str) -> int:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EV_COUNT_CACHE:
        _EV_COUNT_CACHE[key] = load_table(
            spark, sf_dir, "events", columns=["event_id"]
        ).count()
    return _EV_COUNT_CACHE[key]


@query(
    "sessionize_gap30",
    oracle=f"""
    WITH gaps AS (
        SELECT
            user_id, ts, event_id,
            CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                 OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
    )
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           CAST(sum(cnt) AS BIGINT) AS n_events,
           max(cnt) AS max_session_events
    FROM (
        SELECT user_id, session_id, count(*) AS cnt
        FROM sessions GROUP BY user_id, session_id
    ) s
    GROUP BY user_id
    """,
)
def sessionize_gap30(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_id"])
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: casting ts to long truncates to seconds and
    # mis-classifies gaps like 30min + 0.5s vs the interval comparison
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    ev = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)))
    per_session = ev.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("cnt"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("cnt").alias("n_events"),
        F.max("cnt").alias("max_session_events"),
    )


# --- as-of join: latest prior 'purchase' value for each 'error' event
# (single-pass window form — no shuffle beyond the user_id partition;
# scales to 100 TB where a per-key merge_asof would) ---
@query(
    "asof_prior_purchase",
    oracle="""
    SELECT
        event_id,
        user_id,
        round(coalesce(
            last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            -99999.0), 4) AS prior_purchase_value
    FROM events
    QUALIFY event_type = 'error'
    """,
)
def asof_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, -1)
    prior = F.last(F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True).over(w)
    return (
        ev.withColumn("prior_purchase_value", F.round(F.coalesce(prior, F.lit(-99999.0)), 4))
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "prior_purchase_value")
    )


# --- tumbling window aggregation (batch form; streaming twin in
# queries/streaming.py) ---
@query(
    "tumbling_hourly_counts",
    oracle="""
    SELECT
        date_trunc('hour', ts) AS hour,
        event_type,
        count(*) AS n,
        round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["ts", "event_type", "value"])
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


# --- semi-structured JSON extraction (props column) ---
@query(
    "json_props_extract",
    oracle="""
    SELECT
        event_type,
        count(*) AS n,
        round(avg(CAST(json_extract(props, 'k') AS INT)), 4) AS avg_k,
        max(CAST(json_extract(props, 'k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["event_type", "props"])
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


# --- running aggregate (cumulative sum) per key ---
@query(
    "running_value_sum",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 4) AS running_sum
    FROM events
    WHERE user_id < 10
    """,
)
def running_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    return (
        ev.filter(F.col("user_id") < 10)
        .select("event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_sum"))
    )


# --- inter-event gaps (lag arithmetic) ---
@query(
    "inter_event_gaps",
    oracle="""
    WITH d AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT user_id,
           count(gap_us) AS n_gaps,
           -- exact integer sum, ONE fixed division sequence, and an
           -- INTEGER-scaled result (gap in units of 1e-4 s = us/100):
           -- both round(x, 4) (fp-vs-BigDecimal ties) and avg() over
           -- doubles (summation order) diverged between engines at sf1
           CAST(round(CAST(sum(gap_us) AS DOUBLE) / count(gap_us) / 100.0) AS BIGINT) AS avg_gap_e4,
           CAST(round(max(gap_us) / 100.0) AS BIGINT) AS max_gap_e4
    FROM d
    GROUP BY user_id
    """,
)
def inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_id"])
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.withColumn("gap_us", gap_us)
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.round(
                F.sum("gap_us").cast("double") / F.count("gap_us") / F.lit(100.0), 0
            ).cast("long").alias("avg_gap_e4"),
            F.round(F.max("gap_us") / F.lit(100.0), 0).cast("long").alias("max_gap_e4"),
        )
    )


# --- exact grouped percentiles (training-data quality gates filter on
# p95/p99 thresholds; Spark's exact percentile and DuckDB's quantile_cont
# share the linear-interpolation definition) ---
@query(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["event_type", "value"])
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


# --- hopping (sliding) window aggregation: 1h windows every 30min, each
# event lands in two windows (epoch-aligned in both engines) ---
@query(
    "hopping_window_counts",
    oracle="""
    SELECT hop_start, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS hop_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value FROM events
    )
    GROUP BY hop_start
    """,
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["ts", "value"])
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("window.start").alias("hop_start"), "n", "sum_value")
    )


# --- skew-safe aggregation: salt the grouping key, partially aggregate,
# re-aggregate (the standard fix when one key dominates a shuffle; result
# is provably identical to the direct groupBy, which the oracle computes) ---
@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    salted = ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(8)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("value").alias("psum")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), F.round(F.sum("psum"), 4).alias("sum_value")
    )


# --- approximate distinct counting (HLL++; rows-only — approximation has
# no SQL twin, accuracy vs exact distinct is asserted in tests) ---
@query("approx_distinct_users")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["event_type", "user_id"])
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )


# --- forward as-of join with tolerance (merge_asof direction='forward':
# for each error event, the next purchase of the same user within 1 hour,
# else sentinel) ---
@query(
    "asof_forward_tolerance",
    oracle="""
    WITH nxt AS (
        SELECT event_id, user_id, ts, event_type,
               first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
                   OVER w AS next_pts,
               first_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                   OVER w AS next_pval
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           round(CASE WHEN next_pts IS NOT NULL AND next_pts <= ts + INTERVAL '1 hour'
                      THEN next_pval ELSE -99999.0 END, 4) AS next_purchase_value
    FROM nxt
    WHERE event_type = 'error'
    """,
)
def asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"])
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(1, W.unboundedFollowing)
    is_p = F.col("event_type") == "purchase"
    next_pts = F.first(F.when(is_p, F.col("ts")), ignorenulls=True).over(w)
    next_pval = F.first(F.when(is_p, F.col("value")), ignorenulls=True).over(w)
    within = next_pts.isNotNull() & (next_pts <= F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    return (
        ev.withColumn("next_purchase_value", F.round(F.when(within, next_pval).otherwise(-99999.0), 4))
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "next_purchase_value")
    )


# --- interval-overlap join: per-order activity interval vs a generated
# month calendar (overlap iff s1 <= e2 AND s2 <= e1); the calendar side is
# tiny and broadcast, so the fact side never shuffles ---
@query(
    "interval_overlap_months",
    oracle="""
    WITH months AS (
        SELECT m AS month_start, m + INTERVAL '1 month' AS month_end
        FROM (SELECT unnest(generate_series(TIMESTAMP '1996-01-01',
                                            TIMESTAMP '1998-12-01',
                                            INTERVAL '1 month')) AS m)
    ),
    intervals AS (
        SELECT o_orderkey, o_orderdate AS s, o_orderdate + INTERVAL '30 days' AS e
        FROM orders
    )
    SELECT month_start, count(*) AS n_active
    FROM intervals JOIN months
      ON s < month_end AND month_start <= e
    GROUP BY month_start
    """,
)
def interval_overlap_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    months = spark.sql(
        """
        SELECT month_start, month_start + INTERVAL 1 MONTH AS month_end
        FROM (
            SELECT explode(sequence(TIMESTAMP '1996-01-01', TIMESTAMP '1998-12-01',
                                    INTERVAL 1 MONTH)) AS month_start
        )
        """
    )
    iv = orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("e"),
    )
    joined = iv.join(
        F.broadcast(months),
        (F.col("s") < F.col("month_end")) & (F.col("month_start") <= F.col("e")),
    )
    return joined.groupBy("month_start").agg(F.count(F.lit(1)).alias("n_active"))


# --- ordered funnel conversion (view -> click -> purchase): each step is
# the user's first qualifying event strictly after the previous step.
# Three tiny per-user aggregates chained by broadcast joins — the fact
# table is scanned once per step with the step filter pushed down, and
# nothing wider than (user_id, ts) ever shuffles. ---
@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def first_after(step: str, prev: DataFrame | None) -> DataFrame:
        step_ev = ev.filter(F.col("event_type") == step)
        if prev is not None:
            step_ev = step_ev.join(
                F.broadcast(prev.select("user_id", F.col("t").alias("prev_t"))), "user_id"
            ).filter(F.col("ts") > F.col("prev_t"))
        return step_ev.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = first_after("view", None)
    c = first_after("click", v)
    p = first_after("purchase", c)
    counts = [df.agg(F.count(F.lit(1)).alias(name)) for df, name in
              [(v, "n_view"), (c, "n_view_click"), (p, "n_view_click_purchase")]]
    out = counts[0]
    for df in counts[1:]:
        out = out.join(F.broadcast(df))
    return out


# --- weekly cohort retention: cohort = ISO week of the user's first
# event; one row per (cohort_week, week_offset) with distinct active
# users.  The first-event table is per-user tiny, broadcast back onto the
# fact; the only wide shuffle is the final distinct-count agg. ---
@query(
    "cohort_retention_weeks",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM events GROUP BY user_id
    )
    SELECT cohort_week,
           CAST((CAST(date_trunc('week', e.ts) AS DATE) - CAST(cohort_week AS DATE)) / 7 AS BIGINT)
               AS week_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN firsts USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def cohort_retention_weeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    firsts = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .withColumn(
            "week_offset",
            (
                F.datediff(F.date_trunc("week", "ts").cast("date"), F.col("cohort_week").cast("date")) / 7
            ).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


# --- event transition matrix (first-order Markov counts): lead() within
# user ordered by (ts, event_id), then one groupBy over the 25 state
# pairs; transition probabilities normalize via a per-from-state window
# over the already-tiny count table. ---
@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    counts AS (
        SELECT from_type, to_type, count(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(n / sum(n) OVER (PARTITION BY from_type), 4) AS p
    FROM counts
    ORDER BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = W.partitionBy("from_type")
    return (
        counts.withColumn("p", F.round(F.col("n") / F.sum("n").over(norm), 4))
        .orderBy("from_type", "to_type")
    )


# --- RANGE-frame rolling aggregate: per-user trailing-7-day event value
# sum/count evaluated AT each event (frame bounded by time, not rows) —
# the window shape none of the other queries exercise.  Spark orders by
# unix microseconds with rangeBetween; output keyed by event_id so ties
# are exact. ---
@query(
    "rolling_window_7d",
    oracle="""
    SELECT event_id,
           round(sum(value) OVER w, 4) AS roll_sum,
           count(*) OVER w AS roll_n
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
    )
    ORDER BY event_id
    """,
)
def rolling_window_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    micros_7d = 7 * 24 * 3600 * 1_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-micros_7d, W.currentRow)
    )
    return ev.select(
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("roll_sum"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    ).orderBy("event_id")


# --- datetime-part profile: hour-of-day x event-type activity matrix
# (UTC container TZ keeps extract() engine-portable). ---
@query(
    "events_hourly_profile",
    oracle="""
    SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["ts", "event_type", "value"])
    return (
        ev.groupBy(F.hour("ts").cast("long").alias("hour_of_day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("hour_of_day", "event_type")
    )


# --- first_value/last_value over full-partition frames: per-order first
# and last shipped line revenue (frame = ROWS UNBOUNDED BOTH WAYS, the
# value-function window shape).  Collapsed to one row per order via
# max_by-free distinct since the window already makes them constant. ---
@query(
    "order_first_last_lines",
    oracle="""
    SELECT DISTINCT l_orderkey,
           round(first_value(l_extendedprice) OVER w, 4) AS first_rev,
           round(last_value(l_extendedprice)  OVER w, 4) AS last_rev,
           nth_value(l_linenumber, 1) OVER w AS first_line
    FROM lineitem
    WINDOW w AS (
        PARTITION BY l_orderkey ORDER BY l_shipdate, l_extendedprice, l_linenumber
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    ORDER BY l_orderkey
    """,
)
def order_first_last_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_linenumber"],
    )
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_shipdate", "l_extendedprice", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        li.select(
            "l_orderkey",
            F.round(F.first("l_extendedprice").over(w), 4).alias("first_rev"),
            F.round(F.last("l_extendedprice").over(w), 4).alias("last_rev"),
            F.nth_value("l_linenumber", 1).over(w).alias("first_line"),
        )
        .distinct()
        .orderBy("l_orderkey")
    )


# --- date-series densification: per-user activity calendar built by
# exploding a generated day sequence (the gap-filling shape hist axis
# densification uses on categorical axes, here on time). ---
@query(
    "user_activity_gaps",
    oracle="""
    SELECT user_id,
           len(generate_series(CAST(min(ts) AS DATE), CAST(max(ts) AS DATE), INTERVAL 1 DAY))
               AS span_days,
           count(DISTINCT CAST(ts AS DATE)) AS active_days,
           len(generate_series(CAST(min(ts) AS DATE), CAST(max(ts) AS DATE), INTERVAL 1 DAY))
               - count(DISTINCT CAST(ts AS DATE)) AS gap_days
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def user_activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts"])
    per_user = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
        F.countDistinct(F.col("ts").cast("date")).alias("active_days"),
    )
    # explode the generated day series and re-count: the densification
    # pattern (a pure datediff would avoid the explode; the explode IS the
    # operator under test and stays proportional to span, not events)
    days = per_user.select(
        "user_id", "active_days",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    return (
        days.groupBy("user_id", "active_days")
        .agg(F.count(F.lit(1)).alias("span_days"))
        .select(
            "user_id",
            "span_days",
            "active_days",
            (F.col("span_days") - F.col("active_days")).alias("gap_days"),
        )
        .orderBy("user_id")
    )


# --- approximate percentiles (KLL/GK-style sketch; the scale form of
# value_percentiles' exact sort: one pass, mergeable partials, error
# bounded by the accuracy knob — rows-only driver check, accuracy pinned
# against the exact form in tests/test_sketches.py). ---
@query("approx_value_percentiles")
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events", columns=["event_type", "value"])
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("pcts"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.element_at("pcts", 1), 4).alias("p50"),
            F.round(F.element_at("pcts", 2), 4).alias("p90"),
            F.round(F.element_at("pcts", 3), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


# --- hot-key top-k via two-phase salted windows (functions/skew.py):
# event_type has ~5 distinct values, so at 100 TB a single
# Window.partitionBy(event_type) serializes ~20 TB per task; the salted
# form spreads phase 1 over (key, salt) and ranks only the <= n_salt*k
# survivors in phase 2.  Top-k is reduction-safe, so the result is
# bit-identical to the unsalted window (the oracle computes exactly
# that). ---
@query(
    "skew_salted_topk_values",
    oracle="""
    SELECT event_type, rk, event_id, value
    FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY value DESC, event_id
               ) AS rk
        FROM events
    )
    WHERE rk <= 10
    ORDER BY event_type, rk
    """,
)
def skew_salted_topk_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnflow_spark.functions.skew import salted_topk

    events = load_table(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    top = salted_topk(
        events,
        keys=["event_type"],
        order_cols=[F.desc("value"), F.asc("event_id")],
        k=10,
        salt_src=F.col("event_id"),
    )
    return top.select("event_type", "rk", "event_id", "value").orderBy("event_type", "rk")


# --- gap-fill + LOCF resample: the standard time-series densification
# (TimescaleDB time_bucket_gapfill + locf; Flink/beam watermark fills) —
# an hourly spine per entity, the hour's closing aggregate where data
# exists, last-observation-carried-forward where it does not.
_LOCF_USER_PRED = "user_id % 10 = 3"  # the bounded serving subset


@query(
    "events_gap_fill_locf",
    oracle=f"""
    WITH sub AS (
        SELECT user_id, ts, value FROM events WHERE {_LOCF_USER_PRED}
    ),
    bounds AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM sub GROUP BY user_id
    ),
    spine AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ),
    hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h, round(max(value), 4) AS v
        FROM sub GROUP BY 1, 2
    )
    SELECT s.user_id, s.h,
           last_value(hr.v IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.h
           ) AS v_locf,
           (hr.v IS NULL) AS is_gap
    FROM spine s LEFT JOIN hourly hr ON hr.user_id = s.user_id AND hr.h = s.h
    """,
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled series per user with LOCF: ``(user_id, h,
    v_locf, is_gap)``.  The hour's observed value is its max (a
    deterministic closing aggregate — no composite-key tie-break
    needed); empty hours carry the last observed value forward.

    Plan shape: the spine is generated IN-ROW from per-user bounds
    (sequence + explode — no driver loop, no cross join against an hour
    dimension), the hourly aggregate is one user/hour shuffle, and the
    fill is one user-partitioned window.  Spine volume is bounded by
    entities x span-hours — the resample contract — and each user's
    series lives in one partition, so the window never sees another
    user's rows."""
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts", "value"])
    sub = ev.filter(F.expr(_LOCF_USER_PRED))
    bounds = sub.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        "user_id", F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
    )
    hourly = sub.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.max("value"), 4).alias("v"))
    win = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            "h",
            F.last("v", ignorenulls=True).over(win).alias("v_locf"),
            F.col("v").isNull().alias("is_gap"),
        )
    )


# --- KMV (bottom-k / K-Minimum-Values) distinct sketches: the
# DataSketches theta-sketch family's deterministic core.  Unlike HLL
# (approx_distinct_users above, rows-only checked), a KMV sketch is a
# PURE FUNCTION of the input set — the k smallest 60-bit sha256 hashes —
# so merge (k smallest of the union), estimation ((k-1) * H_MAX // h_k,
# exact integer division), and set-intersection (Jaccard over the
# merged sketch x union estimate) all replay bit-identically in SQL.
# The sketch is the mergeable-summary contract: per-partition bottom-k
# partials combine associatively (salted_topk's phase 1), exactly how a
# 100 TB distinct-count rolls up.
_KMV_K = 64
_KMV_HMAX = 16**15  # 60-bit hash space (15 hex chars)

_KMV_HASH_SQL = "('0x' || substr(sha256(user_id::VARCHAR), 1, 15))::BIGINT"

_KMV_SKETCH_CTES = f"""
    hashes AS (
        SELECT DISTINCT event_type, {_KMV_HASH_SQL} AS h FROM events
    ),
    sk AS (
        SELECT event_type, h, rk FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
            FROM hashes
        ) WHERE rk <= {_KMV_K}
    ),
    est AS (
        SELECT event_type,
               CAST(max(rk) AS BIGINT) AS k_used,
               CAST(max(h) FILTER (WHERE rk = {_KMV_K}) AS BIGINT) AS h_k,
               CAST(CASE WHEN max(rk) < {_KMV_K} THEN max(rk)
                    ELSE CAST(({_KMV_K} - 1)::HUGEINT * {_KMV_HMAX}
                         // (max(h) FILTER (WHERE rk = {_KMV_K})) AS BIGINT)
               END AS BIGINT) AS est_q
        FROM sk GROUP BY event_type
    )"""


@query(
    "kmv_distinct_sketch",
    oracle=f"""
    WITH {_KMV_SKETCH_CTES}
    SELECT event_type, k_used, h_k, est_q FROM est ORDER BY event_type
    """,
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KMV sketch summary ``(event_type, k_used, h_k,
    est_q)`` — the distinct-user estimate from the k-th minimum hash
    (exact count when the group holds fewer than k distinct values).

    Plan shape: one distinct over (type, hash) with map-side combine,
    then the two-phase salted bottom-k — no per-type single-task sort
    at any scale; the estimate is an exact integer division."""
    from columnflow_spark.functions.hashing import seed_long
    from columnflow_spark.functions.skew import salted_topk

    ev = load_table(spark, sf_dir, "events", columns=["event_type", "user_id"])
    hashes = ev.select(
        "event_type", seed_long(F.col("user_id")).alias("h")
    ).distinct()
    sk = salted_topk(
        hashes, ["event_type"], [F.asc("h")], _KMV_K, salt_src=F.col("h")
    )
    return kmv_summarize(sk)


def kmv_summarize(sk: DataFrame) -> DataFrame:
    """``(event_type, k_used, h_k, est_q)`` from a ranked sketch frame
    ``(event_type, h, rk)`` — shared by the one-pass build, the
    incremental store serve, and the streaming ingest twin."""
    return (
        sk.groupBy("event_type")
        .agg(
            F.max("rk").cast("long").alias("k_used"),
            F.max(F.when(F.col("rk") == _KMV_K, F.col("h")))
            .cast("long")
            .alias("h_k"),
        )
        .select(
            "event_type",
            "k_used",
            "h_k",
            F.when(F.col("k_used") < _KMV_K, F.col("k_used"))
            .otherwise(F.expr(f"CAST((({_KMV_K} - 1) * CAST({_KMV_HMAX} AS DECIMAL(38,0))) div h_k AS BIGINT)"))
            .cast("long")
            .alias("est_q"),
        )
        .orderBy("event_type")
    )


@query(
    "kmv_set_intersection",
    oracle=f"""
    WITH {_KMV_SKETCH_CTES},
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM (SELECT DISTINCT event_type FROM events) a
        JOIN (SELECT DISTINCT event_type FROM events) b
          ON a.event_type < b.event_type
    ),
    merged AS (
        SELECT p.ta, p.tb, u.h,
               row_number() OVER (PARTITION BY p.ta, p.tb ORDER BY u.h) AS rk
        FROM pairs p
        JOIN (SELECT DISTINCT s.event_type, s.h FROM sk s) u
          ON u.event_type IN (p.ta, p.tb)
        GROUP BY p.ta, p.tb, u.h
    ),
    unioned AS (
        SELECT ta, tb, h, rk FROM merged WHERE rk <= {_KMV_K}
    ),
    summary AS (
        SELECT u.ta, u.tb,
               CAST(max(u.rk) AS BIGINT) AS k_used,
               CAST(CASE WHEN max(u.rk) < {_KMV_K} THEN max(u.rk)
                    ELSE CAST(({_KMV_K} - 1)::HUGEINT * {_KMV_HMAX}
                         // (max(u.h) FILTER (WHERE u.rk = {_KMV_K})) AS BIGINT)
               END AS BIGINT) AS union_q,
               CAST(sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS shared
        FROM unioned u
        LEFT JOIN sk sa ON sa.event_type = u.ta AND sa.h = u.h
        LEFT JOIN sk sb ON sb.event_type = u.tb AND sb.h = u.h
        GROUP BY u.ta, u.tb
    )
    SELECT ta, tb, k_used, shared, union_q,
           CAST(shared * union_q // k_used AS BIGINT) AS inter_q
    FROM summary ORDER BY ta, tb
    """,
)
def kmv_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user overlap between every event-type pair, estimated
    ENTIRELY from the per-type KMV sketches (never from the raw data):
    merge = k smallest of the union, Jaccard = shared fraction of the
    merged sketch, intersection = Jaccard x union estimate — the theta-
    sketch intersection recipe on exact integer grids.

    Plan shape: everything after the sketch build runs at SKETCH grain
    (|types| x k rows) — the raw corpus is touched once."""
    from columnflow_spark.functions.hashing import seed_long
    from columnflow_spark.functions.skew import salted_topk

    ev = load_table(spark, sf_dir, "events", columns=["event_type", "user_id"])
    hashes = ev.select(
        "event_type", seed_long(F.col("user_id")).alias("h")
    ).distinct()
    sk = (
        salted_topk(hashes, ["event_type"], [F.asc("h")], _KMV_K, salt_src=F.col("h"))
        .select("event_type", "h", "rk")
        .transform(checkpoint_df)  # sketch grain: |types| x k rows, reused 4x
    )
    types = sk.select("event_type").distinct()
    pairs = (
        types.withColumnRenamed("event_type", "ta")
        .crossJoin(types.withColumnRenamed("event_type", "tb"))
        .filter(F.col("ta") < F.col("tb"))
    )
    u = sk.select("event_type", "h")
    merged = (
        pairs.join(
            F.broadcast(u),
            (F.col("event_type") == F.col("ta"))
            | (F.col("event_type") == F.col("tb")),
        )
        .select("ta", "tb", "h")
        .distinct()
    )
    mwin = W.partitionBy("ta", "tb").orderBy("h")
    unioned = merged.withColumn("rk", F.row_number().over(mwin)).filter(
        F.col("rk") <= _KMV_K
    )
    sa = sk.select(F.col("event_type").alias("ta"), F.col("h").alias("h"), F.lit(True).alias("in_a"))
    sb = sk.select(F.col("event_type").alias("tb"), F.col("h").alias("h"), F.lit(True).alias("in_b"))
    summary = (
        unioned.join(F.broadcast(sa), ["ta", "h"], "left")
        .join(F.broadcast(sb), ["tb", "h"], "left")
        .groupBy("ta", "tb")
        .agg(
            F.max("rk").cast("long").alias("k_used"),
            F.max(F.when(F.col("rk") == _KMV_K, F.col("h"))).alias("h_k"),
            F.sum(
                F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0)
            ).cast("long").alias("shared"),
        )
        .select(
            "ta",
            "tb",
            "k_used",
            "shared",
            F.when(F.col("k_used") < _KMV_K, F.col("k_used"))
            .otherwise(
                F.expr(f"CAST((({_KMV_K} - 1) * CAST({_KMV_HMAX} AS DECIMAL(38,0))) div h_k AS BIGINT)")
            )
            .cast("long")
            .alias("union_q"),
        )
    )
    return summary.select(
        "ta",
        "tb",
        "k_used",
        "shared",
        "union_q",
        F.expr("shared * union_q div k_used").cast("long").alias("inter_q"),
    ).orderBy("ta", "tb")


# --- incremental KMV sketch store: the mergeable-summary maintenance
# demo.  Each ingest batch persists ONLY its own bottom-k per group (a
# |types| x k slice — the sketch property: the merged bottom-k of
# per-batch bottom-ks equals the bottom-k of the union), and the serve
# merges slices at sketch grain.  Deletes are deliberately ABSENT:
# bottom-k sketches are not inverse-closed (a forgotten user's hash may
# be one of the k minima and cannot be un-taken without the raw data) —
# the delete story for sketch stores is a rebuild, documented here
# rather than faked.
def _kmv_store_path(sf_dir: str) -> str:
    import os

    from columnflow_spark.queries.annindex import content_tag, scratch_root
    from columnflow_spark.sources.tables import table_path

    tag = content_tag(table_path(sf_dir, "events"), f"kmv-k{_KMV_K}-v1")
    return os.path.join(scratch_root(), "kmv_store", tag)


def _kmv_batch_sketch(ev: DataFrame) -> DataFrame:
    """Per-type bottom-k over one batch's events: ``(event_type, h)``."""
    from columnflow_spark.functions.hashing import seed_long
    from columnflow_spark.functions.skew import salted_topk

    hashes = ev.select(
        "event_type", seed_long(F.col("user_id")).alias("h")
    ).distinct()
    return salted_topk(
        hashes, ["event_type"], [F.asc("h")], _KMV_K, salt_src=F.col("h")
    ).select("event_type", "h")


def kmv_store_serve(spark: SparkSession, path: str) -> DataFrame:
    """Merge the store's per-batch sketch slices into the group sketch
    and summarize — the rank window runs over sketch-grain rows only
    (batches x types x k), never the raw corpus."""
    merged = spark.read.parquet(path).select("event_type", "h").distinct()
    win = W.partitionBy("event_type").orderBy("h")
    sk = merged.withColumn("rk", F.row_number().over(win)).filter(
        F.col("rk") <= _KMV_K
    )
    return kmv_summarize(sk)


@query(
    "kmv_incremental_sketch",
    oracle=f"""
    WITH {_KMV_SKETCH_CTES}
    SELECT event_type, k_used, h_k, est_q FROM est ORDER BY event_type
    """,
)
def kmv_incremental_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV sketch maintained incrementally: events ingested in
    three event_id-range batches, each persisting only its own bottom-k
    slice; the merged serve is hash-equal to the from-scratch sketch —
    the mergeability proof."""
    import os

    from columnflow_spark.sources.sinks import upsert_partitions

    path = _kmv_store_path(sf_dir)
    done = os.path.join(path, "_SEQ_COMPLETE")
    if not os.path.exists(done):
        ev = load_table(spark, sf_dir, "events", columns=["event_id", "event_type", "user_id"])
        n = _events_count(spark, sf_dir)
        for b, (lo, hi) in enumerate(((0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1))):
            rows = _kmv_batch_sketch(
                ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
            ).withColumn("batch", F.lit(b))
            upsert_partitions(rows, path, partition_by=["batch"])
        with open(done, "w") as f:
            f.write("kmv ingest complete\n")
    return kmv_store_serve(spark, path)


# --- Poisson bootstrap confidence interval (Chamandy et al., "Estimating
# Uncertainty for Massive Data Streams" — the Google one-pass bootstrap):
# B resample replicas of mean(value) per group, each row weighted by an
# independent Poisson(1) draw, so the resample happens INSIDE one
# distributed aggregation instead of B data passes.  Determinism: the
# draw for (event, replica) inverts the Poisson CDF at the 60-bit sha256
# hash u, compared against PRECOMPUTED INTEGER thresholds (u and t_k
# both exact integers — no float op anywhere in the draw), so both
# engines produce the identical weight table.
_BOOT_B = 32
#: ceil-free integer thresholds t_k = floor(CDF_Poisson1(k) * 16^15):
#: weight(u) = #{k : u >= t_k}, capped at 8 (P(X>8|lambda=1) ~ 1e-6)
_BOOT_THRESH = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
    1152825534095764608,
    1152909688087595776,
)
_BOOT_VSCALE = 10_000  # value grid 1e-4
_BOOT_LO_IDX = 2  # 2nd smallest of 32 ~ 5th percentile
_BOOT_HI_IDX = 31  # 31st of 32 ~ 95th percentile


def _boot_weight_sql(u: str) -> str:
    return "(" + " + ".join(f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END" for t in _BOOT_THRESH) + ")"


@query(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH base AS (
        SELECT event_type, event_id,
               CAST(round(value * {_BOOT_VSCALE}) AS BIGINT) AS v_q
        FROM events
    ),
    rep AS (
        SELECT b.event_type, r.b, b.v_q,
               {_boot_weight_sql(f"(('0x' || substr(sha256(b.event_id || '|' || r.b), 1, 15))::BIGINT)")} AS w
        FROM base b CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b) r
    ),
    means AS (
        SELECT event_type, b,
               CAST(sum(w * v_q) // greatest(sum(w), 1) AS BIGINT) AS m_q
        FROM rep GROUP BY event_type, b
    ),
    ranked AS (
        SELECT event_type, m_q,
               row_number() OVER (PARTITION BY event_type ORDER BY m_q, b) AS rk
        FROM means
    ),
    full_mean AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v_q) // count(*) AS BIGINT) AS mean_q
        FROM base GROUP BY event_type
    )
    SELECT f.event_type, f.n, f.mean_q,
           max(CASE WHEN r.rk = {_BOOT_LO_IDX} THEN r.m_q END) AS lo_q,
           max(CASE WHEN r.rk = {_BOOT_HI_IDX} THEN r.m_q END) AS hi_q
    FROM full_mean f JOIN ranked r USING (event_type)
    GROUP BY f.event_type, f.n, f.mean_q
    ORDER BY f.event_type
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mean with a {B}-replica Poisson-bootstrap CI:
    ``(event_type, n, mean_q, lo_q, hi_q)`` on the 1e-4 grid.

    Plan shape: ONE corpus pass exploded x{B} with map-side partial sums
    into (group, replica) grain (the whole bootstrap is a single
    aggregation — never B passes); the CI rank runs over |groups| x {B}
    rows."""
    from columnflow_spark.functions.hashing import seed_long

    ev = load_table(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    base = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * _BOOT_VSCALE, 0).cast("long").alias("v_q"),
    )
    rep = base.select(
        "event_type",
        "v_q",
        F.posexplode(F.expr(f"array_repeat(event_id, {_BOOT_B})")).alias("b", "eid"),
    ).select(
        "event_type",
        "v_q",
        "b",
        F.expr(
            _boot_weight_sql(
                f"conv(substr(sha2(concat_ws('|', eid, b), 256), 1, 15), 16, 10)"
            )
        ).alias("w"),
    )
    means = rep.groupBy("event_type", "b").agg(
        F.expr("CAST(sum(w * v_q) div greatest(sum(w), 1) AS BIGINT)").alias("m_q")
    )
    rwin = W.partitionBy("event_type").orderBy("m_q", "b")
    ranked = means.withColumn("rk", F.row_number().over(rwin))
    full_mean = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("CAST(sum(v_q) div count(*) AS BIGINT)").alias("mean_q"),
    )
    return (
        full_mean.join(ranked, "event_type")
        .groupBy("event_type", "n", "mean_q")
        .agg(
            F.max(F.when(F.col("rk") == _BOOT_LO_IDX, F.col("m_q"))).alias("lo_q"),
            F.max(F.when(F.col("rk") == _BOOT_HI_IDX, F.col("m_q"))).alias("hi_q"),
        )
        .orderBy("event_type")
    )


# --- sliding-window distinct counts from daily KMV sketches: the
# pre-aggregation pattern that makes sketches pay — ONE corpus pass
# builds a bottom-k per day, and every overlapping 7-day window is then
# answered by merging 7 tiny sketches (|days| x k rows), never by
# rescanning events.  An exact sliding count(DISTINCT) would have to
# re-shuffle the raw rows once per window.
_KMV_WIN_DAYS = 7


@query(
    "kmv_sliding_window_distinct",
    oracle=f"""
    WITH daily AS (
        SELECT date_trunc('day', ts) AS day,
               {_KMV_HASH_SQL} AS h
        FROM events GROUP BY 1, 2
    ),
    dsk AS (
        SELECT day, h FROM (
            SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rk
            FROM daily
        ) WHERE rk <= {_KMV_K}
    ),
    days AS (SELECT DISTINCT day FROM dsk),
    winmerge AS (
        SELECT w.day, s.h,
               row_number() OVER (PARTITION BY w.day ORDER BY s.h) AS rk
        FROM days w
        JOIN (SELECT DISTINCT day, h FROM dsk) s
          ON s.day BETWEEN w.day - INTERVAL {_KMV_WIN_DAYS - 1} DAY AND w.day
        GROUP BY w.day, s.h
    )
    SELECT day,
           CAST(max(rk) AS BIGINT) AS k_used,
           CAST(CASE WHEN max(rk) < {_KMV_K} THEN max(rk)
                ELSE CAST(({_KMV_K} - 1)::HUGEINT * {_KMV_HMAX}
                     // (max(h) FILTER (WHERE rk = {_KMV_K})) AS BIGINT)
           END AS BIGINT) AS est_q
    FROM winmerge WHERE rk <= {_KMV_K} GROUP BY day ORDER BY day
    """,
)
def kmv_sliding_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{d}-day distinct-user estimates per day, computed by
    merging the persisted DAILY sketches: ``(day, k_used, est_q)``.

    Plan shape: one corpus distinct into daily bottom-ks (checkpointed
    — sketch grain), then a bounded day-range self-join + rank entirely
    at |days| x k volume."""
    from columnflow_spark.functions.hashing import seed_long
    from columnflow_spark.functions.skew import salted_topk

    ev = load_table(spark, sf_dir, "events", columns=["ts", "user_id"])
    daily = ev.select(
        F.date_trunc("day", "ts").alias("day"), seed_long(F.col("user_id")).alias("h")
    ).distinct()
    dsk = (
        salted_topk(daily, ["day"], [F.asc("h")], _KMV_K, salt_src=F.col("h"))
        .select("day", "h")
        .transform(checkpoint_df)  # sketch grain: |days| x k
    )
    days = dsk.select("day").distinct()
    joined = (
        days.withColumnRenamed("day", "wday")
        .join(
            dsk,
            (F.col("day") <= F.col("wday"))
            & (F.col("day") >= F.col("wday") - F.expr(f"INTERVAL {_KMV_WIN_DAYS - 1} DAY")),
        )
        .select(F.col("wday").alias("day"), "h")
        .distinct()
    )
    win = W.partitionBy("day").orderBy("h")
    merged = joined.withColumn("rk", F.row_number().over(win)).filter(
        F.col("rk") <= _KMV_K
    )
    return (
        merged.groupBy("day")
        .agg(
            F.max("rk").cast("long").alias("k_used"),
            F.max(F.when(F.col("rk") == _KMV_K, F.col("h"))).alias("h_k"),
        )
        .select(
            "day",
            "k_used",
            F.when(F.col("k_used") < _KMV_K, F.col("k_used"))
            .otherwise(
                F.expr(f"CAST((({_KMV_K} - 1) * CAST({_KMV_HMAX} AS DECIMAL(38,0))) div h_k AS BIGINT)")
            )
            .cast("long")
            .alias("est_q"),
        )
        .orderBy("day")
    )


# --- trimmed (winsor-free) mean: the robust location estimate metric
# pipelines quote next to the mean (drop the top and bottom 5% by exact
# rank, average the middle 90%) — immune to the heavy-tail events that
# make raw means jump between runs.  Exact: integer-grid values, exact
# rank bounds, ONE fixed division at the end.
_TRIM_PCT = 5  # drop lowest/highest 5%


@query(
    "trimmed_mean_values",
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CAST(round(value * 10000) AS BIGINT) AS v_q,
               row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(v_q) // count(*) AS BIGINT) AS trimmed_mean_q
    FROM base
    WHERE rk > n * {_TRIM_PCT} // 100 AND rk <= n - n * {_TRIM_PCT} // 100
    GROUP BY event_type ORDER BY event_type
    """,
)
def trimmed_mean_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(event_type, n, n_kept, trimmed_mean_q)`` — the 5-95% trimmed
    mean on the 1e-4 grid, via exact histogram ranks (VERDICT r9 weak
    #1): the oracle's corpus-grain rank window would funnel each whole
    event_type (~20 TB/task at 100 TB with ~5 types) through one task.

    Because the grid value ``v_q = round(value * 1e4)`` is monotone in
    ``value``, a rank window ordered by raw value assigns every v_q
    bucket a contiguous rank range — so the kept-row count and v_q sum
    per bucket follow from cumulative bucket counts alone.  Which rows
    of a cut-straddling bucket survive is irrelevant: they all carry the
    same v_q.  Plan: one map-side-combinable groupBy(event_type, v_q),
    then cumulative windows over the grid-bounded distinct-value table —
    identical integers to the oracle's window, no corpus sort."""
    ev = load_table(spark, sf_dir, "events", columns=["event_type", "value"])
    hist = ev.groupBy(
        "event_type", F.round(F.col("value") * 10000, 0).cast("long").alias("v_q")
    ).agg(F.count(F.lit(1)).alias("c"))
    wcum = W.partitionBy("event_type").orderBy("v_q")
    cum = hist.select(
        "event_type",
        "v_q",
        "c",
        (F.sum("c").over(wcum) - F.col("c")).alias("below"),
        F.sum("c").over(W.partitionBy("event_type")).alias("n"),
    )
    lo = F.expr(f"n * {_TRIM_PCT} div 100")
    hi = F.col("n") - lo
    # overlap of this bucket's rank range (below, below + c] with the
    # kept range (lo, hi]
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("below") + F.col("c"), hi) - F.greatest(F.col("below"), lo),
    )
    return (
        cum.select("event_type", "n", kept.alias("kept"), (kept * F.col("v_q")).alias("kept_sum"))
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum("kept").cast("long").alias("n_kept"),
            F.expr("CAST(sum(kept_sum) div sum(kept) AS BIGINT)").alias("trimmed_mean_q"),
        )
        .orderBy("event_type")
    )


# --- mergeable quantile sketch (VERDICT r9 next #3 — completes the
# counts/CMS + distincts/KMV + quantiles observability trio).  The
# summary is a bottom-k-by-seeded-hash row sample per group
# ("priority sample"): row r is retained iff its 60-bit sha256 hash is
# among the group's k smallest.  That single rule gives every property
# the 100 TB maintenance story needs, all by construction:
#
# - **mergeable / order-invariant**: bottom-k of a union is the
#   bottom-k of per-part bottom-ks — per-batch slices merge
#   associatively under ANY partitioning or arrival order (the KMV
#   property, reused verbatim).  KLL's compactor hierarchy was
#   considered and rejected for the engine: its compaction decisions
#   depend on stream ORDER, so a distributed build would need a fixed
#   merge tree to be deterministic — the hash-rank sample has the same
#   O(1/sqrt(k)) rank-error class per stored row with none of that
#   coupling, and replays exactly in SQL.
# - **deterministic / exact-replayable**: membership is a pure function
#   of event_id; the estimate reads the sample element at an exact
#   integer ceil-rank on the 1e-4 value grid — no float op anywhere.
# - **store + streaming**: per-batch ``batch=`` slices of (h, v_q),
#   serve = distinct-merge + rank at SKETCH grain (|types| x k x
#   |batches| rows).  Deletes: like KMV, bottom-k is not
#   inverse-closed (a dropped row's hash cannot be un-taken without the
#   raw data) — the delete story is a rebuild, documented not faked.
_QSK_K = 256
_QSK_VSCALE = 10_000  # value grid 1e-4
_QSK_PCTS = (50, 90, 99)

_QSK_HASH_SQL = "('0x' || substr(sha256(event_id || '|qsk'), 1, 15))::BIGINT"


def _qsk_sketch_ctes(where: str = "") -> str:
    """The sketch build CTE chain; ``where`` filters the event universe
    (the delete twin's oracle sketches the REDUCED corpus — delete =
    per-slice rebuild, so the store must land exactly there)."""
    return f"""
    qhashes AS (
        SELECT DISTINCT event_type, {_QSK_HASH_SQL} AS h,
               CAST(round(value * {_QSK_VSCALE}) AS BIGINT) AS v_q
        FROM events {where}
    ),
    qsk AS (
        SELECT event_type, h, v_q FROM (
            SELECT event_type, h, v_q,
                   row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
            FROM qhashes
        ) WHERE rk <= {_QSK_K}
    ),
    qranked AS (
        SELECT event_type, v_q,
               row_number() OVER (PARTITION BY event_type ORDER BY v_q, h) AS vrk,
               count(*) OVER (PARTITION BY event_type) AS k_used
        FROM qsk
    ),
    qest AS (
        SELECT event_type, CAST(max(k_used) AS BIGINT) AS k_used,
               {", ".join(
                   f"CAST(max(v_q) FILTER (WHERE vrk = (({p} * k_used + 99) // 100)) AS BIGINT) AS p{p}_q"
                   for p in _QSK_PCTS
               )}
        FROM qranked GROUP BY event_type
    )"""


_QSK_SKETCH_CTES = _qsk_sketch_ctes()


def _qsk_batch_sample(ev: DataFrame) -> DataFrame:
    """Bottom-k-by-hash sample of one batch: ``(event_type, h, v_q)``."""
    from columnflow_spark.functions.hashing import seed_long
    from columnflow_spark.functions.skew import salted_topk

    rows = ev.select(
        "event_type",
        seed_long(F.col("event_id"), F.lit("qsk")).alias("h"),
        F.round(F.col("value") * _QSK_VSCALE, 0).cast("long").alias("v_q"),
    ).distinct()
    return salted_topk(
        rows, ["event_type"], [F.asc("h")], _QSK_K, salt_src=F.col("h")
    ).select("event_type", "h", "v_q")


def qsk_summarize(sample: DataFrame, group_col: str = "event_type") -> DataFrame:
    """``(<group>, k_used, p50_q, p90_q, p99_q)`` from a sketch-grain
    sample frame — the element at exact ceil-rank ``(p * k + 99) div
    100`` of the (v_q, h)-sorted sample; shared by the one-pass build,
    the incremental store serve, the sliding-window merge, and the
    streaming ingest twin."""
    vwin = W.partitionBy(group_col).orderBy("v_q", "h")
    ranked = sample.select(
        group_col,
        "v_q",
        "h",
        F.row_number().over(vwin).alias("vrk"),
        F.count(F.lit(1)).over(W.partitionBy(group_col)).alias("k_used"),
    )
    return (
        ranked.groupBy(group_col)
        .agg(
            F.max("k_used").cast("long").alias("k_used"),
            *[
                F.max(
                    F.when(
                        F.col("vrk") == F.expr(f"({p} * k_used + 99) div 100"),
                        F.col("v_q"),
                    )
                )
                .cast("long")
                .alias(f"p{p}_q")
                for p in _QSK_PCTS
            ],
        )
        .orderBy(group_col)
    )


@query(
    "quantile_sketch_values",
    oracle=f"""
    WITH {_QSK_SKETCH_CTES}
    SELECT event_type, k_used, p50_q, p90_q, p99_q FROM qest ORDER BY event_type
    """,
)
def quantile_sketch_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass quantile sketch per event_type: p50/p90/p99 estimates on
    the 1e-4 grid from the bottom-256-by-hash row sample.

    Plan shape: one distinct with map-side combine, the two-phase salted
    bottom-k, then rank windows over SKETCH-grain rows only (|types| x
    k) — the corpus is scanned once and never group-sorted."""
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    return qsk_summarize(_qsk_batch_sample(ev))


def _qsk_store_path(sf_dir: str, variant: str = "") -> str:
    import os

    from columnflow_spark.queries.annindex import content_tag, scratch_root
    from columnflow_spark.sources.tables import table_path

    # v2: the store carries a _slices sidecar (batch boundaries) so the
    # delete contract can rebuild exactly the affected slices
    tag = content_tag(table_path(sf_dir, "events"), f"qsk{variant}-k{_QSK_K}-v2")
    return os.path.join(scratch_root(), "qsk_store", tag)


def _build_qsk_store(spark: SparkSession, sf_dir: str, p: str) -> None:
    """Three event_id-range ingest slices + the ``_slices`` boundary
    sidecar (what makes a per-slice rebuild operational) + the sequence
    marker — written at the staging path ``ensure_store`` gives us."""
    import os

    from columnflow_spark.sources.sinks import upsert_partitions

    ev = load_table(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    n = _events_count(spark, sf_dir)
    bounds = [(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n + 1)]
    for b, (lo, hi) in enumerate(bounds):
        rows = _qsk_batch_sample(
            ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        ).withColumn("batch", F.lit(b))
        upsert_partitions(rows, p, partition_by=["batch"])
    from columnflow_spark.sources.sinks import tiny_rows_df

    # one-partition sidecar (r14): coalesce(1) on a createDataFrame list
    # serialized 32 Python partitions into one task — see sinks.tiny_rows_df
    slices = tiny_rows_df(
        spark, [(b, lo, hi) for b, (lo, hi) in enumerate(bounds)], "batch int, lo long, hi long"
    )
    slices.write.mode("overwrite").parquet(os.path.join(p, "_slices"))
    with open(os.path.join(p, "_SEQ_COMPLETE"), "w") as f:
        f.write("qsk ingest complete\n")


def _ensure_qsk_store(spark: SparkSession, sf_dir: str, path: str | None = None) -> str:
    from columnflow_spark.sources.sinks import ensure_store

    return ensure_store(
        path or _qsk_store_path(sf_dir),
        lambda p: _build_qsk_store(spark, sf_dir, p),
        marker="_SEQ_COMPLETE",
    )


def qsk_store_serve(spark: SparkSession, path: str) -> DataFrame:
    """Merge the per-batch sample slices (distinct-union — an aggregate
    at sketch grain) and re-take the bottom-k before summarizing: the
    merged bottom-k of per-batch bottom-ks IS the corpus bottom-k."""
    merged = spark.read.parquet(path).select("event_type", "h", "v_q").distinct()
    win = W.partitionBy("event_type").orderBy("h")
    sk = (
        merged.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= _QSK_K)
        .select("event_type", "h", "v_q")
    )
    return qsk_summarize(sk)


# --- quantile-sketch deletion (VERDICT r11 missing #3): bottom-k by
# hash is not inverse-closed — a dropped row's hash cannot be un-taken
# without the raw data — so delete = REBUILD is the honest contract.
# This makes it OPERATIONAL instead of manual: delete requests land as
# ``_deleted`` tombstone slices (the store-contract event every other
# family has), and the serve path settles them by rebuilding ONLY the
# ingest slices whose event_id range contains a deleted id (the
# ``_slices`` boundary sidecar makes that bounded — never the corpus).
# After the per-slice rebuild the merged serve is hash-equal to the
# from-scratch sketch of the REDUCED corpus, which is exactly the
# oracle. ---
_QSK_DELETE_MOD, _QSK_DELETE_REM = 13, 5


def qsk_request_delete(ids: DataFrame, path: str, *, batch: int = 0) -> None:
    """Record a delete request (``event_id`` rows) as the store's
    tombstone slice — the asynchronous half of the contract; nothing is
    rebuilt until a serve settles it."""
    from columnflow_spark.sources.sinks import upsert_tombstones

    upsert_tombstones(ids, path, batch=batch, id_col="event_id")


def qsk_apply_deletes(spark: SparkSession, sf_dir: str, path: str) -> list[int]:
    """Settle pending delete requests: rebuild exactly the slices whose
    id range contains a deleted id (each a range-pruned source re-read
    minus the broadcast delete set), then clear the tombstones.
    Returns the rebuilt batch ids ([] when nothing was pending).
    Re-running after a crash between rebuild and clear re-rebuilds the
    same slices to the same bytes — idempotent."""
    import os

    from columnflow_spark.sources.sinks import (
        clear_tombstones,
        read_tombstones,
        upsert_partitions,
    )

    del_ids = read_tombstones(spark, path, id_col="event_id")
    if del_ids is None:
        return []
    del_ids = del_ids.transform(checkpoint_df)
    slices = spark.read.parquet(os.path.join(path, "_slices"))
    # ONE driver collect: the affected slices WITH their bounds (the
    # unaffected slices' bounds are never needed) — r13, guide §5.2
    affected = sorted(
        (
            (r.batch, r.lo, r.hi)
            for r in slices.join(
                F.broadcast(del_ids),
                (F.col("event_id") >= F.col("lo")) & (F.col("event_id") < F.col("hi")),
                "left_semi",
            ).collect()
        ),
    )  # bounded: at most the slice count
    if not affected:
        clear_tombstones(path)
        return []
    ev = load_table(spark, sf_dir, "events", columns=["event_id", "event_type", "value"])
    # ALL affected slices rebuild in ONE job + ONE dynamic-overwrite
    # write (r13, guide §2.1/§5.3: the per-slice driver loop scheduled
    # checkpoint + isEmpty + write PER slice — 3 sequential write jobs
    # for this workload's delete set, and O(slices) at cluster scale).
    # Slice ranges are disjoint, so tagging each surviving row with its
    # slice id and ranking per (batch, event_type) yields bit-identical
    # rows to the per-slice rebuilds: the per-slice distinct becomes a
    # (batch, ...) distinct and the per-slice bottom-k a per-(batch,
    # event_type) bottom-k over the same row sets.
    from columnflow_spark.functions.hashing import seed_long
    from columnflow_spark.functions.skew import salted_topk

    # membership filter stays an OR of range predicates (parquet row-group
    # stats on event_id can skip unaffected ranges at the SCAN), but the
    # slice TAG is a broadcast range join against the bounded (batch, lo,
    # hi) frame instead of an O(slices) nested when/otherwise chain
    # (ADVICE r13: deep literal expression chains can exceed Catalyst/
    # codegen expression-tree limits at the cluster-scale slice counts
    # this settle targets).  Ranges are disjoint, so each surviving event
    # matches exactly one bounds row — the join IS the old when-chain.
    in_affected = None
    for _b, lo, hi in affected:
        pred = (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        in_affected = pred if in_affected is None else (pred | in_affected)
    bounds = spark.createDataFrame(
        [(int(b), int(lo), int(hi)) for b, lo, hi in affected],
        "batch int, lo long, hi long",
    )
    src = (
        ev.filter(in_affected)
        .join(F.broadcast(del_ids), "event_id", "left_anti")
        .join(
            F.broadcast(bounds),
            (F.col("event_id") >= F.col("lo")) & (F.col("event_id") < F.col("hi")),
        )
    )
    keyed = src.select(
        "batch",
        "event_type",
        seed_long(F.col("event_id"), F.lit("qsk")).alias("h"),
        F.round(F.col("value") * _QSK_VSCALE, 0).cast("long").alias("v_q"),
    ).distinct()
    rows = (
        salted_topk(
            keyed, ["batch", "event_type"], [F.asc("h")], _QSK_K, salt_src=F.col("h")
        )
        .select("event_type", "h", "v_q", "batch")
        .transform(checkpoint_df)
    )
    present = {r.batch for r in rows.select("batch").distinct().collect()}
    if present:
        upsert_partitions(rows, path, partition_by=["batch"])
    for b, _lo, _hi in affected:
        if b not in present:
            # ADVICE r12: dynamic partition overwrite writes NOTHING for
            # an empty slice, so a delete set covering a whole slice
            # would leave the stale slice files serving deleted rows
            # after the tombstones clear — drop the partition explicitly
            import shutil

            shutil.rmtree(os.path.join(path, f"batch={b}"), ignore_errors=True)
    clear_tombstones(path)
    return [b for b, _lo, _hi in affected]


@query(
    "quantile_sketch_store_delete",
    oracle=f"""
    WITH {_qsk_sketch_ctes(f"WHERE event_id % {_QSK_DELETE_MOD} != {_QSK_DELETE_REM}")}
    SELECT event_type, k_used, p50_q, p90_q, p99_q FROM qest ORDER BY event_type
    """,
)
def quantile_sketch_store_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-through-the-store serve: ingest the 3-slice store, request
    deletion of the ``event_id % {_QSK_DELETE_MOD} == {_QSK_DELETE_REM}``
    rows, settle (bounded per-slice rebuild), serve — hash-equal to the
    from-scratch sketch over the reduced corpus."""
    path = _ensure_qsk_store(spark, sf_dir, _qsk_store_path(sf_dir, variant="-del"))
    ids = (
        load_table(spark, sf_dir, "events", columns=["event_id"])
        .filter(F.col("event_id") % _QSK_DELETE_MOD == _QSK_DELETE_REM)
        .select("event_id")
        .distinct()
    )
    qsk_request_delete(ids, path, batch=0)
    qsk_apply_deletes(spark, sf_dir, path)
    return qsk_store_serve(spark, path)


@query(
    "quantile_sketch_incremental",
    oracle=f"""
    WITH {_QSK_SKETCH_CTES}
    SELECT event_type, k_used, p50_q, p90_q, p99_q FROM qest ORDER BY event_type
    """,
)
def quantile_sketch_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile sketch maintained incrementally: three
    event_id-range ingest batches each persist only their own bottom-k
    slice; the merged serve is hash-equal to the from-scratch sketch
    (the mergeability proof, same shape as ``kmv_incremental_sketch``)."""
    return qsk_store_serve(spark, _ensure_qsk_store(spark, sf_dir))


# --- sliding-window quantiles from daily sketches: the same
# pre-aggregation pattern as kmv_sliding_window_distinct — ONE corpus
# pass builds a per-day bottom-k sample, and every trailing-7-day
# window's p50/p90/p99 is answered by merging <=7 tiny samples
# (re-taking the bottom-k of their union IS the window's sample, by the
# merge property), never by rescanning events.  An exact sliding
# percentile would re-shuffle the raw rows once per window.
_QSK_WIN_DAYS = 7


@query(
    "quantile_sliding_window",
    oracle=f"""
    WITH qdaily AS (
        SELECT DISTINCT date_trunc('day', ts) AS day, {_QSK_HASH_SQL} AS h,
               CAST(round(value * {_QSK_VSCALE}) AS BIGINT) AS v_q
        FROM events
    ),
    qdsk AS (
        SELECT day, h, v_q FROM (
            SELECT day, h, v_q, row_number() OVER (PARTITION BY day ORDER BY h) AS rk
            FROM qdaily
        ) WHERE rk <= {_QSK_K}
    ),
    qdays AS (SELECT DISTINCT day FROM qdsk),
    qwin AS (
        SELECT w.day, s.h, s.v_q,
               row_number() OVER (PARTITION BY w.day ORDER BY s.h) AS rk
        FROM qdays w
        JOIN (SELECT DISTINCT day, h, v_q FROM qdsk) s
          ON s.day BETWEEN w.day - INTERVAL {_QSK_WIN_DAYS - 1} DAY AND w.day
        GROUP BY w.day, s.h, s.v_q
    ),
    qwr AS (
        SELECT day, v_q,
               row_number() OVER (PARTITION BY day ORDER BY v_q, h) AS vrk,
               count(*) OVER (PARTITION BY day) AS k_used
        FROM (SELECT day, h, v_q FROM qwin WHERE rk <= {_QSK_K})
    )
    SELECT day, CAST(max(k_used) AS BIGINT) AS k_used,
           {", ".join(
               f"CAST(max(v_q) FILTER (WHERE vrk = (({p} * k_used + 99) // 100)) AS BIGINT) AS p{p}_q"
               for p in _QSK_PCTS
           )}
    FROM qwr GROUP BY day ORDER BY day
    """,
)
def quantile_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{d}-day value quantiles per day from merged DAILY
    samples: ``(day, k_used, p50_q, p90_q, p99_q)``.

    Plan shape: one corpus distinct into per-day salted bottom-ks
    (checkpointed — sketch grain), then a bounded day-range self-join,
    re-ranked bottom-k and quantile ranks entirely at |days| x k
    volume."""
    from columnflow_spark.functions.hashing import seed_long
    from columnflow_spark.functions.skew import salted_topk

    ev = load_table(spark, sf_dir, "events", columns=["event_id", "ts", "value"])
    qdaily = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        seed_long(F.col("event_id"), F.lit("qsk")).alias("h"),
        F.round(F.col("value") * _QSK_VSCALE, 0).cast("long").alias("v_q"),
    ).distinct()
    dsk = (
        salted_topk(qdaily, ["day"], [F.asc("h")], _QSK_K, salt_src=F.col("h"))
        .select("day", "h", "v_q")
        .transform(checkpoint_df)  # sketch grain: |days| x k
    )
    days = dsk.select("day").distinct()
    merged = (
        days.withColumnRenamed("day", "wday")
        .join(
            dsk,
            (F.col("day") <= F.col("wday"))
            & (F.col("day") >= F.col("wday") - F.expr(f"INTERVAL {_QSK_WIN_DAYS - 1} DAY")),
        )
        .select(F.col("wday").alias("day"), "h", "v_q")
        .distinct()
    )
    win = W.partitionBy("day").orderBy("h")
    wsk = (
        merged.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= _QSK_K)
        .select("day", "h", "v_q")
    )
    return qsk_summarize(wsk, group_col="day")
