"""Event-stream batch analytics: time bucketing, pivot, JSON
extraction, sessionization, as-of / range joins, CDC-style dedup,
percentiles.

These are the batch twins of the streaming jobs in
``cdk_serverless_data_lake_sandbox_spark.streaming`` — identical semantics, so the streaming
output can be validated against these plans.

Scale notes: every window partitions by ``user_id`` (high cardinality,
uniform), so state is evenly spread. The range join avoids the O(n^2)
per-user blow-up by bucketing time into interval-width buckets and
joining on (user, bucket) with a neighbor-bucket explode — each
candidate pair is produced exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.operators._helpers import (
    dec,
    money,
    money_sum,
    round_rat,
    sql_round_rat,
)
from cdk_serverless_data_lake_sandbox_spark.registry import register

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("events",))["events"]


# ---------------------------------------------------------------- B14
_PCTL_ORACLE = """
SELECT c_mktsegment,
  MEDIAN(o_totalprice) AS median_price,
  QUANTILE_CONT(o_totalprice, 0.95) AS p95_price,
  COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("percentiles", oracle=_PCTL_ORACLE)
def percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / p95 order price per market segment (exact,
    interpolated — same linear-interpolation semantics in Spark's
    ``percentile`` and DuckDB's ``quantile_cont``)."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("median_price"),
            F.percentile("o_totalprice", 0.95).alias("p95_price"),
            F.count("*").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------- B15
_PIVOT_ORACLE = """
SELECT DATE_TRUNC('day', ts) AS day,
  COUNT(*) FILTER (WHERE event_type = 'click') AS click_cnt,
  COUNT(*) FILTER (WHERE event_type = 'error') AS error_cnt,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase_cnt,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup_cnt,
  COUNT(*) FILTER (WHERE event_type = 'view') AS view_cnt
FROM events GROUP BY 1
"""


@register("pivot_events", oracle=_PIVOT_ORACLE)
def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot daily event counts by type. Expressed as conditional
    aggregation (one shuffle, map-side partials) rather than
    ``groupBy().pivot()``'s two-pass value discovery — the value set
    is the schema's, declared up front."""
    ev = _events(spark, sf_dir).withColumn("day", F.date_trunc("day", F.col("ts")))
    aggs = [
        F.count(F.when(F.col("event_type") == et, 1)).alias(f"{et}_cnt")
        for et in _EVENT_TYPES
    ]
    return ev.groupBy("day").agg(*aggs)


# ---------------------------------------------------------------- B16
_TIMEBUCKET_ORACLE = """
SELECT DATE_TRUNC('day', ts) AS day, event_type,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


@register("time_bucket_agg", oracle=_TIMEBUCKET_ORACLE)
def time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows via date_trunc — the batch twin of the
    streaming windowed count job."""
    return (
        _events(spark, sf_dir)
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value", 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------- B17
_JSON_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events GROUP BY 1
"""


@register("json_extract", oracle=_JSON_ORACLE)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``$.k`` out of the JSON props
    column (JVM-side ``get_json_object``, no Python) and aggregate."""
    return (
        _events(spark, sf_dir)
        .select(
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(dec("value", 2)).cast("double") / F.count("*")).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------- B18
_SESSION_GAP_S = 1800

_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR DATE_DIFF('second', LAG(ts) OVER w, ts) > {_SESSION_GAP_S}
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_id
"""


@register("sessionize", oracle=_SESSION_ORACLE)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle gap): lag -> new-session
    flag -> running sum -> group. One shuffle on user_id serves both
    windows and the final aggregation."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    is_new = F.when(gap_s.isNull() | (gap_s > _SESSION_GAP_S), 1).otherwise(0)
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.select("user_id", "ts", "event_id", is_new.alias("is_new"))
        .select("user_id", "ts", F.sum("is_new").over(wc).alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )


# ---------------------------------------------------------------- B19
_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
  (SELECT MAX(s.ts) FROM events s
   WHERE s.user_id = p.user_id AND s.event_type = 'signup'
     AND s.ts <= p.ts) AS last_signup_ts
FROM events p WHERE p.event_type = 'purchase'
"""


@register("asof_join", oracle=_ASOF_ORACLE)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest signup at or
    before it, per user. Implemented as a union + last(ignorenulls)
    window — one sort per user partition, no per-row subquery, scales
    linearly where a correlated lookup would be quadratic."""
    ev = _events(spark, sf_dir).where(F.col("event_type").isin("signup", "purchase"))
    # Signups sort before purchases at identical timestamps so that
    # s.ts <= p.ts includes the tie, matching the oracle.
    order_in_tie = F.when(F.col("event_type") == "signup", 0).otherwise(1)
    w = Window.partitionBy("user_id").orderBy("ts", order_in_tie, "event_id")
    signup_ts = F.when(F.col("event_type") == "signup", F.col("ts"))
    return (
        ev.withColumn("last_signup_ts", F.last(signup_ts, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"), "last_signup_ts")
    )


# ---------------------------------------------------------------- B20
_RANGE_WINDOW_S = 300

_RANGE_ORACLE = f"""
SELECT a.event_id AS a_id, b.event_id AS b_id,
  DATE_DIFF('second', a.ts, b.ts) AS delta_s
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
WHERE ABS(DATE_DIFF('second', a.ts, b.ts)) <= {_RANGE_WINDOW_S}
"""


@register("range_join", oracle=_RANGE_ORACLE)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: event pairs for the same user within 300 s.

    Scale path: time is hashed into 300-s buckets; side B explodes to
    its bucket±1, so the join is a pure equi-join on (user_id, bucket)
    and each qualifying pair is emitted exactly once. Candidate count
    is O(pairs-in-window), never O(n^2 per user)."""
    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts", (F.col("ts").cast("long")).alias("sec")
    )
    bucket = (F.col("sec") / _RANGE_WINDOW_S).cast("long")
    a = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("sec").alias("a_sec"),
        bucket.alias("a_bucket"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("sec").alias("b_sec"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("b_bucket"),
    )
    return (
        a.join(b, (F.col("a_user") == F.col("b_user")) & (F.col("a_bucket") == F.col("b_bucket")))
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("b_sec") - F.col("a_sec")) <= _RANGE_WINDOW_S)
        )
        .select("a_id", "b_id", (F.col("b_sec") - F.col("a_sec")).alias("delta_s"))
    )


# ---------------------------------------------------------------- B21
_DEDUP_EVENTS_ORACLE = """
SELECT event_id, user_id, event_type, ts, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


@register("dedup_events", oracle=_DEDUP_EVENTS_ORACLE)
def dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style dedup: latest event per (user, type). Window + rank
    filter — AQE prunes the rank early, no full materialization."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
    )


# ---------------------------------------------------------------- B51
_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
  GROUP BY e.user_id
)
SELECT stage, n_users FROM (
  SELECT 1 AS stage, COUNT(*) AS n_users FROM s1
  UNION ALL SELECT 2, COUNT(*) FROM s2
  UNION ALL SELECT 3, COUNT(*) FROM s3
)
"""


@register("funnel_conversion", oracle=_FUNNEL_ORACLE)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup -> click -> purchase: each stage keeps
    users whose stage event happens at-or-after their previous stage's
    first event. Three filtered aggregates chained by semi-join-style
    equi-joins on user_id — every join key is the same, so at scale
    one user_id-partitioned exchange feeds all three stages."""
    ev = _events(spark, sf_dir)
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [
        s1.agg(F.count("*").alias("n_users")).select(F.lit(1).alias("stage"), "n_users"),
        s2.agg(F.count("*").alias("n_users")).select(F.lit(2).alias("stage"), "n_users"),
        s3.agg(F.count("*").alias("n_users")).select(F.lit(3).alias("stage"), "n_users"),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


# ---------------------------------------------------------------- B52
_RETENTION_ORACLE = """
WITH first_week AS (
  SELECT user_id, MIN(DATE_TRUNC('week', ts)) AS cohort FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS wk FROM events
)
SELECT f.cohort,
  CAST(DATE_DIFF('day', f.cohort, a.wk) // 7 AS BIGINT) AS week_offset,
  COUNT(DISTINCT a.user_id) AS n_active
FROM activity a JOIN first_week f ON f.user_id = a.user_id
GROUP BY f.cohort, week_offset
"""


@register("cohort_retention", oracle=_RETENTION_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week,
    counted in each later week they return. The distinct-activity
    projection collapses the event volume to user x week before any
    join — the shuffle carries at most |users| * |weeks| rows."""
    ev = _events(spark, sf_dir)
    first_week = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    return (
        activity.join(first_week, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("wk").cast("date"), F.col("cohort").cast("date")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------- B58
_HEATMAP_ORACLE = """
SELECT CAST(DAYOFWEEK(ts) + 1 AS INTEGER) AS dow,
  CAST(HOUR(ts) AS INTEGER) AS hour,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


@register("activity_heatmap", oracle=_HEATMAP_ORACLE)
def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity grid (the ops-dashboard
    heat map): one scan, one aggregation on the 7x24 composite key.
    DuckDB's DAYOFWEEK is 0-based while Spark's is 1-based; the
    oracle shifts to match."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count("*").alias("n_events"),
        money_sum("value", 4).alias("total_value"),
    )


# ---------------------------------------------------------------- B62
_SESSION_STATS_ORACLE = f"""
WITH sessions AS ({_SESSION_ORACLE})
SELECT user_id, COUNT(*) AS n_sessions,
  {sql_round_rat("SUM(DATE_DIFF('second', session_start, session_end))",
                 'COUNT(*)', 4)} AS avg_session_s,
  CAST(MAX(DATE_DIFF('second', session_start, session_end)) AS BIGINT)
    AS max_session_s,
  CAST(SUM(n_events) AS BIGINT) AS total_events
FROM sessions GROUP BY user_id
"""


@register("session_stats", oracle=_SESSION_STATS_ORACLE)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session summary layered on the sessionize plan (the
    composability test: operators are DataFrames, so stacking another
    aggregation is free and Catalyst fuses the pipeline). Durations
    compare whole-second truncations on both engines."""
    sessions = sessionize(spark, sf_dir)
    dur = F.col("session_end").cast("long") - F.col("session_start").cast("long")
    # integer-exact mean seconds (round_rat over the duration sum)
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(dur).alias("_sd"),
            F.max(dur).cast("bigint").alias("max_session_s"),
            F.sum("n_events").cast("bigint").alias("total_events"),
        )
        .select(
            "user_id",
            "n_sessions",
            round_rat("_sd", "n_sessions", 4).alias("avg_session_s"),
            "max_session_s",
            "total_events",
        )
    )


# ---------------------------------------------------------------- B65
_SCD2_ORACLE = """
WITH changes AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN LAG(event_type) OVER w IS NULL
           OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), segments AS (
  SELECT user_id, event_type, ts,
    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
  FROM changes
), ranges AS (
  SELECT user_id, seg, event_type AS state,
    MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM segments GROUP BY user_id, seg, event_type
)
SELECT user_id, seg, state, valid_from,
  LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seg) AS valid_to,
  n_events
FROM ranges
"""


@register("scd2_ranges", oracle=_SCD2_ORACLE)
def scd2_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse each user's
    consecutive same-state events into validity ranges
    (valid_from/valid_to, open-ended current row) — change flag ->
    running segment id -> per-segment window, all on one user_id
    shuffle. The history-table shape every warehouse merge feeds."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    segments = ev.select(
        "user_id", "event_type", "ts", F.sum(chg).over(wc).alias("seg")
    )
    ranges = segments.groupBy("user_id", "seg", F.col("event_type").alias("state")).agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    wl = Window.partitionBy("user_id").orderBy("seg")
    return ranges.select(
        "user_id", "seg", "state", "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        "n_events",
    )


# ---------------------------------------------------------------- B66
_FFILL_ORACLE = """
WITH sparse AS (
  SELECT event_id, user_id, ts,
    CASE WHEN event_type <> 'error' THEN value END AS v
  FROM events
)
SELECT event_id, user_id,
  CAST(ROUND(CAST(LAST_VALUE(v IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,4)), 2) AS DOUBLE) AS filled_value
FROM sparse
"""


@register("forward_fill", oracle=_FFILL_ORACLE)
def forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last-observation-carried-forward): error events
    are treated as missing readings and repaired with the user's most
    recent valid value — LAST_VALUE IGNORE NULLS over an unbounded
    preceding frame, the standard sensor-gap repair. Rows before any
    valid reading stay null. Missingness is gated on event_type
    directly so a legitimate reading of exactly 0 is NOT overwritten
    (the old NULLIF(value*flag, 0) form conflated the two)."""
    ev = _events(spark, sf_dir)
    sparse = ev.select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sparse.select(
        "event_id", "user_id",
        F.round(
            F.last("v", ignorenulls=True).over(w).cast("decimal(18,4)"), 2
        ).cast("double").alias("filled_value"),
    )


# ---------------------------------------------------------------- B68
_REPEAT_ORACLE = f"""
WITH purchases AS (
  SELECT user_id, ts,
    epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
        ORDER BY ts, event_id)) AS gap_us
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, COUNT(gap_us) AS n_repeats,
  {sql_round_rat('SUM(gap_us)', 'COUNT(gap_us) * 3600000000', 4)}
    AS avg_gap_hours
FROM purchases WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@register("repeat_purchase_interval", oracle=_REPEAT_ORACLE)
def repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average time between consecutive purchases per user (the
    repeat-purchase cadence metric): LAG over each user's purchase
    history in exact integer microseconds, averaged and surfaced in
    hours. The event-type filter pushes into the scan."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    # integer-exact mean hours: the rational sum(gap_us) /
    # (n * 3.6e9 us-per-hour) rounded with round_rat
    return (
        purchases.groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_repeats"),
            F.sum("gap_us").alias("_sg"),
        )
        .select(
            "user_id",
            "n_repeats",
            round_rat("_sg", "n_repeats * 3600000000", 4).alias(
                "avg_gap_hours"
            ),
        )
    )


# ---------------------------------------------------------------- B69
_ORDERSIZE_ORACLE = """
WITH sizes AS (
  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey
)
SELECT n_lines, COUNT(*) AS n_orders
FROM sizes GROUP BY n_lines
"""


@register("order_size_distribution", oracle=_ORDERSIZE_ORACLE)
def order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines-per-order histogram: two-level aggregation where the
    second groupBy runs over the already-tiny per-order counts."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
        .groupBy("n_lines")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------- B78
_PIT_ORACLE = """
WITH dim AS (
  SELECT * FROM events WHERE event_type <> 'purchase'
), changes AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN LAG(event_type) OVER w IS NULL
           OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM dim
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), segments AS (
  SELECT user_id, event_type, ts,
    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg
  FROM changes
), ranges AS (
  SELECT user_id, seg, event_type AS state, MIN(ts) AS valid_from
  FROM segments GROUP BY user_id, seg, event_type
), versioned AS (
  SELECT user_id, seg, state, valid_from,
    LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seg) AS valid_to
  FROM ranges
)
SELECT p.event_id, p.user_id, p.ts, v.state AS state_at_purchase, v.seg
FROM events p LEFT JOIN versioned v
  ON p.user_id = v.user_id AND p.ts >= v.valid_from
  AND (v.valid_to IS NULL OR p.ts < v.valid_to)
WHERE p.event_type = 'purchase'
"""


@register("scd2_point_in_time_join", oracle=_PIT_ORACLE)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correct join — the warehouse-correctness
    classic: each purchase is joined to the SCD2 dimension version
    valid AT ITS TIMESTAMP (the activity state built from the user's
    non-purchase events), never to a later version (no time-travel
    leakage, the bug that silently poisons training features).
    Dimension ranges are half-open [valid_from, next_valid_from);
    purchases before any state carry NULL. The join shuffles both
    sides on user_id; within a user the range predicate selects at
    most one version — same shape as asof_join, but against a
    maintained dimension rather than raw events."""
    ev = _events(spark, sf_dir)
    dim = ev.where(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
        1,
    ).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    segments = dim.select(
        "user_id", "event_type", "ts", F.sum(chg).over(wc).alias("seg")
    )
    ranges = segments.groupBy(
        "user_id", "seg", F.col("event_type").alias("state")
    ).agg(F.min("ts").alias("valid_from"))
    wl = Window.partitionBy("user_id").orderBy("seg")
    versioned = ranges.select(
        F.col("user_id").alias("v_user"), "seg", "state", "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    cond = (
        (p["user_id"] == versioned["v_user"])
        & (p["ts"] >= versioned["valid_from"])
        & (versioned["valid_to"].isNull() | (p["ts"] < versioned["valid_to"]))
    )
    return p.join(versioned, cond, "left").select(
        "event_id",
        "user_id",
        "ts",
        F.col("state").alias("state_at_purchase"),
        "seg",
    )


# ---------------------------------------------------------------- B80
_COGROUP_ORACLE = """
WITH p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), matched AS (
  SELECT p.user_id, p.ts,
    (SELECT MAX(c.ts) FROM c
     WHERE c.user_id = p.user_id AND c.ts <= p.ts
       AND c.ts >= p.ts - INTERVAL 7 DAY) AS click_ts
  FROM p
)
SELECT user_id,
  COUNT(*) AS n_purchases,
  COUNT(click_ts) AS n_matched,
  CAST(QUANTILE_CONT(DATE_DIFF('microsecond', click_ts, ts), 0.5)
    / 1000000.0 AS DOUBLE) AS median_latency_s
FROM matched GROUP BY user_id
"""


@register("cogroup_conversion_latency", oracle=_COGROUP_ORACLE)
def cogroup_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase conversion latency per user via
    ``cogroup().applyInPandas`` — the two-sided Arrow escape hatch:
    each user's purchases and clicks arrive as a pandas frame PAIR and
    ``pd.merge_asof`` (backward, 7-day tolerance) aligns them in one
    vectorized call. This is the pattern for per-key logic that needs
    BOTH sides materialized (alignment, interleaving, per-key model
    scoring); for plain as-of semantics the JVM-side asof_join stays
    the fast path — the oracle here is exactly that SQL, proving the
    two routes agree. Scales like any keyed shuffle: state is one
    user's rows, never the stream."""
    import pandas as pd

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")

    def align(key, p_pdf: pd.DataFrame, c_pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if p_pdf.empty:
            return pd.DataFrame(
                columns=["user_id", "n_purchases", "n_matched", "median_latency_s"]
            )
        p_pdf = p_pdf.sort_values("ts")
        c_pdf = c_pdf.sort_values("ts")
        m = pd.merge_asof(
            p_pdf,
            c_pdf.rename(columns={"ts": "click_ts"}),
            left_on="ts",
            right_on="click_ts",
            direction="backward",
            tolerance=pd.Timedelta(days=7),
        )
        # Median on INTEGER microseconds, then one division: both
        # engines then produce the same correctly-rounded double —
        # rounding an interpolated float median hits half-ulp
        # disagreements on exact .5 microsecond midpoints.
        lat_us = (m["ts"] - m["click_ts"]).dropna().astype("int64") // 1000
        med = float(np.median(lat_us)) / 1e6 if lat_us.size else None
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_purchases": [len(m)],
                "n_matched": [int(lat_us.size)],
                "median_latency_s": [med],
            }
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            align,
            "user_id long, n_purchases long, n_matched long, median_latency_s double",
        )
    )


# ---------------------------------------------------------------- B82
_SW_GAP_S = 1800

_SESSION_WINDOW_ORACLE = f"""
WITH o AS (
  SELECT user_id, ts,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
           >= INTERVAL {_SW_GAP_S} SECONDS
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
    THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts,
    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM o
)
SELECT user_id, MIN(ts) AS session_start,
  MAX(ts) + INTERVAL {_SW_GAP_S} SECONDS AS session_end,
  COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


@register("session_window_agg", oracle=_SESSION_WINDOW_ORACLE)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` grouping
    (the same operator Structured Streaming uses for stateful session
    windows, here in batch): the planner merges overlapping
    [ts, ts+gap) intervals per user inside a dedicated
    session-window aggregation — one shuffle on user_id, no lag/
    cumsum window pair, and the exact operator a streaming session
    job runs, so batch backfills and the live stream share semantics
    by construction.

    Boundary parity: Spark closes a session when the next event
    starts >= gap after the previous (merge requires overlap of
    half-open windows); the oracle's lag/cumsum mirror uses the same
    >= break rule, and session_end = last_ts + gap on both sides."""
    ev = _events(spark, sf_dir)
    sw = F.session_window("ts", f"{_SW_GAP_S} seconds")
    return (
        ev.groupBy(sw.alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------- B83
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_OVERLAP_PAIR_SQL = " UNION ALL ".join(
    f"""SELECT '{a}' AS type_a, '{b}' AS type_b,
      CAST(SUM(CASE WHEN f_{a} AND f_{b} THEN 1 ELSE 0 END) AS BIGINT)
        AS n_both,
      CAST(SUM(CASE WHEN f_{a} THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      CAST(SUM(CASE WHEN f_{b} THEN 1 ELSE 0 END) AS BIGINT) AS n_b
    FROM flags"""
    for i, a in enumerate(_EVENT_TYPES)
    for b in _EVENT_TYPES[i + 1 :]
)

_OVERLAP_ORACLE = f"""
WITH flags AS (
  SELECT user_id,
    {", ".join(f"BOOL_OR(event_type = '{t}') AS f_{t}" for t in _EVENT_TYPES)}
  FROM events GROUP BY user_id
)
SELECT type_a, type_b, n_both, n_a, n_b,
  CAST(ROUND(CAST(n_both AS DOUBLE) / NULLIF(n_a + n_b - n_both, 0), 6)
    AS DOUBLE) AS jaccard
FROM ({_OVERLAP_PAIR_SQL})
"""


@register("audience_overlap", oracle=_OVERLAP_ORACLE)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap matrix: for every event-type pair, how
    many users did both, each, and the Jaccard of the two audiences —
    the segment-intersection report behind "do purchasers also
    click?". ONE pass builds per-user boolean reach flags (map-side
    combinable bool_or), then every pairwise count is a conditional
    sum over that user-sized flag table in a single second aggregate
    — no self-join of events, no distinct-count per pair, and adding
    a type adds a column, not a scan. At 100 TB the flag table is
    |users| rows; both shuffles are linear."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    flags = ev.groupBy("user_id").agg(
        *[
            F.bool_or(F.col("event_type") == t).alias(f"f_{t}")
            for t in _EVENT_TYPES
        ]
    )
    both = [
        F.sum(F.when(F.col(f"f_{a}") & F.col(f"f_{b}"), 1).otherwise(0))
        .cast("bigint")
        .alias(f"b_{a}_{b}")
        for i, a in enumerate(_EVENT_TYPES)
        for b in _EVENT_TYPES[i + 1 :]
    ]
    singles = [
        F.sum(F.when(F.col(f"f_{t}"), 1).otherwise(0))
        .cast("bigint")
        .alias(f"s_{t}")
        for t in _EVENT_TYPES
    ]
    agg = flags.agg(*(both + singles))
    rows = []
    for i, a in enumerate(_EVENT_TYPES):
        for b in _EVENT_TYPES[i + 1 :]:
            rows.append(
                F.struct(
                    F.lit(a).alias("type_a"),
                    F.lit(b).alias("type_b"),
                    F.col(f"b_{a}_{b}").alias("n_both"),
                    F.col(f"s_{a}").alias("n_a"),
                    F.col(f"s_{b}").alias("n_b"),
                )
            )
    exploded = agg.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
    jac = F.col("n_both").cast("double") / F.nullif(
        F.col("n_a") + F.col("n_b") - F.col("n_both"), F.lit(0)
    )
    return exploded.select(
        "type_a", "type_b", "n_both", "n_a", "n_b",
        F.round(jac, 6).alias("jaccard"),
    )


# ---------------------------------------------------------------- B87
_WF_WINDOW_DAYS = 7

_WFUNNEL_ORACLE = f"""
WITH firsts AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT
  COUNT(first_signup) AS n_signup,
  COUNT(CASE WHEN first_click >= first_signup
         AND first_click < first_signup + INTERVAL {_WF_WINDOW_DAYS} DAYS
        THEN 1 END) AS n_click_7d,
  COUNT(CASE WHEN first_purchase >= first_signup
         AND first_purchase < first_signup + INTERVAL {_WF_WINDOW_DAYS} DAYS
        THEN 1 END) AS n_purchase_7d,
  {sql_round_rat('COUNT(CASE WHEN first_purchase >= first_signup'
                 ' AND first_purchase < first_signup'
                 ' + INTERVAL ' + str(_WF_WINDOW_DAYS) + ' DAYS'
                 ' THEN 1 END)',
                 'NULLIF(COUNT(first_signup), 0)', 6)} AS purchase_cvr_7d
FROM firsts
"""


@register("windowed_funnel", oracle=_WFUNNEL_ORACLE)
def windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-boxed funnel (the SLA variant of B51's ordered funnel):
    of users whose journey starts with a signup, how many click and
    how many purchase WITHIN {d} days of that first signup — ordered
    funnels count eventual conversion, time-boxed funnels measure
    conversion velocity, and growth teams want the latter. One
    conditional-min aggregation per user (first touch per stage in a
    single pass — no joins, no windows), then a one-row conditional
    count; both shuffles are linear and the second input is
    user-count sized."""
    ev = _events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == t, F.col("ts"))).alias(
                f"first_{t}"
            )
            for t in ("signup", "click", "purchase")
        ]
    )
    in_window = lambda c: (
        (F.col(c) >= F.col("first_signup"))
        & (
            F.col(c)
            < F.col("first_signup")
            + F.expr(f"INTERVAL {_WF_WINDOW_DAYS} DAYS")
        )
    )
    n_purch = F.count(F.when(in_window("first_purchase"), 1))
    # integer-exact conversion rate (round_rat; null on zero signups)
    return firsts.agg(
        F.count("first_signup").alias("n_signup"),
        F.count(F.when(in_window("first_click"), 1)).alias("n_click_7d"),
        n_purch.alias("n_purchase_7d"),
    ).select(
        "n_signup",
        "n_click_7d",
        "n_purchase_7d",
        round_rat("n_purchase_7d", "nullif(n_signup, 0)", 6).alias(
            "purchase_cvr_7d"
        ),
    )


# ---------------------------------------------------------------- B90
_PATH_PREFIX_LEN = 5
_PATH_TOP_N = 20

_TOP_PATHS_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR DATE_DIFF('second', LAG(ts) OVER w, ts) > {_SESSION_GAP_S}
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id, event_type,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                               ORDER BY ts, event_id) AS rn
  FROM numbered
), paths AS (
  SELECT user_id, session_id,
    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM ranked WHERE rn <= {_PATH_PREFIX_LEN}
  GROUP BY user_id, session_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT {_PATH_TOP_N}
"""


@register("top_paths", oracle=_TOP_PATHS_ORACLE)
def top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the most common ordered event-type sequences
    (first {k} events of each gap-based session) — the path-analysis
    query behind every funnel-exploration UI, answering "what do
    sessions actually DO?" rather than testing a preconceived funnel.

    Scale: one shuffle on user_id serves the session windows (same
    plan spine as ``sessionize``); the path string is built by an
    in-group sort of at most {k} rows, and path counting is a
    map-side-combinable groupBy on the path string. The final top-N
    is TakeOrdered (per-partition heads merged on the driver), not a
    global sort."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    is_new = F.when(gap_s.isNull() | (gap_s > _SESSION_GAP_S), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = ev.select(
        "user_id", "ts", "event_id", "event_type", is_new.alias("is_new")
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("is_new").over(wc).alias("session_id"),
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    )
    paths = (
        numbered.withColumn("rn", rn)
        .where(F.col("rn") <= _PATH_PREFIX_LEN)
        .groupBy("user_id", "session_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(ts, event_id, event_type))), s -> s.event_type), '>')"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(_PATH_TOP_N)
    )


# ---------------------------------------------------------------- B92
_SEASONAL_ORACLE = """
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('day', ts) AS day,
         EXTRACT(hour FROM ts) AS hr, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
base AS (
  SELECT event_type, hr,
         COUNT(*) AS n_days,
         SUM(n) AS s1, SUM(n * n) AS s2
  FROM hourly GROUP BY 1, 2
),
scored AS (
  SELECT h.event_type, h.day, h.hr, h.n,
         CAST(b.s1 AS DOUBLE) / b.n_days AS mean_n,
         SQRT(CAST(b.s2 AS DOUBLE) / b.n_days
              - (CAST(b.s1 AS DOUBLE) / b.n_days)
                * (CAST(b.s1 AS DOUBLE) / b.n_days)) AS std_n,
         b.n_days
  FROM hourly h JOIN base b ON b.event_type = h.event_type AND b.hr = h.hr
)
SELECT event_type, day, CAST(hr AS INTEGER) AS hour,
  CAST(n AS BIGINT) AS n_events,
  ROUND(mean_n, 6) AS baseline_mean,
  ROUND(std_n, 6) AS baseline_std,
  ROUND((n - mean_n) / std_n, 4) AS z
FROM scored
WHERE n_days >= 3 AND std_n > 0 AND ABS(n - mean_n) > 2 * std_n
ORDER BY event_type, day, hour
"""


def hourly_cells(e: DataFrame) -> DataFrame:
    """(event_type, day, hr, n) hourly count cells — the unit both
    the batch detector and the streaming gate score."""
    return e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour("ts").alias("hr"),
    ).agg(F.count("*").alias("n"))


def hourly_baseline(e: DataFrame) -> DataFrame:
    """Per (event_type, hour-of-day) baseline from exact integer sums
    (n_days, sum, sum of squares): tiny (types x 24 rows), broadcast
    by every consumer, and mergeable — s1/s2/n_days add across
    partitions and across corpus increments."""
    return hourly_cells(e).groupBy("event_type", "hr").agg(
        F.count("*").alias("n_days"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )


def score_cells(cells: DataFrame, base: DataFrame) -> DataFrame:
    """Score hourly cells against a baseline; emit cells beyond
    2 sigma with their z-score. Shared verbatim by the batch operator
    and ``stream_anomaly_gate`` so live and backfill flags cannot
    diverge. Population mean/std derive from the integer sums in
    float expressions the DuckDB oracle mirrors exactly."""
    mean = F.col("s1").cast("double") / F.col("n_days")
    std = F.sqrt(F.col("s2").cast("double") / F.col("n_days") - mean * mean)
    scored = cells.join(F.broadcast(base), ["event_type", "hr"]).select(
        "event_type", "day", "hr", "n",
        mean.alias("mean_n"), std.alias("std_n"), "n_days",
    )
    return (
        scored.where(
            (F.col("n_days") >= 3)
            & (F.col("std_n") > 0)
            & (F.abs(F.col("n") - F.col("mean_n")) > 2 * F.col("std_n"))
        )
        .select(
            "event_type",
            "day",
            F.col("hr").cast("int").alias("hour"),
            F.col("n").cast("bigint").alias("n_events"),
            F.round("mean_n", 6).alias("baseline_mean"),
            F.round("std_n", 6).alias("baseline_std"),
            F.round((F.col("n") - F.col("mean_n")) / F.col("std_n"), 4).alias("z"),
        )
    )


@register("seasonal_anomaly", oracle=_SEASONAL_ORACLE)
def seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal anomaly detection: each (event_type, day,
    hour) cell's event count is scored against that type's same-hour
    baseline across all days (population mean/std from exact integer
    sums, so the float math mirrors DuckDB with zero tolerance); cells
    beyond 2 sigma are flagged with their z-score — the traffic-spike /
    outage detector behind ops dashboards.

    Two map-side-combinable aggregations (cells, then baselines keyed
    by the far smaller (type, hour) key) and one broadcast-size join
    back; no windows, no per-row state — the same plan at 100 TB, and
    the streaming twin (``stream_anomaly_gate``) scores micro-batches
    against this exact baseline artifact via the shared
    :func:`score_cells` path."""
    e = _events(spark, sf_dir)
    return score_cells(hourly_cells(e), hourly_baseline(e)).orderBy(
        "event_type", "day", "hour"
    )


# ---------------------------------------------------------------- B98
_SPLIT_ORACLE = """
WITH mx AS (SELECT MAX(ts) AS tmax FROM events),
lab AS (
  SELECT e.event_type, e.ts,
    CASE WHEN e.ts >= mx.tmax - INTERVAL 7 DAY THEN 'test'
         WHEN e.ts >= mx.tmax - INTERVAL 8 DAY THEN 'embargo'
         ELSE 'train' END AS split
  FROM events e CROSS JOIN mx
)
SELECT split, event_type, COUNT(*) AS n_events,
  MIN(ts) AS min_ts, MAX(ts) AS max_ts
FROM lab GROUP BY split, event_type
ORDER BY split, event_type
"""


@register("temporal_split_embargo", oracle=_SPLIT_ORACLE)
def temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based train/test split with an EMBARGO buffer: the last 7
    days are test, the day before them is embargoed (dropped from
    both sides), everything earlier trains — the split protocol for
    temporally-autocorrelated data, where a hash split (C67
    dataset_split) leaks near-boundary information between train and
    test. Emits per-split/type counts and time ranges for audit;
    the same labeling expression applied row-wise materializes the
    actual splits. One scan + the broadcast max-timestamp scalar —
    the same plan at any scale."""
    e = _events(spark, sf_dir)
    mx = e.agg(F.max("ts").alias("tmax"))
    lab = e.crossJoin(F.broadcast(mx)).select(
        "event_type",
        "ts",
        F.when(
            F.col("ts") >= F.expr("tmax - INTERVAL 7 DAY"), F.lit("test")
        )
        .when(F.col("ts") >= F.expr("tmax - INTERVAL 8 DAY"), F.lit("embargo"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    return (
        lab.groupBy("split", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("split", "event_type")
    )


# ---------------------------------------------------------------- B101
_ATTR_WINDOW_HOURS = 24

_ATTR_ORACLE = f"""
WITH purchases AS (
  SELECT event_id AS pid, user_id, ts AS pts, value AS amount
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT p.pid, p.amount, e.event_type AS touch_type, e.event_id AS tid
  FROM purchases p
  JOIN events e
    ON e.user_id = p.user_id
   AND e.event_type IN ('click', 'view', 'signup')
   AND e.ts < p.pts
   AND e.ts >= p.pts - INTERVAL {_ATTR_WINDOW_HOURS} HOUR
),
sized AS (
  SELECT pid, amount, touch_type, tid,
         COUNT(*) OVER (PARTITION BY pid) AS n_touches
  FROM touches
)
SELECT touch_type,
  COUNT(*) AS n_touches,
  COUNT(DISTINCT pid) AS n_purchases_touched,
  ROUND(CAST(CAST(SUM(CAST(amount / n_touches AS DECIMAL(18,6)))
    AS DECIMAL(38,6)) AS DOUBLE), 2) AS attributed_revenue
FROM sized
GROUP BY touch_type ORDER BY touch_type
"""


@register("attribution_weights", oracle=_ATTR_ORACLE)
def attribution_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's revenue splits
    equally across the user's qualifying touches (click/view/signup)
    in the prior 24 hours; per touch-type totals are the channel-
    credit numbers a marketing dashboard reports. The touch join is
    the stream-stream interval-join shape run in batch (user equi-key
    + bounded time predicate — state/scan bounded by the window, the
    property that makes it survive at scale); credit shares are
    summed in DECIMAL so distributed accumulation is order-free and
    the oracle matches exactly. The per-purchase touch count is a
    purchase-keyed window — partitioned by pid, never global."""
    e = _events(spark, sf_dir)
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
        F.col("value").alias("amount"),
    )
    t = e.where(
        F.col("event_type").isin("click", "view", "signup")
    ).select(
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("tid"),
    )
    touches = p.join(
        t,
        (F.col("tu") == F.col("pu"))
        & (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.expr(f"pts - INTERVAL {_ATTR_WINDOW_HOURS} HOUR")),
    )
    w = Window.partitionBy("pid")
    sized = touches.withColumn("n_touches", F.count("*").over(w))
    return (
        sized.groupBy("touch_type")
        .agg(
            F.count("*").alias("n_touches"),
            F.count_distinct("pid").alias("n_purchases_touched"),
            F.sum(
                (F.col("amount") / F.col("n_touches")).cast("decimal(18,6)")
            )
            .cast("decimal(38,6)")
            .cast("double")
            .alias("_rev"),
        )
        .select(
            "touch_type",
            "n_touches",
            "n_purchases_touched",
            F.round("_rev", 2).alias("attributed_revenue"),
        )
        .orderBy("touch_type")
    )


# ---------------------------------------------------------------- B102
_KM_ORACLE = """
WITH purch AS (
  SELECT user_id, ts,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
),
mx AS (SELECT MAX(ts) AS tmax FROM events),
subj AS (
  SELECT p1.user_id,
    CASE WHEN p2.ts IS NOT NULL
         THEN DATEDIFF('day', p1.ts, p2.ts)
         ELSE DATEDIFF('day', p1.ts, mx.tmax) END AS t,
    CASE WHEN p2.ts IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM purch p1
  LEFT JOIN purch p2 ON p2.user_id = p1.user_id AND p2.rn = 2
  CROSS JOIN mx
  WHERE p1.rn = 1
),
n_total AS (SELECT COUNT(*) AS n FROM subj),
daily AS (
  SELECT t, SUM(ev) AS d, COUNT(*) AS leaving FROM subj GROUP BY t
),
risk AS (
  SELECT t, d,
    nt.n - COALESCE(SUM(leaving) OVER (ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
  FROM daily CROSS JOIN n_total nt
),
km AS (
  SELECT t, d, n_risk,
    CASE WHEN MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
              OVER (ORDER BY t) = 1
         THEN CAST(0 AS DOUBLE)
         ELSE EXP(SUM(CASE WHEN d < n_risk
                           THEN LN(1 - CAST(d AS DOUBLE) / n_risk)
                           ELSE CAST(0 AS DOUBLE) END)
                  OVER (ORDER BY t)) END AS s
  FROM risk WHERE d > 0
)
SELECT CAST(t AS INTEGER) AS day_offset,
  CAST(n_risk AS BIGINT) AS n_at_risk,
  CAST(d AS BIGINT) AS n_repurchases,
  ROUND(s, 6) AS survival
FROM km ORDER BY day_offset
"""


@register("repurchase_survival", oracle=_KM_ORACLE)
def repurchase_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Kaplan-Meier survival of time-to-second-purchase:
    each first-time purchaser either repurchases after t days (event)
    or is right-CENSORED at the corpus horizon — the estimator that
    handles censoring correctly where a naive average of observed
    intervals is biased toward fast repurchasers. S(t) =
    prod_{u<=t}(1 - d_u/n_u), computed as exp of a running sum of
    logs so the cumulative product is a window aggregate; the two
    day-keyed windows run over the days-of-history frame (calendar-
    bounded, the mom_growth class — the audit's reviewed list), while
    every subject-level step is a keyed aggregation. Survival
    analysis joins the analytics families; oracle mirrors the exact
    ln/exp chain, rounded to 6."""
    e = _events(spark, sf_dir)
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    purch = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
        .withColumn("rn", F.row_number().over(wp))
    )
    p1 = purch.where(F.col("rn") == 1).select("user_id", F.col("ts").alias("t1"))
    p2 = purch.where(F.col("rn") == 2).select(
        F.col("user_id").alias("u2"), F.col("ts").alias("t2")
    )
    mx = e.agg(F.max("ts").alias("tmax"))
    subj = (
        p1.join(p2, p1.user_id == p2.u2, "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("t2").isNotNull(), F.datediff(F.col("t2"), F.col("t1"))
            )
            .otherwise(F.datediff(F.col("tmax"), F.col("t1")))
            .alias("t"),
            F.when(F.col("t2").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("ev"),
        )
    )
    n_total = subj.count()
    daily = subj.groupBy("t").agg(
        F.sum("ev").alias("d"), F.count("*").alias("leaving")
    )
    w_prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = daily.withColumn(
        "n_risk",
        F.lit(n_total) - F.coalesce(F.sum("leaving").over(w_prior), F.lit(0)),
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # the terminal day can have d == n_risk (everyone at risk
    # repurchases): that factor is exactly 0 and ln() is undefined, so
    # survival pins to 0 from that row on instead of entering the sum
    ln_term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(F.lit(1) - F.col("d").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    hit_zero = F.max(
        F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
    ).over(w_cum)
    km = (
        risk.where(F.col("d") > 0)
        .withColumn(
            "s",
            F.when(hit_zero == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum(ln_term).over(w_cum))
            ),
        )
    )
    return km.select(
        F.col("t").cast("int").alias("day_offset"),
        F.col("n_risk").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("n_repurchases"),
        F.round("s", 6).alias("survival"),
    ).orderBy("day_offset")


# ---------------------------------------------------------------- B114
_MARKOV_ORACLE = f"""
WITH s AS (
  SELECT event_type,
    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS next_type
  FROM events
), t AS (
  SELECT event_type AS from_type, next_type AS to_type,
    COUNT(*) AS n_transitions
  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_transitions,
  {sql_round_rat('n_transitions',
                 'SUM(n_transitions) OVER (PARTITION BY from_type)', 6)}
    AS prob,
  ROW_NUMBER() OVER (PARTITION BY from_type
    ORDER BY n_transitions DESC, to_type) AS rank
FROM t
"""


@register("event_markov_transitions", oracle=_MARKOV_ORACLE)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain over per-user event streams: for each
    (from_type, to_type) pair, the transition count, the row-normalized
    transition probability, and the rank of each successor within its
    source state — the behavioral model behind next-event prediction
    and anomaly scoring (an observed transition with a tiny ``prob`` is
    the anomaly; ``top_paths`` mines full k-step sequences, this is the
    one-step kernel those paths factor through).

    Scale: the lead() window shuffles once on user_id (each user's
    stream sorts independently — no global order), the count aggregates
    on (from, to) with map-side combine, and every window after that
    runs on the transition MATRIX, whose size is event-type-cardinality
    squared — a constant, not a function of corpus size. Probabilities
    divide exact int64 counts once, so both engines agree to the
    rounded digit."""
    ev = _events(spark, sf_dir)
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w_user).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    t = s.groupBy("from_type", "to_type").agg(F.count("*").alias("n_transitions"))
    w_from = Window.partitionBy("from_type")
    w_rank = Window.partitionBy("from_type").orderBy(
        F.desc("n_transitions"), "to_type"
    )
    # integer-exact row probability (round_rat over the windowed sum)
    return t.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.sum("n_transitions").over(w_from).alias("_tot"),
        F.row_number().over(w_rank).alias("rank"),
    ).select(
        "from_type",
        "to_type",
        "n_transitions",
        round_rat("n_transitions", "_tot", 6).alias("prob"),
        "rank",
    )


# ---------------------------------------------------------------- B115
_MK_MIN_T = 5
_MK_BOTTOM = 20

_MK_ANOMALY_ORACLE = f"""
WITH s AS (
  SELECT user_id, ts, event_id, event_type AS from_type,
    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS to_type
  FROM events
), t AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2
), m AS (
  SELECT from_type, to_type,
    LN(CAST(n AS DOUBLE)
       / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)) AS lp
  FROM t
), uc AS (
  -- per-user state is the (from, to) COUNT matrix, never the raw
  -- transition stream: bounded by type-cardinality squared even for
  -- a bot with millions of events (r8 session review)
  SELECT user_id, from_type, to_type, COUNT(*) AS n
  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2, 3
), u AS (
  SELECT uc.user_id,
    CAST(SUM(uc.n) AS BIGINT) AS n_transitions,
    list(CAST(uc.n AS DOUBLE) * m.lp
         ORDER BY uc.from_type, uc.to_type) AS terms
  FROM uc JOIN m ON m.from_type = uc.from_type AND m.to_type = uc.to_type
  GROUP BY uc.user_id
)
SELECT user_id, n_transitions,
  ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE), terms),
      (a, x) -> a + x) / CAST(n_transitions AS DOUBLE), 6) AS mean_lp
FROM u WHERE n_transitions >= {_MK_MIN_T}
ORDER BY mean_lp, user_id LIMIT {_MK_BOTTOM}
"""


@register("markov_anomaly_users", oracle=_MK_ANOMALY_ORACLE)
def markov_anomaly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-plausibility anomaly scoring: each user's event
    stream is scored by the corpus-wide first-order Markov kernel
    (B114) — mean per-transition log-probability — and the least
    plausible users surface (the bot/fraud/broken-instrumentation
    shortlist; a user whose transitions the population model finds
    surprising is the anomaly). Users under ``_MK_MIN_T`` transitions
    are excluded as noise.

    Scale: the kernel is event-type-cardinality-squared (tiny, AQE
    broadcasts it into the per-user counts); per-user state is the
    (from, to) COUNT matrix — bounded by type-cardinality squared
    even for a bot with millions of events, never the raw transition
    stream — and the score is an in-row fold over the TYPE-PAIR-
    ORDERED count*lp terms (a float sum across unordered rows would
    be partition-order dependent). The bottom-k fuses to
    TakeOrderedAndProject, so k rows per partition cross the wire."""
    ev = _events(spark, sf_dir)
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id", "ts", "event_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w_user).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    t = s.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    w_from = Window.partitionBy("from_type")
    m = t.select(
        "from_type", "to_type",
        F.log(
            F.col("n").cast("double")
            / F.sum("n").over(w_from).cast("double")
        ).alias("lp"),
    )
    uc = s.groupBy("user_id", "from_type", "to_type").agg(
        F.count("*").alias("n")
    )
    u = (
        uc.join(m, ["from_type", "to_type"])
        .groupBy("user_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_transitions"),
            F.expr(
                "transform(array_sort(collect_list(struct(from_type, to_type,"
                " CAST(n AS DOUBLE) * lp AS term))), x -> x.term)"
            ).alias("terms"),
        )
    )
    return (
        u.where(F.col("n_transitions") >= _MK_MIN_T)
        .select(
            "user_id", "n_transitions",
            F.round(
                F.expr(
                    "aggregate(terms, CAST(0 AS DOUBLE), (a, x) -> a + x)"
                )
                / F.col("n_transitions").cast("double"),
                6,
            ).alias("mean_lp"),
        )
        .orderBy("mean_lp", "user_id")
        .limit(_MK_BOTTOM)
    )


# ---------------------------------------------------------------- B119
_VARIANT_ORACLE = """
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER))
    AS BIGINT) AS n_with_k,
  CAST(MIN(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER))
    AS INTEGER) AS min_k,
  CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER))
    AS INTEGER) AS max_k,
  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
    AS BIGINT) AS sum_k
FROM events GROUP BY event_type ORDER BY event_type
"""


@register("variant_props_profile", oracle=_VARIANT_ORACLE)
def variant_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured profiling through Spark 4's VARIANT type: the
    props JSON parses ONCE per row into a binary variant
    (``parse_json``) and every field extraction afterwards is a typed
    ``try_variant_get`` over that parsed form — the engine-native
    successor to per-path ``get_json_object`` string re-parsing
    (B17's shape), and the right plan when one payload feeds many
    extractions. Missing paths, malformed JSON, and non-int values
    all yield NULL (try_ semantics end to end, TRY_CAST on the oracle
    side), so the n_with_k / min / max / sum profile is exactly what
    the JSON-text oracle computes; integer aggregates keep the report
    hash-exact."""
    ev = _events(spark, sf_dir)
    v = ev.select(
        "event_type",
        # try_parse_json + try_variant_get: malformed JSON or a
        # non-int / overflowing k yields NULL on BOTH engines (the
        # oracle mirrors with TRY_CAST) instead of one side raising
        # (r10 review)
        F.expr(
            "try_variant_get(try_parse_json(props), '$.k', 'int')"
        ).alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count("k").cast("bigint").alias("n_with_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
        .orderBy("event_type")
    )
