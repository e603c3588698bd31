"""Analytics wave 3: time-series windows, explode analytics,
histograms, fuzzy matching, approximate aggregates.

Everything here is oracle-checked, including the sketches: the
Count-Min (C103) and HLL (C105) families use explicit Horner hashes
both engines replay, so even the approximate ops are hash-exact
against DuckDB; error-bound tests additionally pin the sketches'
accuracy vs exact counts (approximation quality is its own claim).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.operators._helpers import (
    dec,
    money,
    money_sum,
    pin,
    round_rat,
    sql_round_rat,
)
from cdk_serverless_data_lake_sandbox_spark.registry import register


# ---------------------------------------------------------------- B35
_MOVAVG_ORACLE = """
WITH daily AS (
  SELECT user_id, DATE_TRUNC('day', ts) AS day,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
)
SELECT user_id, day, day_value,
  AVG(day_value) OVER (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
FROM daily
"""


@register("moving_average", oracle=_MOVAVG_ORACLE)
def moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average of per-user daily value: aggregate to one
    row per (user, day) first so the window frame is tiny and the
    sort key is unique — no tie-dependent results."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum(dec("value", 2)).cast("double").alias("day_value"))
    )
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "user_id", "day", "day_value", F.avg("day_value").over(w).alias("ma7")
    )


# ---------------------------------------------------------------- B36
_CUMREV_ORACLE = """
WITH monthly AS (
  SELECT DATE_TRUNC('month', o_orderdate) AS month,
    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS month_revenue
  FROM orders GROUP BY 1
)
SELECT month, month_revenue,
  CAST(ROUND(CAST(SUM(month_revenue) OVER (ORDER BY month
      ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)), 2) AS DOUBLE) AS running_revenue
FROM monthly
"""


@register("cumulative_revenue", oracle=_CUMREV_ORACLE)
def cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with a running total. The global window runs
    over ~tens of monthly rows post-aggregation — a single-partition
    window over pre-aggregated data is fine at any scale; the
    aggregation below it is what distributes."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    monthly = (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(money_sum("o_totalprice", 2).alias("month_revenue"))
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month",
        "month_revenue",
        money(F.sum("month_revenue").over(w).cast("decimal(18,2)")).alias("running_revenue"),
    )


# ---------------------------------------------------------------- B37
_WORDFREQ_ORACLE = """
SELECT w AS word, COUNT(*) AS n
FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
GROUP BY w
ORDER BY n DESC, word
LIMIT 20
"""


@register("word_frequencies", oracle=_WORDFREQ_ORACLE)
def word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequencies, top 20 — explode + count with
    map-side partial aggregation (the shuffle carries one row per
    distinct word per partition, not one per token)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.select(F.explode_outer(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


# ---------------------------------------------------------------- B38
_HISTOGRAM_ORACLE = """
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
  COUNT(*) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS bucket_revenue
FROM orders GROUP BY 1
"""


@register("value_histogram", oracle=_HISTOGRAM_ORACLE)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram of order totals."""
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_orders"),
            money_sum("o_totalprice", 2).alias("bucket_revenue"),
        )
    )


# ---------------------------------------------------------------- B39
_FUZZY_ORACLE = """
WITH names AS (
  SELECT DISTINCT p_name,
    string_split(p_name, ' ')[1] AS w1,
    string_split(p_name, ' ')[2] AS w2
  FROM part
)
SELECT a.p_name AS a_name, b.p_name AS b_name,
  levenshtein(a.w1, b.w1) AS edit_dist
FROM names a JOIN names b
  ON a.w2 = b.w2 AND a.p_name < b.p_name
WHERE levenshtein(a.w1, b.w1) <= 2
"""


@register("fuzzy_name_match", oracle=_FUZZY_ORACLE)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching: part names in the same category (second word)
    whose qualifiers are within edit distance 2. The category equi-join
    is the blocking key — levenshtein runs only inside blocks, which
    is what makes edit-distance joins feasible at scale."""
    p = load_tables(spark, sf_dir, ("part",))["part"]
    names = (
        p.select("p_name").distinct().select(
            "p_name",
            F.split(F.col("p_name"), " ").getItem(0).alias("w1"),
            F.split(F.col("p_name"), " ").getItem(1).alias("w2"),
        )
    )
    a = names.select(
        F.col("p_name").alias("a_name"), F.col("w1").alias("a_w1"), F.col("w2").alias("w2")
    )
    b = names.select(
        F.col("p_name").alias("b_name"), F.col("w1").alias("b_w1"), F.col("w2").alias("w2")
    )
    return (
        a.join(b, "w2")
        .where(F.col("a_name") < F.col("b_name"))
        .select("a_name", "b_name", F.levenshtein("a_w1", "b_w1").alias("edit_dist"))
        .where(F.col("edit_dist") <= 2)
    )


# ---------------------------------------------------------------- B40
_DISTINCT_ORACLE = """
SELECT event_type,
  COUNT(DISTINCT user_id) AS n_users,
  COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


@register("distinct_users", oracle=_DISTINCT_ORACLE)
def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (the two-phase
    distinct-then-count expansion Spark plans automatically)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


# approx_distinct_users (B40-R) lives below the C105 HLL helpers it
# reuses; see the end of this module.


# ---------------------------------------------------------------- B41
# DuckDB DAYOFWEEK is 0-based (Sun=0), Spark's is 1-based (Sun=1).
_CUBE_ORACLE = """
SELECT event_type, CAST(DAYOFWEEK(ts) + 1 AS INTEGER) AS dow,
  COUNT(*) AS n_events
FROM events GROUP BY CUBE(event_type, CAST(DAYOFWEEK(ts) + 1 AS INTEGER))
"""


@register("cube_agg", oracle=_CUBE_ORACLE)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week): all four grouping sets in
    one pass."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.cube("event_type", F.dayofweek("ts").cast("int").alias("dow"))
        .agg(F.count("*").alias("n_events"))
    )


# B56 frequent_items_sketch and B75 sketch_rollup_dau live below the
# C103 Count-Min / C105 HLL helpers they reuse; see end of module.


# ---------------------------------------------------------------- B76
_GROUP_SAMPLE_K = 5

_GROUP_SAMPLE_ORACLE = f"""
SELECT event_type, event_id, rk FROM (
  SELECT event_type, event_id,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk
  FROM events
) WHERE rk <= {_GROUP_SAMPLE_K}
"""


@register("group_sample_topk", oracle=_GROUP_SAMPLE_ORACLE)
def group_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group uniform sample, deterministically: rank
    rows inside each group by the md5 of their key (a pseudo-random
    but reproducible order — no RNG, stable under any partitioning or
    retry, the property a sampled debugging/eval set needs) and keep
    the first k. The window partitions by group, so ranking
    parallelizes across groups; at extreme per-group cardinality the
    md5 order threshold could first be estimated per group to
    pre-filter before the window (the top-k-per-group pattern)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.select("event_type", "event_id")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _GROUP_SAMPLE_K)
    )


# ---------------------------------------------------------------- C96
_HR_BINS = 64

_HIST_ROLLUP_ORACLE = f"""
WITH rng AS (
  SELECT event_type, MIN(value) AS lo,
    GREATEST(MAX(value) - MIN(value), 1e-12) AS width
  FROM events GROUP BY event_type
), b AS (
  SELECT e.event_type,
    LEAST(CAST(FLOOR((e.value - r.lo) / r.width * {_HR_BINS}) AS INT),
          {_HR_BINS - 1}) AS bin
  FROM events e JOIN rng r USING (event_type)
), h AS (
  SELECT event_type, bin, COUNT(*) AS c FROM b GROUP BY event_type, bin
), cum AS (
  SELECT event_type, bin,
    SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
    SUM(c) OVER (PARTITION BY event_type) AS n
  FROM h
), pick AS (
  SELECT event_type, MAX(n) AS n,
    MIN(CASE WHEN cum >= CEIL(0.50 * n) THEN bin END) AS b50,
    MIN(CASE WHEN cum >= CEIL(0.95 * n) THEN bin END) AS b95,
    MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN bin END) AS b99
  FROM cum GROUP BY event_type
)
SELECT p.event_type, CAST(p.n AS BIGINT) AS n_events,
  CAST(ROUND(r.lo + (p.b50 + 1) * r.width / {_HR_BINS}, 6) AS DOUBLE) AS p50_est,
  CAST(ROUND(r.lo + (p.b95 + 1) * r.width / {_HR_BINS}, 6) AS DOUBLE) AS p95_est,
  CAST(ROUND(r.lo + (p.b99 + 1) * r.width / {_HR_BINS}, 6) AS DOUBLE) AS p99_est,
  CAST(ROUND(r.width / {_HR_BINS}, 6) AS DOUBLE) AS bin_width
FROM pick p JOIN rng r USING (event_type)
"""


@register("histogram_rollup_percentiles", oracle=_HIST_ROLLUP_ORACLE)
def histogram_rollup_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-HISTOGRAM percentile rollup — ``sketch_rollup_dau``'s
    pattern applied to quantiles: per-day fixed-bin value histograms
    are tiny (<= {bins} rows/day/type) and merge by ADDING bin counts,
    so any date range's p50/p95/p99 comes from summed bins with error
    bounded by one bin width — no re-scan of raw events, which is the
    only way percentile dashboards stay tractable at 100 TB (exact
    percentiles are not mergeable; bin counts are).

    The estimate is the bin's upper edge (guaranteed >= the true
    quantile within one bin width, the conservative side for latency
    SLOs). Per-type bin ranges come from one min/max pass. The daily
    histogram stage is real (groupBy day x type x bin) and the merge
    is a second sum — the oracle computes the direct histogram, which
    is equal by construction BECAUSE binning is mergeable; the
    equality is the point being tested. Windows touch only the
    {bins}-row-per-type cumulative frame, never raw events."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    rng = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.greatest(F.max("value") - F.min("value"), F.lit(1e-12)).alias("width"),
    )
    b = ev.join(F.broadcast(rng), "event_type").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.least(
            F.floor((F.col("value") - F.col("lo")) / F.col("width") * _HR_BINS)
            .cast("int"),
            F.lit(_HR_BINS - 1),
        ).alias("bin"),
    )
    daily = b.groupBy("event_type", "day", "bin").agg(F.count("*").alias("c"))
    merged = daily.groupBy("event_type", "bin").agg(F.sum("c").alias("c"))
    return percentiles_from_bins(merged, rng)


def percentiles_from_bins(merged: DataFrame, rng: DataFrame) -> DataFrame:
    """Read p50/p95/p99 off merged (event_type, bin, c) counts against
    the (event_type, lo, width) reference ranges — the shared decode
    half of the histogram rollup, used by the batch operator and the
    streaming sink's reader alike so both report identical numbers
    from the same stored bins."""
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = merged.select(
        "event_type",
        "bin",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    def _pick(q: float):
        return F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("bin"))
        )
    pick = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        _pick(0.50).alias("b50"),
        _pick(0.95).alias("b95"),
        _pick(0.99).alias("b99"),
    )
    def _edge(bcol: str):
        return F.round(
            F.col("lo") + (F.col(bcol) + 1) * F.col("width") / _HR_BINS, 6
        )
    return pick.join(rng, "event_type").select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        _edge("b50").alias("p50_est"),
        _edge("b95").alias("p95_est"),
        _edge("b99").alias("p99_est"),
        F.round(F.col("width") / _HR_BINS, 6).alias("bin_width"),
    )


def bin_values(events: DataFrame, rng: DataFrame, bins: int = _HR_BINS) -> DataFrame:
    """(event_type, bin) per event against fixed reference ranges —
    the shared encode half of the histogram rollup."""
    # Clamp BOTH ends into [0, bins): against a fixed baseline range a
    # live stream legally produces values above hi (top clamp) and
    # below lo (bottom clamp) — a negative bin id would break the
    # rollup/decode invariant and the lowest bin's quantile bound.
    return events.join(F.broadcast(rng), "event_type").select(
        "event_type",
        F.greatest(
            F.lit(0),
            F.least(
                F.floor((F.col("value") - F.col("lo")) / F.col("width") * bins)
                .cast("int"),
                F.lit(bins - 1),
            ),
        ).alias("bin"),
    )


# ---------------------------------------------------------------- B89
_CUPED_CUTOFF = "2024-01-16"
_CUPED_ARM_SQL = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)) AS INTEGER) % 2"
)

_CUPED_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
    {_CUPED_ARM_SQL} AS arm,
    COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUTOFF}' THEN value END), 0)
      AS pre,
    COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUTOFF}' THEN value END), 0)
      AS post
  FROM events GROUP BY user_id
), st AS (
  SELECT covar_pop(post, pre) / var_pop(pre) AS theta, AVG(pre) AS mp
  FROM per_user
), adj AS (
  SELECT p.arm, p.post, p.post - st.theta * (p.pre - st.mp) AS post_adj, st.theta
  FROM per_user p CROSS JOIN st
)
SELECT CAST(arm AS INT) AS arm,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(ROUND(AVG(post), 6) AS DOUBLE) AS mean_post,
  CAST(ROUND(AVG(post_adj), 6) AS DOUBLE) AS mean_adjusted,
  CAST(ROUND(var_pop(post), 6) AS DOUBLE) AS var_post,
  CAST(ROUND(var_pop(post_adj), 6) AS DOUBLE) AS var_adjusted,
  CAST(ROUND(1.0 - var_pop(post_adj) / var_pop(post), 6) AS DOUBLE)
    AS var_reduction,
  CAST(ROUND(MIN(theta), 6) AS DOUBLE) AS theta
FROM adj GROUP BY arm
"""


@register("cuped_lift", oracle=_CUPED_ORACLE)
def cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013,
    WSDM — "Improving the Sensitivity of Online Controlled
    Experiments"): users hash deterministically into two arms, the
    pre-period value sum is the covariate, theta = cov(post,pre)/
    var(pre) is fitted on the pooled population, and the adjusted
    metric post - theta*(pre - mean(pre)) preserves the treatment
    effect while shrinking variance by the pre/post correlation
    squared — the standard trick that makes small lifts detectable
    without more traffic. Per arm: raw and adjusted means/variances
    plus the realized variance reduction.

    Scale: one events scan -> per-user conditional sums (map-side
    combinable), a 1-row moment aggregate broadcast back, and a
    2-row output; no windows, no pairwise anything. The arm hash is
    the same portable md5 expression as the oracle's, so assignment
    is bit-identical across engines."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cutoff = F.to_timestamp(F.lit(_CUPED_CUTOFF))
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts") < cutoff, F.col("value"))), F.lit(0.0)
        ).alias("pre"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= cutoff, F.col("value"))), F.lit(0.0)
        ).alias("post"),
    ).withColumn(
        "arm",
        (
            F.expr(
                "cast(conv(substr(md5(cast(user_id as string)), 1, 4), 16, 10) as int)"
            )
            % 2
        ).cast("int"),
    )
    st = per_user.agg(
        (F.covar_pop("post", "pre") / F.var_pop("pre")).alias("theta"),
        F.avg("pre").alias("mp"),
    )
    adj = per_user.crossJoin(F.broadcast(st)).select(
        "arm",
        "post",
        (F.col("post") - F.col("theta") * (F.col("pre") - F.col("mp"))).alias(
            "post_adj"
        ),
        "theta",
    )
    return adj.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.avg("post"), 6).alias("mean_post"),
        F.round(F.avg("post_adj"), 6).alias("mean_adjusted"),
        F.round(F.var_pop("post"), 6).alias("var_post"),
        F.round(F.var_pop("post_adj"), 6).alias("var_adjusted"),
        F.round(1.0 - F.var_pop("post_adj") / F.var_pop("post"), 6).alias(
            "var_reduction"
        ),
        F.round(F.min("theta"), 6).alias("theta"),
    )


# ---------------------------------------------------------------- C103
# Count-Min sketch with an EXPLICIT polynomial hash (Horner fold over
# character codes, mod 1000003) so the DuckDB oracle can reproduce the
# sketch bit-for-bit — unlike the xxhash-based rows-only sketches.
_CMS_BASES = (31, 37, 41, 43)
_CMS_WIDTH = 256
_CMS_MOD = 1000003


def _cms_hash_spark(col: str, base: int) -> F.Column:
    return F.expr(
        f"aggregate(transform(sequence(1, length({col})), i ->"
        f" ascii(substring({col}, i, 1))), 0L,"
        f" (acc, x) -> (acc * {base} + x) % {_CMS_MOD}) % {_CMS_WIDTH}"
    )


def _cms_hash_sql(col: str, base: int) -> str:
    return (
        f"list_reduce(list_prepend(0, list_transform("
        f"range(1, len({col}) + 1), i -> ascii({col}[i]))),"
        f" (acc, x) -> (acc * {base} + x) % {_CMS_MOD}) % {_CMS_WIDTH}"
    )


_CMS_ORACLE = f"""
WITH w AS (
  SELECT w AS word, COUNT(*) AS n
  FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
  WHERE w <> '' GROUP BY w
),
h AS (
  SELECT word, n,
    {", ".join(f"{_cms_hash_sql('word', b)} AS b{i}" for i, b in enumerate(_CMS_BASES))}
  FROM w
),
cms AS (
  SELECT row_id, bucket, SUM(n) AS total FROM (
    {" UNION ALL ".join(f"SELECT {i} AS row_id, b{i} AS bucket, n FROM h" for i in range(len(_CMS_BASES)))}
  ) GROUP BY row_id, bucket
)
SELECT h.word, CAST(h.n AS BIGINT) AS exact_n,
  CAST(LEAST({", ".join(f"c{i}.total" for i in range(len(_CMS_BASES)))}) AS BIGINT)
    AS cms_estimate,
  CAST(LEAST({", ".join(f"c{i}.total" for i in range(len(_CMS_BASES)))}) - h.n AS BIGINT)
    AS overestimate
FROM h
{" ".join(f"JOIN cms c{i} ON c{i}.row_id = {i} AND c{i}.bucket = h.b{i}" for i in range(len(_CMS_BASES)))}
ORDER BY exact_n DESC, word
LIMIT 20
"""


def word_counts(docs: DataFrame) -> DataFrame:
    """(word, n) exact token counts — map-side-combinable groupBy."""
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def cms_cells(wc: DataFrame) -> DataFrame:
    """Collapse (word, n) counts into the d x w Count-Min cell table
    (row_id, bucket, total). Cells are MERGEABLE: summing two cell
    tables by (row_id, bucket) equals building one table over the
    union of their inputs — the property the streaming maintainer
    (E34) and any map-side partial rely on."""
    h = wc.select(
        "n",
        *[
            _cms_hash_spark("word", b).alias(f"b{i}")
            for i, b in enumerate(_CMS_BASES)
        ],
    )
    stacked = None
    for i in range(len(_CMS_BASES)):
        part = h.select(
            F.lit(i).alias("row_id"), F.col(f"b{i}").alias("bucket"), F.col("n")
        )
        stacked = part if stacked is None else stacked.unionAll(part)
    return stacked.groupBy("row_id", "bucket").agg(F.sum("n").alias("total"))


def cms_probe(wc: DataFrame, cells: DataFrame) -> DataFrame:
    """Estimate each word's count from a cell table: min over the d
    rows of that word's bucket totals.

    The cell table is d*w rows BY CONSTRUCTION (1024 here) regardless
    of corpus size — that bound is the sketch's entire point — so it
    collects to the driver in one job and probes as d map LITERALS in
    a single projection (r11: the previous shape built d broadcast
    relations and ran d hash joins — four extra jobs and four
    executor-side hash tables per call for a constant-sized lookup;
    guide §1.2 "don't compute things you throw away"). The driver
    collect is geometry-bounded exactly like the k-means centroid
    collect (similarity.py precedent). Lookup-miss semantics mirror
    the old INNER joins: a word missing from ANY row's bucket is
    dropped (cannot happen when ``cells`` was built over a superset
    of ``wc``'s tokens — every probed word contributed to every row)."""
    d = len(_CMS_BASES)
    by_row: dict[int, list[tuple[int, int]]] = {i: [] for i in range(d)}
    for r in cells.collect():  # d*w <= 1024 rows, sketch-geometry bound
        by_row[int(r["row_id"])].append((int(r["bucket"]), int(r["total"])))
    out = wc.select(
        "word",
        "n",
        *[
            _cms_hash_spark("word", b).alias(f"b{i}")
            for i, b in enumerate(_CMS_BASES)
        ],
    )
    lk = []
    for i in range(d):
        ent = sorted(by_row[i])
        if ent:
            ks = ",".join(f"{k}L" for k, _ in ent)
            vs = ",".join(f"{v}L" for _, v in ent)
            m = f"map_from_arrays(array({ks}), array({vs}))"
        else:
            m = (
                "map_from_arrays(CAST(array() AS ARRAY<BIGINT>),"
                " CAST(array() AS ARRAY<BIGINT>))"
            )
        lk.append(F.element_at(F.expr(m), F.col(f"b{i}")).alias(f"t{i}"))
    out = out.select("word", "n", *lk)
    found = functools.reduce(
        lambda a, b: a & b, [F.col(f"t{i}").isNotNull() for i in range(d)]
    )
    est = F.least(*[F.col(f"t{i}") for i in range(d)])
    return out.where(found).select(
        "word",
        F.col("n").cast("bigint").alias("exact_n"),
        est.cast("bigint").alias("cms_estimate"),
        (est - F.col("n")).cast("bigint").alias("overestimate"),
    )


@register("count_min_words", oracle=_CMS_ORACLE)
def count_min_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch word frequencies, reported against exact
    counts for the top-20 words (estimate >= exact always; the gap is
    the hash-collision overestimate the d x w geometry bounds).

    The sketch is the mergeable shape that matters at 100 TB: each
    executor's partial counts collapse into d*w = 1024 cells
    regardless of vocabulary size, the cell table broadcasts, and the
    probe side is a per-word constant-time lookup. The polynomial
    hash is deliberately explicit (Horner over character codes) so
    the DuckDB oracle replays the identical sketch — integer
    arithmetic end-to-end, zero tolerance."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # wc feeds 8 plan branches (4 sketch rows + 4 probe joins); a
    # vocabulary-sized materialization collapses them to ONE token
    # scan instead of relying on exchange reuse across the fan-out
    wc = word_counts(docs).transform(pin)
    return (
        cms_probe(wc, cms_cells(wc))
        .orderBy(F.desc("exact_n"), "word")
        .limit(20)
    )


# ---------------------------------------------------------------- C105
# HyperLogLog with the same explicit-hash discipline as C103: Horner
# polynomial over the key's decimal digits, mod the Mersenne prime
# 2^31-1; low 8 bits pick one of m=256 registers, the remaining 23
# bits feed the leading-zero rank. Registers are MAX-mergeable.
_HLL_M = 256
_HLL_BASE = 131
_HLL_MOD = 2147483647  # 2^31 - 1


def _hll_hash_spark(col: str) -> F.Column:
    return F.expr(
        f"aggregate(transform(sequence(1, length({col})), i ->"
        f" ascii(substring({col}, i, 1))), 0L,"
        f" (acc, x) -> (acc * {_HLL_BASE} + x) % {_HLL_MOD})"
    )


def _hll_hash_sql(col: str) -> str:
    return (
        f"list_reduce(list_prepend(0, list_transform("
        f"range(1, len({col}) + 1), i -> ascii({col}[i]))),"
        f" (acc, x) -> (acc * {_HLL_BASE} + x) % {_HLL_MOD})"
    )


# rho = leading zeros of the 23-bit word + 1; bin() drops leading
# zeros in both engines, so rho = 24 - len(bin(w)) (24 when w = 0).
_RHO_SQL = "CASE WHEN w = 0 THEN 24 ELSE 24 - LENGTH(bin(w)) END"
# alpha_m for m >= 128, spelled as the same double expression on both
# sides rather than a rounded literal
_ALPHA_SQL = (
    "CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)"
    " + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))"
)

_HLL_ORACLE = f"""
WITH h AS (
  SELECT event_type, {_hll_hash_sql("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
),
hb AS (SELECT event_type, hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS w FROM h),
rg AS (
  SELECT event_type, bucket, MAX({_RHO_SQL}) AS m_j
  FROM hb GROUP BY event_type, bucket
),
agg AS (
  SELECT event_type,
    COUNT(*) AS present,
    SUM(CAST(1 AS DOUBLE) / CAST((1 << m_j) AS DOUBLE)) AS s_present
  FROM rg GROUP BY event_type
),
est AS (
  SELECT event_type,
    {_HLL_M} - present AS v_zero,
    ({_ALPHA_SQL}) * {_HLL_M} * {_HLL_M}
      / (s_present + CAST({_HLL_M} - present AS DOUBLE)) AS e_raw
  FROM agg
),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users FROM events
  GROUP BY event_type
)
SELECT e.event_type,
  CAST(x.exact_users AS BIGINT) AS exact_users,
  ROUND(CASE WHEN e.e_raw <= 2.5 * {_HLL_M} AND e.v_zero > 0
        THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE) / e.v_zero)
        ELSE e.e_raw END, 4) AS hll_estimate,
  CAST(e.v_zero AS INTEGER) AS zero_registers
FROM est e JOIN ex x ON x.event_type = e.event_type
ORDER BY e.event_type
"""


@register("hll_distinct_users", oracle=_HLL_ORACLE)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimation per event type, reported
    against the exact count. The register build is the scale story:
    one map-side-combinable MAX aggregation into m=256 registers per
    type — no distinct shuffle at all (the exact column here is the
    diagnostic, not the plan) — and registers merge by MAX across
    executors, batches, or days.

    Oracle-exactness is engineered, not lucky: the hash is an
    explicit Horner polynomial both engines replay; each register
    term 2^-M_j is an exact power of two (integer shiftleft then
    divide), so the register sum is exactly representable in double
    and order-independent; the only transcendental (ln, in the
    linear-counting branch) is rounded to 4 decimals on both
    sides."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    h = e.select(
        "event_type",
        "user_id",
        _hll_hash_spark("CAST(user_id AS STRING)").alias("hv"),
    )
    hb = h.select(
        "event_type",
        "user_id",
        (F.col("hv") % _HLL_M).alias("bucket"),
        F.expr(f"hv div {_HLL_M}").alias("w"),
    )
    rg = (
        hb.withColumn("rho", F.expr(_RHO_SQL))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    agg = rg.groupBy("event_type").agg(
        F.count("*").alias("present"),
        F.sum(
            F.lit(1.0) / F.expr("CAST(shiftleft(1L, m_j) AS DOUBLE)")
        ).alias("s_present"),
    )
    alpha = F.expr(_ALPHA_SQL)
    est = agg.select(
        "event_type",
        (F.lit(_HLL_M) - F.col("present")).alias("v_zero"),
        (
            alpha * _HLL_M * _HLL_M
            / (F.col("s_present") + (F.lit(_HLL_M) - F.col("present")).cast("double"))
        ).alias("e_raw"),
    )
    ex = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_users")
    )
    hll = F.when(
        (F.col("e_raw") <= 2.5 * _HLL_M) & (F.col("v_zero") > 0),
        F.lit(_HLL_M) * F.log(F.lit(float(_HLL_M)) / F.col("v_zero")),
    ).otherwise(F.col("e_raw"))
    return (
        est.join(ex, "event_type")
        .select(
            "event_type",
            "exact_users",
            F.round(hll, 4).alias("hll_estimate"),
            F.col("v_zero").cast("int").alias("zero_registers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------- B111
_SKY_BUCKET = 100.0  # fixed price-bucket width for the prune stage

_SKYLINE_ORACLE = f"""
SELECT p.p_partkey AS part_key, p.p_retailprice AS retail_price,
  CAST(p.p_size AS BIGINT) AS size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY retail_price, part_key
"""


@register("part_skyline", oracle=_SKYLINE_ORACLE)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query over parts — minimize retail
    price, maximize size: the parts no other part beats on both
    dimensions, the multi-criteria shortlist behind "cheapest for its
    size class". The naive formulation is a quadratic NOT EXISTS self
    join (the oracle runs exactly that); the Spark plan is an EXACT
    distributed prefix-max sweep with NO pairwise stage at all — a
    part is on the frontier iff (a) it carries its price group's max
    size and (b) that size strictly beats the max size of every
    strictly-cheaper price:

    1. per-price group max size (one map-side-combinable aggregation
       -> one row per DISTINCT price, so the sweep below never sees
       ties in its ORDER BY);
    2. running max over strictly-cheaper prices, decomposed so no
       window ever runs on a single partition: a within-bucket
       running max (window PARTITIONED by fixed-width price bucket)
       plus a cross-bucket offset from the bucket-count-sized
       per-bucket-max table (the only global window, bounded by
       price_range / bucket_width rows);
    3. join the price-group verdicts back to parts by price (a plain
       shuffle join — the frontier can legitimately be table-sized
       when size grows with price, so nothing here is broadcast) and
       keep rows with size == group max and size > prefix max.

    Every stage is linear in the input; the former quadratic
    broadcast verify over survivors (which OOMed by construction on
    monotone data where survivors approach the whole table) is gone.
    Equal (price, size) pairs both survive — neither strictly
    dominates the other — matching the NOT EXISTS oracle."""
    p = load_tables(spark, sf_dir, ("part",))["part"].select(
        F.col("p_partkey").alias("part_key"),
        F.col("p_retailprice").alias("retail_price"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    grp = (
        p.groupBy("retail_price")
        .agg(F.max("size").alias("grp_mx"))
        .withColumn("bkt", F.floor(F.col("retail_price") / F.lit(_SKY_BUCKET)))
    )
    wb = (
        Window.partitionBy("bkt")
        .orderBy("retail_price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grp = grp.withColumn("run_in_bkt", F.max("grp_mx").over(wb))
    per_bkt = grp.groupBy("bkt").agg(F.max("grp_mx").alias("bmx"))
    wprior = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prior = per_bkt.withColumn("best_below", F.max("bmx").over(wprior)).select(
        "bkt", "best_below"
    )
    verdicts = (
        grp.join(F.broadcast(prior), "bkt")
        .withColumn(
            "m_less",
            F.greatest(
                F.coalesce("run_in_bkt", F.lit(-(1 << 62))),
                F.coalesce("best_below", F.lit(-(1 << 62))),
            ),
        )
        .where(F.col("grp_mx") > F.col("m_less"))
        .select("retail_price", "grp_mx")
    )
    return (
        p.join(verdicts, "retail_price")
        .where(F.col("size") == F.col("grp_mx"))
        .select("part_key", "retail_price", "size")
        .orderBy("retail_price", "part_key")
    )


# ---------------------------------------------------------------- C125
_COVERAGE_TARGETS = (0.5, 0.9, 0.95, 0.99, 0.999)

_COVERAGE_ORACLE = f"""
WITH wc AS (
  SELECT word, COUNT(*) AS n FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
), tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS T FROM wc
), ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY n DESC, word) AS i,
    SUM(n) OVER (ORDER BY n DESC, word ROWS UNBOUNDED PRECEDING) AS cum
  FROM wc
), tgt(c) AS (VALUES (0.5), (0.9), (0.95), (0.99), (0.999))
SELECT CAST(tgt.c AS DOUBLE) AS coverage_target,
  MIN(CASE WHEN CAST(cum AS DOUBLE) >= CEIL(tgt.c * tot.T)
      THEN i END) AS vocab_size,
  CAST(MIN(CASE WHEN CAST(cum AS DOUBLE) >= CEIL(tgt.c * tot.T)
      THEN cum END) AS BIGINT) AS tokens_covered,
  {sql_round_rat('tot.T - MIN(CASE WHEN CAST(cum AS DOUBLE)'
                 ' >= CEIL(tgt.c * tot.T) THEN cum END)',
                 'tot.T', 6)} AS oov_rate
FROM ranked, tot, tgt
GROUP BY tgt.c, tot.T
"""


@register("vocab_coverage_curve", oracle=_COVERAGE_ORACLE)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-sizing curve: the vocabulary size needed to cover
    50/90/95/99/99.9% of corpus token MASS (frequency-ranked, ties to
    lexicographically-first word) plus the residual OOV rate at each
    cut — the analysis that decides a vocab budget before training a
    tokenizer, and the mass-coverage companion to `vocab_oov_profile`
    (which scores a GIVEN vocab) and `heaps_law_fit` (type growth).

    Scale: the global frequency-descending cumsum runs through
    `total_order_index` (range-bucketed parallel ranking — no
    single-reducer window even though a 100 TB corpus's Heaps
    vocabulary is ~1e8 types); the curve itself is ONE aggregate over
    the ranked frame (min hit index per target), so cost is one
    word-count shuffle + the ranking's two cheap passes."""
    from cdk_serverless_data_lake_sandbox_spark.operators.stats import (
        total_order_index,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    wc = word_counts(docs)
    ranked, _, total = total_order_index(
        wc,
        F.col("n"),
        [F.col("word").asc()],
        descending=True,
        cum=F.col("n"),
        cum_dtype="decimal(38,0)",
    )
    t_double = float(total)
    aggs = []
    for i, t in enumerate(_COVERAGE_TARGETS):
        need = F.ceil(F.lit(t) * F.lit(t_double))
        hit = F.col("_cum").cast("double") >= need
        aggs.append(F.min(F.when(hit, F.col("_i"))).alias(f"_v{i}"))
        aggs.append(
            F.min(F.when(hit, F.col("_cum").cast("double"))).alias(f"_c{i}")
        )
    one = ranked.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(float(t)).alias("coverage_target"),
                F.col(f"_v{i}").alias("vocab_size"),
                F.col(f"_c{i}").cast("bigint").alias("tokens_covered"),
                # integer-exact oov = (T - covered)/T (round_rat)
                round_rat(
                    f"CAST({int(total)} - _c{i} AS BIGINT)",
                    str(int(total)),
                    6,
                ).alias("oov_rate"),
            )
            for i, t in enumerate(_COVERAGE_TARGETS)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


# ---------------------------------------------------------------- B40-R
# approx_distinct_users, re-engineered on the C105 explicit-HLL recipe
# so the DuckDB oracle replays the sketch exactly (the earlier
# approx_count_distinct form was xxhash-internal -> rows-only). Same
# m=256 registers, same Horner hash, same linear-counting switch.
_APPROX_DISTINCT_ORACLE = f"""
WITH h AS (
  SELECT event_type, {_hll_hash_sql("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
),
hb AS (SELECT event_type, hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS w FROM h),
rg AS (
  SELECT event_type, bucket, MAX({_RHO_SQL}) AS m_j
  FROM hb GROUP BY event_type, bucket
),
agg AS (
  SELECT event_type,
    COUNT(*) AS present,
    SUM(CAST(1 AS DOUBLE) / CAST((1 << m_j) AS DOUBLE)) AS s_present
  FROM rg GROUP BY event_type
),
est AS (
  SELECT event_type,
    {_HLL_M} - present AS v_zero,
    ({_ALPHA_SQL}) * {_HLL_M} * {_HLL_M}
      / (s_present + CAST({_HLL_M} - present AS DOUBLE)) AS e_raw
  FROM agg
),
ne AS (
  SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type
)
SELECT e.event_type,
  ROUND(CASE WHEN e.e_raw <= 2.5 * {_HLL_M} AND e.v_zero > 0
        THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE) / e.v_zero)
        ELSE e.e_raw END, 4) AS n_users_approx,
  CAST(n.n_events AS BIGINT) AS n_events
FROM est e JOIN ne n ON n.event_type = e.event_type
"""


@register("approx_distinct_users", oracle=_APPROX_DISTINCT_ORACLE)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via the explicit
    m=256-register HLL (C105's recipe: Horner polynomial hash, MAX-
    mergeable registers, linear counting below 2.5m). At 100 TB this
    is the difference between a fixed-size register merge and a full
    shuffle of every distinct key; tests pin <5% error vs the exact
    counts at the measured SF (theoretical rsd ~1.04/sqrt(256) = 6.5%,
    so the headroom is empirical, not guaranteed — use more registers
    for tighter bounds).

    Oracle-exactness is engineered exactly as C105: both engines
    replay the same integer hash, exactly-representable 2^-M_j
    register terms, and a shared ROUND(.., 4) on the one
    transcendental."""
    e = load_tables(spark, sf_dir, ("events",))["events"]
    h = e.select(
        "event_type", _hll_hash_spark("CAST(user_id AS STRING)").alias("hv")
    )
    hb = h.select(
        "event_type",
        (F.col("hv") % _HLL_M).alias("bucket"),
        F.expr(f"hv div {_HLL_M}").alias("w"),
    )
    rg = (
        hb.withColumn("rho", F.expr(_RHO_SQL))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    agg = rg.groupBy("event_type").agg(
        F.count("*").alias("present"),
        F.sum(
            F.lit(1.0) / F.expr("CAST(shiftleft(1L, m_j) AS DOUBLE)")
        ).alias("s_present"),
    )
    est = agg.select(
        "event_type",
        (F.lit(_HLL_M) - F.col("present")).alias("v_zero"),
        (
            F.expr(_ALPHA_SQL) * _HLL_M * _HLL_M
            / (
                F.col("s_present")
                + (F.lit(_HLL_M) - F.col("present")).cast("double")
            )
        ).alias("e_raw"),
    )
    hll = F.when(
        (F.col("e_raw") <= 2.5 * _HLL_M) & (F.col("v_zero") > 0),
        F.lit(_HLL_M) * F.log(F.lit(float(_HLL_M)) / F.col("v_zero")),
    ).otherwise(F.col("e_raw"))
    ne = e.groupBy("event_type").agg(F.count("*").alias("n_events"))
    return est.join(ne, "event_type").select(
        "event_type",
        F.round(hll, 4).alias("n_users_approx"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------- B75-R
# sketch_rollup_dau on the same explicit-HLL registers: per-DAY
# register tables (the persisted daily-sketch analog) are MAX-merged
# into weekly registers — never re-touching raw events — then
# estimated. The oracle computes weekly registers directly from
# events; identical by MAX-associativity, which is precisely the
# mergeability claim under test.
_SKETCH_ROLLUP_ORACLE = f"""
WITH h AS (
  SELECT date_trunc('day', ts) AS day,
    {_hll_hash_sql("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
),
hb AS (
  SELECT date_trunc('week', day) AS week_start,
    hv % {_HLL_M} AS bucket, hv // {_HLL_M} AS w
  FROM h
),
rg AS (
  SELECT week_start, bucket, MAX({_RHO_SQL}) AS m_j
  FROM hb GROUP BY week_start, bucket
),
agg AS (
  SELECT week_start,
    COUNT(*) AS present,
    SUM(CAST(1 AS DOUBLE) / CAST((1 << m_j) AS DOUBLE)) AS s_present
  FROM rg GROUP BY week_start
),
est AS (
  SELECT week_start,
    {_HLL_M} - present AS v_zero,
    ({_ALPHA_SQL}) * {_HLL_M} * {_HLL_M}
      / (s_present + CAST({_HLL_M} - present AS DOUBLE)) AS e_raw
  FROM agg
),
wk AS (
  SELECT date_trunc('week', ts) AS week_start,
    COUNT(DISTINCT date_trunc('day', ts)) AS n_days,
    COUNT(*) AS n_events
  FROM events GROUP BY 1
)
SELECT w.week_start,
  CAST(w.n_days AS BIGINT) AS n_days,
  CAST(w.n_events AS BIGINT) AS n_events,
  ROUND(CASE WHEN e.e_raw <= 2.5 * {_HLL_M} AND e.v_zero > 0
        THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE) / e.v_zero)
        ELSE e.e_raw END, 4) AS approx_users
FROM est e JOIN wk w ON w.week_start = e.week_start
"""


@register("sketch_rollup_dau", oracle=_SKETCH_ROLLUP_ORACLE)
def sketch_rollup_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-DAY HLL register tables of active
    users are MAX-merged into weekly uniques without touching raw
    events again — the pre-aggregation pattern that makes
    distinct-count dashboards tractable at 100 TB (store tiny daily
    register tables, merge any date range on demand; exact distinct
    would re-scan the raw table per query). Registers are the C105
    explicit-HLL kind, so the rollup is driver-gradable: the oracle
    builds weekly registers straight from events, which equals the
    daily-then-MAX-merge path by associativity of MAX — the exact
    property that makes the sketch mergeable."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    h = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        _hll_hash_spark("CAST(user_id AS STRING)").alias("hv"),
    )
    # the persisted daily-sketch analog: one register table per day
    daily_reg = (
        h.select(
            "day",
            (F.col("hv") % _HLL_M).alias("bucket"),
            F.expr(f"hv div {_HLL_M}").alias("w"),
        )
        .withColumn("rho", F.expr(_RHO_SQL))
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    daily_cnt = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n_events"))
    # weekly rollup touches ONLY the day-sized sketch tables
    weekly_reg = daily_reg.groupBy(
        F.date_trunc("week", F.col("day")).alias("week_start"), "bucket"
    ).agg(F.max("m_j").alias("m_j"))
    agg = weekly_reg.groupBy("week_start").agg(
        F.count("*").alias("present"),
        F.sum(
            F.lit(1.0) / F.expr("CAST(shiftleft(1L, m_j) AS DOUBLE)")
        ).alias("s_present"),
    )
    est = agg.select(
        "week_start",
        (F.lit(_HLL_M) - F.col("present")).alias("v_zero"),
        (
            F.expr(_ALPHA_SQL) * _HLL_M * _HLL_M
            / (
                F.col("s_present")
                + (F.lit(_HLL_M) - F.col("present")).cast("double")
            )
        ).alias("e_raw"),
    )
    hll = F.when(
        (F.col("e_raw") <= 2.5 * _HLL_M) & (F.col("v_zero") > 0),
        F.lit(_HLL_M) * F.log(F.lit(float(_HLL_M)) / F.col("v_zero")),
    ).otherwise(F.col("e_raw"))
    weekly_cnt = daily_cnt.groupBy(
        F.date_trunc("week", F.col("day")).alias("week_start")
    ).agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("n_events"),
    )
    return est.join(weekly_cnt, "week_start").select(
        "week_start",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(hll, 4).alias("approx_users"),
    )


# ---------------------------------------------------------------- B56-R
# frequent_items_sketch on the C103 Count-Min cells: an item is
# reported iff its CMS estimate exceeds support * N. Same guarantee
# direction as lossy counting / freq_items (no false negatives —
# estimates only overcount; false positives possible), but fully
# deterministic and replayable in SQL, where freq_items' per-partition
# Misra-Gries state was partition-order dependent and rows-only.
_FREQ_SUPPORT = 0.05


def _cms_hh_sql(key_expr: str, sfx: str) -> str:
    """CTE block (suffix-namespaced): (k, n, est) per distinct key of
    ``key_expr`` over events, where est is the 4-row Count-Min
    estimate."""
    hashes = ", ".join(
        f"{_cms_hash_sql('k', b)} AS b{i}" for i, b in enumerate(_CMS_BASES)
    )
    stacked = " UNION ALL ".join(
        f"SELECT {i} AS row_id, b{i} AS bucket, n FROM hh{sfx}"
        for i in range(len(_CMS_BASES))
    )
    joins = " ".join(
        f"JOIN cells{sfx} c{i} ON c{i}.row_id = {i}"
        f" AND c{i}.bucket = hh{sfx}.b{i}"
        for i in range(len(_CMS_BASES))
    )
    least = ", ".join(f"c{i}.total" for i in range(len(_CMS_BASES)))
    return f"""
kc{sfx} AS (SELECT {key_expr} AS k, COUNT(*) AS n FROM events GROUP BY 1),
hh{sfx} AS (SELECT k, n, {hashes} FROM kc{sfx}),
cells{sfx} AS (
  SELECT row_id, bucket, SUM(n) AS total FROM ({stacked})
  GROUP BY row_id, bucket
),
probe{sfx} AS (
  SELECT hh{sfx}.k, hh{sfx}.n, LEAST({least}) AS est FROM hh{sfx} {joins}
),
tot{sfx} AS (SELECT SUM(n) AS total_n FROM kc{sfx})
"""


_FREQ_ITEMS_ORACLE = f"""
WITH {_cms_hh_sql("CAST(event_type AS VARCHAR)", "_t")},
{_cms_hh_sql("CAST(user_id AS VARCHAR)", "_u")}
SELECT
  COALESCE((SELECT string_agg(k, ',' ORDER BY k) FROM probe_t, tot_t
            WHERE est > {_FREQ_SUPPORT} * total_n), '') AS frequent_types,
  CAST((SELECT COUNT(*) FROM probe_u, tot_u
        WHERE est > {_FREQ_SUPPORT} * total_n) AS INTEGER)
    AS n_frequent_users
"""


@register("frequent_items_sketch", oracle=_FREQ_ITEMS_ORACLE)
def frequent_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters per column via Count-Min-thresholding: an item is
    frequent iff its CMS estimate exceeds support * N. Single pass
    into d x w mergeable cells, fixed memory — the shape of "which
    tokens/hosts/keys dominate" at 100 TB where the full key
    distribution won't fit. CMS only overcounts, so every item with
    true frequency > support is guaranteed present (false positives
    possible, false negatives not — tests assert containment of the
    exact heavy hitters); the explicit Horner hash makes the whole
    report hash-exact against the DuckDB replay."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]

    def hh_probe(keyed: DataFrame) -> DataFrame:
        kc = keyed.groupBy("word").agg(F.count("*").alias("n"))
        kc = kc.transform(pin)
        probe = cms_probe(kc, cms_cells(kc))
        tot = kc.agg(F.sum("n").alias("total_n"))
        return probe.join(F.broadcast(tot)).where(
            F.col("cms_estimate") > _FREQ_SUPPORT * F.col("total_n")
        )
    types = hh_probe(
        ev.select(F.col("event_type").cast("string").alias("word"))
    ).agg(
        F.concat_ws(",", F.array_sort(F.collect_list("word"))).alias(
            "frequent_types"
        )
    )
    users = hh_probe(
        ev.select(F.col("user_id").cast("string").alias("word"))
    ).agg(F.count("*").cast("int").alias("n_frequent_users"))
    return types.join(users)
