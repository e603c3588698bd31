"""Declarative data-quality expectations (the Deequ/Great-
Expectations pattern, engine-native): a rule set is compiled into ONE
conditional-aggregation pass over the table plus one broadcast
anti-join per referential rule — adding a rule adds a column to the
aggregate, never a scan. The registered query runs the standard
warehouse suite over orders/customer; ``run_expectations`` is the
reusable library entry for any table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.operators._helpers import (
    round_rat,
    sql_round_rat,
)
from cdk_serverless_data_lake_sandbox_spark.registry import register


def run_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Evaluate named violation predicates in one scan. Each rule is
    a Column counting violations (pre-aggregated expressions allowed);
    returns (rule, n_violations, passed) rows — the shape a quality
    gate or a dashboard consumes."""
    agg = df.agg(
        *[expr.cast("bigint").alias(name) for name, expr in rules.items()]
    )
    stack = ", ".join(f"'{name}', {name}" for name in rules)
    return agg.select(
        F.expr(
            f"stack({len(rules)}, {stack}) AS (rule, n_violations)"
        )
    ).select("rule", "n_violations", (F.col("n_violations") == 0).alias("passed"))


_DQ_ORACLE = """
WITH r AS (
  SELECT 'null_orderkey' AS rule,
    COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS n_violations FROM orders
  UNION ALL
  SELECT 'duplicate_orderkey',
    COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
  UNION ALL
  SELECT 'nonpositive_totalprice',
    COUNT(*) FILTER (WHERE o_totalprice <= 0) FROM orders
  UNION ALL
  SELECT 'status_outside_domain',
    COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) FROM orders
  UNION ALL
  SELECT 'orderdate_out_of_range',
    COUNT(*) FILTER (WHERE o_orderdate < DATE '1990-01-01'
                        OR o_orderdate > DATE '2030-01-01') FROM orders
  UNION ALL
  SELECT 'orphan_custkey',
    COUNT(*) FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT rule, CAST(n_violations AS BIGINT) AS n_violations,
  n_violations = 0 AS passed
FROM r
"""


@register("dq_expectations", oracle=_DQ_ORACLE)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard warehouse expectation suite over orders: completeness
    (null key), uniqueness (duplicate key), range (price, date),
    domain (status), and referential integrity against customer. The
    five scalar rules compile to one aggregation pass; the
    referential rule is a broadcast-dim anti-join count — the whole
    suite costs one scan of the fact table at any scale."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    o, c = t["orders"], t["customer"]
    scalar = run_expectations(
        o,
        {
            "null_orderkey": F.count(F.when(F.col("o_orderkey").isNull(), 1)),
            "duplicate_orderkey": F.count("*") - F.count_distinct("o_orderkey"),
            "nonpositive_totalprice": F.count(
                F.when(F.col("o_totalprice") <= 0, 1)
            ),
            "status_outside_domain": F.count(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
            ),
            "orderdate_out_of_range": F.count(
                F.when(
                    (F.col("o_orderdate") < F.lit("1990-01-01").cast("date"))
                    | (F.col("o_orderdate") > F.lit("2030-01-01").cast("date")),
                    1,
                )
            ),
        },
    )
    orphans = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o["o_custkey"] == c["c_custkey"],
            "left_anti",
        )
        .agg(F.count("*").cast("bigint").alias("n_violations"))
        .select(
            F.lit("orphan_custkey").alias("rule"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
    return scalar.unionByName(orphans)


def observe_metrics(df: DataFrame, name: str, metrics: dict[str, Column]):
    """Attach pipeline metrics that piggyback on the frame's NEXT
    action — Spark's ``Observation`` accumulates the aggregates on
    each task's rows as they stream through, so row counts / null
    counts / sums cost ZERO extra scans (vs. the naive
    ``df.count(); df.agg(...)`` pattern, which reruns the whole
    upstream plan per metric batch — at 100 TB that second scan is
    the difference between free monitoring and doubling the job).

    Returns ``(observed_df, observation)``: run any action on
    ``observed_df`` (write, noop sink, collect), then read
    ``observation.get`` for the metric dict. Only aggregate
    expressions are legal (Spark enforces this)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


def corpus_ingest_metrics(df: DataFrame):
    """The standard ingest-health metric set for a documents batch:
    row count, blank/null text count, total characters, and distinct
    sources — attached via :func:`observe_metrics` so a single write
    action yields both the data and its health report."""
    return observe_metrics(
        df,
        "corpus_ingest",
        {
            "n_rows": F.count(F.lit(1)),
            "n_blank_text": F.count_if(
                F.col("text").isNull() | (F.length(F.trim(F.col("text"))) == 0)
            ),
            "total_chars": F.coalesce(
                F.sum(F.length("text")), F.lit(0)
            ).cast("bigint"),
            # DISTINCT aggregates are illegal in observed metrics
            # (and exact distinct wouldn't stream anyway) — the HLL
            # sketch is the right monitoring answer at any scale.
            "n_sources": F.approx_count_distinct("source"),
        },
    )


# ---------------------------------------------------------------- C92
_ENSEMBLE_ENTROPY_MIN = 0.9


def _ensemble_oracle() -> str:
    from cdk_serverless_data_lake_sandbox_spark.operators.curation import (
        _qc_score_sql,
    )
    from cdk_serverless_data_lake_sandbox_spark.operators.text import (
        _ENTROPY_ORACLE,
        _GOPHER_ORACLE,
    )

    return f"""
WITH g AS ({_GOPHER_ORACLE}), c AS ({_qc_score_sql()}), e AS ({_ENTROPY_ORACLE})
SELECT g.keep AS gopher_keep, c.decision AS classifier_decision,
  CAST(e.norm_entropy >= {_ENSEMBLE_ENTROPY_MIN} AS INTEGER) AS entropy_pass,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(e.n_tokens) AS BIGINT) AS total_tokens,
  CAST(ROUND(AVG(c.score), 6) AS DOUBLE) AS mean_score
FROM g JOIN c USING (doc_id) JOIN e USING (doc_id)
GROUP BY g.keep, c.decision, CAST(e.norm_entropy >= {_ENSEMBLE_ENTROPY_MIN} AS INTEGER)
"""


@register("quality_ensemble", oracle=_ensemble_oracle())
def quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-agreement matrix across three ORTHOGONAL quality
    signals — the Gopher rule gate (hand heuristics), the linear
    classifier score (learned-model stand-in), and the unigram-entropy
    diversity cut — rolled up to one row per decision combination
    with doc counts, token mass, and mean classifier score.

    This is the calibration report a curation run reads BEFORE wiring
    filters in series: high-volume disagreement cells (e.g. Gopher
    keeps / classifier drops) are exactly where thresholds need
    tuning, and the token mass per cell says what each policy would
    cost at corpus scale.

    Scale: three independent linear passes over the corpus (each
    map-side-combinable, no windows — see the component operators),
    joined on doc_id and collapsed to <= 2*3*2 rows. The join keys are
    unique per side, so AQE plans shuffle joins with no skew risk; the
    rollup output is constant-size regardless of corpus size."""
    from cdk_serverless_data_lake_sandbox_spark.operators.curation import (
        quality_classifier_score,
    )
    from cdk_serverless_data_lake_sandbox_spark.operators.text import (
        gopher_quality_filter,
        unigram_entropy,
    )

    g = gopher_quality_filter(spark, sf_dir).select("doc_id", "keep")
    c = quality_classifier_score(spark, sf_dir).select(
        "doc_id", "score", "decision"
    )
    e = unigram_entropy(spark, sf_dir).select(
        "doc_id",
        "n_tokens",
        (F.col("norm_entropy") >= _ENSEMBLE_ENTROPY_MIN)
        .cast("int")
        .alias("entropy_pass"),
    )
    return (
        g.join(c, "doc_id")
        .join(e, "doc_id")
        .groupBy(
            F.col("keep").alias("gopher_keep"),
            F.col("decision").alias("classifier_decision"),
            "entropy_pass",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("score"), 6).alias("mean_score"),
        )
    )


# ---------------------------------------------------------------- C117
def _decile_lift_oracle() -> str:
    from cdk_serverless_data_lake_sandbox_spark.operators.curation import (
        _qc_score_sql,
    )
    from cdk_serverless_data_lake_sandbox_spark.operators.text import (
        _GOPHER_ORACLE,
    )

    cuts = ", ".join(
        f"quantile_cont(score, {q / 10}) AS d{q}" for q in range(1, 10)
    )
    decile = " + ".join(f"CAST(s.score > c.d{q} AS INT)" for q in range(1, 10))
    return f"""
WITH s AS ({_qc_score_sql()}), g AS ({_GOPHER_ORACLE}),
cuts AS (SELECT {cuts} FROM s),
scored AS (
  SELECT s.doc_id, s.score, g.keep, 1 + {decile} AS decile
  FROM s JOIN g USING (doc_id) CROSS JOIN cuts c
),
tot AS (SELECT SUM(keep) AS tk, COUNT(*) AS tn FROM scored)
SELECT CAST(decile AS INTEGER) AS decile,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  {sql_round_rat('SUM(keep)', 'COUNT(*)', 6)} AS keep_rate,
  {sql_round_rat('SUM(keep) * t.tn', 'COUNT(*) * t.tk', 6)} AS lift,
  ROUND(AVG(score), 6) AS mean_score
FROM scored CROSS JOIN tot t
GROUP BY decile, t.tk, t.tn
ORDER BY decile
"""


@register("quality_decile_lift", oracle=_decile_lift_oracle())
def quality_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile-lift calibration table for the quality classifier: docs
    bucketed by exact score deciles (nine broadcast quantile cuts —
    the RFM recipe, never a global NTILE), each decile's Gopher-rule
    keep rate and its lift over the corpus base rate. This is the
    gain chart read before trusting a learned quality score to rank
    a corpus: a well-calibrated score shows keep-rate rising
    monotonically with decile; a flat table means the classifier adds
    nothing over the rules. Two linear scoring passes joined on
    doc_id + one 9-scalar broadcast; constant 10-row output."""
    from cdk_serverless_data_lake_sandbox_spark.operators.curation import (
        quality_classifier_score,
    )
    from cdk_serverless_data_lake_sandbox_spark.operators.text import (
        gopher_quality_filter,
    )

    s = quality_classifier_score(spark, sf_dir).select("doc_id", "score")
    g = gopher_quality_filter(spark, sf_dir).select("doc_id", "keep")
    cuts = s.agg(
        *[
            F.percentile("score", q / 10).alias(f"d{q}")
            for q in range(1, 10)
        ]
    )
    decile = sum(
        (F.col("score") > F.col(f"d{q}")).cast("int") for q in range(1, 10)
    ) + F.lit(1)
    scored = (
        s.join(g, "doc_id")
        .crossJoin(F.broadcast(cuts))
        .select("doc_id", "score", "keep", decile.alias("decile"))
    )
    tot = scored.agg(
        F.sum("keep").alias("_tk"), F.count("*").alias("_tn")
    )
    # integer-exact rates (round_rat): keep_rate = k/n, lift =
    # (k/n)/(K/N) = k*N / (n*K) — all four are counts
    return (
        scored.groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("keep").alias("_k"),
            F.round(F.avg("score"), 6).alias("mean_score"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_docs",
            round_rat("_k", "n_docs", 6).alias("keep_rate"),
            round_rat("_k * _tn", "n_docs * _tk", 6).alias("lift"),
            "mean_score",
        )
        .orderBy("decile")
    )
