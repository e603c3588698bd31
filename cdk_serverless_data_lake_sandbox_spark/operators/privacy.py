"""Privacy / governance operators: re-identification risk audits and
noisy-release mechanics.

The reference stack's data surface stops at IAM-level access control;
a lake that serves analysts also needs ROW-level disclosure checks
before a table or an aggregate leaves the trusted zone. Two standard
tools, both expressed as linear aggregation plans:

- k-anonymity / l-diversity (Sweeney 2002; Machanavajjhala et al.
  2007): every quasi-identifier combination must be shared by >= k
  rows, and the sensitive attribute within it must take >= l distinct
  values — the audit run before releasing a "pseudonymized" extract.
- Laplace-mechanism count release (Dwork et al. 2006): sensitivity-1
  counts plus Laplace(1/epsilon) noise. The mechanism here derives its
  uniform from an md5 of the group key and a fixed seed so the release
  is REPRODUCIBLE for testing and oracle verification — production
  swaps the seed for real entropy (one line); the query shape
  (count agg + in-row noise + rounding) is identical.

Scale: both are one map-side-combinable aggregation over the source
table; the noise/risk math is per-GROUP, so the post-agg work is
bounded by the number of cells, never the row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.registry import register

_K_ANON = 5
_L_DIV = 3

# Quasi-identifiers: nation + account-balance band (what a motivated
# adversary plausibly knows); sensitive attribute: market segment.
_KA_ORACLE = f"""
WITH cells AS (
  SELECT c_nationkey AS nation_key,
    CAST(FLOOR(c_acctbal / 2000) AS INTEGER) AS bal_band,
    COUNT(*) AS n_rows,
    COUNT(DISTINCT c_mktsegment) AS l_distinct
  FROM customer
  GROUP BY 1, 2
)
SELECT nation_key, bal_band,
  CAST(n_rows AS BIGINT) AS n_rows,
  CAST(l_distinct AS BIGINT) AS l_distinct,
  (n_rows < {_K_ANON}) AS k_violation,
  (l_distinct < {_L_DIV}) AS l_violation
FROM cells
WHERE n_rows < {_K_ANON} OR l_distinct < {_L_DIV}
ORDER BY nation_key, bal_band
"""


@register("k_anonymity_check", oracle=_KA_ORACLE)
def k_anonymity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity + l-diversity audit of the customer table under a
    (nation, account-balance band) quasi-identifier: every cell with
    fewer than k=5 members (re-identifiable by linkage) or fewer
    than l=3 distinct market segments (attribute-disclosable even
    when k holds — the homogeneity attack l-diversity exists for) is
    reported for suppression or generalization. One aggregation pass;
    the violation report is cell-bounded, so the audit costs the same
    scan at any row count."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    cells = c.groupBy(
        F.col("c_nationkey").alias("nation_key"),
        F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_band"),
    ).agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("c_mktsegment").alias("l_distinct"),
    )
    return (
        cells.where(
            (F.col("n_rows") < _K_ANON) | (F.col("l_distinct") < _L_DIV)
        )
        .select(
            "nation_key",
            "bal_band",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("l_distinct").cast("bigint").alias("l_distinct"),
            (F.col("n_rows") < _K_ANON).alias("k_violation"),
            (F.col("l_distinct") < _L_DIV).alias("l_violation"),
        )
        .orderBy("nation_key", "bal_band")
    )


_DP_EPS = 1.0
_DP_SEED = "dp_r5"

# Inverse-CDF Laplace from a 48-bit md5 uniform. Every arithmetic step
# is written identically on both engines; ln is rounded at the END
# (one round on the final released value), and u is strictly inside
# (0, 1) by construction (x+0.5)/2^48, so ln(1 - 2|u-0.5|) is finite
# unless u = 0.5 exactly (x = 2^47 - handled by the GREATEST floor).
_U48 = "CAST(2 AS DOUBLE) * CAST(140737488355328 AS DOUBLE)"  # 2 * 2^47


@register(
    "dp_count_release",
    oracle=f"""
WITH counts AS (
  SELECT c_mktsegment AS segment, COUNT(*) AS n
  FROM customer GROUP BY 1
),
noise AS (
  SELECT segment, n,
    (CAST(('0x' || SUBSTR(md5(segment || '_{_DP_SEED}'), 1, 12))::BIGINT
          AS DOUBLE) + CAST(0.5 AS DOUBLE)) / ({_U48}) AS u
  FROM counts
)
SELECT segment,
  ROUND(CAST(n AS DOUBLE)
    - (CAST(1 AS DOUBLE) / CAST({_DP_EPS} AS DOUBLE))
      * CASE WHEN u < CAST(0.5 AS DOUBLE) THEN CAST(-1 AS DOUBLE)
             ELSE CAST(1 AS DOUBLE) END
      * LN(GREATEST(CAST(1 AS DOUBLE)
            - CAST(2 AS DOUBLE) * ABS(u - CAST(0.5 AS DOUBLE)),
          CAST(1e-12 AS DOUBLE))), 4) AS released_count,
  CAST({_DP_EPS} AS DOUBLE) AS epsilon
FROM noise ORDER BY segment
""",
)
def dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release per market segment: the
    sensitivity-1 count plus Laplace(1/epsilon) noise via the inverse
    CDF of a uniform derived from md5(group key, seed) — reproducible
    by construction so the oracle (and a regression test) can verify
    the release end-to-end; a production deployment replaces the seed
    with real entropy and nothing else changes. The true count never
    appears in the output. Noise is computed per GROUP after the
    aggregation, so the mechanism adds constant work regardless of
    table size."""
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    counts = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("segment"), F.lit(f"_{_DP_SEED}"))), 1, 12
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5).cast("double")
    ) / F.expr(_U48)
    lap = (
        (F.lit(1.0).cast("double") / F.lit(_DP_EPS).cast("double"))
        * F.when(u < F.lit(0.5).cast("double"), F.lit(-1.0).cast("double"))
        .otherwise(F.lit(1.0).cast("double"))
        * F.log(
            F.greatest(
                F.lit(1.0).cast("double")
                - F.lit(2.0).cast("double")
                * F.abs(u - F.lit(0.5).cast("double")),
                F.lit(1e-12).cast("double"),
            )
        )
    )
    return (
        counts.select(
            "segment",
            F.round(F.col("n").cast("double") - lap, 4).alias(
                "released_count"
            ),
            F.lit(_DP_EPS).cast("double").alias("epsilon"),
        )
        .orderBy("segment")
    )
