"""Parity gate for the opt-in long-cents money-sum fast path
(SPARK_GRAFT_LONG_CENTS=1): for every query that routes a simple
single-column money sum through ``money_sum``, the fast path must be
bit-identical to the default decimal path (same exact rational,
rounded to double once — see the helper's docstring)."""

from __future__ import annotations

import pytest

from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

from tests.compare import assert_frames_match
from tests.conftest import SF_MEDIUM

_Q = all_queries()

# every query with a money_sum call site
_CONVERTED = [
    "q1_pricing_summary",
    "q18_large_volume",
    "cumulative_revenue",
    "value_histogram",
    "rollup_agg",
    "time_bucket_agg",
    "activity_heatmap",
    "ntile_quartiles",
    "mom_growth",
    "region_rollup",
]


@pytest.mark.parametrize("name", [n for n in _CONVERTED if n in _Q])
def test_long_cents_matches_decimal(spark, name, monkeypatch):
    slow = _Q[name](spark, SF_MEDIUM).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_LONG_CENTS", "1")
    fast = _Q[name](spark, SF_MEDIUM).toPandas()
    assert_frames_match(fast, slow, f"{name} (long-cents vs decimal)")


def test_long_cents_changes_the_plan(spark, monkeypatch):
    """The flag must actually flip the aggregation to a LONG sum."""
    slow_plan = _Q["cumulative_revenue"](spark, SF_MEDIUM)._jdf.queryExecution().optimizedPlan().toString()
    monkeypatch.setenv("SPARK_GRAFT_LONG_CENTS", "1")
    fast_plan = _Q["cumulative_revenue"](spark, SF_MEDIUM)._jdf.queryExecution().optimizedPlan().toString()
    assert fast_plan != slow_plan
    assert "bigint" in fast_plan.lower() or "cast((o_totalprice" in fast_plan