"""Local mirror of the driver's correctness gate: every registered
query with an oracle runs on Spark AND DuckDB; row counts, column
names, and order-insensitive values must match exactly.

Default tier runs at SF_PARITY = sf0.001 (every oracle is verified at
that SF by the standing XSF rotation artifacts, so small-SF parity
loses rows, not oracle coverage); SPARK_GRAFT_FULL_TESTS=1 restores
the sf0.01 mirror for the builder's close-out run.
"""

from __future__ import annotations

import pytest

from tests.compare import assert_frames_match
from tests.conftest import SF_PARITY, make_duck

from cdk_serverless_data_lake_sandbox_spark.registry import all_oracles, all_queries

_ORACLES = all_oracles()
_QUERIES = all_queries()


@pytest.fixture(scope="module")
def duck_parity():
    con = make_duck(SF_PARITY)
    yield con
    con.close()


def test_every_oracle_has_query():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_parity(registry_frames, duck_parity, name):
    spark_pdf = registry_frames[name].toPandas()
    oracle_pdf = duck_parity.execute(_ORACLES[name]).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_compare_rejects_int_float_dtype_divergence():
    """The driver's value hash is dtype-sensitive: int64 vs float64 with
    equal values (1 == 1.0) hash-mismatches. The local mirror must fail
    that case too — this is the exact divergence that made the old
    cohort_retention oracle (float `/ 7`) pass locally but fail the gate."""
    import pandas as pd

    ints = pd.DataFrame({"k": ["a", "b"], "v": pd.array([1, 2], dtype="int64")})
    floats = pd.DataFrame({"k": ["a", "b"], "v": pd.array([1.0, 2.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype kind mismatch"):
        assert_frames_match(ints, floats, "dtype_guard")
