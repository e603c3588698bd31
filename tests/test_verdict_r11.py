"""Round-11 verdict items: the C72 PCA oracle and the C95 scoring twin.

The heavy verification is the driver hash gate (both ops registered
with oracles, checked at three SFs in scripts/xsf_check.py runs); the
tests here pin the properties the gate can't see.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cdk_serverless_data_lake_sandbox_spark.registry import (  # noqa: E402
    all_oracles,
    all_queries,
)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from cdk_serverless_data_lake_sandbox_spark.session import get_spark

    s = get_spark(app_name="test-verdict-r11")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_pca_and_compression_twin_are_oracle_backed():
    oracles = all_oracles()
    assert "embedding_pca_variance" in oracles
    assert "compressed_size_scoring" in oracles


def test_compression_twin_shares_the_real_tail(spark):
    """Twin and real op must emit the identical schema (same shared
    tail code), and the planted sizes must exercise both regimes the
    real zlib output has: compressible docs (ratio < 1) and
    tiny-doc expansion (ratio > 1 when n_bytes < 20 + remainder)."""
    qs = all_queries()
    twin = qs["compressed_size_scoring"](spark, SF_SMALL)
    real = qs["compression_ratio"](spark, SF_SMALL)
    assert twin.schema == real.schema
    rows = twin.collect()
    assert all(r.n_compressed >= 20 for r in rows)
    assert all(
        r.n_compressed <= max(r.n_bytes, 20) for r in rows
    ), "plant must stay bounded by the payload (modulo the 20-byte floor)"
    ratios = [r.compression_ratio for r in rows if r.n_bytes > 0]
    assert any(x < 1.0 for x in ratios)


def test_vacuum_scratch_removes_only_stale_trees(tmp_path):
    """Killed sessions skip their atexit scratch cleanup; the
    session-start vacuum must reclaim their trees by age without
    touching anything a live session could own."""
    import os
    import time

    from cdk_serverless_data_lake_sandbox_spark.operators._helpers import (
        vacuum_scratch,
    )

    old = tmp_path / "local-dead"
    new = tmp_path / "local-live"
    old.mkdir()
    new.mkdir()
    stale = time.time() - 7 * 3600
    os.utime(old, (stale, stale))
    removed = vacuum_scratch(str(tmp_path))
    assert removed == [str(old)]
    assert not old.exists() and new.exists()


def test_pca_spectrum_still_matches_numpy_after_oracle_flip(spark):
    """The oracle flip changed only output rounding (JVM HALF_UP);
    the spectrum itself must still be the eigvalsh spectrum."""
    import numpy as np

    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables

    emb = load_tables(spark, SF_SMALL, ("embeddings",))["embeddings"]
    m = np.array(
        [r.embedding for r in emb.select("embedding").collect()], dtype=np.float64
    )
    cov = np.cov(m, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)[::-1]
    want = evals[:8] / evals.sum()
    got = (
        all_queries()["embedding_pca_variance"](spark, SF_SMALL)
        .orderBy("component")
        .collect()
    )
    for i, r in enumerate(got):
        assert abs(r.explained_variance - want[i]) < 1e-6


def test_rfm_avg_monetary_is_exact_cents(spark):
    """r11 XSF rotation regression: avg_monetary must be integer-cent
    arithmetic (round-half-up of exact cents/n), never a rounded
    double quotient — the double path flips the last cent between
    Spark (shortest-repr HALF_UP) and DuckDB (binary-nearest) when
    the true mean sits at a .xx5 boundary (seen live at sf0.001:
    segment avg 2682767.45 vs 2682767.44). Exact-cents output means
    every value times 100 is an integer, and the value equals the
    independently recomputed half-up cents mean."""
    from cdk_serverless_data_lake_sandbox_spark.operators.stats import rfm_segments

    rows = rfm_segments(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        cents = r.avg_monetary * 100
        assert abs(cents - round(cents)) < 1e-6, r.segment


def test_rank_distribution_six_dp_is_exact_integer_rounding(spark):
    """r11 XSF regression twin of the rfm cents fix: pr/cd must be
    integer half-up rounding of the exact rationals (rn-1)/(n-1) and
    rn/n — round(double, 6) diverges between engines at .xxxxxx5
    boundaries. Recompute both from collected ranks and require
    equality to the last representable digit."""
    from cdk_serverless_data_lake_sandbox_spark.operators.stats import (
        rank_distribution,
    )
    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables

    got = {r.c_custkey: (r.pr, r.cd) for r in rank_distribution(spark, SF_SMALL).collect()}
    cust = (
        load_tables(spark, SF_SMALL, ("customer",))["customer"]
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .collect()
    )
    by_nation: dict = {}
    for r in cust:
        by_nation.setdefault(r.c_nationkey, []).append((r.c_acctbal, r.c_custkey))
    checked = 0
    for rows in by_nation.values():
        rows.sort()
        n = len(rows)
        for i, (_, ck) in enumerate(rows, start=1):
            pr = 0.0 if n == 1 else ((2 * (i - 1) * 10**6 + (n - 1)) // (2 * (n - 1))) / 1e6
            cd = ((2 * i * 10**6 + n) // (2 * n)) / 1e6
            assert got[ck] == (pr, cd), ck
            checked += 1
    assert checked == len(got) > 0


def test_percentile_sketch_exact_through_partial_merges(spark):
    """r11 XSF regression: exactness of percentile_approx must hold
    under the 32-way partial MERGE, not just the single-partition
    head ("n <= accuracy" was a false bound — 30k rows/group at
    accuracy 50000 came back ranks off). Pin the carried accuracy
    against the exact order statistic on a 30k-row spread-out frame."""
    from cdk_serverless_data_lake_sandbox_spark.operators.stats import _QSCALE_ACC

    n = 30000
    df = spark.range(n).repartition(32).select(
        (F.hash(F.col("id").cast("string")).cast("double")).alias("x")
    )
    got = df.agg(
        F.percentile_approx("x", [0.5, 0.95, 0.99], _QSCALE_ACC).alias("p")
    ).first()["p"]
    xs = sorted(r.x for r in df.collect())
    import math

    for p, g in zip((0.5, 0.95, 0.99), got):
        assert g == xs[max(math.ceil(p * n), 1) - 1]


def test_round_rat_matches_fraction_half_up_on_both_engines(spark):
    """The round_rat/sql_round_rat pair must implement EXACT
    half-away-from-zero rounding of num/den on both engines,
    including the .<dp>5 boundary cases where round(double, dp)
    diverges between Spark and DuckDB (the r11 bug class). Ground
    truth is Fraction arithmetic."""
    from fractions import Fraction

    import duckdb

    from cdk_serverless_data_lake_sandbox_spark.operators._helpers import (
        round_rat,
        sql_round_rat,
    )

    cases = [
        # (num, den, dp) — boundary-heavy: quotient*10^dp ends in .5
        (33300, 64000, 6),     # 0.5203125 -> 0.520313 (the live cd hit)
        (1, 2, 0),             # 0.5 -> 1
        (3, 2, 0),             # 1.5 -> 2
        (-3, 2, 0),            # -1.5 -> -2 (away from zero)
        (445, 1000, 2),        # 0.445 -> 0.45 (the live cents hit)
        (-445, 1000, 2),       # -0.445 -> -0.45
        (123456, 7, 4),        # non-terminating
        (0, 5, 6),
        (999995, 10**6 * 2, 6),  # 0.4999975
        (25, 10000, 2),        # 0.0025 -> 0.0 (half at dp+1? no: .00)
        (15, 1000, 2),         # 0.015 -> 0.02
    ]
    rows = spark.createDataFrame(
        [(n, d, i) for i, (n, d, _) in enumerate(cases)], "num long, den long, i long"
    )
    got_spark = {}
    for i, (_, _, dp) in enumerate(cases):
        r = (
            rows.where(F.col("i") == i)
            .select(round_rat("num", "den", dp).alias("v"))
            .first()
        )
        got_spark[i] = r.v
    con = duckdb.connect()
    for i, (n, d, dp) in enumerate(cases):
        want_fr = Fraction(n, d)
        sign = -1 if want_fr < 0 else 1
        scaled = abs(want_fr) * 10**dp
        want = sign * ((2 * scaled.numerator + scaled.denominator)
                       // (2 * scaled.denominator)) / 10**dp
        # independently: half-up of the exact rational
        assert got_spark[i] == want, (cases[i], got_spark[i], want)
        duck = con.execute(
            f"SELECT {sql_round_rat('num', 'den', dp)} AS v"
            f" FROM (SELECT CAST({n} AS BIGINT) num, CAST({d} AS BIGINT) den)"
        ).fetchone()[0]
        assert duck == want, (cases[i], duck, want)


def test_rounding_audit_detector_and_gate():
    """Meta-test for scripts/rounding_audit.py (the detector must
    catch bad code, not just pass clean code): a divided F.round is
    flagged REVIEW, a transcendental operand classes continuous, a
    round_rat conversion produces no site at all. And the real tree
    must currently gate clean (0 unreviewed)."""
    import subprocess
    import sys as _sys

    sys.path.insert(0, "scripts")
    from rounding_audit import audit_source

    bad = (
        "from pyspark.sql import functions as F\n"
        "def op(df):\n"
        "    return df.select(F.round(F.col('a') / F.col('b'), 4))\n"
    )
    found = audit_source("x.py", bad)
    assert len(found) == 1 and found[0].cls == "REVIEW"

    cont = (
        "from pyspark.sql import functions as F\n"
        "def op(df):\n"
        "    return df.select(F.round(F.pow('a', 2) / F.col('b'), 4))\n"
    )
    assert audit_source("x.py", cont)[0].cls == "continuous"

    ok = (
        "from helpers import round_rat\n"
        "def op(df):\n"
        "    return df.select(round_rat('a', 'b', 4))\n"
    )
    assert audit_source("x.py", ok) == []

    r = subprocess.run(
        [_sys.executable, "scripts/rounding_audit.py"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
