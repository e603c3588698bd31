from __future__ import annotations

import time

import duckdb
import pytest

from cdk_serverless_data_lake_sandbox_spark.catalog import ALL_TABLES
from cdk_serverless_data_lake_sandbox_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    wh = tempfile.mkdtemp(prefix="spark-wh-")
    s = get_spark(
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
    s.stop()


def await_stream_done(q, timeout: float = 600.0) -> None:
    """Wait for an ``availableNow`` streaming query to terminate and
    ASSERT that it did.

    A bare ``q.awaitTermination(n)`` returns ``False`` on timeout and
    the test then reads a partially-written sink — the load-dependent
    flake the round-2 verdict flagged in the PSI-monitor test. Polling
    in short slices (instead of one long wait) lets a failed query
    surface its exception promptly, and the final assert turns a hung
    query into a clear message rather than a downstream KeyError on
    whichever batch was missing."""
    deadline = time.monotonic() + timeout
    while q.isActive and time.monotonic() < deadline:
        q.awaitTermination(10)  # raises StreamingQueryException on failure
    if q.exception() is not None:
        raise q.exception()
    assert not q.isActive, (
        f"streaming query {q.name or q.id} still active after {timeout}s"
    )


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the driver's view registration."""
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="session")
def duck_small():
    con = make_duck(SF_SMALL)
    yield con
    con.close()
