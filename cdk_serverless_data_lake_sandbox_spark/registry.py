"""Query registry backing the driver contract (``__spark_entry__``).

Every operator registers a ``(spark, sf_dir) -> DataFrame`` callable
and, when SQL-expressible, a DuckDB-runnable oracle SQL string. Column
names are aliased identically on both sides — the driver sorts columns
by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_modules()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_modules()
    return dict(_ORACLES)


def _load_modules() -> None:
    # Import for registration side effects.
    from cdk_serverless_data_lake_sandbox_spark.operators import (  # noqa: F401
        analytics,
        core,
        dedup,
        etl,
        events,
        multimodal,
        pipeline,
        similarity,
        stats,
        text,
        tpch_extra,
    )
    from cdk_serverless_data_lake_sandbox_spark.sources import kv  # noqa: F401
