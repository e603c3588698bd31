"""Federated relational source — the Aurora-serverless analog.

The reference stands up an Aurora MySQL cluster next to the lake for
federated relational queries (``stacks/demo_stack.py:372-394``,
``with_aurora``). Here the same surface is a :class:`RelationalStore`
backed by an in-process SQL engine (DuckDB) playing the remote
database, read through :func:`partitioned_read`, which implements the
exact contract of Spark's JDBC source:

- ``partitionColumn`` / ``lowerBound`` / ``upperBound`` /
  ``numPartitions`` stride generation, including Spark's rule that the
  first stride is unbounded below (plus IS NULL) and the last is
  unbounded above, so no remote row is ever silently dropped;
- per-partition queries executed IN THE EXECUTORS (each task opens its
  own read-only connection and fetches only its stride — the driver
  never materializes the table);
- predicate and column pruning pushed into the remote SQL text.

Swapping DuckDB for a real JDBC URL turns this into
``spark.read.jdbc(url, table, column, lower, upper, n)`` — the plan
shape, parallelism, and pushdown semantics are identical; the facade
exists so the federation contract is testable without a network
database in the container.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.operators._helpers import _SCRATCH_ROOT
from cdk_serverless_data_lake_sandbox_spark.registry import register


class RelationalStore:
    """The 'remote' relational database: a DuckDB file on shared
    storage. ``load_table`` is the operational system writing its
    data; everything Spark-side goes through :func:`partitioned_read`.
    """

    def __init__(self, path: str) -> None:
        self.path = path
        self.last_queries: list[str] = []
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def _connect(self, read_only: bool = False):
        import duckdb

        return duckdb.connect(self.path, read_only=read_only)

    def load_table_from_parquet(self, name: str, parquet_path: str) -> None:
        # accept every lake layout: a single parquet FILE (the bench
        # testdata shape), a flat Spark-written DIRECTORY of part
        # files, and a partitionBy() tree (explicit file list +
        # hive_partitioning so partition columns come back as columns).
        # The file list is walked in Python, NOT a bare '**/*.parquet'
        # glob (r8 advice): DuckDB's glob — unlike Spark readers —
        # does not skip underscore/dot sidecars (_dv deletion vectors,
        # _SUCCESS, .crc), and pointed at a versioned lake table root
        # it would union EVERY v=N snapshot with a spurious v column.
        # Versioned layouts resolve to the newest snapshot instead.
        con = self._connect()
        try:
            con.execute(f"DROP TABLE IF EXISTS {name}")
            if os.path.isdir(parquet_path):
                import re

                parquet_path = _resolve_latest_version(parquet_path)
                files = _visible_parquet_files(parquet_path)
                if not files:
                    raise FileNotFoundError(
                        f"no parquet data files under {parquet_path}"
                    )
                # DuckDB's hive_partitioning reads key=value segments
                # from the WHOLE path — a v=N segment in the base path
                # (a resolved snapshot, or a caller pointing straight
                # at one) would surface as a spurious v column
                sel = "*"
                if any(
                    re.fullmatch(r"v=\d+", seg)
                    for seg in parquet_path.split(os.sep)
                ):
                    sel = "* EXCLUDE (v)"
                file_list = ", ".join(f"'{f}'" for f in files)
                con.execute(
                    f"CREATE TABLE {name} AS SELECT {sel} FROM read_parquet("
                    f"[{file_list}], hive_partitioning=true)"
                )
            else:
                con.execute(
                    f"CREATE TABLE {name} AS "
                    f"SELECT * FROM read_parquet('{parquet_path}')"
                )
        finally:
            con.close()

    def load_table(self, name: str, pdf: pd.DataFrame) -> None:
        con = self._connect()
        try:
            con.execute(f"DROP TABLE IF EXISTS {name}")
            con.register("_pdf", pdf)
            con.execute(f"CREATE TABLE {name} AS SELECT * FROM _pdf")
        finally:
            con.close()


def _resolve_latest_version(root: str) -> str:
    """A lake table root whose children are ``v=N`` snapshot dirs
    (:meth:`Lake.write_version` layout) means the caller pointed at the
    TABLE, not a snapshot — loading all of them would union every
    version. Resolve to the newest snapshot; non-versioned layouts pass
    through unchanged."""
    import re

    versions = []
    for entry in os.listdir(root):
        m = re.fullmatch(r"v=(\d+)", entry)
        if m and os.path.isdir(os.path.join(root, entry)):
            versions.append(int(m.group(1)))
    if versions:
        return os.path.join(root, f"v={max(versions)}")
    return root


def _visible_parquet_files(root: str) -> list[str]:
    """Every ``*.parquet`` under ``root``, skipping any path component
    that starts with ``_`` or ``.`` — the Spark reader convention
    (deletion vectors, _SUCCESS markers, audit dirs) that DuckDB's own
    glob does not honor."""
    files: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [
            d for d in dirnames if not d.startswith(("_", "."))
        ]
        files.extend(
            os.path.join(dirpath, fn)
            for fn in filenames
            if fn.endswith(".parquet") and not fn.startswith(("_", "."))
        )
    return sorted(files)


def _stride_clauses(
    column: str, lower: int, upper: int, num_partitions: int
) -> list[str]:
    """Spark JDBCRelation.columnPartition semantics: numPartitions
    ranges over [lower, upper) strides; the FIRST clause is unbounded
    below and catches NULLs, the LAST is unbounded above — values
    outside the caller's bounds still load, just into the edge
    partitions."""
    if num_partitions <= 1 or lower >= upper:
        return ["1=1"]
    stride = max((upper - lower) // num_partitions, 1)
    clauses = []
    bound = lower
    for i in range(num_partitions):
        lo, bound = bound, bound + stride
        if i == 0:
            clauses.append(f"{column} < {bound} OR {column} IS NULL")
        elif i == num_partitions - 1:
            clauses.append(f"{column} >= {lo}")
        else:
            clauses.append(f"{column} >= {lo} AND {column} < {bound}")
    return clauses


def partitioned_read(
    spark: SparkSession,
    store: RelationalStore,
    table: str,
    partition_column: str | None = None,
    lower_bound: int = 0,
    upper_bound: int = 0,
    num_partitions: int = 1,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Parallel federated read with pushdown. Each Spark task runs ONE
    stride query against the remote store; the driver only plans the
    query texts and infers the schema from a LIMIT 0 probe."""
    proj = ", ".join(columns) if columns else "*"
    base = f"SELECT {proj} FROM {table}"
    where_extra = f" AND ({predicate})" if predicate else ""
    if partition_column is None:
        clauses = ["1=1"]
    else:
        clauses = _stride_clauses(
            partition_column, lower_bound, upper_bound, num_partitions
        )
    queries = [f"{base} WHERE ({c}){where_extra}" for c in clauses]
    store.last_queries = queries

    # Schema from a zero-row remote probe, via Arrow -> Spark types.
    import duckdb
    from pyspark.sql.pandas.types import from_arrow_schema

    con = duckdb.connect(store.path, read_only=True)
    try:
        arrow_schema = con.execute(f"{base} LIMIT 0").arrow().schema
    finally:
        con.close()
    schema = from_arrow_schema(arrow_schema)

    db_path = store.path
    plan = spark.createDataFrame(
        [(i, q) for i, q in enumerate(queries)], "pid int, sql string"
    ).repartition(len(queries), "pid")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import duckdb as _duckdb

        for pdf in batches:
            for sql in pdf["sql"]:
                con = _duckdb.connect(db_path, read_only=True)
                try:
                    yield con.execute(sql).fetchdf()
                finally:
                    con.close()

    return plan.mapInPandas(fetch, schema)


# ---------------------------------------------------------------- A6b
_JDBC_ORACLE = """
SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name,
  COUNT(*) AS n_lineitems,
  CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))), 2)
      AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY s.s_suppkey, s.s_name, nation_name
"""


@register("federated_jdbc_lookup", oracle=_JDBC_ORACLE)
def federated_jdbc_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated relational demo, the Aurora leg of the reference: the
    supplier and nation dimensions live in the 'remote' relational
    store, are read with a partitioned JDBC-contract scan (4 strides
    on s_suppkey), and broadcast-join to the local lineitem fact —
    the remote system is only ever asked dimension-sized queries."""
    app = spark.sparkContext.applicationId
    store = RelationalStore(
        os.path.join(_SCRATCH_ROOT, app, f"aurora-{os.path.basename(sf_dir)}.duckdb")
    )
    store.load_table_from_parquet("supplier", f"{sf_dir}/supplier.parquet")
    store.load_table_from_parquet("nation", f"{sf_dir}/nation.parquet")
    n_sup = 4
    hi = partitioned_read(spark, store, "supplier", columns=["max(s_suppkey) AS m"])
    upper = hi.first()["m"]
    sup = partitioned_read(
        spark,
        store,
        "supplier",
        partition_column="s_suppkey",
        lower_bound=0,
        upper_bound=int(upper) + 1,
        num_partitions=n_sup,
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    nat = partitioned_read(
        spark, store, "nation", columns=["n_nationkey", "n_name"]
    )
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    from cdk_serverless_data_lake_sandbox_spark.operators._helpers import money

    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_suppkey", "s_name", F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_lineitems"),
            money(F.sum(rev.cast("decimal(18,4)"))).alias("revenue"),
        )
    )
