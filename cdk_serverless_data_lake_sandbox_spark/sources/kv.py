"""Federated key-value source — the Athena->DynamoDB connector analog.

The reference wires a Lambda-based DynamoDB connector into Athena
(``stacks/demo_stack.py:295-341``) over a table with a single string
partition key ``id`` (``stacks/demo_stack.py:396-409``). Here the
same surface is a :class:`KVStore` (put/get/scan on a string key)
whose contents federate into SQL as a broadcast DataFrame — a lookup
join that never shuffles the big side, which is exactly how a remote
KV dimension should join at 100 TB.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.registry import register


class KVStore:
    """DynamoDB-table analog: string partition key ``id`` plus a bag
    of string attributes."""

    def __init__(self) -> None:
        self._items: dict[str, dict[str, Any]] = {}

    def put_item(self, item: dict[str, Any]) -> None:
        if "id" not in item:
            raise ValueError("item requires an 'id' partition key")
        self._items[str(item["id"])] = {k: str(v) for k, v in item.items()}

    def get_item(self, key: str) -> dict[str, Any] | None:
        return self._items.get(str(key))

    def scan(self) -> list[dict[str, Any]]:
        return [self._items[k] for k in sorted(self._items)]

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Federate the store into SQL: scan -> DataFrame. The scan is
        a metadata-sized read (dimension data); downstream joins
        broadcast it."""
        items = self.scan()
        cols = sorted({c for it in items for c in it})
        schema = StructType([StructField(c, StringType()) for c in cols])
        rows = [tuple(it.get(c) for c in cols) for it in items]
        return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------- A6
_KV_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation_name
FROM customer c JOIN nation n ON CAST(n.n_nationkey AS VARCHAR) = CAST(c.c_nationkey AS VARCHAR)
"""


@register("federated_kv_lookup", oracle=_KV_ORACLE)
def federated_kv_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated-query demo: a KVStore is populated from the nation
    dim (the 'remote system of record'), then joined to customers as
    a broadcast lookup — the Spark-native shape of the reference's
    Athena-to-DynamoDB federated join."""
    t = load_tables(spark, sf_dir, ("customer", "nation"))
    store = KVStore()
    for row in t["nation"].collect():  # dim-sized scan, not data-sized
        store.put_item({"id": row.n_nationkey, "n_name": row.n_name})
    kv = store.to_df(spark)
    return (
        t["customer"]
        .join(F.broadcast(kv), F.col("c_nationkey").cast("string") == F.col("id"))
        .select("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
    )
