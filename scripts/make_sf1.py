"""Synthesize an sf1-scale dataset (10x sf0.1) under /tmp for scale
soaks: every table is 10 shifted copies of sf0.1.

Key handling: all id-like columns shift by COPY * 10_000_000, applied
consistently on both sides of every foreign key, so each copy is a
self-consistent TPC-H universe and joins stay 1:1 with the original.

Text handling: copy 0 keeps original text; copies > 0 scramble each
document's words by sorting on xxhash64(word, copy) — deterministic,
preserves WITHIN-copy duplicate structure (identical docs scramble
identically) while destroying cross-copy shingle overlap, so dedup
workloads grow linearly instead of gaining 10 artificial near-dup
siblings per document.

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/sfx10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables  # noqa: E402
from cdk_serverless_data_lake_sandbox_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SOAK_SRC", "/root/testdata/sf0.1")
SHIFT = 10_000_000
# copies of the source tier (env-overridable: SOAK_COPIES=30 builds a
# 3x-of-sf1 tier for the r9 two-size scaling soak)
N_COPIES = int(os.environ.get("SOAK_COPIES", "10"))

# id-like columns to shift per table (both sides of every FK)
ID_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_SCRAMBLE = (
    "array_join(transform(array_sort(transform(split(text, ' '),"
    " w -> struct(xxhash64(w, {copy}) AS h, w AS w))), s -> s.w), ' ')"
)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="make_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, SRC, tuple(ID_COLS))
    for name, df in tables.items():
        copies = []
        for i in range(N_COPIES):
            c = df
            for col in ID_COLS[name]:
                if col == "l_linenumber":
                    continue  # line numbers are per-order, not global
                c = c.withColumn(col, F.col(col) + F.lit(i * SHIFT))
            if name == "documents":
                c = c.withColumn(
                    "text",
                    F.when(
                        F.lit(i) == 0, F.col("text")
                    ).otherwise(F.expr(_SCRAMBLE.format(copy=i))),
                )
            copies.append(c)
        full = copies[0]
        for c in copies[1:]:
            full = full.unionByName(c)
        path = os.path.join(out, f"{name}.parquet")
        full.repartition(32).write.mode("overwrite").parquet(path)
        print(f"{name}: {full.count()} rows -> {path}")


if __name__ == "__main__":
    main()
