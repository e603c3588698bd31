"""Cross-SF oracle parity: verify named queries hash-exact at SFs the
driver gate never runs (it uses sf0.01 only) — the r4 discipline for
newly added oracle-backed operators, re-runnable per round.

Usage: python scripts/xsf_check.py SF_DIR [name ...]
"""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")

from cdk_serverless_data_lake_sandbox_spark.catalog import ALL_TABLES  # noqa: E402
from cdk_serverless_data_lake_sandbox_spark.registry import (  # noqa: E402
    all_oracles,
    all_queries,
)
from tests.compare import assert_frames_match  # noqa: E402

# Default sweep: the operators whose ORACLES or hot paths changed most
# recently (r7: the portable-hash LSH oracle flips, the ANN rescore
# broadcast fix, and the materializer-routed iteratives), so a bare
# `python scripts/xsf_check.py SF_DIR` re-proves the current round.
DEFAULT_SWEEP = [
    # r8: the new Q ops and the R->Q oracle flip
    "ann_recall_report",
    "cluster_balanced_sample",
    "decontaminate_strip",
    "boilerplate_prefix_strip",
    "vocab_coverage_curve",
    # r7 carry-over: portable-hash LSH + rescore-fix family
    "dedup_minhash_lsh",
    "ann_lsh_multiprobe",
    "ann_topk_arrow",
    # iteratives last: minutes-scale at sf0.1; they route through the
    # pluggable materializer (pin()) — re-prove at a non-gate SF
    "copurchase_pagerank",
    "copurchase_kcore",
]


def main() -> None:
    sf = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_SWEEP
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, ors = all_queries(), all_oracles()
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    failed = 0
    for name in names:
        try:
            spdf = qs[name](spark, sf).toPandas()
            odf = con.execute(ors[name]).fetchdf()
            assert_frames_match(spdf, odf, name)
            print(f"  OK   {name}: {len(spdf)} rows", flush=True)
        except Exception as e:  # noqa: BLE001
            failed += 1
            print(f"  FAIL {name}: {str(e)[:300]}", flush=True)
    print(f"{len(names) - failed} ok, {failed} failed at {sf}", flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
