"""Simulate the driver's verify pass against the public contract:
a VANILLA SparkSession (none of our session.py tuning), entry() smoke,
then each queries()/oracle_sql() pair compared via DuckDB at sf0.01.
Usage: python scripts/driver_sim.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, ".")
from __spark_entry__ import entry, oracle_sql, queries  # noqa: E402

from cdk_serverless_data_lake_sandbox_spark.catalog import ALL_TABLES  # noqa: E402
from tests.compare import assert_frames_match  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = entry(spark).collect()
    print(f"entry(): {len(rows)} rows, schema ok")
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    qs, oracles = queries(), oracle_sql()
    names = sys.argv[1:] or sorted(qs)
    ok = bad = 0
    for name in names:
        try:
            spdf = qs[name](spark, SF).toPandas()
            if name in oracles:
                assert_frames_match(spdf, con.execute(oracles[name]).fetchdf(), name)
                print(f"  OK   {name}: {len(spdf)} rows (oracle match)")
            else:
                print(f"  ROWS {name}: {len(spdf)} rows (no oracle)")
            ok += 1
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"  FAIL {name}: {e}")
    print(f"{ok} ok, {bad} failed")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
