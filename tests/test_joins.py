from __future__ import annotations

from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.operators.joins import salted_join

from tests.conftest import SF_SMALL


def test_salted_join_matches_plain_join(spark):
    t = load_tables(spark, SF_SMALL, ("orders", "customer"))
    plain = (
        t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_name")
    )
    salted = salted_join(
        t["orders"], t["customer"], "o_custkey", "c_custkey", n_salts=4
    ).select("o_orderkey", "c_name")
    assert salted.count() == plain.count() == 1500
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(spark):
    # one key carries 10k rows; salting must split it across sub-keys
    big = spark.range(10000).select(F.lit(1).alias("k"), F.col("id"))
    small = spark.createDataFrame([(1, "hot")], ["k2", "v"])
    out = salted_join(big, small, "k", "k2", n_salts=8)
    assert out.count() == 10000
    # deterministic: same result on recompute
    assert out.count() == 10000
