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


def test_aqe_splits_skewed_join(spark):
    """AQE must detect the hot key at runtime and split its partition
    (SortMergeJoin(skew=true) + AQEShuffleRead skewed in the executed
    plan) — the mechanism we rely on instead of manual salting for
    unknown skew at 100 TB. Thresholds are lowered so local data
    exhibits 'skew'; the mechanics are identical at scale."""
    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # this test pins AQE skew mechanics at a fixed partition count:
        # at the quick tier's 4 partitions the skew split does not
        # engage on this synthetic layout (observed empirically), and
        # the POINT here is the mechanism, not the tier default
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(0, 20000)
            .select((F.col("id") % 500).alias("k"), F.rand(7).alias("v"))
            .union(
                spark.range(0, 100000).select(F.lit(0).alias("k"), F.rand(8).alias("v"))
            )
        )
        right = spark.range(0, 500).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = left.join(right, "k").groupBy().count()
        assert j.collect()[0][0] == 120000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_auto_salted_join_equals_plain_and_salts_only_hot(spark):
    """Auto detection: the planted hot key (60% of rows) takes the
    salted path, cold keys join plain, and the union equals the plain
    join row-for-row."""
    from cdk_serverless_data_lake_sandbox_spark.operators.joins import (
        auto_salted_join,
    )

    big = spark.range(20000).select(
        F.when(F.col("id") % 10 < 6, F.lit(7)).otherwise(F.col("id") % 500).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(500).select(
        F.col("id").alias("k2"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    plain = big.join(small, big["k"] == small["k2"]).select("payload", "v")
    auto = auto_salted_join(
        big, small, "k", "k2", n_salts=4,
        hot_threshold=5000, sample_frac=0.05,
    ).select("payload", "v")
    assert auto.count() == plain.count()
    assert auto.exceptAll(plain).count() == 0
    assert plain.exceptAll(auto).count() == 0


def test_auto_salted_join_no_hot_falls_through(spark):
    """Uniform keys: detection finds nothing hot and the call IS the
    plain join (no salted branch in the plan)."""
    from cdk_serverless_data_lake_sandbox_spark.operators.joins import (
        auto_salted_join,
    )

    big = spark.range(5000).select((F.col("id") % 500).alias("k"), "id")
    small = spark.range(500).select(F.col("id").alias("k2"), F.lit("x").alias("v"))
    out = auto_salted_join(big, small, "k", "k2", hot_threshold=100_000)
    assert "_salt" not in out.columns
    assert out.count() == 5000
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan


def test_auto_salted_left_join_keeps_null_and_unmatched(spark):
    from cdk_serverless_data_lake_sandbox_spark.operators.joins import (
        auto_salted_join,
    )

    rows = [(7, i) for i in range(3000)] + [(None, -1), (999, -2)]
    big = spark.createDataFrame(rows, "k int, payload long")
    small = spark.createDataFrame([(7, "hot"), (1, "cold")], "k2 int, v string")
    out = auto_salted_join(
        big, small, "k", "k2", how="left",
        hot_threshold=1000, sample_frac=0.5,
    )
    assert out.count() == 3002
    nulls = out.where(F.col("payload") < 0).collect()
    assert {r.payload: r.v for r in nulls} == {-1: None, -2: None}
