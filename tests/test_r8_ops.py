"""Property tests for the round-8 operators (their hash-exact DuckDB
oracles run in driver_sim; these pin the SEMANTIC contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# ------------------------------------------------------ C122
def test_cluster_balanced_sample_quota_and_prototypicality(spark):
    from cdk_serverless_data_lake_sandbox_spark.operators.similarity import (
        _BAL_QUOTA,
        _KMEANS_ITERS,
        _KMEANS_K,
        cluster_balanced_sample,
        kmeans_assign,
        _emb,
    )

    out = cluster_balanced_sample(spark, SF_SMALL)
    rows = out.collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)

    # every non-empty cluster contributes, never over quota, ranks
    # contiguous from 1
    for cid, members in by_cluster.items():
        assert 1 <= len(members) <= _BAL_QUOTA
        assert sorted(m.sample_rank for m in members) == list(
            range(1, len(members) + 1)
        )

    # selected members are the (d2, vec_id)-minimal ones per cluster —
    # prototypical, not arbitrary
    full = kmeans_assign(
        _emb(spark, SF_SMALL).select("vec_id", "embedding"),
        _KMEANS_K,
        _KMEANS_ITERS,
    ).collect()
    for cid, members in by_cluster.items():
        all_keys = sorted(
            (r.d2, r.vec_id) for r in full if r.cluster == cid
        )
        got_keys = sorted((m.d2, m.vec_id) for m in members)
        assert got_keys == all_keys[: len(members)]

    # deterministic: a second run returns identical rows
    again = cluster_balanced_sample(spark, SF_SMALL).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


# ------------------------------------------------------ C123
def _grams(words: list[str], n: int = 5) -> set[str]:
    if len(words) <= n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def test_decontaminate_strip_contract(spark):
    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
    from cdk_serverless_data_lake_sandbox_spark.operators.curation import (
        decontaminate_strip,
    )

    docs = {
        r.doc_id: r.text
        for r in load_tables(spark, SF_SMALL, ("documents",))["documents"]
        .select("doc_id", "text")
        .collect()
    }
    bench_grams: set[str] = set()
    for did, text in docs.items():
        if did % 20 == 0:
            bench_grams |= _grams(text.split(" "))

    out = {r.doc_id: r for r in decontaminate_strip(spark, SF_SMALL).collect()}
    # corpus docs only
    assert all(did % 20 != 0 for did in out)
    assert len(out) == sum(1 for d in docs if d % 20 != 0)

    n_changed = 0
    for did, r in out.items():
        words = docs[did].split(" ")
        assert r.n_tokens == len(words)
        kept = r.clean_text.split(" ") if r.clean_text else []
        assert r.n_removed == len(words) - len(kept)
        if r.n_removed == 0:
            # uncontaminated docs pass through byte-identical
            assert r.clean_text == docs[did]
        else:
            n_changed += 1
            # reference re-implementation: strip positions covered by
            # any flagged 5-gram window
            flagged = [
                i
                for i in range(max(len(words) - 4, 1))
                if " ".join(words[i : i + 5]) in bench_grams
            ]
            covered = {
                p for i in flagged for p in range(i, min(i + 5, len(words)))
            }
            expect = [w for p, w in enumerate(words) if p not in covered]
            assert kept == expect, did
    assert n_changed > 0  # the planted 5% bench split does overlap


def test_decontaminate_agrees_with_contamination_check(spark):
    """Docs the C37 scan flags are exactly the docs C123 strips
    something from — detection and removal share one definition."""
    from cdk_serverless_data_lake_sandbox_spark.operators.curation import (
        contamination_check,
        decontaminate_strip,
    )

    n_contaminated = contamination_check(spark, SF_SMALL).collect()[0][
        "n_contaminated"
    ]
    stripped = (
        decontaminate_strip(spark, SF_SMALL)
        .where(F.col("n_removed") > 0)
        .count()
    )
    assert stripped == n_contaminated


# ------------------------------------------------------ C124
def test_boilerplate_prefix_strip_planted(spark):
    from cdk_serverless_data_lake_sandbox_spark.operators.curation import (
        boilerplate_prefix_strip_frame,
    )

    header = "terms of use apply"
    rows = [
        (1, "srcA", f"{header} alpha beta gamma"),
        (2, "srcA", f"{header} delta epsilon"),
        (3, "srcA", "unique opening words here and more"),
        # same header in a DIFFERENT source, alone -> not boilerplate
        (4, "srcB", f"{header} zeta eta"),
        # short doc: header only -> stripped to empty
        (5, "srcA", header),
        (6, "srcA", f"{header} theta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in boilerplate_prefix_strip_frame(docs).collect()}

    assert [out[i].boilerplate for i in (1, 2, 3, 4, 5, 6)] == [
        True, True, False, False, True, True,
    ]
    assert out[1].clean_text == "alpha beta gamma"
    assert out[2].clean_text == "delta epsilon"
    assert out[3].clean_text == rows[2][2]  # untouched
    assert out[4].clean_text == rows[3][2]  # cross-source, untouched
    assert out[5].clean_text == "" and out[5].n_removed == 4
    assert out[6].clean_text == "theta"
    assert all(
        out[i].n_tokens - out[i].n_removed
        == (len(out[i].clean_text.split(" ")) if out[i].clean_text else 0)
        for i in out
    )
