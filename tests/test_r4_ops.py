"""Round-4 operator tests: automatic hot-shingle guard engagement,
and the new operators landed this round."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables

from tests.conftest import SF_SMALL


# ------------------------------------------------ auto hot guard
def _saturated_corpus(spark):
    """1,200 docs sharing one leading trigram (posting size > the
    auto bound) with otherwise-unique tails, plus exact copies so the
    pair set is non-empty. This is the regime the sf1 soak proved
    OOMs the unguarded in-lambda flatten at scale."""
    rows = []
    for i in range(1200):
        tail = " ".join(f"t{i}w{j}" for j in range(8))
        rows.append((i, f"c0 c1 c2 {tail}"))
    # exact copies of the first 5 docs -> jaccard 1.0 pairs
    for j in range(5):
        rows.append((5000 + j, rows[j][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_auto_hot_guard_engages_and_is_lossless(spark):
    """On a corpus with a posting over _HOT_AUTO_BOUND the DEFAULT
    call (no hot_threshold argument) must take the guard path and
    still produce exactly the unguarded plan's pair set — auto
    engagement may never change results."""
    from cdk_serverless_data_lake_sandbox_spark.operators.dedup import (
        _HOT_AUTO_BOUND,
        _shingled,
        containment_pairs,
        ngram_jaccard_pairs,
    )

    docs = _saturated_corpus(spark)
    # precondition: the corpus really is in the hot regime
    max_posting = (
        _shingled(docs)
        .select(F.explode("sh").alias("s"))
        .groupBy("s")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_posting > _HOT_AUTO_BOUND, "test corpus lost its hot posting"

    for core in (ngram_jaccard_pairs, containment_pairs):
        auto = core(docs).collect()  # default: auto
        off = core(docs, hot_threshold=None).collect()
        cols = auto[0].asDict().keys() if auto else []
        a = {tuple(r[c] for c in cols) for r in auto}
        o = {tuple(r[c] for c in cols) for r in off}
        assert a == o and len(a) > 0, core.__name__


def test_auto_hot_guard_stays_off_on_bounded_postings(spark):
    """A Heaps-law corpus (the real testdata) resolves auto to the
    plain in-lambda plan: _resolve_hot returns None, so the physical
    plan is byte-identical to hot_threshold=None."""
    from cdk_serverless_data_lake_sandbox_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    # one scratch key -> both calls scan the same materialized
    # intermediate, so the plans are comparable as strings
    key = "r4-auto-guard-bounded"
    auto_plan = (
        ngram_jaccard_pairs(docs, scratch_key=key)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    off_plan = (
        ngram_jaccard_pairs(docs, scratch_key=key, hot_threshold=None)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    strip = lambda p: re.sub(r"#\d+", "#", p)  # expression ids differ per plan
    assert strip(auto_plan) == strip(off_plan)


# --------------------------------------- SURVEY §2 kind bookkeeping
def test_survey_kinds_match_registry():
    """The §2 checklist is the coverage contract: a row marked [Q]
    must have a registered oracle and a row marked [R] must not —
    the r3 verdict found exactly one mismatch (C42), so pin the whole
    table."""
    import os
    import re

    from cdk_serverless_data_lake_sandbox_spark.registry import (
        all_oracles,
        all_queries,
    )

    qs, ors = all_queries(), all_oracles()
    survey = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    with open(survey) as fh:
        text = fh.read()
    checked = 0
    for m in re.finditer(
        r"^\| ([A-E]\d+b?) \| `([a-z0-9_]+)`[^|]*\| ([A-Z]) \|", text, re.M
    ):
        row, name, kind = m.groups()
        if name not in qs:
            continue
        if kind == "Q":
            assert name in ors, f"{row} {name}: SURVEY says Q, registry has no oracle"
        elif kind == "R":
            assert name not in ors, f"{row} {name}: SURVEY says R, registry has an oracle"
        checked += 1
    assert checked > 120, f"only matched {checked} rows — regex drifted from SURVEY format"
