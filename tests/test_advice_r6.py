"""Regression tests for the round-5 ADVICE/VERDICT findings fixed in
round 6.

1. video_scene_cuts (and any other registered query) must not emit
   ARRAY/MAP/STRUCT output columns: the driver's correctness harness
   canonicalizes through a pandas sort and dies on unhashable cells
   (the r5 gate ERR).
2. cdc_envelope_apply: an envelope with an unknown/NULL op used to
   land its key in clear_keys while producing neither an upsert nor a
   delete — silent row loss. Now the batch is rejected up front.
3. dv sidecar joins match files by BASENAME, so a sidecar carrying a
   different URI normalization ("file:///p" vs "file:/p") than the
   reader emits still suppresses/compacts the deleted rows.
4. burst_detection lost its __doc__ to a stray .format() call.
5. part_skyline's quadratic broadcast verify was replaced by an exact
   linear prefix-max sweep; pin it against the brute-force NOT EXISTS
   answer on an adversarial monotone dataset where the frontier IS
   the whole table (the shape that OOMed the old broadcast by
   construction).
6. The ANN execution-strategy twins now rescore JVM-side: their
   output must be BIT-identical to ann_topk_bruteforce.
7. Winnowing gram hashes use Spark ascii(): pinned codepoint parity
   with DuckDB unicode() on non-ASCII text (Spark 4 ascii() returns
   the full codepoint — this test guards the engine-upgrade trap).
8. crawl_parquet round-trip (closes the one uncovered TSTATUS row).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from cdk_serverless_data_lake_sandbox_spark.registry import all_queries


# ------------------------------------------------------------- fix 1
def test_no_registered_query_emits_nested_output_columns(registry_frames):
    """Schema-only sweep of every registered query: the driver's
    pandas canonicalizer cannot hash list/dict cells, so nested
    output types are banned from the gate surface. Reads the
    session-shared registry build (r12: a second full-registry
    construction was 174 s of the suite wall)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, df in registry_frames.items():
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


def test_video_scene_cuts_positions_join_matches_array(spark):
    """The joined-string cut_positions must carry the same content
    the localization test pins on the array form."""
    row = {
        r.doc_id: r
        for r in all_queries()["video_scene_cuts"](spark, SF_SMALL).collect()
    }
    for r in row.values():
        parts = [p for p in r.cut_positions.split(",") if p]
        assert len(parts) == r.n_cuts
        assert all(p.isdigit() for p in parts)


# ------------------------------------------------------------- fix 2
def test_cdc_envelope_unknown_op_rejected(spark, tmp_path):
    import json

    from cdk_serverless_data_lake_sandbox_spark.operators.etl import (
        cdc_envelope_apply,
    )

    tgt = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string"
    ).write.parquet(tgt)

    def env(op, k, v, lsn):
        return json.dumps(
            {"op": op, "lsn": lsn, "before": None, "after": {"k": k, "v": v}}
        )

    bad = spark.createDataFrame(
        [(env("u", 1, "a2", 10),), (env("x", 2, "zz", 11),)], "value string"
    )
    with pytest.raises(ValueError, match="op not in"):
        cdc_envelope_apply(spark, tgt, bad, "k", "k int, v string")
    # target untouched — key 2 must still be there with its old value
    rows = {r.k: r.v for r in spark.read.parquet(tgt).collect()}
    assert rows == {1: "a", 2: "b"}


# ------------------------------------------------------------- fix 3
def _rewrite_sidecar_uri_form(spark, table_path):
    """Rewrite the _dv sidecar's file column into the OTHER URI form
    ('file:///abs' instead of the 'file:/abs' this platform emits)."""
    import glob
    import shutil

    dv_dir = os.path.join(table_path, "_dv")
    dv = spark.read.parquet(dv_dir).select(
        F.regexp_replace("file", "^file:/+", "file:///").alias("file"),
        "pos",
        F.lit(-1).alias("batch_id"),
    )
    rows = [(r.file, r.pos, r.batch_id) for r in dv.collect()]
    assert all(f.startswith("file:///") for f, _, _ in rows)
    for d in glob.glob(os.path.join(dv_dir, "*")):
        shutil.rmtree(d) if os.path.isdir(d) else os.remove(d)
    spark.createDataFrame(rows, "file string, pos long, batch_id int").write.mode(
        "overwrite"
    ).partitionBy("batch_id").parquet(dv_dir)


def test_dv_read_and_compact_survive_foreign_uri_sidecar(spark, tmp_path):
    from cdk_serverless_data_lake_sandbox_spark.operators.etl import (
        dv_compact,
        dv_delete,
        dv_read,
    )

    tbl = str(tmp_path / "t")
    spark.range(0, 100).withColumn("grp", F.col("id") % 4).repartition(
        4
    ).write.parquet(tbl)
    stats = dv_delete(spark, tbl, "id % 10 = 3")
    assert stats["rows_deleted"] == 10
    _rewrite_sidecar_uri_form(spark, tbl)
    # merge-on-read still suppresses the deleted rows
    assert dv_read(spark, tbl).count() == 90
    # a re-delete of the same predicate stays idempotent across forms
    again = dv_delete(spark, tbl, "id % 10 = 3")
    assert again["rows_deleted"] == 0
    # compaction folds them in instead of silently keeping dirty files
    cstats = dv_compact(spark, tbl)
    assert cstats["rows_dropped"] == 10
    plain = spark.read.parquet(tbl)
    assert plain.count() == 90
    assert plain.where("id % 10 = 3").count() == 0
    # no duplicated rows from a kept-and-rewritten file
    assert plain.select("id").distinct().count() == 90


# ------------------------------------------------------------- fix 4
def test_burst_detection_docstring_present():
    from cdk_serverless_data_lake_sandbox_spark.operators.stats import (
        burst_detection,
    )

    assert burst_detection.__doc__ and "Kleinberg" in burst_detection.__doc__


# ------------------------------------------------------------- fix 5
def test_part_skyline_exact_on_monotone_frontier(spark, tmp_path):
    """size strictly grows with price -> NOTHING is dominated, the
    frontier is the whole table (the old broadcast-verify worst
    case). Plus dominated rows mixed in, plus (price, size) ties that
    must BOTH survive."""
    from cdk_serverless_data_lake_sandbox_spark.operators.analytics import (
        part_skyline,
    )

    rows = []
    # monotone frontier: price i*10, size i
    for i in range(1, 201):
        rows.append((i, float(i * 10), i))
    # dominated rows: same price as frontier row i but smaller size
    for i in range(1, 101):
        rows.append((1000 + i, float(i * 10), max(0, i - 5)))
    # exact (price, size) tie with frontier row 50 — both survive
    rows.append((2001, 500.0, 50))
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "p_partkey long, p_retailprice double, p_size int"
    ).write.parquet(os.path.join(sf, "part.parquet"))

    got = {
        (r.part_key, r.retail_price, r.size)
        for r in part_skyline(spark, sf).collect()
    }
    # brute-force NOT EXISTS reference
    want = set()
    for pk, pr, sz in rows:
        dominated = any(
            (qr <= pr and qs >= sz and (qr < pr or qs > sz))
            for _, qr, qs in rows
        )
        if not dominated:
            want.add((pk, pr, sz))
    assert got == want
    assert (2001, 500.0, 50) in got and (50, 500.0, 50) in got
    assert len(got) == 201  # 200 frontier + the tie twin


# ------------------------------------------------------------- fix 6
@pytest.mark.parametrize("twin", ["ann_topk_vectorized", "ann_topk_arrow"])
def test_ann_twins_bit_identical_to_bruteforce(spark, twin):
    qs = all_queries()
    base = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in qs["ann_topk_bruteforce"](spark, SF_SMALL).collect()
    }
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in qs[twin](spark, SF_SMALL).collect()
    }
    assert got == base  # exact doubles, not recall


# ------------------------------------------------------------- fix 7
def test_winnowing_codepoint_parity_nonascii(spark):
    """Spark ascii() must agree with DuckDB unicode() per position on
    non-ASCII text (codepoints, not first UTF-8 bytes) — the gram
    hash depends on it. Guards the Spark-upgrade trap: pre-4.0
    ascii() returned the first byte."""
    import duckdb

    s = "naïve 中文 😀 résumé ß"
    spark_cs = spark.createDataFrame([(s,)], "text string").select(
        F.expr(
            "transform(sequence(1, length(text)),"
            " i -> CAST(ascii(substring(text, i, 1)) AS BIGINT))"
        ).alias("cs")
    ).collect()[0].cs
    duck_cs = duckdb.connect().execute(
        "SELECT list_transform(generate_series(1, LENGTH(?)),"
        " i -> CAST(unicode(SUBSTR(?, i, 1)) AS BIGINT))",
        [s, s],
    ).fetchone()[0]
    assert spark_cs == duck_cs == [ord(c) for c in s]


# ------------------------------------------------------------- fix 8
def test_crawl_parquet_roundtrip(spark, tmp_path):
    from cdk_serverless_data_lake_sandbox_spark.sources.crawler import (
        crawl_parquet,
    )

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, s string, x double"
    ).write.parquet(p)
    back = crawl_parquet(spark, p)
    assert back.count() == 2
    assert dict(back.dtypes) == {"id": "bigint", "s": "string", "x": "double"}


# --------------------------------------------- delta-iteration (r6)
def _sym_edges(spark, und):
    from collections import Counter

    rows = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    deg = Counter(x for x, _ in rows)
    return spark.createDataFrame(
        [(a, b, deg[a]) for a, b in rows], "src long, dst long, src_deg long"
    )


def test_coreness_delta_path_long_pendant_chain(spark):
    """K4 with a 30-node pendant chain: the 1-coreness wave peels in
    from the leaf ~one node per round, so the changed frontier is
    tiny for nearly every round — the delta path (recompute only
    affected neighborhoods) runs for most of the iteration. The Spark
    result must equal a pure-Python FULL-recompute H-index simulation
    with the same round budget, node for node (the chain is longer
    than _CORE_ROUNDS on purpose: per-round equality must hold even
    under round-budget truncation, which is exactly where a delta
    bookkeeping bug would show)."""
    from collections import defaultdict

    from cdk_serverless_data_lake_sandbox_spark.operators.graph import (
        _CORE_ROUNDS,
        coreness_frame,
    )
    from tests.conftest import FULL_TIER

    # default tier: fewer rounds, shorter chain — SAME truncation
    # property (chain longer than the round budget) at a third of the
    # per-round Spark cost; the full tier keeps the production budget
    rounds = _CORE_ROUNDS if FULL_TIER else 8
    und = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]  # K4
    chain = [100 + i for i in range(rounds + 6)]
    und += [(4, chain[0])] + list(zip(chain, chain[1:]))

    adj = defaultdict(list)
    for a, b in und:
        adj[a].append(b)
        adj[b].append(a)
    c = {v: len(adj[v]) for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v in adj:
            cs = sorted((c[u] for u in adj[v]), reverse=True)
            h = max((min(x, j + 1) for j, x in enumerate(cs)), default=0)
            nxt[v] = min(c[v], h)
        if nxt == c:
            break
        c = nxt

    got = {
        r.node: r.c
        for r in coreness_frame(
            _sym_edges(spark, und), max_rounds=rounds
        ).collect()
    }
    assert got == c
    # sanity: the wave did convert the leaf-side half of the chain
    assert got[chain[-1]] == 1 and got[1] == 3


def test_lpa_delta_matches_python_synchronous_reference(spark):
    """Two cliques joined by a long bridge: labels stabilize inside
    the cliques after round 1 (tiny frontier -> delta path), and the
    Spark result must equal a pure-Python synchronous LPA with the
    same (count desc, label asc) tie rule, round for round."""
    from collections import Counter, defaultdict

    from cdk_serverless_data_lake_sandbox_spark.operators.graph import (
        _LPA_ROUNDS,
        lpa_labels,
    )

    c1 = [(a, b) for a in range(1, 7) for b in range(a + 1, 7)]
    c2 = [(a, b) for a in range(20, 26) for b in range(a + 1, 26)]
    bridge = [(6, 40), (40, 41), (41, 42), (42, 20)]
    und = c1 + c2 + bridge
    adj = defaultdict(list)
    for a, b in und:
        adj[a].append(b)
        adj[b].append(a)
    lbl = {v: v for v in adj}
    for _ in range(_LPA_ROUNDS):
        nxt = {}
        any_change = False
        for v in adj:
            votes = Counter(lbl[u] for u in adj[v])
            best = min(votes, key=lambda l: (-votes[l], l))
            nxt[v] = best
            any_change |= best != lbl[v]
        lbl = nxt
        if not any_change:
            break
    got = {r.node: r.lbl for r in lpa_labels(_sym_edges(spark, und)).collect()}
    assert got == lbl
