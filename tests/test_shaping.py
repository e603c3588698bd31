"""Semantic tests for the dataset-shaping operators (C45-C49):
invariants a packing/chunking/span-dedup pass must hold regardless of
data, checked on the real testdata (the oracle-parity gate already
covers value equality vs DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

from tests.conftest import SF_MEDIUM

_Q = all_queries()


def test_sequence_packing_conserves_tokens(spark):
    packed = _Q["sequence_packing"](spark, SF_MEDIUM).collect()
    docs = load_tables(spark, SF_MEDIUM, ("documents",))["documents"]
    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("t")
    ).collect()[0].t
    total_docs = docs.count()
    assert sum(r.seq_tokens for r in packed) == total_tokens
    assert sum(r.n_docs for r in packed) == total_docs
    # Within a shard, seq_ids are dense from 0: concat-and-split can't
    # skip a sequence (every token offset is covered).
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r.seq_id)
    for shard, ids in by_shard.items():
        ids = sorted(ids)
        assert ids[0] == 0, f"shard {shard} misses seq 0"
        assert ids == list(range(len(ids))), f"shard {shard} has a gap"


def test_doc_chunking_covers_every_token(spark):
    chunks = _Q["doc_chunking"](spark, SF_MEDIUM)
    docs = load_tables(spark, SF_MEDIUM, ("documents",))["documents"]
    words = docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n")
    )
    got = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_start") + F.col("n_chunk_tokens")).alias("covered"),
            F.count("*").alias("n_chunks"),
            F.min("chunk_start").alias("first_start"),
        )
        .join(words, "doc_id")
        .collect()
    )
    assert got
    for r in got:
        assert r.first_start == 0
        assert r.covered == r.n, f"doc {r.doc_id}: covered {r.covered} of {r.n}"
        # stride 24: chunk count is exactly ceil(n / 24)
        assert r.n_chunks == -(-r.n // 24)


def test_dup_span_fraction_flags_planted_clones(spark, tmp_path):
    # Exact clones must report dup_fraction 1.0; a unique-vocabulary
    # doc must report 0.0.
    rows = [
        (1, " ".join(f"w{i}" for i in range(20))),
        (2, " ".join(f"w{i}" for i in range(20))),  # clone of 1
        (3, " ".join(f"u{i}" for i in range(20))),  # unique vocab
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.select(
        "doc_id", "text", F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.length("text").alias("n_chars"),
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path + ".dir")
    # load_tables expects <dir>/documents.parquet; write a single file tree
    import glob
    import shutil

    part = glob.glob(path + ".dir/part-*.parquet")[0]
    shutil.copy(part, path)
    out = {
        r.doc_id: r
        for r in _Q["dup_span_fraction"](spark, str(tmp_path)).collect()
    }
    assert out[1].dup_fraction == 1.0 and out[2].dup_fraction == 1.0
    assert out[3].dup_fraction == 0.0
    assert out[1].n_spans == 13  # 20 words -> 13 8-gram positions


def test_token_budget_allocation_sums_to_budget(spark):
    rows = _Q["token_budget_allocation"](spark, SF_MEDIUM).collect()
    assert rows
    # Weights normalize; allocations hit the budget up to floor loss.
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
    total_alloc = sum(r.allocated_tokens for r in rows)
    assert 1_000_000 - len(rows) <= total_alloc <= 1_000_000
    for r in rows:
        assert r.oversampled == (r.epochs > 1.0)


def test_embedding_quantization_error_bounded_by_scale(spark):
    # Round-half-up int8 error is at most scale/2 = max|v|/254 per dim.
    emb = load_tables(spark, SF_MEDIUM, ("embeddings",))["embeddings"]
    max_abs = emb.select(
        F.max(F.expr("array_max(transform(embedding, v -> abs(cast(v as double))))"))
    ).collect()[0][0]
    bound = max_abs / 254.0 + 1e-12
    for r in _Q["embedding_quantization"](spark, SF_MEDIUM).collect():
        assert 0.0 <= r.mean_abs_err <= r.max_abs_err <= bound
        assert r.n_vectors > 0


def test_shaping_ops_survive_empty_corpus(spark, tmp_path):
    """An empty documents table must produce empty (or single
    null-aggregate) results — never a crash. Guards the where(size>=k)
    prefilters and the empty-frame round-trip through materialize()."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "d.dir"))
    part = glob.glob(str(tmp_path / "d.dir") + "/part-*.parquet")[0]
    shutil.copy(part, str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)
    for name in (
        "sequence_packing",
        "doc_chunking",
        "dup_span_fraction",
        "token_budget_allocation",
        "tokenizer_fertility",
        "ngram_novelty",
        "dup_cluster_sizes",
    ):
        rows = _Q[name](spark, sf).collect()
        assert rows == [], f"{name}: expected empty, got {rows}"
    # global-aggregate op returns its single row with null fit
    (heaps,) = _Q["heaps_law_fit"](spark, sf).collect()
    assert heaps.n_buckets == 0


def test_export_jsonl_writes_manifest_exact_bytes(spark, tmp_path):
    """The materialized JSONL shards must carry exactly the bytes the
    export_jsonl_shards manifest planned: per-(writer,file_idx) byte
    totals match, every doc round-trips as parseable JSON, and no
    file exceeds the budget except by its final single line."""
    import json
    import os

    from cdk_serverless_data_lake_sandbox_spark.operators.shaping import (
        _JSONL_BUDGET,
        export_jsonl,
    )

    out = str(tmp_path / "jsonl")
    totals = export_jsonl(spark, SF_MEDIUM, out)
    manifest = {
        (r.writer, r.file_idx): (r.n_docs, r.file_bytes)
        for r in _Q["export_jsonl_shards"](spark, SF_MEDIUM).collect()
    }
    docs = load_tables(spark, SF_MEDIUM, ("documents",))["documents"]
    n_docs = docs.count()
    assert totals["docs"] == n_docs
    assert totals["files"] == len(manifest)

    seen_ids = []
    for (writer, file_idx), (nd, fb) in manifest.items():
        d = os.path.join(out, f"writer={writer}", f"file_idx={file_idx}")
        lines = []
        for fn in os.listdir(d):
            if fn.endswith(".txt"):
                with open(os.path.join(d, fn), "rb") as fh:
                    lines += fh.read().splitlines(keepends=True)
        assert len(lines) == nd, (writer, file_idx)
        assert sum(len(ln) for ln in lines) == fb, (writer, file_idx)
        # budget holds up to the final line's overflow
        assert fb - len(lines[-1]) < _JSONL_BUDGET
        for ln in lines:
            rec = json.loads(ln)
            seen_ids.append(rec["doc_id"])
            assert rec["doc_id"] % 8 == writer
    assert sorted(seen_ids) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )


def test_quality_classifier_is_shuffle_free(spark):
    """The classifier serving pass is one projection: no Exchange may
    appear in its physical plan (scan speed at any corpus size)."""
    plan = (
        _Q["quality_classifier_score"](spark, SF_MEDIUM)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def _bpe_merge(syms, a, b):
    out = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _ref_bpe(wc, n_merges, batch_size):
    """Pure-Python BPE with the SAME batched selection rule as the
    Spark trainer (select_disjoint_batch is shared, so only the
    count/apply halves are independently reimplemented here).
    batch_size=1 is classic sequential Sennrich BPE."""
    from collections import Counter

    from cdk_serverless_data_lake_sandbox_spark.operators.text import (
        select_disjoint_batch,
    )

    vocab = {w: list(w) for w in wc}
    merges = []
    while len(merges) < n_merges:
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        ranked = sorted(
            ((a, b, n) for (a, b), n in pc.items()), key=lambda t: (-t[2], t[0], t[1])
        )
        batch = select_disjoint_batch(ranked, batch_size, len(merges), n_merges)
        if not batch:
            break
        merges.extend(batch)
        for a, b in batch:
            vocab = {w: _bpe_merge(s, a, b) for w, s in vocab.items()}
    return merges, vocab


def test_bpe_train_apply_matches_reference(spark):
    """bpe_train + bpe_tokenize_stats must reproduce a pure-Python
    reference BPE (same tie-breaks, same leftmost-non-overlapping
    merge order, same disjoint-batch selection) exactly, on the
    sf0.001 corpus — in BOTH modes: the default batched trainer, and
    batch_size=1 which must equal classic one-merge-per-round BPE.
    Batching must also actually cut the round count (the reason it
    exists: a 32k-merge run can't be 32k sequential Spark jobs)."""
    from collections import Counter

    from cdk_serverless_data_lake_sandbox_spark.operators.text import (
        _BPE_BATCH,
        _BPE_MERGES,
        bpe_train,
    )
    from tests.conftest import SF_SMALL

    docs = {
        r.doc_id: r.text
        for r in load_tables(spark, SF_SMALL, ("documents",))["documents"].collect()
    }
    wc = Counter(w for t in docs.values() for w in t.strip().split() if w)

    # classic sequential mode
    seq_ref, _ = _ref_bpe(wc, _BPE_MERGES, batch_size=1)
    assert bpe_train(spark, SF_SMALL, batch_size=1) == seq_ref

    # default batched mode: identical to the batched reference, and
    # round count sublinear in merges
    batch_ref, vocab = _ref_bpe(wc, _BPE_MERGES, batch_size=_BPE_BATCH)
    stats: dict = {}
    got_merges = bpe_train(spark, SF_SMALL, stats=stats)
    assert got_merges == batch_ref
    assert stats["rounds"] <= -(-_BPE_MERGES // _BPE_BATCH) + 2, stats

    got = {
        r.doc_id: (r.n_words, r.n_pieces)
        for r in _Q["bpe_tokenize_stats"](spark, SF_SMALL).collect()
    }
    for doc_id, text in docs.items():
        ws = [w for w in text.strip().split() if w]
        exp_pieces = sum(len(vocab[w]) for w in ws)
        assert got[doc_id] == (len(ws), exp_pieces), doc_id
