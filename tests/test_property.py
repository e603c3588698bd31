"""Property-based tests (hypothesis): randomized inputs against
pure-Python reference implementations. These cover the paths where a
subtle indexing bug would silently lose pairs — the posting-list pair
generation and the Glue choice-cast semantics."""

from __future__ import annotations

from tests.conftest import prop_examples
from hypothesis import given, settings
from hypothesis import strategies as st

from cdk_serverless_data_lake_sandbox_spark.operators.dedup import ngram_jaccard_pairs
from cdk_serverless_data_lake_sandbox_spark.operators.etl import apply_mapping

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]
_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=12,
)


def _shingles(t: str) -> set[str]:
    w = t.split(" ")
    n = max(len(w) - 2, 1)
    return {" ".join(w[i : i + 3]) for i in range(n)}


@settings(max_examples=prop_examples(8), deadline=None)
@given(texts=_texts)
def test_ngram_pairs_match_bruteforce(spark, texts):
    """The indexed posting-list plan must agree exactly with the
    quadratic definition of Jaccard >= tau on arbitrary corpora —
    including duplicate texts, sub-3-word docs, and empty overlap."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {(r.a_id, r.b_id): r.jaccard for r in ngram_jaccard_pairs(docs).collect()}
    sh = [_shingles(t) for t in texts]
    expected = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= 0.5:
                expected[(a, b)] = inter / union
    assert got == expected


_INTS = st.integers(-(10**12), 10**12).map(str)
_JUNK = st.text(alphabet="xy z", min_size=1, max_size=4)


@settings(max_examples=prop_examples(8), deadline=None)
@given(vals=st.lists(st.one_of(_INTS, _JUNK), min_size=1, max_size=8))
def test_apply_mapping_choice_resolution(spark, vals):
    """A 'choice' column cast to bigint keeps exactly the values that
    parse as integers and nulls the rest (Glue choice semantics via
    try_cast) — row count and order preserved."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, raw string")
    out = apply_mapping(df, [("i", "bigint", "i", "bigint"), ("raw", "choice", "val", "bigint")])
    rows = {r.i: r.val for r in out.collect()}
    assert len(rows) == len(vals)
    for i, v in enumerate(vals):
        try:
            expected = int(v)
        except ValueError:
            expected = None
        assert rows[i] == expected, (v, rows[i], expected)


def test_ngram_pairs_degenerate_inputs(spark):
    """Empty corpus, single doc, empty/one-word texts: no crashes, no
    spurious pairs."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    empty = spark.createDataFrame([], schema)
    assert ngram_jaccard_pairs(empty).count() == 0
    single = spark.createDataFrame([(1, "hello world this is a doc")], schema)
    assert ngram_jaccard_pairs(single).count() == 0
    degenerate = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one"), (4, "two words")], schema
    )
    pairs = {(r.a_id, r.b_id): r.jaccard for r in ngram_jaccard_pairs(degenerate).collect()}
    # the two identical one-word docs are an exact pair; nothing else
    assert pairs == {(2, 3): 1.0} or ((2, 3) in pairs and all(
        k == (2, 3) or v < 0.5 for k, v in pairs.items()
    )), pairs


def test_minhash_degenerate_inputs(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from cdk_serverless_data_lake_sandbox_spark.operators.dedup import (
        _minhash_signatures,
    )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    empty = spark.createDataFrame([], schema)
    assert _minhash_signatures(empty).count() == 0
    docs = spark.createDataFrame([(1, ""), (2, "a b c d e")], schema)
    sigs = {r.doc_id: r.sig for r in _minhash_signatures(docs).collect()}
    assert len(sigs[2]) == 32


def test_pii_patterns_fire_on_crafted_text(spark):
    """The synthetic corpus contains no PII (the registered query's
    zeros are real) — prove the patterns themselves detect planted
    emails / phones / IPs and that clean text stays clean."""
    from pyspark.sql import Row

    from cdk_serverless_data_lake_sandbox_spark.operators.curation import (
        _EMAIL_RE,
        _IPV4_RE,
        _PHONE_RE,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            Row(source="dirty", text="mail me at jo.doe+x@site.org or 555-123-4567 from 10.0.0.1"),
            Row(source="clean", text="no personal data here just words and 123 numbers"),
        ]
    )
    got = {
        r["source"]: (r["e"], r["p"], r["i"])
        for r in df.select(
            "source",
            F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0))).alias("e"),
            F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0))).alias("p"),
            F.size(F.regexp_extract_all("text", F.lit(_IPV4_RE), F.lit(0))).alias("i"),
        ).collect()
    }
    assert got["dirty"] == (1, 1, 1), got
    assert got["clean"] == (0, 0, 0), got


@settings(max_examples=prop_examples(8), deadline=None)
@given(texts=_texts)
def test_dup_span_profile_matches_bruteforce(spark, texts):
    """The hashed span-index plan must agree with the quadratic
    definition: a span position is duplicated iff its k-gram occurs
    in at least one OTHER document. k=3 keeps random docs eligible."""
    from cdk_serverless_data_lake_sandbox_spark.operators.shaping import (
        dup_span_profile,
    )

    k = 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans)
        for r in dup_span_profile(docs, k=k).collect()
    }
    span_docs: dict[str, set[int]] = {}
    per_doc: dict[int, list[str]] = {}
    for i, t in enumerate(texts):
        w = t.split(" ")
        spans = [" ".join(w[j : j + k]) for j in range(len(w) - k + 1)]
        if not spans:
            continue
        per_doc[i] = spans
        for s in set(spans):
            span_docs.setdefault(s, set()).add(i)
    expected = {
        i: (len(spans), sum(1 for s in spans if len(span_docs[s]) >= 2))
        for i, spans in per_doc.items()
    }
    assert got == expected


@settings(max_examples=prop_examples(8), deadline=None)
@given(texts=_texts)
def test_containment_pairs_match_bruteforce(spark, texts):
    """The contained-side-only prefix filter must be lossless: the
    indexed plan agrees exactly with the quadratic containment
    definition on arbitrary corpora, including equal-size ties and
    duplicate texts (containment 1.0 both ways -> one pair, smaller
    doc_id contained)."""
    from cdk_serverless_data_lake_sandbox_spark.operators.dedup import (
        _CONTAIN_TAU,
        containment_pairs,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs(docs).collect()
    }
    sh = [_shingles(t) for t in texts]
    expected = {}
    for a in range(len(texts)):
        for b in range(len(texts)):
            if a == b:
                continue
            smaller = len(sh[a]) < len(sh[b]) or (
                len(sh[a]) == len(sh[b]) and a < b
            )
            if not smaller:
                continue
            c = len(sh[a] & sh[b]) / len(sh[a])
            if c >= _CONTAIN_TAU:
                expected[(a, b)] = round(c, 6)
    assert got == expected


@settings(max_examples=prop_examples(8), deadline=None)
@given(texts=_texts)
def test_segment_dedup_matches_reference(spark, texts):
    """First-occurrence segment dedup must agree with the sequential
    reference on arbitrary corpora — duplicates, singletons, and
    docs shorter than one segment."""
    from cdk_serverless_data_lake_sandbox_spark.operators.shaping import (
        _SEG_SIZE,
    )
    from cdk_serverless_data_lake_sandbox_spark.registry import all_queries

    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="segprop-")
    try:
        docs = spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.coalesce(1).write.mode("overwrite").parquet(tmp + "/d.dir")
        part = glob.glob(tmp + "/d.dir/part-*.parquet")[0]
        shutil.copy(part, tmp + "/documents.parquet")
        out = {
            r.doc_id: r
            for r in all_queries()["segment_dedup"](spark, tmp).collect()
        }
        seen: dict[str, tuple[int, int]] = {}
        per_doc: dict[int, list[tuple[int, str]]] = {}
        for i, t in enumerate(texts):
            ws = t.strip().split()
            segs = [
                " ".join(ws[j : j + _SEG_SIZE])
                for j in range(0, len(ws), _SEG_SIZE)
            ]
            per_doc[i] = list(enumerate(segs))
            for idx, s in enumerate(segs):
                if s not in seen:
                    seen[s] = (i, idx)
        for i, pairs in per_doc.items():
            kept = [s for idx, s in pairs if seen[s] == (i, idx)]
            assert out[i].dedup_text == " ".join(kept)
            assert out[i].n_kept == len(kept)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ------------------------------------------------------ strip_dup_spans
def _ref_strip(texts: list[str], k: int = 8):
    """Pure-Python reference of the span-removal semantics: positions
    covered by any k-gram span occurring in >= 2 docs are excised
    everywhere except in the span's min-doc owner."""
    spans: dict[str, set[int]] = {}
    toks = [t.split() for t in texts]
    for d, w in enumerate(toks):
        for i in range(len(w) - k + 1):
            spans.setdefault(" ".join(w[i : i + k]), set()).add(d)
    owner = {s: min(ds) for s, ds in spans.items() if len(ds) >= 2}
    out = []
    for d, w in enumerate(toks):
        covered: set[int] = set()
        for i in range(len(w) - k + 1):
            s = " ".join(w[i : i + k])
            if s in owner and owner[s] != d:
                covered.update(range(i, i + k))
        kept = [t for p, t in enumerate(w) if p not in covered]
        out.append((len(w), len(w) - len(kept), " ".join(kept)))
    return out


_span_texts = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=20
    ).map(" ".join),
    min_size=2,
    max_size=8,
)


@settings(max_examples=prop_examples(8), deadline=None)
@given(texts=_span_texts)
def test_strip_dup_spans_matches_reference(spark, texts):
    """Random small-alphabet corpora maximize span collisions — the
    regime where an off-by-one in prefix positions or owner selection
    would show. The distributed plan must equal the reference
    exactly, including rebuilt text."""
    from cdk_serverless_data_lake_sandbox_spark.operators.shaping import (
        strip_dup_spans_frame,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in strip_dup_spans_frame(docs).collect()
    }
    want = {i: row for i, row in enumerate(_ref_strip(texts))}
    assert got == want


# ------------------------------------------------------ cdc_chunk_dedup
def _ref_cdc(rows: list[tuple[int, str, str]], mod: int = 8):
    """Pure-Python reference of the content-defined chunker: a word
    whose md5-16-bit hash is 0 mod ``mod`` ends a chunk (exclusive
    prefix count of boundary flags = chunk id); chunks are identified
    by md5 of their text."""
    import hashlib
    from collections import defaultdict

    def h16(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:4], 16)

    chunks = []  # (source, chunk_hash, chunk_bytes)
    for _doc_id, source, text in rows:
        words = text.split()
        cid, cur = 0, []
        groups = defaultdict(list)
        for w in words:
            groups[cid].append(w)
            if h16(w) % mod == 0:
                cid += 1
        for ws in groups.values():
            ctext = " ".join(ws)
            chunks.append(
                (source, hashlib.md5(ctext.encode()).hexdigest(), len(ctext))
            )
    n_sources = defaultdict(set)
    for s, ch, _b in chunks:
        n_sources[ch].add(s)
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for s, ch, b in chunks:
        per[s][ch][0] += 1
        per[s][ch][1] = b
    out = {}
    for s, hs in per.items():
        n_chunks = sum(c for c, _ in hs.values())
        uniq = len(hs)
        shared = sum(1 for ch in hs if len(n_sources[ch]) >= 2)
        bt = sum(c * b for c, b in hs.values())
        bu = sum(b for _, b in hs.values())
        out[s] = (n_chunks, uniq, shared, bt, bu)
    return out


_cdc_rows = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1"]),
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=1,
            max_size=30,
        ).map(" ".join),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=prop_examples(8), deadline=None)
@given(rows=_cdc_rows)
def test_cdc_chunker_matches_reference(spark, rows):
    from cdk_serverless_data_lake_sandbox_spark.operators.dedup import (
        cdc_chunk_dedup_frame,
    )

    full = [(i, s, t) for i, (s, t) in enumerate(rows)]
    docs = spark.createDataFrame(
        full, "doc_id long, source string, text string"
    )
    got = {
        r["source"]: (
            r["n_chunks"],
            r["n_unique_chunks"],
            r["n_shared_chunks"],
            r["bytes_total"],
            r["bytes_unique"],
        )
        for r in cdc_chunk_dedup_frame(docs).collect()
    }
    assert got == _ref_cdc(full)


# ------------------------------------------------------ strip_dup_chars
def _ref_strip_chars(texts: list[str], k: int):
    """Pure-Python suffix-scan reference of character-level
    exact-substring removal: every char position covered by a k-gram
    occurring in >= 2 docs is excised except in the gram's min-doc
    owner; text rebuilt from surviving characters."""
    grams: dict[str, set[int]] = {}
    for d, t in enumerate(texts):
        for i in range(len(t) - k + 1):
            grams.setdefault(t[i : i + k], set()).add(d)
    owner = {g: min(ds) for g, ds in grams.items() if len(ds) >= 2}
    out = []
    for d, t in enumerate(texts):
        covered: set[int] = set()
        for i in range(len(t) - k + 1):
            g = t[i : i + k]
            if g in owner and owner[g] != d:
                covered.update(range(i, i + k))
        kept = "".join(c for p, c in enumerate(t) if p not in covered)
        out.append((len(t), len(t) - len(kept), kept))
    return out


_char_texts = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=30),
    min_size=2,
    max_size=8,
)


@settings(max_examples=prop_examples(8), deadline=None)
@given(texts=_char_texts)
def test_strip_dup_chars_matches_reference(spark, texts):
    """Random tiny-alphabet corpora maximize char-gram collisions and
    interval merges/abutments — the regime where an off-by-one in the
    interval fold or the complement-slice rebuild would show. k=5 so
    short random strings actually collide; the registered k=50 entry
    rides the identical frame function."""
    from cdk_serverless_data_lake_sandbox_spark.operators.shaping import (
        strip_dup_chars_frame,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["n_removed"], r["text_clean"])
        for r in strip_dup_chars_frame(docs, k=5).collect()
    }
    want = {i: row for i, row in enumerate(_ref_strip_chars(texts, k=5))}
    assert got == want


# ---------------------------------------------------------------- r9
_bpe_words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)


@settings(max_examples=prop_examples(10), deadline=None)
@given(docs=st.lists(_bpe_words, min_size=1, max_size=6))
def test_bpe_oracle_replay_matches_reference_on_random_corpora(docs):
    """The generated DuckDB BPE-trainer replay (_bpe_stats_oracle)
    must reproduce the pure-Python batched-BPE fold on ARBITRARY
    corpora, not just the shipped tables — the oracle generator's own
    correctness, checked engine-to-engine without Spark."""
    from collections import Counter

    import duckdb

    from cdk_serverless_data_lake_sandbox_spark.operators.text import (
        _BPE_BATCH,
        _BPE_MERGES,
        _bpe_stats_oracle,
        select_disjoint_batch,
    )

    texts = [" ".join(ws) for ws in docs]
    wc = Counter(w for t in texts for w in t.strip().split() if w)

    # pure-Python reference: the shared selection rule + leftmost fold
    def merge(syms, a, b):
        out = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        return out

    vocab = {w: list(w) for w in wc}
    merges = []
    while len(merges) < _BPE_MERGES:
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        ranked = sorted(
            ((a, b, n) for (a, b), n in pc.items() if n >= 2),
            key=lambda t: (-t[2], t[0], t[1]),
        )[: max(_BPE_BATCH * 8, 8)]
        batch = select_disjoint_batch(
            ranked, _BPE_BATCH, len(merges), _BPE_MERGES
        )
        if not batch:
            break
        merges.extend(batch)
        for a, b in batch:
            vocab = {w: merge(s, a, b) for w, s in vocab.items()}
    expect = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.strip().split() if w]
        if ws:
            expect[i] = (len(ws), sum(len(vocab[w]) for w in ws))

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(_bpe_stats_oracle()).fetchall()
    }
    assert got == expect


@settings(max_examples=prop_examples(10), deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-8, max_value=8),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=24,
    )
)
def test_kcenter_oracle_replay_matches_reference_on_random_vectors(vecs):
    """The unrolled k-center oracle must reproduce the pure-Python
    greedy farthest-point fold on arbitrary vector sets (integer
    coordinates keep every distance exact in both engines)."""
    import duckdb

    from cdk_serverless_data_lake_sandbox_spark.operators.similarity import (
        _KCENTER_K,
        _kcenter_oracle,
    )

    pts = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    chosen = [(1, 0, 0.0)]
    dmin = {i: d2(e, pts[0][1]) for i, e in pts}
    for r in range(2, _KCENTER_K + 1):
        nxt = min(dmin, key=lambda i: (-dmin[i], i))
        chosen.append((r, nxt, dmin[nxt]))
        ce = pts[nxt][1]
        for i, e in pts:
            dmin[i] = min(dmin[i], d2(e, ce))
    expect = {r: (v, round(d, 6)) for r, v, d in chosen}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)",
        [(i, e) for i, e in pts],
    )
    got = {
        r[0]: (r[1], r[2]) for r in con.execute(_kcenter_oracle()).fetchall()
    }
    assert got == expect
