"""Round-9 scale-path work: the shuffle-free unigram corpus stitch,
the large-vocab tokenize_to_ids broadcast-join path, and their
bit-identical parity with the default strategies."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ulm_assemble_map_equals_shuffle(spark):
    """The broadcast-map stitch (default for Heaps-small vocabs) and
    the explode+regroup fallback must emit bit-identical documents —
    including the position-ordered float fold for doc_logp."""
    from cdk_serverless_data_lake_sandbox_spark.operators.text import (
        _docs,
        _ulm_assemble_map,
        _ulm_assemble_shuffle,
        _ulm_final_seg,
    )
    from pyspark.sql import functions as F

    docs = _docs(spark, SF_SMALL)
    seg = _ulm_final_seg(docs)
    wseg = seg.select(
        "w",
        F.size("toks").cast("bigint").alias("np"),
        F.expr("element_at(dp, 2 * length(w) - 1)").alias("wlp"),
        F.array_join(F.reverse("toks"), " ").alias("wtxt"),
    )
    a = _rows(_ulm_assemble_map(docs, wseg))
    b = _rows(_ulm_assemble_shuffle(docs, wseg))
    assert a == b and len(a) > 0


def test_ulm_assemble_map_drops_unknown_words_like_join(spark):
    """A word missing from the segmentation table must drop out of
    the stitched doc (inner-join semantics), and a doc with no
    surviving words must yield no row — on BOTH paths."""
    from cdk_serverless_data_lake_sandbox_spark.operators.text import (
        _docs,
        _ulm_assemble_map,
        _ulm_assemble_shuffle,
        _ulm_final_seg,
    )
    from pyspark.sql import functions as F

    docs = _docs(spark, SF_SMALL)
    seg = _ulm_final_seg(docs)
    wseg = seg.select(
        "w",
        F.size("toks").cast("bigint").alias("np"),
        F.expr("element_at(dp, 2 * length(w) - 1)").alias("wlp"),
        F.array_join(F.reverse("toks"), " ").alias("wtxt"),
    )
    # drop one word from the vocab entirely
    victim = wseg.select("w").orderBy("w").first().w
    wseg2 = wseg.where(F.col("w") != victim)
    a = _rows(_ulm_assemble_map(docs, wseg2))
    b = _rows(_ulm_assemble_shuffle(docs, wseg2))
    assert a == b
    full = _rows(_ulm_assemble_map(docs, wseg))
    assert a != full  # the drop was observable


def test_tokenize_ids_join_path_bit_identical(spark):
    """The ranked-broadcast-join tokenize_to_ids (large-vocab path)
    equals the literal-map default row for row, and forcing the gate
    low routes the registered query through it with the same
    output."""
    from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
    from cdk_serverless_data_lake_sandbox_spark.operators import text as T

    d = load_tables(spark, SF_SMALL, ("documents",))["documents"]
    default = _rows(T.tokenize_to_ids(spark, SF_SMALL))
    joined = _rows(T._tokenize_ids_join(d))
    assert joined == default and len(default) > 0

    orig = T._IDS_LITERAL_MAX
    try:
        T._IDS_LITERAL_MAX = 0  # force every vocab onto the join path
        gated = _rows(T.tokenize_to_ids(spark, SF_SMALL))
    finally:
        T._IDS_LITERAL_MAX = orig
    assert gated == default
