"""Reusable column-expression library — the engine's scalar/array
function surface, all JVM-side (codegen-friendly), importable by user
pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.operators._helpers import dec, money

__all__ = [
    "dec",
    "money",
    "cosine",
    "dot",
    "l2_norm",
    "word_shingles",
    "ws_tokens",
    "norm_fingerprint",
]


def dot(a: str, b: str) -> Column:
    """Deterministic double dot product of two float array columns
    (left fold — bit-stable across engines)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0.0d, (acc, v) -> acc + v)"
    )


def l2_norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " 0.0d, (acc, v) -> acc + v)"
        )
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def word_shingles(text_col: str = "text", n: int = 3) -> Column:
    """Distinct n-word shingles of a text column."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n}))))"
    )


def ws_tokens(text_col: str = "text") -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def norm_fingerprint(text_col: str = "text") -> Column:
    """md5 of the whitespace-normalized lowercase text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")))
