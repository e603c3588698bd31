"""Heaps-law honest-vocabulary corpus for the near-dup soak (round-8
verdict item 6).

The make_sf1.py corpus keeps the generator's 31-word vocabulary, so its
trigram space SATURATES: posting lists grow linearly with the corpus
and the jaccard-pair family's OUTPUT is quadratic — an adversarial
property of that data, not of real corpora, which obey Heaps' law
(vocabulary ~ c * n_tokens^beta, beta ~ 0.5; the repo's own
``heaps_law_fit`` measures exactly this). This script synthesizes a
document corpus whose vocabulary actually grows with corpus size, so
the near-dup family's 10x-data ratios can be read off honest data:

- vocabulary: V = ceil(2 * sqrt(expected tokens)) per scale tier, so
  the sf1 tier has ~3.16x the sf0.1 vocabulary — the law's slope;
- text: ~20-80 words per doc, each word a pure hash function of
  (doc_id, position) — deterministic, partition-stable, no RNG —
  drawn ZIPF(s=1) over V (log-uniform inverse CDF: rank =
  floor(exp(u * ln V))), so the corpus has the realistic head (a few
  stopword-like terms carry hot shingle postings that grow with the
  corpus — the slice the auto hot-posting guard handles) AND the
  realistic tail (most postings stay O(1), pair output stays linear);
- planted duplicate structure so dedup operators have real work:
  doc_id % 50 == 3 is an EXACT copy of doc_id-3, and doc_id % 20 == 7
  is a NEAR copy of doc_id-1 (every 8th word swapped) — rules are
  disjoint mod 100 and shift-invariant, so every 10M-shifted copy of
  the sf1 tier carries the same structure against its own docs only.

Tables other than documents are reused from the source tiers
(/root/testdata/sf0.1 and the make_sf1.py output) via symlinks, so
registered queries that join documents against anything else still run.

Usage:
    python scripts/make_heaps.py [out_root] [sfx10_dir]
    # default out_root /tmp/heaps, sfx10_dir /tmp/sfx10
    # -> <out_root>/sf0.1/documents.parquet  (5k docs,  V ~ 1000)
    # -> <out_root>/sf1/documents.parquet    (50k docs, V ~ 3163)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from cdk_serverless_data_lake_sandbox_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
SHIFT = 10_000_000
AVG_WORDS = 50  # sequence length 20-80 to match the source corpus


def _zipf_word(hash_expr: str, vocab: int) -> str:
    """Zipf(s=1) rank from a 64-bit hash: u uniform in (0,1] ->
    rank = floor(exp(u * ln V)) in [1, V]."""
    u = f"((pmod({hash_expr}, 999983) + 1) / 999983.0)"
    return (
        f"concat('w', CAST(floor(exp({u} * ln({vocab}))) AS BIGINT))"
    )


def _heaps_text(base: str, vocab: int, perturb: bool) -> str:
    """SQL for the document text of doc id ``base`` (an expression):
    length 20 + hash%61 words, word j drawn Zipf(1) over V from
    hash(base, j). ``perturb`` swaps every 8th word through an
    independent hash — the planted near-duplicate channel."""
    word = _zipf_word(f"xxhash64({base}, j)", vocab)
    if perturb:
        alt = _zipf_word(f"xxhash64({base}, j, 999)", vocab)
        word = f"IF(j % 8 = 0, {alt}, {word})"
    return (
        f"array_join(transform("
        f"sequence(0, 19 + CAST(pmod(xxhash64({base}, -1), 61) AS INT)),"
        f" j -> {word}), ' ')"
    )


def make_documents(spark, n_docs: int, n_copies: int, out_path: str) -> None:
    vocab = int(math.ceil(2 * math.sqrt(n_docs * n_copies * AVG_WORDS)))
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    copies = []
    for i in range(n_copies):
        copies.append(base.select((F.col("doc_id") + i * SHIFT).alias("doc_id")))
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    text = F.expr(
        "CASE WHEN doc_id % 50 = 3 THEN "
        + _heaps_text("doc_id - 3", vocab, False)
        + " WHEN doc_id % 20 = 7 THEN "
        + _heaps_text("doc_id - 1", vocab, True)
        + " ELSE "
        + _heaps_text("doc_id", vocab, False)
        + " END"
    )
    out = df.select(
        "doc_id",
        text.alias("text"),
        F.expr(
            "element_at(array('en','zh','de','fr','es'),"
            " CAST(pmod(xxhash64(doc_id, -2), 5) AS INT) + 1)"
        ).alias("lang"),
        F.concat(F.lit("src"), F.expr("pmod(doc_id, 8)")).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    out.repartition(32).write.mode("overwrite").parquet(out_path)
    print(f"{out_path}: {n_docs * n_copies} docs, vocab={vocab}")


def link_other_tables(tier_dir: str, src_dir: str) -> None:
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(tier_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/heaps"
    sfx10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx10"
    spark = get_spark(app_name="make_heaps")
    spark.sparkContext.setLogLevel("ERROR")

    tier01 = os.path.join(out_root, "sf0.1")
    tier1 = os.path.join(out_root, "sf1")
    os.makedirs(tier01, exist_ok=True)
    os.makedirs(tier1, exist_ok=True)
    make_documents(spark, 5000, 1, os.path.join(tier01, "documents.parquet"))
    make_documents(spark, 5000, 10, os.path.join(tier1, "documents.parquet"))
    link_other_tables(tier01, SRC)
    if os.path.isdir(sfx10):
        link_other_tables(tier1, sfx10)


if __name__ == "__main__":
    main()
