"""Corpus-curation operators: the compliance / contamination /
mixing passes a pretraining-data pipeline runs after cleaning and
dedup — PII density scanning, intra-document repetition scoring,
benchmark-contamination checks, and domain mixing weights.

All batch paths are JVM-side expressions over one scan (regexp /
array functions inside whole-stage codegen); the contamination check
reuses the inverted-index shape of the dedup family, so nothing here
is O(n^2). Each operator has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdk_serverless_data_lake_sandbox_spark.catalog import load_tables
from cdk_serverless_data_lake_sandbox_spark.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir, ("documents",))["documents"]


# ---------------------------------------------------------------- C35
# Patterns restricted to syntax Java regex and RE2 interpret
# identically (no backrefs, no lookaround).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_ORACLE = f"""
WITH m AS (
  SELECT source,
    LEN(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_email,
    LEN(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phone,
    LEN(regexp_extract_all(text, '{_IPV4_RE}')) AS n_ip
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(n_email) AS BIGINT) AS total_emails,
  CAST(SUM(n_phone) AS BIGINT) AS total_phones,
  CAST(SUM(n_ip) AS BIGINT) AS total_ips,
  COUNT(*) FILTER (WHERE n_email + n_phone + n_ip > 0) AS n_docs_with_pii
FROM m GROUP BY source
"""


@register("pii_scan", oracle=_PII_ORACLE)
def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII density per source: email / phone / IPv4 pattern counts,
    the redaction-planning profile a corpus compliance pass produces.
    One scan, conditional aggregation; patterns stay inside codegen
    (regexp_extract_all), so this runs at parquet-scan speed and the
    same plan handles 100 TB."""
    d = _docs(spark, sf_dir)

    def hits(pattern: str) -> F.Column:
        return F.size(F.regexp_extract_all(F.col("text"), F.lit(pattern), F.lit(0)))

    m = d.select(
        "source",
        hits(_EMAIL_RE).alias("n_email"),
        hits(_PHONE_RE).alias("n_phone"),
        hits(_IPV4_RE).alias("n_ip"),
    )
    return m.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_email").cast("bigint").alias("total_emails"),
        F.sum("n_phone").cast("bigint").alias("total_phones"),
        F.sum("n_ip").cast("bigint").alias("total_ips"),
        F.count(
            F.when(F.col("n_email") + F.col("n_phone") + F.col("n_ip") > 0, 1)
        ).alias("n_docs_with_pii"),
    )


# ---------------------------------------------------------------- C36
_REP_ORACLE = """
WITH g AS (
  SELECT doc_id, lang,
    greatest(len(string_split(text, ' ')) - 2, 1) AS n_grams,
    len(list_distinct(list_transform(
      generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
      i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS n_distinct
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
  CAST(ROUND(AVG(1.0 - CAST(n_distinct AS DOUBLE) / n_grams), 6) AS DOUBLE)
    AS avg_rep_ratio,
  COUNT(*) FILTER (WHERE 1.0 - CAST(n_distinct AS DOUBLE) / n_grams > 0.2)
    AS n_high_rep
FROM g GROUP BY lang
"""


@register("doc_repetition", oracle=_REP_ORACLE)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition score (the Gopher/C4-style repetition
    filter): fraction of a document's word 3-grams that are duplicates
    of an earlier 3-gram in the SAME document. Templated / spammy
    pages score high and get filtered before training. One scan; the
    word array is projected once so the lambda never re-splits."""
    d = _docs(spark, sf_dir)
    words = d.select("doc_id", "lang", F.split(F.col("text"), " ").alias("_w"))
    shingles = "transform(sequence(1, greatest(size(_w) - 2, 1)), i -> concat_ws(' ', slice(_w, i, 3)))"
    g = words.select(
        "lang",
        F.greatest(F.size("_w") - 2, F.lit(1)).alias("n_grams"),
        F.size(F.expr(f"array_distinct({shingles})")).alias("n_distinct"),
    )
    rep = 1.0 - F.col("n_distinct").cast("double") / F.col("n_grams")
    return g.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(rep), 6).alias("avg_rep_ratio"),
        F.count(F.when(rep > 0.2, 1)).alias("n_high_rep"),
    )


# ---------------------------------------------------------------- C37
_N_CONTAM = 5  # benchmark n-gram size (words)

_CONTAM_ORACLE = f"""
WITH grams AS (
  SELECT doc_id, (doc_id % 20) = 0 AS is_bench,
    list_distinct(list_transform(
      generate_series(1, greatest(len(string_split(text, ' ')) - {_N_CONTAM - 1}, 1)),
      i -> array_to_string((string_split(text, ' '))[i:i+{_N_CONTAM - 1}], ' '))) AS gs
  FROM documents
), bench AS (
  SELECT DISTINCT unnest(gs) AS g FROM grams WHERE is_bench
), exploded AS (
  SELECT doc_id, unnest(gs) AS g FROM grams WHERE NOT is_bench
), hits AS (
  SELECT DISTINCT doc_id FROM exploded WHERE g IN (SELECT g FROM bench)
)
SELECT
  (SELECT COUNT(*) FROM grams WHERE is_bench) AS n_benchmark,
  (SELECT COUNT(*) FROM grams WHERE NOT is_bench) AS n_corpus,
  (SELECT COUNT(*) FROM hits) AS n_contaminated
"""


@register("contamination_check", oracle=_CONTAM_ORACLE)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: flag corpus documents sharing any
    word 5-gram with a held-out benchmark set (here a deterministic
    5% doc_id split standing in for an eval suite). Same asymmetric
    inverted-index shape as dedup_incremental — the benchmark side
    contributes a distinct-gram index (tiny), the corpus side streams
    through one semi join on the gram hash. Never O(corpus x bench
    docs); at 100 TB the gram index broadcasts."""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id",
        (F.pmod("doc_id", F.lit(20)) == 0).alias("is_bench"),
        F.split(F.col("text"), " ").alias("_w"),
    )
    shingles = (
        f"array_distinct(transform(sequence(1, greatest(size(_w) - {_N_CONTAM - 1}, 1)),"
        f" i -> xxhash64(concat_ws(' ', slice(_w, i, {_N_CONTAM})))))"
    )
    grams = words.select("doc_id", "is_bench", F.expr(shingles).alias("gs"))
    bench_grams = (
        grams.where("is_bench")
        .select(F.explode_outer("gs").alias("g"))
        .where(F.col("g").isNotNull())
        .distinct()
    )
    corpus = grams.where(~F.col("is_bench"))
    corpus_grams = corpus.select(
        "doc_id", F.explode_outer("gs").alias("g")
    ).where(F.col("g").isNotNull())
    contaminated = (
        corpus_grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        grams.groupBy()
        .agg(
            F.count(F.when(F.col("is_bench"), 1)).alias("n_benchmark"),
            F.count(F.when(~F.col("is_bench"), 1)).alias("n_corpus"),
        )
        .crossJoin(contaminated.agg(F.count("*").alias("n_contaminated")))
    )


# ---------------------------------------------------------------- C38
_MIX_ALPHA = 0.7

_MIX_ORACLE = f"""
WITH t AS (
  SELECT source,
    CAST(SUM(len(string_split_regex(TRIM(text), '\\s+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), s AS (
  SELECT source, n_tokens,
    CAST(n_tokens AS DOUBLE) / (SELECT SUM(CAST(n_tokens AS DOUBLE)) FROM t) AS share
  FROM t
)
SELECT source, n_tokens,
  CAST(ROUND(share, 6) AS DOUBLE) AS share,
  CAST(ROUND(POW(share, {_MIX_ALPHA})
      / (SELECT SUM(POW(share, {_MIX_ALPHA})) FROM s), 6) AS DOUBLE) AS weight
FROM s
"""


@register("domain_mix_weights", oracle=_MIX_ORACLE)
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing weights (share^alpha,
    alpha=0.7, renormalized — the standard upweight-the-tail recipe
    for multi-source pretraining). Token totals aggregate per source
    in one pass; the normalizing constants are source-count-sized
    scalar subqueries, broadcast by Catalyst."""
    d = _docs(spark, sf_dir)
    t = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("n_tokens")
    )
    total = t.agg(F.sum(F.col("n_tokens").cast("double")).alias("_tot"))
    s = t.crossJoin(F.broadcast(total)).select(
        "source",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_tot")).alias("_share"),
    )
    z = s.agg(F.sum(F.pow("_share", F.lit(_MIX_ALPHA))).alias("_z"))
    return s.crossJoin(F.broadcast(z)).select(
        "source",
        "n_tokens",
        F.round("_share", 6).alias("share"),
        F.round(F.pow("_share", F.lit(_MIX_ALPHA)) / F.col("_z"), 6).alias("weight"),
    )
