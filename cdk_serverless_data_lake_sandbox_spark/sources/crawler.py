"""Crawler: schema inference over raw delimited/JSON/parquet files —
the Glue-crawler analog.

The reference deploys two crawlers (``stacks/demo_stack.py:130-187``):
one bare, one with a CSV classifier that forces header detection
(``contains_header="PRESENT"``, tab delimiter) because a header row of
all-string columns is indistinguishable from data. This module
reproduces both behaviors on Spark's readers:

- without a classifier, a delimited file whose first row could be data
  (every column parses as string either way) is read headerless with
  synthesized ``col_N`` names — exactly the Glue failure mode the
  reference's README documents for ``name.basics``;
- with :class:`CsvClassifier` (header PRESENT), the first row becomes
  the header and types are inferred from the remaining rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CsvClassifier:
    """Glue CsvClassifier analog (``stacks/demo_stack.py:158-169``)."""

    delimiter: str = "\t"
    quote_symbol: str = "'"
    contains_header: str = "PRESENT"  # PRESENT | ABSENT | UNKNOWN


def _header_is_detectable(spark: SparkSession, path: str, delimiter: str) -> bool:
    """Glue-style heuristic: a header is auto-detected only when at
    least one column is non-string (then the header row, which never
    parses as that type, stands out). All-string data -> no header."""
    probe = (
        spark.read.option("header", True)
        .option("sep", delimiter)
        .option("inferSchema", True)
        .csv(path)
    )
    return any(f.dataType.simpleString() != "string" for f in probe.schema.fields)


def crawl_delimited(
    spark: SparkSession,
    path: str,
    delimiter: str = "\t",
    classifier: CsvClassifier | None = None,
) -> DataFrame:
    """Infer schema for a delimited file the way the reference's
    crawler pair does. Returns the typed DataFrame; the caller
    registers it in a :class:`~cdk_serverless_data_lake_sandbox_spark.catalog.Lake` zone."""
    if classifier is not None:
        use_header = classifier.contains_header == "PRESENT"
        delimiter = classifier.delimiter
        quote = classifier.quote_symbol
    else:
        use_header = _header_is_detectable(spark, path, delimiter)
        quote = '"'
    reader = (
        spark.read.option("header", use_header)
        .option("sep", delimiter)
        .option("quote", quote)
        .option("inferSchema", True)
        .option("nullValue", "\\N")  # IMDB-style nulls
    )
    df = reader.csv(path)
    if not use_header:
        df = df.toDF(*[f"col_{i}" for i in range(len(df.columns))])
    return df


def crawl_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)


def crawl_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def crawl_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC zone support (native in Spark — no extra package): ORC
    files carry their own typed schema like parquet, so crawling is a
    schema read, and Spark pushes filters/column pruning into the ORC
    reader the same way. Glue crawlers classify ORC natively; this is
    that path."""
    return spark.read.orc(path)


def orc_write(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    """ORC zone writer (snappy, partitioned like the parquet zones)."""
    w = df.write.mode("overwrite").option("compression", "snappy")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
