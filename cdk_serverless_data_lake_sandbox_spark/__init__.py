"""PySpark-native analytics engine with the data capabilities of the
``Lux-CC/cdk-serverless-data-lake-sandbox`` reference (CDK serverless
data lake: Glue catalog + crawlers, TSV->parquet ETL, Athena SQL,
DynamoDB federated lookup), rebuilt Spark-first and extended with a
large-scale training-data pipeline surface (dedup, similarity search,
multimodal columns, text analysis).

Everything here is a declarative DataFrame/SQL plan: Catalyst handles
pushdown, pruning, and join planning; Python runs only in
Arrow-vectorized pandas UDFs at the edges (MinHash/SimHash bit math).
"""

__version__ = "0.1.0"
