"""PySpark-native analytics engine with the query and data-processing
capabilities of ``MichaelChenGithub/Real-timeTransactionalDataLakehouse``.

Brand-new, Spark-first design (DataFrame / Spark SQL / Structured
Streaming): declarative logical plans optimized by Catalyst, Parquet at
rest, Tungsten rows in flight.  The reference's Kappa-medallion semantics
(bronze append log -> silver enriched facts -> gold windowed metrics and
latest-state tables -> SCD1 dims from CDC) are re-expressed as pure
``DataFrame -> DataFrame`` operators (see SURVEY.md section 2), plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) required at 100 TB scale.
"""

__version__ = "0.1.0"

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
