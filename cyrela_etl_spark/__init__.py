"""cyrela_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference
``afonsir/cyrela-etl`` pipeline (batch ETL + ML feature engineering over
object-store zones), built Spark-first:

- DataFrame/SQL logical plans, Catalyst/Tungsten physical execution.
- Parquet-native zone storage, CSV at the ingest/egress edges.
- Single-pass feature engineering (broadcast 1-row aggregates instead of
  the reference's 9 rescanning scalar subqueries,
  cf. reference spark/jobs/pr-wallet-data-tf.py:76-120).
- Extension operators for large-scale training-data pipelines: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
  similarity search, text analysis, multimodal column plumbing, and
  Structured Streaming over event tables.

Everything here derives from the public Apache Spark API and the public
reference repository; no proprietary systems are referenced.
"""

__version__ = "0.2.0"

from cyrela_etl_spark.pipeline import Pipeline, PipelineError, Stage
from cyrela_etl_spark.session import get_spark

__all__ = ["get_spark", "Pipeline", "Stage", "PipelineError", "__version__"]
