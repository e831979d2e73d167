"""Scalar/vector function library built on pyspark.sql.functions (JVM-side)."""

from cyrela_etl_spark.functions.dates import reformat_date
from cyrela_etl_spark.functions.hashing import hex_prefix_long, stable_hash64
from cyrela_etl_spark.functions.vectors import cosine_similarity, dot, l2_norm, to_double_array

__all__ = [
    "reformat_date",
    "stable_hash64",
    "hex_prefix_long",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "to_double_array",
]
