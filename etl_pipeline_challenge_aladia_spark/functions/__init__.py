"""Scalar column helpers shared across operators and the query catalog."""

from etl_pipeline_challenge_aladia_spark.functions.rounding import round_half_up, sql_round_half_up
from etl_pipeline_challenge_aladia_spark.functions.vectors import (
    cosine_similarity_col,
    dot_col,
    norm_col,
    to_double_array,
)

__all__ = [
    "round_half_up",
    "sql_round_half_up",
    "cosine_similarity_col",
    "dot_col",
    "norm_col",
    "to_double_array",
]
