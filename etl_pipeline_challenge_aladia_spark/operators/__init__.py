from etl_pipeline_challenge_aladia_spark.operators.dedup import latest_per_key
from etl_pipeline_challenge_aladia_spark.operators.enrich import (
    watched_ratio_col,
    with_watched_ratio,
)
from etl_pipeline_challenge_aladia_spark.operators.structure import (
    format_original_timestamp,
    modify_structure,
    parse_envelope,
    route_ops,
    to_warehouse_row,
)

__all__ = [
    "latest_per_key",
    "watched_ratio_col",
    "with_watched_ratio",
    "format_original_timestamp",
    "modify_structure",
    "parse_envelope",
    "route_ops",
    "to_warehouse_row",
]
