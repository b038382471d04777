from etl_pipeline_challenge_aladia_spark.sources.cdc import (
    CDC_ORACLE_CTE,
    cdc_envelopes_from_events,
)
from etl_pipeline_challenge_aladia_spark.sources.files import load_table, register_testdata_views

__all__ = [
    "CDC_ORACLE_CTE",
    "cdc_envelopes_from_events",
    "load_table",
    "register_testdata_views",
]
