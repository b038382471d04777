from etl_pipeline_challenge_aladia_spark.streaming.pipeline import (
    run_cdc_file_stream,
    streaming_envelopes_from_json,
)

__all__ = ["run_cdc_file_stream", "streaming_envelopes_from_json"]
