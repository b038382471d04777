"""PySpark-native analytics engine with the capabilities of the reference
CDC ETL pipeline (CarlaOnate/etl-pipeline-challenge-aladia), re-expressed
Spark-first.

The reference (see SURVEY.md) is a MongoDB-change-stream -> RabbitMQ ->
per-message Apache Beam transform -> ClickHouse ReplacingMergeTree pipeline.
This engine expresses the same semantics as ONE declarative Spark plan:

    envelopes -> parse -> watched_ratio enrich -> flatten -> route ->
    warehouse (append) -> last-write-wins dedup view -> analytics SQL

plus the extended large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) the project north star calls for.
"""

__version__ = "0.1.0"
