"""Schemas for the CDC pipeline, encoded from the reference's data model.

Reference citations (see SURVEY.md §1):
- source document fields: reference producer/db/data_simulation.py:26-37
- CDC envelope: reference producer/producer.py:57-62
- warehouse DDL: reference clickhouse/init.sql:8-24

The reference keeps schema implicit (dicts + ``.get()`` -> None); we declare
it explicitly and use permissive nullability so missing fields become NULL,
which reproduces the reference's defaulting behavior.
"""

from __future__ import annotations

from pyspark.sql import types as T

DEVICE_TYPES = ["mobile", "desktop", "tablet", "smart_tv"]
QUALITIES = ["360p", "480p", "720p", "1080p", "4k"]

#: The watched-log source document (reference data_simulation.py:26-37).
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("watched_seconds", T.LongType()),
        T.StructField("video_duration_seconds", T.LongType()),
        T.StructField("timestamp", T.StringType()),  # ISO-8601 ...Z
        T.StructField("device_type", T.StringType()),
        T.StructField("quality", T.StringType()),
    ]
)

#: CDC change-event envelope (reference producer.py:57-62). ``data`` is the
#: full post-image for insert/update and NULL for delete. ``version`` is the
#: engine's explicit monotonic ingestion version — the deterministic
#: replacement for the reference's wall-clock ``ingestion_time DEFAULT now()``
#: last-write-wins rule (SURVEY.md §7.5.2).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("operation", T.StringType(), False),
        T.StructField("document_id", T.StringType(), False),
        T.StructField("timestamp", T.StringType()),  # clusterTime analog; dead field
        T.StructField("data", DOCUMENT_SCHEMA),
        T.StructField("version", T.LongType()),
    ]
)

#: Warehouse table (reference clickhouse/init.sql:8-24). ``original_timestamp``
#: is a formatted string by reference design (init.sql:11, load_data.py:35-37).
WAREHOUSE_SCHEMA = T.StructType(
    [
        T.StructField("original_id", T.StringType(), False),
        T.StructField("original_timestamp", T.StringType()),
        T.StructField("video_id", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("watched_seconds", T.LongType()),
        T.StructField("video_duration_seconds", T.LongType()),
        T.StructField("watched_ratio", T.DoubleType()),
        T.StructField("device_type", T.StringType()),
        T.StructField("quality", T.StringType()),
        T.StructField("is_deleted", T.BooleanType()),
        T.StructField("version", T.LongType()),
        T.StructField("ingestion_time", T.TimestampType()),
    ]
)

#: Dedup key of the warehouse: ORDER BY (original_id, video_id, session_id)
#: on a ReplacingMergeTree (reference clickhouse/init.sql:22-24).
DEDUP_KEY = ["original_id", "video_id", "session_id"]

TESTDATA_TABLES = [
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
]
