"""Envelope parsing, flattening, routing, and warehouse shaping.

Covers the reference operators (SURVEY.md §2.2):
- T1 JSON decode             (consumer/consumer.py:26-27)      -> parse_envelope
- T2 flatten/projection      (consumer/DoFns/modify_structure.py:3-21) -> modify_structure
- T3 op-type routing         (consumer/DoFns/load_data.py:22-25)       -> route_ops
- T4 timestamp reformat      (consumer/DoFns/load_data.py:35-37)       -> format_original_timestamp
- T5 constant is_deleted     (consumer/DoFns/load_data.py:49)          -> to_warehouse_row
- T6 sink-side ingestion_time default (clickhouse/init.sql:19)         -> to_warehouse_row
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.schemas import ENVELOPE_SCHEMA


def parse_envelope(
    raw: DataFrame,
    json_col: str = "value",
    required: tuple[str, ...] = ("operation", "document_id", "version"),
) -> DataFrame:
    """Decode JSON envelope text -> typed columns (reference T1).

    PERMISSIVE mode + a ``_corrupt`` flag replaces the reference's
    nack+requeue loop for undecodable messages (SURVEY.md §2.8-X5): corrupt
    records are quarantined by the caller, not retried forever. ``_raw``
    carries the original message text for corrupt rows (NULL otherwise) so
    the quarantine retains something inspectable/replayable, not just a
    row of NULLs.

    ``required`` extends the contract to SCHEMA-VALID-BUT-UNUSABLE
    messages: valid JSON missing (or failing to type-coerce) any of the
    required envelope fields also quarantines, with the original text
    preserved. The reference crashes on these (``message['document_id']``
    KeyError -> nack/requeue forever, consumer/consumer.py:30-38);
    silently ingesting them instead would produce NULL-keyed warehouse
    rows that all collapse onto one dedup group — neither is acceptable.
    Pass ``required=()`` for raw pass-through parsing.
    """
    import pyspark.sql.types as T

    parse_schema = T.StructType(
        list(ENVELOPE_SCHEMA.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = raw.withColumn(
        "_parsed",
        F.from_json(
            F.col(json_col),
            parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    bad = F.col("_parsed._corrupt_record").isNotNull()
    for c in required:
        bad = bad | F.col(f"_parsed.{c}").isNull()
    return parsed.select(
        *[F.col(f"_parsed.{f.name}") for f in ENVELOPE_SCHEMA.fields],
        bad.alias("_corrupt"),
        F.when(
            bad,
            F.coalesce(F.col("_parsed._corrupt_record"), F.col(json_col)),
        ).alias("_raw"),
    )


def modify_structure(envelopes: DataFrame) -> DataFrame:
    """Flatten envelope -> 9-field record (reference T2).

    Projects document_id from the envelope and 8 fields from ``data``;
    missing fields surface as NULL (the reference's ``.get() -> None``).
    Rows with data IS NULL (deletes) are dropped — the reference DoFn raises
    on them and swallows the error, emitting nothing (SURVEY.md §7.5.1).
    The envelope-level clusterTime ``timestamp`` is dead data and is not
    propagated (SURVEY.md §7.5.7).
    """
    data_fields = {f.name for f in envelopes.schema["data"].dataType.fields}
    ratio = (
        F.col("data.watched_ratio")
        if "watched_ratio" in data_fields
        else F.lit(None).cast("double")
    )
    return envelopes.filter(F.col("data").isNotNull()).select(
        F.col("document_id"),
        F.col("data.video_id").alias("video_id"),
        F.col("data.session_id").alias("session_id"),
        F.col("data.watched_seconds").alias("watched_seconds"),
        F.col("data.video_duration_seconds").alias("video_duration_seconds"),
        ratio.alias("watched_ratio"),
        F.col("data.device_type").alias("device_type"),
        F.col("data.quality").alias("quality"),
        F.col("data.timestamp").alias("timestamp"),
        F.col("operation"),
        F.col("version"),
    )


def route_ops(flat: DataFrame, ops: tuple[str, ...] = ("insert", "update")) -> DataFrame:
    """Pass insert/update to the sink, drop everything else (reference T3)."""
    return flat.filter(F.col("operation").isin(*ops))


def format_original_timestamp(ts: Column) -> Column:
    """ISO-8601 '...Z' string -> 'yyyy-MM-dd HH:mm:ss' string (reference T4).

    Sub-second precision and the zone marker are dropped by reference design;
    wall-clock stays UTC (load_data.py:35-37).
    """
    return F.date_format(F.to_timestamp(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"), "yyyy-MM-dd HH:mm:ss")


def to_warehouse_row(routed: DataFrame, with_ingestion_time: bool = True) -> DataFrame:
    """Shape the routed flat record into the warehouse schema (reference S5).

    ``ingestion_time`` reproduces the sink-side DEFAULT now() (T6) and is
    optional because it is wall-clock (excluded from deterministic oracle
    comparisons; ``version`` is the deterministic ordering column).
    """
    cols = [
        F.col("document_id").alias("original_id"),
        format_original_timestamp(F.col("timestamp")).alias("original_timestamp"),
        F.col("video_id"),
        F.col("session_id"),
        F.col("watched_seconds"),
        F.col("video_duration_seconds"),
        F.col("watched_ratio"),
        F.col("device_type"),
        F.col("quality"),
        F.lit(False).alias("is_deleted"),
        F.col("version"),
    ]
    if with_ingestion_time:
        cols.append(F.current_timestamp().alias("ingestion_time"))
    return routed.select(*cols)


def to_tombstone_row(envelopes: DataFrame, with_ingestion_time: bool = True) -> DataFrame:
    """Delete envelopes -> soft-delete tombstone rows (reference M5).

    The reference left this path a commented-out stub
    (consumer/DoFns/load_data.py:68-101); this implements exactly what the
    stub describes: a NEW warehouse row for the document with
    ``is_deleted=True``. It takes ENVELOPE rows (not the flattened record)
    because the T2 flatten drops data-less deletes for parity. Delete
    envelopes carry ``data=None`` (producer.py:61), so payload fields are
    NULL and — following the stub's ``element.get('video_id', '')``
    defaults — the string key columns are empty strings.
    """
    cols = [
        F.col("document_id").alias("original_id"),
        F.lit(None).cast("string").alias("original_timestamp"),
        F.coalesce(F.col("data.video_id"), F.lit("")).alias("video_id"),
        F.coalesce(F.col("data.session_id"), F.lit("")).alias("session_id"),
        F.col("data.watched_seconds").alias("watched_seconds"),
        F.col("data.video_duration_seconds").alias("video_duration_seconds"),
        F.lit(None).cast("double").alias("watched_ratio"),
        F.coalesce(F.col("data.device_type"), F.lit("")).alias("device_type"),
        F.coalesce(F.col("data.quality"), F.lit("")).alias("quality"),
        F.lit(True).alias("is_deleted"),
        F.col("version"),
    ]
    if with_ingestion_time:
        cols.append(F.current_timestamp().alias("ingestion_time"))
    return envelopes.filter(F.col("operation") == "delete").select(*cols)
