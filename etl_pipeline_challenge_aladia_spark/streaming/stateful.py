"""Custom stateful streaming operator: last-write-wins keyed state.

The reference's warehouse semantics — ReplacingMergeTree keeping the
last-inserted row per (original_id, video_id, session_id)
(reference clickhouse/init.sql:22-24, README.md:281) — expressed as a
*stateful streaming operator*: the state store holds the current winner
per key, each micro-batch emits only keys whose winner changed. This is
the ``applyInPandasWithState`` pattern the engine offers for stateful
logic the built-in operators can't express (the windowed/session aggs in
streaming/windows.py stay built-in).

Arrow moves each group's rows as pandas batches — vectorized, not
row-at-a-time; state is one tiny tuple per key. At 100 TB the state store
shards by key across executors (HDFS/RocksDB-backed), so memory is bounded
by live keys per executor, not stream length.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Streamed-in shape: the flat warehouse row (pre-dedup) + version.
LATEST_STATE_OUTPUT = StructType(
    [
        StructField("original_id", StringType()),
        StructField("video_id", StringType()),
        StructField("session_id", StringType()),
        StructField("watched_seconds", LongType()),
        StructField("version", LongType()),
    ]
)

#: State per key: the winning version and its payload column.
LATEST_STATE_SCHEMA = StructType(
    [
        StructField("version", LongType()),
        StructField("watched_seconds", LongType()),
    ]
)


def _latest_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    best_version, best_watched = state.get if state.exists else (None, None)
    changed = False
    for pdf in pdfs:
        if pdf.empty:
            continue
        idx = pdf["version"].idxmax()
        v = int(pdf.loc[idx, "version"])
        if best_version is None or v > best_version:
            best_version = v
            w = pdf.loc[idx, "watched_seconds"]
            best_watched = None if pd.isna(w) else int(w)
            changed = True
    if changed:
        state.update((best_version, best_watched))
        yield pd.DataFrame(
            {
                "original_id": [key[0]],
                "video_id": [key[1]],
                "session_id": [key[2]],
                "watched_seconds": [best_watched],
                "version": [best_version],
            }
        )


def latest_state_stream(flat_rows: DataFrame) -> DataFrame:
    """Streaming last-write-wins per dedup key; emits changed keys only.

    Input: flat insert/update rows with (original_id, video_id, session_id,
    watched_seconds, version). Output mode must be ``update``.
    """
    return (
        flat_rows.select(
            "original_id", "video_id", "session_id", "watched_seconds", "version"
        )
        .groupBy("original_id", "video_id", "session_id")
        .applyInPandasWithState(
            _latest_state_fn,
            outputStructType=LATEST_STATE_OUTPUT,
            stateStructType=LATEST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


#: Debounce output: the kept (burst-opening) events.
DEBOUNCE_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("us", LongType()),
    ]
)

#: State per (user, type): timestamp of the last KEPT event.
DEBOUNCE_STATE_SCHEMA = StructType([StructField("last_kept_us", LongType())])


def _debounce_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last_kept,) = state.get if state.exists else (None,)
        kept_ids, kept_us = [], []
        # A group's rows may arrive as MULTIPLE Arrow chunks with no global
        # order guarantee (chunk size = spark.sql.execution.arrow
        # .maxRecordsPerBatch). The keep/drop decision is order-dependent,
        # so materialize every chunk and sort ONCE before iterating.
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["us", "event_id"]
            )
            for eid, us in zip(
                pdf["event_id"].to_numpy(), pdf["us"].to_numpy()
            ):
                us = int(us)
                if last_kept is None or us - last_kept >= gap_us:
                    kept_ids.append(int(eid))
                    kept_us.append(us)
                    last_kept = us
        if kept_ids:
            state.update((last_kept,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(kept_ids),
                    "event_type": [key[1]] * len(kept_ids),
                    "event_id": kept_ids,
                    "us": kept_us,
                }
            )

    return fn


def debounce_stream(events: DataFrame, gap_seconds: int = 60) -> DataFrame:
    """TRUE debounce as a stateful streaming operator: an event is kept iff
    it arrives >= ``gap_seconds`` after the last KEPT event of its
    (user, type) stream — chained-burst suppression that the batch lag
    window (operators/funnel.py:debounce_stats, previous-RAW-event rule)
    deliberately does not express: a declarative lag can't reference its
    own output, but one long per key of streaming state can.

    Input: rows with (user_id, event_type, event_id, us — microseconds).
    Emits kept events; output mode ``append``/``update``. State is ONE
    int64 per live (user, type) key, sharded across executors by the
    group-by — bounded by live keys, not stream length.
    """
    return events.select("user_id", "event_type", "event_id", "us").groupBy(
        "user_id", "event_type"
    ).applyInPandasWithState(
        _debounce_fn(gap_seconds * 1_000_000),
        outputStructType=DEBOUNCE_OUTPUT,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
