"""The workload generator as a FIRST-CLASS Spark data source (Spark 4
Python DataSource API).

The reference's producer is a standalone Python process emitting a
weighted insert/update/delete stream of video-watch envelopes over a
queue (reference producer/db/data_simulation.py:80-94 + producer/
producer.py:48-73). Spark-first, that generator belongs INSIDE the
engine's source surface: ``spark.read.format("cdcgen")`` for bounded
backfills and ``spark.readStream.format("cdcgen")`` for a continuous
feed — no external process, no queue, offsets checkpointed like any
other streaming source (S4's in-memory source and S6's generator in one
plug-in).

Faithfulness: the same 50/30/20 operation mix, nullable watched/duration
fields, and repeating dedup keys as ``sources/cdc.py`` — all pure
integer arithmetic on the sequence number, so a DuckDB oracle rebuilds
the identical stream from ``range(n)`` (``CDCGEN_ORACLE_CTE``) and the
full pipeline over this source stays hash-checkable.

Python-worker note: rows here are SYNTHESIZED in Python because the
generator itself is the workload (the reference's is a Python process
too); real ingest paths stay on JVM sources (parquet/Kafka). The
partition plan still parallelizes: N range-partitions spread across
executors, each emitting its slice independently.

Options: ``n`` total messages (batch; default 1000), ``numPartitions``
(default 8), ``rowsPerBatch`` per micro-batch (streaming; default 100).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: keys repeat across messages so last-write-wins dedup has real work
_USERS = 101


def synth_envelope_json(i: int) -> str:
    """Message ``i`` of the deterministic stream, as the BSON-extended-ish
    JSON text the reference producer publishes. Pure function of ``i`` —
    the integer twin of sources/cdc.py's event-derived stream, rebuilt
    verbatim by ``CDCGEN_ORACLE_CTE``."""
    op = "insert" if i % 10 < 5 else ("update" if i % 10 < 8 else "delete")
    user = (i * 31) % _USERS
    data = None
    if op != "delete":
        watched = None if i % 97 == 0 else (i * 7919) % 3600
        duration = (
            None
            if i % 89 == 3
            else (0 if i % 83 == 7 else 61 + 2 * ((i * 104729) % 1770))
        )
        # deterministic event time: one message per second from the epoch
        # day the reference's simulation starts at
        ts = i
        data = {
            "video_id": f"video_{10000 + (user * 37) % 90000}",
            "session_id": f"session_{100000 + (user * 101) % 900000}",
            "watched_seconds": watched,
            "video_duration_seconds": duration,
            "timestamp": (
                f"2024-01-01T{ts // 3600 % 24:02d}:{ts // 60 % 60:02d}:{ts % 60:02d}Z"
            ),
            "device_type": ["mobile", "desktop", "tablet", "tv"][user % 4],
            "quality": ["240p", "360p", "480p", "720p", "1080p"][i % 5],
        }
    return json.dumps(
        {
            "operation": op,
            "document_id": f"doc_{user}",
            "timestamp": "ct",
            "data": data,
            "version": i,
        }
    )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = int(start)
        self.end = int(end)


def _slices(start: int, end: int, num_partitions: int) -> list[_Slice]:
    n = max(0, end - start)
    if n == 0:
        return [_Slice(start, start)]
    p = max(1, min(num_partitions, n))
    step = -(-n // p)
    return [
        _Slice(s, min(end, s + step)) for s in range(start, end, step)
    ]


class CdcGenBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        return _slices(0, self.n, self.num_partitions)

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield (synth_envelope_json(i),)


class CdcGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched generator: the offset IS the sequence number.

    Uses the SIMPLE stream-reader contract (``read(start) -> (rows,
    nextOffset)``): Spark hands every call the COMMITTED start offset, so
    a restarted query resumes exactly past what it already ingested by
    construction — no in-memory counter that could regress the offset and
    re-emit the committed prefix (the failure mode of a stateful
    ``latestOffset`` counter on a fresh reader instance).
    ``readBetweenOffsets`` replays any (start, end) range for recovery —
    trivially exact here because the stream is a pure function of the
    sequence number."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start: dict):
        s = int(start["i"])
        e = s + self.rows_per_batch
        return iter([(synth_envelope_json(i),) for i in range(s, e)]), {"i": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        for i in range(int(start["i"]), int(end["i"])):
            yield (synth_envelope_json(i),)

    def commit(self, end: dict) -> None:
        pass


class CdcGenDataSource(DataSource):
    """``spark.dataSource.register(CdcGenDataSource)`` then
    ``spark.read.format("cdcgen").option("n", 5000).load()`` (or
    ``readStream``). Schema: one ``value string`` column of envelope
    JSON — byte-compatible with the text/Kafka decode path
    (operators/structure.py:parse_envelope)."""

    @classmethod
    def name(cls) -> str:
        return "cdcgen"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> CdcGenBatchReader:
        return CdcGenBatchReader(self.options)

    def simpleStreamReader(self, schema) -> CdcGenStreamReader:
        return CdcGenStreamReader(self.options)


def register_cdcgen(spark) -> None:
    """Idempotent registration of the ``cdcgen`` format on a session."""
    spark.dataSource.register(CdcGenDataSource)


#: DuckDB CTE rebuilding the identical FLAT stream from range(n): the
#: oracle twin of synth_envelope_json after parse_envelope's flatten.
#: Delete messages carry NULL data fields (is_delete routes them).
CDCGEN_ORACLE_CTE = """
gen AS (
  SELECT
    CASE WHEN i % 10 < 5 THEN 'insert'
         WHEN i % 10 < 8 THEN 'update'
         ELSE 'delete' END AS operation,
    'doc_' || CAST((i * 31) % 101 AS VARCHAR) AS document_id,
    CAST(i AS BIGINT) AS version,
    (i % 10 >= 8) AS is_delete,
    'video_' || CAST(10000 + (((i * 31) % 101) * 37) % 90000 AS VARCHAR)
        AS video_id,
    'session_' || CAST(100000 + (((i * 31) % 101) * 101) % 900000 AS VARCHAR)
        AS session_id,
    CAST(CASE WHEN i % 97 = 0 THEN NULL
              ELSE (i * 7919) % 3600 END AS BIGINT) AS watched_seconds,
    CAST(CASE WHEN i % 89 = 3 THEN NULL
              WHEN i % 83 = 7 THEN 0
              ELSE 61 + 2 * ((i * 104729) % 1770) END AS BIGINT)
        AS video_duration_seconds,
    '2024-01-01 ' ||
    lpad(CAST((i // 3600) % 24 AS VARCHAR), 2, '0') || ':' ||
    lpad(CAST((i // 60) % 60 AS VARCHAR), 2, '0') || ':' ||
    lpad(CAST(i % 60 AS VARCHAR), 2, '0') AS data_ts,
    CASE ((i * 31) % 101) % 4 WHEN 0 THEN 'mobile' WHEN 1 THEN 'desktop'
         WHEN 2 THEN 'tablet' ELSE 'tv' END AS device_type,
    CASE i % 5 WHEN 0 THEN '240p' WHEN 1 THEN '360p' WHEN 2 THEN '480p'
         WHEN 3 THEN '720p' ELSE '1080p' END AS quality
  FROM range(__N__) t(i)
)
"""
