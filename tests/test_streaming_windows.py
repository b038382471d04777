"""Event-time streaming operators: watermark windows, session windows, and
the custom stateful last-write-wins operator.

Each streaming result is cross-checked against the equivalent batch
computation on identical input (Spark's unified API makes the windowed aggs
runnable in both modes; the stateful op is checked against latest_per_key).
"""

from __future__ import annotations

import json
import os

import pytest

from tests.test_streaming import envelope, write_lines


@pytest.fixture()
def dirs(tmp_path):
    return {"in": str(tmp_path / "in"), "ckpt": str(tmp_path / "ckpt")}


def _stream_envelopes(spark, input_dir):
    from etl_pipeline_challenge_aladia_spark.streaming.pipeline import (
        streaming_envelopes_from_json,
    )

    env = streaming_envelopes_from_json(spark, input_dir)
    return env.filter(~env["_corrupt"]).drop("_corrupt")


def _run_to_memory(df, name, ckpt, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def ts_envelope(op, doc, version, ts, watched=30, duration=60, video="v1", session="s1"):
    data = None
    if op != "delete":
        data = {
            "video_id": video,
            "session_id": session,
            "watched_seconds": watched,
            "video_duration_seconds": duration,
            "timestamp": ts,
            "device_type": "mobile",
            "quality": "720p",
        }
    return json.dumps(
        {"operation": op, "document_id": doc, "timestamp": "ct", "data": data, "version": version}
    )


def test_windowed_device_stats_matches_batch(spark, dirs):
    from etl_pipeline_challenge_aladia_spark.operators.structure import parse_envelope
    from etl_pipeline_challenge_aladia_spark.streaming.windows import (
        windowed_device_stats,
    )

    lines = [
        ts_envelope("insert", "d1", 1, "2024-01-01T10:05:00Z", watched=30),
        ts_envelope("insert", "d2", 2, "2024-01-01T10:55:00Z", watched=60),
        ts_envelope("update", "d1", 3, "2024-01-01T11:05:00Z", watched=45),
        ts_envelope("delete", "d1", 4, None),  # dropped by op routing
    ]
    write_lines(os.path.join(dirs["in"], "batch0.jsonl"), lines)

    streamed = windowed_device_stats(_stream_envelopes(spark, dirs["in"]))
    # update mode: emit window states each batch; append would hold results
    # until the watermark passes window end (never, in a single replay)
    _run_to_memory(streamed, "win_stats", dirs["ckpt"], mode="update")
    got = {
        (str(r["window_start"]), r["device_type"]): (r["n_events"], r["max_watched"])
        for r in spark.table("win_stats").collect()
    }

    # batch cross-check on identical rows via the same function
    raw = spark.createDataFrame([(l,) for l in lines], ["value"])
    env = parse_envelope(raw)
    batch = windowed_device_stats(env.filter(~env["_corrupt"]).drop("_corrupt"))
    want = {
        (str(r["window_start"]), r["device_type"]): (r["n_events"], r["max_watched"])
        for r in batch.collect()
    }
    assert got == want
    assert got[("2024-01-01 10:00:00", "mobile")] == (2, 60)
    assert got[("2024-01-01 11:00:00", "mobile")] == (1, 45)


def test_session_window_stats_matches_batch_sessionization(spark, dirs):
    from etl_pipeline_challenge_aladia_spark.sources.files import load_table
    from etl_pipeline_challenge_aladia_spark.streaming.windows import (
        session_window_stats,
    )
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    got = (
        session_window_stats(ev)
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n_sessions")
    )
    want = (
        CATALOG["events_sessionization"]
        .spark(spark, "/root/testdata/sf0.001")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n_sessions")
    )
    diff = got.join(want, "user_id").filter(got["n_sessions"] != want["n_sessions"])
    assert diff.count() == 0
    assert got.count() == want.count() > 0


def test_latest_state_stream_emits_changed_keys(spark, dirs):
    from etl_pipeline_challenge_aladia_spark.pipeline import envelopes_to_warehouse
    from etl_pipeline_challenge_aladia_spark.streaming.stateful import (
        latest_state_stream,
    )

    write_lines(
        os.path.join(dirs["in"], "b0.jsonl"),
        [
            envelope("insert", "doc1", 1, watched=10),
            envelope("update", "doc1", 3, watched=30),
            envelope("update", "doc1", 2, watched=20),  # stale: loses to v3
            envelope("insert", "doc2", 5, watched=50),
        ],
    )
    env = _stream_envelopes(spark, dirs["in"])
    flat = envelopes_to_warehouse(env, with_ingestion_time=False)

    # memory sink cannot resume from a checkpoint; collect via foreachBatch
    # so the SAME checkpointed stateful query can continue over new files
    emitted: list = []

    def run_once():
        emitted.clear()
        q = (
            latest_state_stream(flat)
            .writeStream.foreachBatch(
                lambda b, _id: emitted.extend(b.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["original_id"]: (r["watched_seconds"], r["version"]) for r in emitted
        }

    assert run_once() == {"doc1": (30, 3), "doc2": (50, 5)}

    # second delivery: stale + duplicate rows emit nothing; newer row wins
    write_lines(
        os.path.join(dirs["in"], "b1.jsonl"),
        [
            envelope("update", "doc1", 3, watched=30),  # duplicate redelivery
            envelope("update", "doc2", 4, watched=40),  # stale
            envelope("update", "doc2", 6, watched=60),  # winner
        ],
    )
    assert run_once() == {"doc2": (60, 6)}


def test_dedup_stream_drops_redelivery(spark, dirs):
    from etl_pipeline_challenge_aladia_spark.streaming.windows import dedup_stream

    write_lines(
        os.path.join(dirs["in"], "b0.jsonl"),
        [
            ts_envelope("insert", "d1", 1, "2024-01-01T10:00:00Z"),
            ts_envelope("insert", "d1", 1, "2024-01-01T10:00:00Z"),  # exact redelivery
            ts_envelope("update", "d1", 2, "2024-01-01T10:01:00Z"),
        ],
    )
    deduped = dedup_stream(_stream_envelopes(spark, dirs["in"]))
    _run_to_memory(deduped, "dedup_stream_t", dirs["ckpt"])
    rows = spark.table("dedup_stream_t").select("document_id", "version").collect()
    assert sorted((r["document_id"], r["version"]) for r in rows) == [("d1", 1), ("d1", 2)]


def test_stream_stream_join_matches_batch(spark, dirs, tmp_path):
    import json
    import os

    from etl_pipeline_challenge_aladia_spark.streaming.windows import (
        stream_stream_click_purchase_join,
    )

    def ev(event_id, user_id, event_type, ts):
        return json.dumps(
            {"event_id": event_id, "user_id": user_id, "event_type": event_type, "ts": ts}
        )

    lines = [
        ev(1, 7, "click", "2024-01-01 10:00:00"),
        ev(2, 7, "purchase", "2024-01-01 10:05:00"),   # joins click 1
        ev(3, 7, "click", "2024-01-01 10:30:00"),
        ev(4, 7, "purchase", "2024-01-01 10:45:00"),   # outside 10 min: no click
        ev(5, 9, "purchase", "2024-01-01 10:04:00"),   # other user: no click
    ]
    write_lines(os.path.join(dirs["in"], "ev.jsonl"), lines)

    schema = "event_id LONG, user_id LONG, event_type STRING, ts TIMESTAMP"
    stream = spark.readStream.schema(schema).json(dirs["in"])
    joined = stream_stream_click_purchase_join(
        stream.filter("event_type = 'click'"),
        stream.filter("event_type = 'purchase'"),
    )
    _run_to_memory(joined, "ss_join", dirs["ckpt"])
    got = {
        (r["user_id"], r["purchase_id"], r["click_id"])
        for r in spark.table("ss_join").collect()
    }
    assert got == {(7, 2, 1)}


def test_debounce_stream_chained_bursts_across_batches(spark, dirs, tmp_path):
    """True debounce: the keep decision references the last KEPT event, so a
    chain 0s/40s/80s at gap=60 keeps 0 and 80 (batch lag-vs-previous-RAW
    would keep only 0) — and state carries across micro-batches."""
    import pandas as pd

    from etl_pipeline_challenge_aladia_spark.streaming.stateful import debounce_stream

    in_dir = str(tmp_path / "ev_in")
    os.makedirs(in_dir)

    def write_batch(name, rows):
        pd.DataFrame(
            rows, columns=["user_id", "event_type", "event_id", "us"]
        ).to_json(os.path.join(in_dir, name), orient="records", lines=True)

    write_batch(
        "b0.jsonl",
        [
            (1, "click", 1, 0),
            (1, "click", 2, 40_000_000),  # 40s after kept #1 -> dropped
            (1, "click", 3, 80_000_000),  # 80s after kept #1 -> KEPT
        ],
    )

    stream = spark.readStream.schema(
        "user_id long, event_type string, event_id long, us long"
    ).json(in_dir)

    emitted: list = []

    def run_once():
        q = (
            debounce_stream(stream, gap_seconds=60)
            .writeStream.foreachBatch(lambda b, _id: emitted.extend(b.collect()))
            .outputMode("update")
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r["event_id"] for r in emitted)

    assert run_once() == [1, 3]

    # next delivery: 100s is only 20s after kept #3 -> dropped (state
    # survived the restart via the checkpoint); 150s is kept
    write_batch("b1.jsonl", [(1, "click", 4, 100_000_000), (1, "click", 5, 150_000_000)])
    assert run_once() == [1, 3, 5]


def test_debounce_fn_multi_chunk_out_of_order():
    """A group's rows can span MULTIPLE Arrow chunks (maxRecordsPerBatch)
    with no cross-chunk order guarantee. The keep decision is order
    dependent, so _debounce_fn must globally sort before iterating: chunk
    order [80s] then [0s, 40s] must still keep {0s, 80s} at gap=60 (the
    per-chunk-sort bug kept only 80s)."""
    import pandas as pd

    from etl_pipeline_challenge_aladia_spark.streaming.stateful import _debounce_fn

    class _FakeState:
        def __init__(self):
            self._t = None

        @property
        def exists(self):
            return self._t is not None

        @property
        def get(self):
            return self._t

        def update(self, t):
            self._t = t

    def chunk(rows):
        return pd.DataFrame(rows, columns=["user_id", "event_type", "event_id", "us"])

    state = _FakeState()
    out = list(
        _debounce_fn(60 * 1_000_000)(
            (1, "click"),
            iter(
                [
                    chunk([(1, "click", 3, 80_000_000)]),
                    chunk([(1, "click", 1, 0), (1, "click", 2, 40_000_000)]),
                ]
            ),
            state,
        )
    )
    kept = sorted(out[0]["event_id"].tolist())
    assert kept == [1, 3]
    assert state.get == (80_000_000,)
