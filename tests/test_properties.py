"""Property-based tests (hypothesis) for the semantics ledger.

The reference has no tests at all (SURVEY.md §5.1); these pin the engine's
load-bearing scalar semantics against independent Python models across the
whole input space, not just the fixture values:

- round_half_up == the documented floor(x*10^s + 0.5)/10^s IEEE formula
- watched_ratio == the reference F1 decision table (missing->0/1, d<=0 -> 0)
- latest_per_key is invariant under input permutation (the README's
  "order doesn't matter" contract, README:223)

Each hypothesis example batches many values into ONE DataFrame so the
property runs at Spark speed, not job-per-example speed.
"""

from __future__ import annotations

import pytest

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.functions.rounding import round_half_up
from etl_pipeline_challenge_aladia_spark.operators.dedup import latest_per_key
from etl_pipeline_challenge_aladia_spark.operators.enrich import watched_ratio_col

finite_doubles = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def model_round_half_up(x: float, scale: int) -> float:
    factor = float(10**scale)
    return math.floor(x * factor + 0.5) / factor


def model_watched_ratio(watched, duration) -> float:
    w = 0 if watched is None else watched
    d = 1 if duration is None else duration
    raw = w / d if d > 0 else 0.0
    return model_round_half_up(raw, 4)


@settings(max_examples=20, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=50), st.integers(0, 6))
@pytest.mark.slow  # measured heavy in the full --durations run (see pytest.ini)
def test_round_half_up_matches_ieee_model(spark, values, scale):
    df = spark.createDataFrame([(v,) for v in values], "x double").coalesce(1)
    got = [r[0] for r in df.select(round_half_up(F.col("x"), scale)).collect()]
    want = [model_round_half_up(v, scale) for v in values]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 10_000)),
            st.one_of(st.none(), st.integers(-10, 10_000)),
        ),
        min_size=1,
        max_size=50,
    )
)
@pytest.mark.slow  # measured heavy in the full --durations run (see pytest.ini)
def test_watched_ratio_matches_reference_decision_table(spark, rows):
    df = spark.createDataFrame(rows, "watched long, duration long").coalesce(1)
    got = [
        r[0]
        for r in df.select(
            watched_ratio_col(F.col("watched"), F.col("duration"))
        ).collect()
    ]
    want = [model_watched_ratio(w, d) for w, d in rows]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1_000_000)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],  # version is the engine's monotonic unique id
    ),
    st.randoms(),
)
@pytest.mark.slow  # measured heavy in the full --durations run (see pytest.ini)
def test_latest_per_key_order_invariant(spark, rows, rnd):
    """Same multiset of (key, version) rows in any arrival order -> same
    deduped state: max version per key."""
    shuffled = list(rows)
    rnd.shuffle(shuffled)

    def dedup_state(data):
        df = spark.createDataFrame(
            [(f"k{k}", f"v{k}", "s", v) for k, v in data],
            "original_id string, video_id string, session_id string, version long",
        ).coalesce(2)
        return {
            (r["original_id"], r["version"])
            for r in latest_per_key(df).collect()
        }

    want = {
        (f"k{k}", max(v for kk, v in rows if kk == k))
        for k, _ in rows
    }
    assert dedup_state(rows) == dedup_state(shuffled) == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(finite_doubles, min_size=1, max_size=60),
    st.integers(2, 16),
)
def test_histogram_partitions_rows_exactly(spark, values, n_bins):
    """Histogram bins partition the input: counts sum to n, every count
    positive, bins within range, and a Python model agrees per bin."""
    from pyspark.sql import Row

    from etl_pipeline_challenge_aladia_spark.operators.quality_checks import (
        fixed_width_histogram,
    )

    df = spark.createDataFrame([Row(value=float(v)) for v in values])
    rows = fixed_width_histogram(df, "value", n_bins=n_bins).collect()
    assert sum(r["n_rows"] for r in rows) == len(values)
    assert all(0 <= r["bin"] < n_bins for r in rows)
    mn, mx = min(values), max(values)
    model: dict[int, int] = {}
    for v in values:
        b = 0 if mx == mn else min(int((v - mn) / ((mx - mn) / n_bins)), n_bins - 1)
        model[b] = model.get(b, 0) + 1
    assert {r["bin"]: r["n_rows"] for r in rows} == model


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),  # (user, second offset)
        min_size=1,
        max_size=40,
    ),
    st.integers(1, 120),
)
def test_debounce_matches_lag_model(spark, events, gap_s):
    """debounce_stats == the previous-RAW-event lag model: per (user, type)
    stream ordered by (ts, id), an event is kept iff first or >= gap after
    its predecessor."""
    import datetime as dt

    from pyspark.sql import Row

    from etl_pipeline_challenge_aladia_spark.operators.funnel import debounce_stats

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(
            event_id=i,
            user_id=u,
            event_type="e",
            ts=t0 + dt.timedelta(seconds=s),
        )
        for i, (u, s) in enumerate(events)
    ]
    got = debounce_stats(spark.createDataFrame(rows), gap_s).collect()[0]

    per_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, s) in enumerate(events):
        per_user.setdefault(u, []).append((s, i))
    kept = 0
    for stream in per_user.values():
        stream.sort()
        prev = None
        for s, _ in stream:
            if prev is None or s - prev >= gap_s:
                kept += 1
            prev = s
    assert got["n_total"] == len(events)
    assert got["n_kept"] == kept


@settings(max_examples=10, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
                 max_size=40, unique=True),
    rate=st.floats(min_value=0.0, max_value=3.5, allow_nan=False),
)
def test_upsample_by_rate_matches_python_model(spark, ids, rate):
    """upsample_by_rate == the per-row Python model: floor(rate) copies
    plus one iff md5-bucket(id) < round(frac*1000), epochs 0..n-1."""
    import hashlib

    from pyspark.sql import Row

    from etl_pipeline_challenge_aladia_spark.operators.sampling import (
        upsample_by_rate,
    )

    df = spark.createDataFrame([Row(g="x", doc_id=i) for i in ids])
    got = sorted(
        (r["doc_id"], r["epoch"])
        for r in upsample_by_rate(df, "g", {"x": rate}, "doc_id").collect()
    )

    whole, frac_cut = int(rate), int(round((rate - int(rate)) * 1000))
    want = []
    for i in ids:
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000
        n = whole + (1 if bucket < frac_cut else 0)
        want.extend((i, e) for e in range(n))
    assert got == sorted(want)


@settings(max_examples=10, deadline=None)
@given(
    v1=st.dictionaries(st.integers(min_value=0, max_value=50),
                       st.integers(min_value=0, max_value=3), max_size=25),
    v2=st.dictionaries(st.integers(min_value=0, max_value=50),
                       st.integers(min_value=0, max_value=3), max_size=25),
)
def test_snapshot_diff_matches_set_model(spark, v1, v2):
    """snapshot_diff == the obvious set model over (id -> fingerprint)."""
    from pyspark.sql import Row

    from etl_pipeline_challenge_aladia_spark.operators.dedup import snapshot_diff

    def frame(d):
        rows = [Row(doc_id=k, fingerprint=v) for k, v in d.items()]
        return spark.createDataFrame(
            rows, "doc_id long, fingerprint long"
        ) if rows else spark.createDataFrame([], "doc_id long, fingerprint long")

    got = {
        r["id"]: r["status"]
        for r in snapshot_diff(frame(v1), frame(v2)).collect()
    }
    want = {}
    for k in set(v1) | set(v2):
        if k not in v1:
            want[k] = "added"
        elif k not in v2:
            want[k] = "removed"
        elif v1[k] != v2[k]:
            want[k] = "changed"
        else:
            want[k] = "unchanged"
    assert got == want


vec_doubles = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False
)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(1, 24).flatmap(
        lambda d: st.lists(
            st.tuples(
                st.lists(vec_doubles, min_size=d, max_size=d),
                st.lists(vec_doubles, min_size=d, max_size=d),
            ),
            min_size=1,
            max_size=12,
        )
    )
)
@pytest.mark.slow  # measured heavy in the full --durations run (see pytest.ini)
def test_unrolled_vector_ops_bit_equal_fold_property(spark, rows):
    """dot/norm/cosine with static ``dim`` unrolling must be BIT-equal to
    the higher-order-fold defaults for any dim and any finite vectors —
    the equality the vectors.py docstring promises (same left-to-right
    summation order; the fold's leading ``0.0 +`` is an IEEE identity)."""
    from etl_pipeline_challenge_aladia_spark.functions.vectors import (
        cosine_similarity_col,
        dot_col,
        norm_col,
    )

    dim = len(rows[0][0])
    df = spark.createDataFrame(rows, "a array<double>, b array<double>").coalesce(1)
    a, b = F.col("a"), F.col("b")
    mism = df.select(
        (dot_col(a, b) != dot_col(a, b, dim)).alias("d"),
        (norm_col(a) != norm_col(a, dim)).alias("n"),
        (cosine_similarity_col(a, b) != cosine_similarity_col(a, b, dim)).alias("c"),
    ).filter("d or n or c")
    assert mism.count() == 0


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(vec_doubles, min_size=1, max_size=24),
        min_size=1,
        max_size=12,
    )
)
@pytest.mark.slow  # measured heavy in the full --durations run (see pytest.ini)
def test_int8_quantize_let_bound_matches_model(spark, vectors):
    """The let-bound int8 quantize/error kernels (functions/vectors.py
    let_col — amax evaluated once per row, not once per element) must
    match the plain float model exactly: q = clamp(floor(v/scale+0.5)),
    err = mean |v - q*scale|; all-zero vectors -> zeros / 0.0."""
    from etl_pipeline_challenge_aladia_spark.functions.vectors import (
        int8_quant_error_col,
        int8_quantize_col,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vectors)], "id long, e array<double>"
    ).coalesce(1)
    got = {
        r["id"]: (list(r["q"]), r["err"])
        for r in df.select(
            "id",
            int8_quantize_col(F.col("e")).alias("q"),
            int8_quant_error_col(F.col("e")).alias("err"),
        ).collect()
    }
    for i, v in enumerate(vectors):
        amax = max(abs(x) for x in v)
        scale = amax / 127.0
        if scale == 0:
            # all-zero OR amax below int8 resolution (scale underflows):
            # the kernel quantizes to zeros instead of dividing by zero
            assert got[i] == ([0] * len(v), 0.0)
            continue
        q = [int(max(-127, min(127, math.floor(x / scale + 0.5)))) for x in v]
        err = math.fsum(abs(x - qi * scale) for x, qi in zip(v, q))
        assert got[i][0] == q
        # Spark's fold sums left-to-right; fsum is exact — allow 1 ulp-ish
        assert abs(got[i][1] - err / len(v)) < 1e-9
    # reconstruction-error sanity: always within half a quantization step
    for i, v in enumerate(vectors):
        amax = max(abs(x) for x in v)
        assert got[i][1] <= amax / 127.0 * 0.5 + 1e-12
