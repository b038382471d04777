"""Replicates the driver's correctness gate locally: run every catalog query
on Spark AND its DuckDB oracle on the same parquet, then compare exactly
(columns sorted by name, rows sorted by all columns) — any mismatch here
would be a hash mismatch in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG
from etl_pipeline_challenge_aladia_spark.schemas import TESTDATA_TABLES


def oracle_result(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def assert_frames_match(got: pd.DataFrame, want: pd.DataFrame, name: str) -> None:
    got, want = normalize(got), normalize(want)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g.tolist(), w.tolist())):
                an = a is None or (isinstance(a, float) and math.isnan(a))
                bn = b is None or (isinstance(b, float) and math.isnan(b))
                if an and bn:
                    continue
                assert not (an or bn), f"{name}.{c}[{i}]: null mismatch {a} vs {b}"
                assert a == b, f"{name}.{c}[{i}]: {a!r} != {b!r} (diff={a - b!r})"
        else:
            pd.testing.assert_series_equal(g, w, check_names=False, obj=f"{name}.{c}")


ORACLE_QUERIES = sorted(n for n, s in CATALOG.items() if s.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = CATALOG[name]
    got = spec.spark(spark, sf_dir).toPandas()
    want = oracle_result(spec.oracle, sf_dir)
    assert len(want) > 0 or name in ALLOWED_EMPTY, f"{name}: oracle returned 0 rows"
    assert_frames_match(got, want, name)


ALLOWED_EMPTY: set[str] = set()
