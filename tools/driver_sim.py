"""Simulate the external driver: fresh SparkSession, __spark_entry__ contract,
full oracle sweep at sf0.01 with order-insensitive exact compare.

    python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def same(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    a, b = norm(a), norm(b)
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist())):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn or yn or x != y:
                return f"{c}[{i}]: {x!r} != {y!r}"
    return None


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("driver-sim")
        .getOrCreate()
    )
    df = e.entry(spark)
    rows = df.count()
    print(f"entry: {rows} rows, schema={df.schema.simpleString()[:120]}", flush=True)
    assert rows >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    q, o = e.queries(), e.oracle_sql()
    only = [a for a in sys.argv[2:] if a]
    if only:
        q = {k: v for k, v in q.items() if k in only}
        o = {k: v for k, v in o.items() if k in only}
    failures = []
    for name in sorted(o):
        try:
            got = q[name](spark, SF_DIR).toPandas()
            want = con.execute(o[name]).df()
            err = same(got, want)
        except Exception as ex:  # noqa: BLE001
            err = f"exception: {ex}"
        if err:
            failures.append((name, err))
            print(f"FAIL {name}: {err}", flush=True)
        else:
            print(f"ok   {name}", flush=True)
    no_oracle = sorted(set(q) - set(o))
    for name in no_oracle:
        n = q[name](spark, SF_DIR).count()
        print(f"rows-only {name}: {n} rows", flush=True)
    print(f"\n{len(o) - len(failures)}/{len(o)} oracle-checked pass; "
          f"{len(no_oracle)} rows-only", flush=True)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
