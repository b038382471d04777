"""Simulate the external driver: fresh SparkSession, __spark_entry__ contract,
full oracle sweep at sf0.01 with order-insensitive exact compare.

    python tools/driver_sim.py [sf_dir] [query ...] [--out FILE]

With ``--out`` the FULL-catalog result is also written in the driver's
CORRECTNESS_r{N}.json schema (rows/schema/hash per query), so the local
gate is an auditable committed artifact, not just a green terminal.
"""

from __future__ import annotations

import json
import math
import os
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
        # scale-ladder tables (tools/make_scale_data.py) are DIRECTORIES
        # of per-replica part files; the driver's are single files
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    q, o = e.queries(), e.oracle_sql()
    args = sys.argv[2:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    only = [a for a in args if a]
    if only:
        q = {k: v for k, v in q.items() if k in only}
        o = {k: v for k, v in o.items() if k in only}
    failures = []
    results: dict[str, dict] = {}
    for name in sorted(o):
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            got = q[name](spark, SF_DIR).toPandas()
            want = con.execute(o[name]).df()
            rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
            rec["rows_match"] = len(got) == len(want)
            rec["schema_match"] = sorted(got.columns) == sorted(want.columns)
            err = same(got, want)
            rec["hash_match"] = err is None
        except Exception as ex:  # noqa: BLE001
            err = f"exception: {ex}"
            rec["err"] = err
        results[name] = rec
        if err:
            failures.append((name, err))
            print(f"FAIL {name}: {err}", flush=True)
        else:
            print(f"ok   {name}", flush=True)
    no_oracle = sorted(set(q) - set(o))
    for name in no_oracle:
        n = q[name](spark, SF_DIR).count()
        results[name] = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": n, "oracle_rows": None, "err": None,
            "rows_only": True,
        }
        print(f"rows-only {name}: {n} rows", flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {out_path} ({len(results)} queries)", flush=True)
    print(f"\n{len(o) - len(failures)}/{len(o)} oracle-checked pass; "
          f"{len(no_oracle)} rows-only", flush=True)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
