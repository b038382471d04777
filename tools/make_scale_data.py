"""Generate a 10x scale ladder rung (sf1.0-equivalent) from the driver's
sf0.1 testdata, WITHOUT touching /root/testdata (read-only).

    python tools/make_scale_data.py [--reps 10] [--out .scaledata/sf1.0]

Replication preserves each table's statistical profile while keeping the
scaled-up semantics honest:

- fact keys are offset per replica (max_key+1 stride), so FK joins stay
  consistent and key cardinalities scale linearly;
- document TEXT is token-prefixed per replica ("x{r}tok"), so the planted
  intra-replica near-dup structure repeats 10x but NO cross-replica
  near-dups appear — dup-cluster sizes stay constant and LSH pair output
  scales linearly, exactly how a 10x-bigger real corpus behaves (naive
  byte-identical replication would grow every dup cluster 10x and force
  quadratic pair blowup, testing the generator, not the engine);
- embeddings get a tiny per-replica component shift (cross-replica vectors
  are near-dups of nothing, cluster geometry repeats);
- dims (region, nation) stay as-is, like real dims at 10x facts.

Each output table is a DIRECTORY of per-replica parquet files (still
loadable as `{dir}/{table}.parquet`), so scans parallelize naturally.
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

#: table -> columns to offset by (replica * (max+1)) keyed by source column
OFFSET_KEYS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_TABLES = ["region", "nation"]


def key_strides() -> dict[str, int]:
    strides: dict[str, int] = {}
    for table, cols in OFFSET_KEYS.items():
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        for col, src_key in cols.items():
            if src_key not in strides and col in t.column_names and src_key == col:
                strides[src_key] = int(pc.max(t[col]).as_py()) + 1
    return strides


def transform_documents(t: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return t
    prefix = f"x{r}"
    texts = [
        " ".join(prefix + tok for tok in s.split(" ")) if s is not None else None
        for s in t["text"].to_pylist()
    ]
    arr = pa.array(texts, type=pa.string())
    n_chars = pa.array(
        [len(s) if s is not None else None for s in texts], type=pa.int64()
    )
    t = t.set_column(t.column_names.index("text"), "text", arr)
    return t.set_column(t.column_names.index("n_chars"), "n_chars", n_chars)


def transform_embeddings(t: pa.Table, r: int) -> pa.Table:
    """Per-replica deterministic sign-flip pattern on the components:
    preserves every norm and all intra-replica geometry (distances between
    same-replica vectors are unchanged up to the common reflection), while
    cross-replica cosines decorrelate — so near-dup/cluster structure
    repeats 10x instead of every vector gaining 9 artificial near-twins
    (a constant shift would leave cross-replica cosine ~= 1 and grow LSH
    buckets 10x, testing the generator, not the engine)."""
    if r == 0:
        return t
    import numpy as np

    col = t["embedding"].combine_chunks()
    vals = col.values.to_numpy(zero_copy_only=False).copy()
    dim = len(vals) // t.num_rows
    rng = np.random.RandomState(1000 + r)
    signs = np.where(rng.rand(dim) < 0.5, -1.0, 1.0).astype("float32")
    vals = (vals.reshape(-1, dim) * signs).reshape(-1)
    arr = pa.ListArray.from_arrays(col.offsets, pa.array(vals, type=pa.float32()))
    return t.set_column(
        t.column_names.index("embedding"),
        pa.field("embedding", t.schema.field("embedding").type),
        arr,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default=".scaledata/sf1.0")
    ap.add_argument(
        "--tables", default="",
        help="comma list; default all (an embeddings-only 100x rung"
        " doesn't need 60M lineitem rows)",
    )
    args = ap.parse_args()
    only = {t for t in args.tables.split(",") if t}
    global COPY_TABLES, OFFSET_KEYS
    if only:
        COPY_TABLES = [t for t in COPY_TABLES if t in only]
        OFFSET_KEYS = {t: c for t, c in OFFSET_KEYS.items() if t in only}
    strides = key_strides()

    for table in COPY_TABLES:
        out_dir = os.path.join(args.out, f"{table}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        pq.write_table(t, os.path.join(out_dir, "part-0.parquet"))
        print(f"{table}: copied {t.num_rows} rows")

    for table, cols in OFFSET_KEYS.items():
        src = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
        out_dir = os.path.join(args.out, f"{table}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        for r in range(args.reps):
            t = src
            for col, src_key in cols.items():
                idx = t.column_names.index(col)
                typ = t.schema.field(col).type
                off = pa.scalar(r * strides[src_key], type=typ)
                t = t.set_column(idx, col, pc.add(t[col], off))
            if table == "documents":
                t = transform_documents(t, r)
            elif table == "embeddings":
                t = transform_embeddings(t, r)
            pq.write_table(t, os.path.join(out_dir, f"part-{r}.parquet"))
        print(f"{table}: {src.num_rows} x {args.reps} rows")


if __name__ == "__main__":
    main()
