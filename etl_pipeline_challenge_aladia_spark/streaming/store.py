"""The streaming layer's ONE batch-keyed store contract.

Every persistent store in this package (document signature/segment/
CDC-chunk/count-min stores, the embedding index and its stats, the
media fingerprint stores, the anomaly day store, admission state, and
every per-batch report) follows the same protocol; this module is that
protocol, stated once:

- **Batch-keyed overwrite appends** (``append_batch``): each
  micro-batch's output lands in its own ``batch=<id>`` directory
  written with overwrite, so a checkpoint-replayed batch rewrites its
  own output instead of duplicating it — the layer's idempotence
  contract.

- **Strictly-earlier reads** (``read_store(strictly_before=...)``): a
  (possibly replayed) batch screening against the store must see ONLY
  batches that committed before it. Excluding just the replayed
  batch's own directory is not enough: a MID-STREAM replay (crash
  after batch N wrote, checkpoint reset to N-k) would read batches
  N-k+1..N that already ran and rewrite superset reports. The
  predicate is enforced on the DIRECTORY ids at listing time — no
  store schema needs a batch_id column, and pruned batches are never
  even listed, let alone scanned (the IO win of partition pruning).

- **Reserved ``compacted/`` history** (``compact_store``): maintenance
  consolidates per-batch directories into ONE layout under the
  reserved ``compacted`` directory at a FRESH path (publish-then-point
  — never blocks ingest), read UNCONDITIONALLY by every reader. The
  consolidated data deliberately does NOT live in a ``batch=<id>``
  directory: a continuing ingest pointed at a compacted store restarts
  its fresh checkpoint at batch_id 0, and a ``batch=0`` layout would
  let that first batch both exclude the entire history from its screen
  and overwrite it on append (the batch-0 collision class). The
  strictly-earlier predicate never applies to compacted rows —
  compacted history predates every live batch by the compaction
  contract (the store is quiesced and live directories removed before
  the pointer swap).

Reference analog: none (the reference pipeline keeps no cross-message
state, SURVEY.md §2.12); this is the north-star streaming layer's
storage discipline, factored out after five processors had each
restated it (VERDICT r8 #4).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

#: reserved directory name for consolidated history (see module doc)
COMPACTED_DIR = "compacted"


def batch_dirs(
    path: str,
    exclude: int | None = None,
    before: int | None = None,
) -> list[str]:
    """The live ``batch=<id>`` directories of a store, sorted by name —
    minus ``exclude``'s own directory (replay never reads its own
    half-written output) and, with ``before``, minus every id >=
    ``before`` (the strictly-earlier contract, applied at listing
    time). Only ``append_batch``-written NUMERIC ids are live batches:
    a stray non-numeric ``batch=*`` entry (a partial copy, an editor
    dropping) is skipped outright rather than read as history — under
    ``before`` it would otherwise masquerade as strictly-earlier data
    in every replay screen."""
    try:
        entries = []
        for e in sorted(os.listdir(path)):
            if not e.startswith("batch="):
                continue
            try:
                int(e.split("=", 1)[1])
            except ValueError:
                continue
            entries.append(e)
    except OSError:
        return []
    if exclude is not None:
        entries = [e for e in entries if e != f"batch={exclude}"]
    if before is not None:
        entries = [
            e for e in entries if int(e.split("=", 1)[1]) < before
        ]
    return [os.path.join(path, e) for e in entries]


def read_batch_store(
    spark: SparkSession,
    path: str,
    schema: str,
    exclude_batch: int | None = None,
    base_path: str | None = None,
    strictly_before: int | None = None,
) -> DataFrame:
    """Read a store's LIVE batch directories (no compacted layer), or
    an EMPTY frame with the declared schema when nothing has been
    ingested yet (never a path-not-found AnalysisException).
    ``base_path`` turns on partition-column discovery (batch/cell
    directory columns)."""
    dirs = batch_dirs(path, exclude_batch, strictly_before)
    if not dirs:
        return spark.createDataFrame([], schema)
    reader = spark.read
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    return reader.parquet(*dirs)


def read_store(
    spark: SparkSession,
    path: str,
    schema: str,
    exclude_batch: int | None = None,
    strictly_before: int | None = None,
    compacted_schema: str | None = None,
    live_columns: Sequence[str] | None = None,
) -> DataFrame:
    """The full store a reader may see: live batch directories (pruned
    per ``exclude_batch`` / ``strictly_before``) PLUS the reserved
    ``compacted/`` layer when present, read UNCONDITIONALLY.

    ``live_columns`` projects live rows before the union — for stores
    whose live rows carry columns the compacted layout drops (the
    anomaly day store's data-level batch_id). ``compacted_schema``
    defaults to ``schema``."""
    df = read_batch_store(
        spark, path, schema, exclude_batch, strictly_before=strictly_before
    )
    if live_columns is not None:
        df = df.select(*live_columns)
    compacted = os.path.join(path, COMPACTED_DIR)
    if os.path.isdir(compacted):
        df = df.unionByName(
            spark.read.schema(compacted_schema or schema).parquet(compacted)
        )
    return df


def append_batch(df: DataFrame, path: str, batch_id: int, partition_by: Sequence[str] | None = None) -> None:
    """Persist one micro-batch's rows under its ``batch=<id>``
    directory — overwrite, so replay is idempotent."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(path, f"batch={batch_id}"))


def compact_store(
    spark: SparkSession,
    store_path: str,
    out_path: str,
    schema: str,
    transform=None,
    partition_by: Sequence[str] | None = None,
    compacted_schema: str | None = None,
    live_columns: Sequence[str] | None = None,
) -> int:
    """Consolidate a store's per-batch directories (folding in any
    prior ``compacted/`` layer, so re-compaction composes) into ONE
    reserved ``compacted/`` layout at a fresh path. ``transform``
    shrinks the data on the way (DISTINCT for fingerprint sets,
    cell-wise sums for sketches); identity by default.
    ``live_columns``/``compacted_schema`` forward to ``read_store``
    for stores whose live rows carry provenance columns the compacted
    layout drops. Returns the compacted row count."""
    data = read_store(
        spark,
        store_path,
        schema,
        compacted_schema=compacted_schema,
        live_columns=live_columns,
    )
    if transform is not None:
        data = transform(data)
    target = os.path.join(out_path, COMPACTED_DIR)
    writer = data.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target)
    return spark.read.parquet(target).count()
