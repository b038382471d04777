"""Warehouse sinks.

The reference's sink is a per-row ClickHouse insert with engine-side merge
dedup (SURVEY.md §2.1-S5, §1.4). Spark-first equivalents:

- ``append_warehouse``: partitioned Parquet append. Partitioning by the
  date of ``original_timestamp`` gives partition pruning for time-ranged
  analytics (the layout the reference README wished for but didn't build).
- ``upsert_warehouse_batch``: dedup-on-write for ``foreachBatch`` — merges
  a micro-batch into the stored table keeping the latest version per key.
  Paired with Structured Streaming checkpointing this gives effectively
  exactly-once (at-least-once redelivery collapses on the dedup key), the
  engine's answer to the reference's ack/requeue + ReplacingMergeTree.

Both sinks commit through an atomic snapshot manifest, which grows into a
small transactional table format: ``read_warehouse(version=)`` /
``read_warehouse(as_of=)`` time travel (VERSION AS OF and TIMESTAMP AS
OF) over ``retain_snapshots`` retained versions, ``table_history``,
``table_changes`` (change data feed between snapshots),
``erase_warehouse_keys`` (bucket-proportional GDPR hard deletes),
``vacuum_warehouse`` (snapshot expiry + GC), schema evolution via merged
bucket schemas, and ``compact_warehouse`` (small-file OPTIMIZE, optionally
z-order clustered).
"""

from __future__ import annotations

import os
import shutil
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.operators.dedup import latest_per_key
from etl_pipeline_challenge_aladia_spark.schemas import DEDUP_KEY

#: injectable clock for the manifest's commit timestamps (tests pin it)
_now = time.time


def append_warehouse(df: DataFrame, path: str, partition_by_day: bool = True) -> None:
    out = df.withColumn("_day", F.to_date("original_timestamp"))
    writer = out.write.mode("append")
    if partition_by_day:
        writer = writer.partitionBy("_day")
    writer.parquet(path)


def read_warehouse(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    as_of: float | str | None = None,
) -> DataFrame:
    """Read a warehouse table, resolving through the snapshot manifest when
    one exists (manifest-sink tables): the manifest names one directory per
    bucket (or one table-version directory), so a reader sees exactly the
    set a single atomic commit published — never a half-merged mix.
    Legacy/append layouts read the directory tree directly as before.

    ``version=`` time-travels to a RETAINED earlier snapshot (the
    manifest's ``history`` list, rotation depth set by the sinks'
    ``retain_snapshots``) — the plain-parquet analog of Delta's
    ``VERSION AS OF``. ``as_of=`` is the ``TIMESTAMP AS OF`` twin: the
    NEWEST retained snapshot committed at or before the given time
    (epoch seconds, or an ISO-8601 string — naive strings are read as
    UTC, matching the engine's session timezone). Raises ``KeyError``
    listing what IS readable when the request was never committed, has
    been vacuumed, or predates the earliest retained commit."""
    if version is not None and as_of is not None:
        raise ValueError("pass either version= or as_of=, not both")
    manifest = _read_manifest(path)
    if manifest is not None and version is not None:
        manifest = _resolve_snapshot(manifest, version)
    elif manifest is not None and as_of is not None:
        manifest = _resolve_as_of(manifest, as_of)
    elif version is not None or as_of is not None:
        raise KeyError(f"{path} has no snapshot manifest; cannot time-travel")
    if manifest is not None and manifest.get("buckets"):
        dirs = [os.path.join(path, d) for d in manifest["buckets"].values()]
        # mergeSchema: buckets committed at different versions may carry
        # evolved schemas (a later batch adding a column only rewrites its
        # own buckets); the union schema with NULL back-fill is the
        # correct read. Footer cost is bounded by the bucket count.
        return spark.read.option("mergeSchema", "true").parquet(*dirs)
    if manifest is not None and manifest.get("table_dir"):
        df = spark.read.parquet(os.path.join(path, manifest["table_dir"]))
        return df.drop("_day") if "_day" in df.columns else df
    df = spark.read.parquet(path)
    for layout_col in ("_day", "_bucket"):
        if layout_col in df.columns:
            df = df.drop(layout_col)
    return df


def _snapshot_entry(manifest: dict) -> dict:
    """The frozen, re-readable core of a manifest: version + directory
    refs + commit time. What history retains per commit — nothing else in
    the manifest is needed to resolve a past snapshot."""
    entry: dict = {"version": manifest["version"]}
    if manifest.get("committed_at") is not None:
        entry["committed_at"] = manifest["committed_at"]
    if "buckets" in manifest:
        entry["buckets"] = dict(manifest["buckets"])
    else:
        entry["table_dir"] = manifest["table_dir"]
    return entry


def _rotate_history(manifest: dict, retain_snapshots: int) -> list[dict]:
    """History for the NEXT commit: append the about-to-be-replaced current
    snapshot, keep the newest ``retain_snapshots`` entries. 0 disables
    time travel (lag-1 ``garbage`` retention still applies)."""
    history = list(manifest.get("history", []))
    if manifest.get("buckets") or manifest.get("table_dir"):
        history.append(_snapshot_entry(manifest))
    return history[-retain_snapshots:] if retain_snapshots > 0 else []


def _resolve_snapshot(manifest: dict, version: int) -> dict:
    if int(manifest.get("version", -1)) == version:
        return manifest
    for snap in manifest.get("history", []):
        if int(snap["version"]) == version:
            return snap
    have = sorted(
        [int(s["version"]) for s in manifest.get("history", [])]
        + [int(manifest["version"])]
    )
    raise KeyError(
        f"snapshot version {version} not retained; readable versions: {have}"
    )


def _as_epoch(as_of: float | str) -> float:
    if isinstance(as_of, str):
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(as_of.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.timestamp()
    return float(as_of)


def _resolve_as_of(manifest: dict, as_of: float | str) -> dict:
    """TIMESTAMP AS OF: the newest retained snapshot committed at or
    before ``as_of``. Snapshots predating the committed_at stamp (legacy
    manifests) are not time-addressable and are skipped."""
    ts = _as_epoch(as_of)
    snaps = list(manifest.get("history", [])) + [manifest]
    stamped = [s for s in snaps if s.get("committed_at") is not None]
    eligible = [s for s in stamped if float(s["committed_at"]) <= ts]
    if not eligible:
        have = [
            (int(s["version"]), float(s["committed_at"])) for s in stamped
        ]
        raise KeyError(
            f"no retained snapshot committed at or before {as_of!r}; "
            f"readable (version, committed_at): {have}"
        )
    best = max(eligible, key=lambda s: (float(s["committed_at"]), int(s["version"])))
    if int(best["version"]) == int(manifest.get("version", -1)):
        return manifest
    return best


def table_history(path: str) -> list[dict]:
    """Readable snapshots, oldest first, current last: ``[{version,
    table_dir | buckets}, ...]`` — Delta's ``DESCRIBE HISTORY`` shape for
    the manifest warehouse. Empty for non-manifest tables."""
    manifest = _read_manifest(path)
    if manifest is None:
        return []
    return list(manifest.get("history", [])) + [_snapshot_entry(manifest)]


def _promote_dir(staged: str, dst: str, keep_old_as: str) -> None:
    """Crash-recoverable directory promote: the previous version is moved
    aside BEFORE the new one lands, so no failure point loses both copies —
    PROVIDED the caller runs ``_recover_dir(dst, keep_old_as)`` first, which
    repairs the one window where ``dst`` is missing and the only copy sits
    in ``keep_old_as``. (Delta/Iceberg make this a metadata-only txn; plain
    parquet gets the next best thing.)"""
    if os.path.exists(keep_old_as):
        shutil.rmtree(keep_old_as)
    if os.path.exists(dst):
        os.rename(dst, keep_old_as)
    os.rename(staged, dst)
    shutil.rmtree(keep_old_as, ignore_errors=True)


def _recover_dir(dst: str, keep_old_as: str) -> None:
    """Repair an interrupted ``_promote_dir``: a crash between moving the
    old copy aside and installing the new one leaves ``dst`` missing with
    the only copy in ``keep_old_as`` — restore it. If both exist, the
    promote completed and the leftover old copy is safe to drop."""
    if os.path.exists(keep_old_as):
        if os.path.exists(dst):
            shutil.rmtree(keep_old_as)
        else:
            os.rename(keep_old_as, dst)


def upsert_warehouse_batch(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    retain_snapshots: int = 1,
) -> None:
    """Idempotent micro-batch upsert: union stored + batch, keep latest per
    key, rewrite. Simple full-rewrite variant — correct anywhere, O(table)
    per batch; ``merge_warehouse_batch`` below is the batch-proportional
    MERGE used at scale.

    Visibility is SNAPSHOT-ATOMIC like the merge sink: each rewrite lands
    as a new table-version directory published by one atomic manifest
    rename, with the previous version retained one commit for in-flight
    readers (``_commit_manifest``). A crash before the commit leaves only
    an unreferenced staging/version dir — readers keep the old snapshot and
    the next upsert garbage-collects the stray. Pre-manifest tables
    (day dirs directly under ``path``, possibly with an interrupted
    ``._old`` promote) are adopted in place.

    Only the missing-table case starts from batch-only; any other read
    failure (IO, permissions, corruption) raises instead of silently
    discarding the stored table.
    """
    manifest = _read_manifest(path)
    if manifest is not None and "buckets" in manifest:
        raise ValueError(
            f"{path} was written by the bucketed MERGE sink; "
            "use merge_warehouse_batch on it, not upsert_warehouse_batch"
        )
    legacy_entries: list[str] = []
    if manifest is None:
        # pre-manifest table (or fresh path): read whatever is stored —
        # raising on anything unreadable, exactly like before — and migrate
        # it into the first version directory on this write
        _recover_dir(path, path + "._old")
        shutil.rmtree(path + "._tmp", ignore_errors=True)
        legacy_entries = (
            [e for e in os.listdir(path) if not e.startswith("._")]
            if os.path.exists(path)
            else []
        )
        if legacy_entries:
            current = spark.read.parquet(path)
            if "_day" in current.columns:
                current = current.drop("_day")
            merged = current.unionByName(batch, allowMissingColumns=True)
        else:
            merged = batch
        version = 1
        garbage: list[str] = []
    else:
        # entry GC: unreferenced versions are aged-out garbage or strays
        _gc_unreferenced(path, manifest)
        shutil.rmtree(path + "._tmp", ignore_errors=True)
        if manifest["table_dir"] is not None:
            current = spark.read.parquet(
                os.path.join(path, manifest["table_dir"])
            ).drop("_day")
            merged = current.unionByName(batch, allowMissingColumns=True)
        else:
            merged = batch
        version = int(manifest["version"]) + 1
        garbage = [manifest["table_dir"]] if manifest["table_dir"] else []
    deduped = latest_per_key(merged)
    out = deduped.withColumn("_day", F.to_date("original_timestamp"))
    # executing this write also materializes the legacy read above, BEFORE
    # anything is moved or deleted — an unreadable store raises here with
    # the stored files untouched
    out.write.mode("overwrite").partitionBy("_day").parquet(path + "._tmp")
    new_dir = f"v{version:08d}"
    os.makedirs(path, exist_ok=True)
    os.rename(path + "._tmp", os.path.join(path, new_dir))
    history = _rotate_history(manifest or {}, retain_snapshots)
    _commit_manifest(
        path,
        {"version": version, "table_dir": new_dir, "garbage": garbage,
         "history": history},
    )
    for e in legacy_entries:
        full = os.path.join(path, e)
        shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)


#: Snapshot manifest file name (inside the table directory).
_MANIFEST = "_manifest.json"


def _read_manifest(path: str) -> dict | None:
    f = os.path.join(path, _MANIFEST)
    if not os.path.exists(f):
        return None
    import json

    with open(f) as fh:
        return json.load(fh)


def _commit_manifest(path: str, manifest: dict) -> None:
    """The ONE atomic visibility switch: fsync a temp file, then rename it
    over the manifest (POSIX rename is atomic; object stores use a
    conditional PUT here). Readers resolve the table exclusively through
    the manifest, so every bucket written this commit becomes visible at
    once or not at all — the plain-parquet analog of the reference's
    atomic ClickHouse part swap (reference clickhouse/init.sql:22-24) and
    of a Delta/Iceberg metadata commit.

    Each NEW version is stamped ``committed_at`` (the ``TIMESTAMP AS OF``
    anchor); a re-commit of the SAME version (vacuum trimming history,
    entry-GC bookkeeping) preserves the original stamp — metadata
    maintenance must not move a snapshot in time."""
    import json

    prev = _read_manifest(path)
    if prev is not None and int(prev.get("version", -1)) == int(
        manifest.get("version", -2)
    ):
        manifest = {**manifest, "committed_at": prev.get("committed_at")}
    else:
        manifest = {**manifest, "committed_at": _now()}

    tmp = os.path.join(path, "._manifest_tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(path, _MANIFEST))


def _bucket_dirname(bk: int, version: int) -> str:
    return f"b{bk:05d}_v{version:08d}"


def _gc_unreferenced(path: str, manifest: dict) -> int:
    """Drop every version directory neither the current manifest nor any
    RETAINED history snapshot references — aged-out garbage (rotated out
    of history) and strays from crashed pre-commit attempts. Shared by
    both sinks' entry GC and the public ``vacuum_warehouse``. Returns
    directories removed."""
    import glob as _glob

    snapshots = [manifest] + list(manifest.get("history", []))
    if "buckets" in manifest:
        referenced = {d for s in snapshots for d in s.get("buckets", {}).values()}
        pattern = "b[0-9]*_v[0-9]*"
    else:
        referenced = {
            s["table_dir"] for s in snapshots if s.get("table_dir")
        }
        pattern = "v[0-9]*"
    removed = 0
    for d in _glob.glob(os.path.join(path, pattern)):
        if os.path.basename(d) not in referenced:
            shutil.rmtree(d, ignore_errors=True)
            removed += 1
    return removed


def vacuum_warehouse(path: str, keep_snapshots: int = 0) -> int:
    """Operational GC for manifest tables (the VACUUM / snapshot-expiry
    knob): expire history beyond ``keep_snapshots`` past versions (default
    0 — current only, Delta's ``VACUUM RETAIN 0``), drop every now-
    unreferenced version directory, and clear the manifest's garbage
    list. Safe any time no reader is older than the newest expired
    snapshot. No-op (returns 0) on non-manifest tables."""
    manifest = _read_manifest(path)
    if manifest is None:
        return 0
    history = list(manifest.get("history", []))
    kept = history[-keep_snapshots:] if keep_snapshots > 0 else []
    trimmed = {**manifest, "history": kept}
    # Commit the trimmed manifest BEFORE deleting directories: a crash
    # between the two then leaves only harmless unreferenced dirs (which
    # the next write's entry GC collects), never a manifest whose history
    # advertises already-deleted snapshots.
    if manifest.get("garbage") or kept != history:
        _commit_manifest(path, {**trimmed, "garbage": []})
    return _gc_unreferenced(path, trimmed)


def merge_warehouse_batch(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    num_buckets: int = 64,
    keys: Sequence[str] = tuple(DEDUP_KEY),
    order_col: str = "version",
    retain_snapshots: int = 1,
) -> int:
    """MERGE-style upsert with I/O proportional to the batch, not the table,
    and SNAPSHOT-ATOMIC visibility for concurrent readers.

    Layout: one directory per bucket (``_bucket = pmod(xxhash64(keys), N)``)
    per version, resolved through ``_manifest.json``. A micro-batch only
    touches the buckets its keys hash into, so the merge reads and rewrites
    just those — at 100 TB a small batch rewrites batch_buckets/N of the
    table instead of all of it. All touched buckets are staged as NEW
    version directories first, then published by one atomic manifest rename
    (``_commit_manifest``): a reader resolving the manifest before the
    commit sees the complete old snapshot, after it the complete new one,
    never a mix. This is the plain-parquet equivalent of Delta/Iceberg
    ``MERGE INTO``.

    Crash safety: a crash before the manifest commit leaves only
    unreferenced new-version directories — the table still reads as the old
    snapshot, and the next merge garbage-collects the strays; the
    checkpointed ``foreachBatch`` retry then re-merges the same batch,
    which is idempotent because ``latest_per_key`` is. The previous
    ``retain_snapshots`` snapshots stay fully readable (manifest
    ``history``) — in-flight readers finish their scans, and
    ``read_warehouse(version=)`` time-travels to any retained version
    until ``vacuum_warehouse`` expires it: the knob Iceberg calls
    snapshot expiry, Delta ``VERSION AS OF`` + ``VACUUM``.

    ``num_buckets`` is pinned in the manifest at table creation; later
    calls use the pinned value (a caller drifting the bucket count would
    otherwise split keys across buckets and break the merge locality).
    Returns the number of buckets written.
    """
    import glob as _glob

    manifest = _read_manifest(path)
    if manifest is not None and "buckets" not in manifest:
        raise ValueError(
            f"{path} was written by the rewrite (upsert) sink; "
            "use upsert_warehouse_batch on it, not merge_warehouse_batch"
        )
    if manifest is None:
        # pre-manifest layout (or fresh table): adopt any legacy
        # ``_bucket=N`` partition dirs as version-0 buckets after running
        # the legacy interrupted-promote repair
        for leftover in _glob.glob(f"{path}._old_bucket_*"):
            bk = leftover.rsplit("_", 1)[-1]
            _recover_dir(os.path.join(path, f"_bucket={bk}"), leftover)
        os.makedirs(path, exist_ok=True)
        manifest = {"version": 0, "num_buckets": num_buckets, "buckets": {},
                    "garbage": []}
        for legacy in sorted(_glob.glob(os.path.join(path, "_bucket=*"))):
            bk = int(legacy.rsplit("=", 1)[-1])
            adopted = _bucket_dirname(bk, 0)
            os.rename(legacy, os.path.join(path, adopted))
            manifest["buckets"][str(bk)] = adopted
        _commit_manifest(path, manifest)
    num_buckets = int(manifest["num_buckets"])

    # entry GC: unreferenced versions are aged-out garbage (replaced a
    # full commit ago — lag-1 retention) or crashed pre-commit strays
    _gc_unreferenced(path, manifest)

    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets)).cast(
        "int"
    )
    b = batch.withColumn("_bucket", bucket)
    # bounded by num_buckets — a driver-safe collect by construction
    touched = sorted(
        r["_bucket"] for r in b.select("_bucket").distinct().collect()
    )
    if not touched:
        _commit_manifest(path, {**manifest, "garbage": []})
        return 0
    current_dirs = [
        os.path.join(path, manifest["buckets"][str(bk)])
        for bk in touched
        if str(bk) in manifest["buckets"]
    ]
    if current_dirs:
        # bucket dirs store only data columns; the bucket id is recomputed
        # from the keys — the same deterministic expression that routed the
        # rows at write time. mergeSchema: see read_warehouse.
        current = (
            spark.read.option("mergeSchema", "true")
            .parquet(*current_dirs)
            .withColumn("_bucket", bucket)
        )
        merged = latest_per_key(
            current.unionByName(b, allowMissingColumns=True),
            keys=keys,
            order_col=order_col,
        )
    else:
        merged = latest_per_key(b, keys=keys, order_col=order_col)
    staged = path + "._merge_tmp"
    if os.path.exists(staged):
        shutil.rmtree(staged)
    merged.write.mode("overwrite").partitionBy("_bucket").parquet(staged)

    version = int(manifest["version"]) + 1
    buckets = dict(manifest["buckets"])
    replaced = []
    written = 0
    for bk in touched:
        src = os.path.join(staged, f"_bucket={bk}")
        if not os.path.exists(src):
            continue
        new_name = _bucket_dirname(bk, version)
        os.rename(src, os.path.join(path, new_name))
        old = buckets.get(str(bk))
        if old is not None:
            replaced.append(old)
        buckets[str(bk)] = new_name
        written += 1
    _commit_manifest(
        path,
        {"version": version, "num_buckets": num_buckets, "buckets": buckets,
         "garbage": replaced,
         "history": _rotate_history(manifest, retain_snapshots)},
    )
    shutil.rmtree(staged, ignore_errors=True)
    return written


def read_warehouse_key(
    spark: SparkSession,
    path: str,
    key_values: Sequence[str],
    keys: Sequence[str] = tuple(DEDUP_KEY),
) -> DataFrame:
    """Point lookup on a MERGE-sink table: hash the key to its bucket and
    scan ONLY that bucket's directory (resolved through the manifest) —
    I/O is 1/num_buckets of the table regardless of size, the read-side
    payoff of the bucketed layout. Falls back to a filtered full scan on
    non-manifest tables. The returned frame is already filtered to the key.
    """
    manifest = _read_manifest(path)
    cond = None
    for col, val in zip(keys, key_values):
        c = F.col(col) == F.lit(val)
        cond = c if cond is None else cond & c
    if manifest is None or "buckets" not in manifest:
        return read_warehouse(spark, path).filter(cond)
    num_buckets = int(manifest["num_buckets"])
    # same deterministic route the writer used — computed driver-side on
    # the literal key, no Spark job needed to find the bucket
    bk = (
        spark.range(1)
        .select(
            F.pmod(
                F.xxhash64(*[F.lit(v) for v in key_values]), F.lit(num_buckets)
            ).cast("int")
        )
        .first()[0]
    )
    dirname = manifest["buckets"].get(str(bk))
    if dirname is None:  # bucket never written -> key cannot exist
        return read_warehouse(spark, path).filter(cond).limit(0)
    return spark.read.parquet(os.path.join(path, dirname)).filter(cond)


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted managed table for co-located joins.

    Two tables bucketed on the same keys with the same bucket count join
    WITHOUT an exchange: each task zips matching buckets (sort-merge over
    pre-sorted buckets, no shuffle, no sort). At 100 TB this is the
    difference between re-shuffling the fact table on every join and
    paying the layout cost once at write time. Bucket pruning also applies
    to point lookups on the bucket key.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def compact_warehouse(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    max_workers: int = 4,
    zorder_by: tuple[str, str] | None = None,
    zorder_bits: int = 8,
) -> int:
    """Rewrite each day partition into ~target-sized files (the small-files
    compaction every streaming-append warehouse needs operationally).

    Micro-batch appends leave one small file per batch per partition; scans
    then pay per-file open cost and lose row-group pruning. Compaction
    rewrites day-by-day — each rewrite is partition-local, so at 100 TB it
    runs incrementally on recent days, not the whole table. Day rewrites are
    submitted concurrently (Spark's scheduler interleaves the jobs) instead
    of serially.

    ``zorder_by=(col_a, col_b)`` additionally CLUSTERS each rewritten
    partition by the Morton interleave of the two (numeric) columns —
    Delta's ``OPTIMIZE ... ZORDER BY``: files are range-partitioned on the
    z-key, so each file covers a bounded rectangle of (a, b) space and
    min/max footer stats prune scans filtered on EITHER column. The
    quantization min/max is per day partition (a 4-value driver-bounded
    aggregate), which is what scoped OPTIMIZE does on a partitioned table. NULL days — the soft-delete tombstones whose
    original_timestamp is NULL by design — live in the
    ``__HIVE_DEFAULT_PARTITION__`` directory and are compacted too. Returns
    the number of partitions rewritten. On Delta/Iceberg this is OPTIMIZE /
    rewrite_data_files; plain parquet needs the staging-dir swap used here.
    """
    import glob as _glob
    from concurrent.futures import ThreadPoolExecutor

    # manifest-era upsert tables keep their day dirs inside the current
    # version directory — compact within the published snapshot in place
    # (day swaps stay crash-recoverable; snapshot atomicity is the
    # sink's concern, compaction never changes row content)
    manifest = _read_manifest(path)
    if manifest is not None and manifest.get("table_dir"):
        path = os.path.join(path, manifest["table_dir"])

    # repair any promote a previous compaction crashed in the middle of
    # (old-copy names are keyed by partition directory, so this is exact)
    for leftover in _glob.glob(f"{path}._compact_old_*"):
        _recover_dir(
            os.path.join(path, leftover.rsplit("._compact_old_", 1)[-1]), leftover
        )

    current = spark.read.parquet(path)
    days = [r["_day"] for r in current.select("_day").distinct().collect()]

    def rewrite(day: object) -> bool:
        dirname = "_day=__HIVE_DEFAULT_PARTITION__" if day is None else f"_day={day}"
        dst = os.path.join(path, dirname)
        if not os.path.isdir(dst):
            return False
        # read the partition directory directly: each rewrite only lists its
        # own files, so concurrent day swaps can't invalidate the scan
        part = spark.read.parquet(dst)
        n = part.count()
        files = max(1, -(-n // target_rows_per_file))
        staged = f"{path}._compact_tmp_{dirname}"
        out = part.repartition(files)
        if zorder_by is not None and n > 0:
            from etl_pipeline_challenge_aladia_spark.operators.layout import (
                quantize_col,
                zorder_key_col,
            )

            ca, cb = zorder_by
            stats = part.agg(
                F.min(ca).alias("mna"), F.max(ca).alias("mxa"),
                F.min(cb).alias("mnb"), F.max(cb).alias("mxb"),
            ).first()
            if stats["mna"] is not None and stats["mnb"] is not None:
                z = zorder_key_col(
                    quantize_col(
                        F.col(ca), F.lit(stats["mna"]), F.lit(stats["mxa"]),
                        zorder_bits,
                    ),
                    quantize_col(
                        F.col(cb), F.lit(stats["mnb"]), F.lit(stats["mxb"]),
                        zorder_bits,
                    ),
                    zorder_bits,
                )
                out = (
                    part.withColumn("_z", z)
                    .repartitionByRange(files, "_z")
                    .sortWithinPartitions("_z")
                    .drop("_z")
                )
        out.write.mode("overwrite").parquet(staged)
        _promote_dir(staged, dst, f"{path}._compact_old_{dirname}")
        return True

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        done = list(pool.map(rewrite, days))
    return sum(done)


def table_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
    keys: Sequence[str] = tuple(DEDUP_KEY),
    order_col: str = "version",
) -> DataFrame:
    """Change data feed between two RETAINED snapshots: one row per key
    whose latest state differs, tagged ``_change_type`` in
    ('insert', 'update', 'delete') — Delta's ``table_changes`` on top of
    the manifest history, the hook an incremental downstream pipeline
    polls instead of re-scanning the table.

    Diffed by full outer join on the merge keys comparing ``order_col``
    (the sinks' monotonic version column), so a row rewritten with the
    same version is — correctly — not a change. 'delete' only appears if
    rows were physically removed between snapshots (the CDC pipeline's
    soft deletes surface as 'update' of ``is_deleted``, matching its
    warehouse semantics). Emitted columns are the NEW side for
    insert/update and the OLD side for delete.

    Cost: a keyed join of exactly the two snapshots — at 100 TB both
    sides share the sinks' bucket layout, and for merge tables the join
    could be further restricted to buckets whose directory names differ
    between the snapshots (version-named directories make the unchanged
    ones trivially identical).
    """
    old = read_warehouse(spark, path, version=from_version)
    new = read_warehouse(
        spark, path, version=to_version
    )  # None -> current snapshot
    key_cols = list(keys)
    o_df = latest_per_key(old, keys=keys, order_col=order_col)
    n_df = latest_per_key(new, keys=keys, order_col=order_col)
    # Schema evolution: the old snapshot may predate columns added by a
    # later mergeSchema write — patch them in as typed NULLs (from the new
    # side's schema) so the diff projection resolves on both sides.
    o_cols = set(o_df.columns)
    for field in n_df.schema.fields:
        if field.name not in o_cols:
            o_df = o_df.withColumn(field.name, F.lit(None).cast(field.dataType))
    o = o_df.alias("o")
    n = n_df.alias("n")
    cond = None
    for k in key_cols:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    o_key = F.col(f"o.{key_cols[0]}")
    n_key = F.col(f"n.{key_cols[0]}")
    change = (
        F.when(o_key.isNull(), F.lit("insert"))
        .when(n_key.isNull(), F.lit("delete"))
        .when(
            F.col(f"n.{order_col}") != F.col(f"o.{order_col}"), F.lit("update")
        )
        .otherwise(F.lit(None))
    )
    # Whole-side row selection, NOT per-column coalesce: an update that
    # legitimately sets a column to NULL (e.g. a soft-delete tombstone
    # writing NULL original_timestamp/watched_ratio) must emit the NEW
    # NULL, not the stale old value. New side whenever the key exists on
    # the new side; old side only for deletes.
    out_cols = [
        F.when(n_key.isNotNull(), F.col(f"n.{c}"))
        .otherwise(F.col(f"o.{c}"))
        .alias(c)
        for c in n.columns
    ]
    return (
        joined.withColumn("_change_type", change)
        .filter(F.col("_change_type").isNotNull())
        .select(*out_cols, "_change_type")
    )


def erase_warehouse_keys(
    spark: SparkSession,
    keys_df: DataFrame,
    path: str,
    keys: Sequence[str] = tuple(DEDUP_KEY),
    retain_snapshots: int = 1,
) -> int:
    """Hard row erasure (the GDPR/right-to-be-forgotten primitive every
    training-data warehouse needs): physically remove all rows matching
    ``keys_df``'s key tuples, with I/O proportional to the TOUCHED buckets
    — never a full-table rewrite on bucketed MERGE tables.

    Same commit protocol as the sinks: touched buckets are staged as new
    version directories and published by one atomic manifest rename, so
    readers see the pre- or post-erasure snapshot, never a mix. NOTE the
    erased rows still exist in RETAINED past snapshots (time travel) —
    complete physical purge requires ``vacuum_warehouse(path)`` after the
    erase, which is the same two-step contract Delta documents for GDPR
    (DELETE then VACUUM). ``table_changes`` across the erase commit
    reports the rows as ``delete``.

    Rewrite-sink (``table_dir``) tables fall back to a full single-version
    rewrite — correct anywhere, O(table). Returns the number of bucket
    directories (or 1 for rewrite tables) written.
    """
    manifest = _read_manifest(path)
    if manifest is None:
        raise ValueError(f"{path} has no snapshot manifest; nothing to erase from")
    key_cols = list(keys)
    erase = keys_df.select(*key_cols).distinct()

    if "buckets" not in manifest:
        # rewrite-sink table: one new version without the matching keys
        current = spark.read.parquet(
            os.path.join(path, manifest["table_dir"])
        ).drop("_day")
        kept = current.join(erase, key_cols, "left_anti")
        version = int(manifest["version"]) + 1
        out = kept.withColumn("_day", F.to_date("original_timestamp"))
        out.write.mode("overwrite").partitionBy("_day").parquet(path + "._tmp")
        new_dir = f"v{version:08d}"
        os.rename(path + "._tmp", os.path.join(path, new_dir))
        _commit_manifest(
            path,
            {"version": version, "table_dir": new_dir,
             "garbage": [manifest["table_dir"]],
             "history": _rotate_history(manifest, retain_snapshots)},
        )
        return 1

    num_buckets = int(manifest["num_buckets"])
    bucket = F.pmod(
        F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(num_buckets)
    ).cast("int")
    tagged = erase.withColumn("_bucket", bucket)
    touched = sorted(
        r["_bucket"] for r in tagged.select("_bucket").distinct().collect()
    )
    touched = [bk for bk in touched if str(bk) in manifest["buckets"]]
    if not touched:
        return 0
    current_dirs = [
        os.path.join(path, manifest["buckets"][str(bk)]) for bk in touched
    ]
    current = (
        spark.read.option("mergeSchema", "true")
        .parquet(*current_dirs)
        .withColumn("_bucket", bucket)
    )
    kept = current.join(erase, key_cols, "left_anti")
    staged = path + "._erase_tmp"
    if os.path.exists(staged):
        shutil.rmtree(staged)
    kept.write.mode("overwrite").partitionBy("_bucket").parquet(staged)

    version = int(manifest["version"]) + 1
    buckets = dict(manifest["buckets"])
    replaced = []
    written = 0
    for bk in touched:
        src = os.path.join(staged, f"_bucket={bk}")
        replaced.append(buckets[str(bk)])
        if os.path.exists(src):
            new_name = _bucket_dirname(bk, version)
            os.rename(src, os.path.join(path, new_name))
            buckets[str(bk)] = new_name
        else:
            del buckets[str(bk)]  # bucket fully erased
        written += 1
    _commit_manifest(
        path,
        {"version": version, "num_buckets": num_buckets, "buckets": buckets,
         "garbage": replaced,
         "history": _rotate_history(manifest, retain_snapshots)},
    )
    shutil.rmtree(staged, ignore_errors=True)
    return written
