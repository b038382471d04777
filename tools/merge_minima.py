"""Merge fresh bench runs into the committed per-query minima file.

    python tools/merge_minima.py run1.json run2.json [--changed q1,q2,...]

The committed ``BENCH_local_latest.json`` is curated minima across full
runs OF THE SAME CODE. Queries named in ``--changed`` (code or fixture
intentionally changed this round) take the min of the FRESH runs only —
inheriting a stale minimum from a plan that no longer exists would
understate the honest cost. New queries likewise. Everything else takes
min(committed, fresh...). The newest fresh run is also written to the
uncommitted ``BENCH_local_run.json`` sidecar (the round-8 artifact
convention).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+")
    ap.add_argument("--changed", default="")
    ap.add_argument("--out", default="BENCH_local_latest.json")
    args = ap.parse_args()
    changed = {q for q in args.changed.split(",") if q}

    runs = [json.load(open(p)) for p in args.runs]
    committed = json.load(open(args.out))
    names = set(runs[0]["queries"])
    for r in runs[1:]:
        assert set(r["queries"]) == names, "runs cover different catalogs"
    unknown = sorted(changed - names)
    assert not unknown, (
        f"--changed names not in the run catalog: {unknown} — a typo here"
        " would silently let the query inherit a stale pre-change minimum"
    )

    merged = {}
    for q in sorted(names):
        fresh = min(r["queries"][q] for r in runs)
        if q in changed or q not in committed["queries"]:
            merged[q] = fresh
        else:
            merged[q] = min(committed["queries"][q], fresh)
    out = dict(runs[-1])
    out["queries"] = merged
    out["value"] = round(sum(merged.values()), 3)
    with open(args.out, "w") as f:
        f.write(json.dumps(out) + "\n")
    with open("BENCH_local_run.json", "w") as f:
        f.write(json.dumps(runs[-1]) + "\n")
    dropped = sorted(set(committed["queries"]) - names)
    print(
        f"merged {len(names)} queries -> {out['value']} s "
        f"(changed/new taking fresh-only: "
        f"{sorted(changed | (names - set(committed['queries'])))}; "
        f"dropped from committed: {dropped})"
    )


if __name__ == "__main__":
    main()
