"""Regenerate CATALOG.md: every catalog query, its oracle status, and doc.

    python tools/dump_catalog.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> None:
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    with open("CATALOG.md", "w") as f:
        f.write(
            f"# CATALOG — {len(CATALOG)} queries\n\n"
            "Every entry pairs an idiomatic-Spark DataFrame program with a DuckDB\n"
            "oracle (hash-compared by the driver at sf0.01). `rows-only` entries\n"
            "have no SQL equivalent by design (Python-side kernels).\n\n"
            "| # | Query | Oracle | What it covers |\n|---|---|---|---|\n"
        )
        for i, (name, spec) in enumerate(CATALOG.items(), 1):
            oracle = "SQL" if spec.oracle else "rows-only"
            doc = " ".join(spec.doc.split())
            f.write(f"| {i} | `{name}` | {oracle} | {doc} |\n")
    print(f"wrote CATALOG.md ({len(CATALOG)} queries)")


if __name__ == "__main__":
    main()
