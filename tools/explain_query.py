"""Dump `.explain("formatted")` for catalog queries to files — the
before/after plan evidence the optimization rounds commit.

    python tools/explain_query.py --out plans/r14 --suffix _after q1 q2 ...

Writes ``<out>/<query><suffix>.txt`` per query.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    argv = sys.argv[1:]
    out_dir = "plans/r14"
    suffix = "_after"
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(argv):
        if argv[i] == "--out":
            out_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--suffix":
            suffix = argv[i + 1]
            i += 2
        elif argv[i] == "--sf":
            sf_dir = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1

    from contextlib import redirect_stdout

    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG
    from etl_pipeline_challenge_aladia_spark.session import get_spark

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain", cpus=8, shuffle_partitions=8)
    for name in names:
        df = CATALOG[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
