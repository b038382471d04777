"""User-extension surface: Arrow-vectorized Pandas UDFs.

The reference's entire UDF mechanism is the Beam DoFn (SURVEY.md §2.9-U1);
all three of its DoFns translate to native Column expressions here, so the
parity path has NO Python in the row loop. This module is the engine's
extension point for logic that genuinely needs Python (custom scoring,
model inference): scalar and grouped-aggregate Pandas UDFs, Arrow-batched —
the ~10-100x-over-row-at-a-time path. Tests cross-check each UDF against
the equivalent native expression so the two surfaces stay semantically
aligned; the native version remains canonical for anything expressible in
Columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def watched_ratio_pudf(watched: pd.Series, duration: pd.Series) -> pd.Series:
    """Vectorized twin of enrich.watched_ratio_col (F1 semantics including
    the asymmetric missing-field defaults, duration<=0 -> 0, and the shared
    half-up rounding formula)."""
    w = watched.fillna(0).astype("float64")
    d = duration.fillna(1).astype("float64")
    ratio = (w / d).where(d > 0, 0.0)
    return np.floor(ratio * 10_000.0 + 0.5) / 10_000.0


@pandas_udf("long")
def token_count_pudf(text: pd.Series) -> pd.Series:
    """Vectorized twin of text.token_count_col (whitespace tokens)."""
    return text.fillna("").str.split().map(len).astype("int64")


@pandas_udf("double")
def grouped_mean_ratio_pudf(ratio: pd.Series) -> float:
    """Grouped-aggregate Pandas UDF: plain mean over the group's Arrow
    batch. Used with groupBy().agg() — partial aggregation happens per
    group partition, the Arrow transfer is the group's column only."""
    return float(ratio.mean())


def register_sql_functions(spark) -> None:
    """Expose the engine's Python-side functions to raw SQL users:
    ``SELECT watched_ratio_py(watched, duration), token_count_py(text)``.
    The native Column forms remain the fast path; registration exists so
    the spark.sql surface is as complete as the DataFrame one."""
    spark.udf.register("watched_ratio_py", watched_ratio_pudf)
    spark.udf.register("token_count_py", token_count_pudf)


def make_chunk_udtf():
    """Python UDTF (Spark 4 table function): text -> one row per
    overlapping chunk, the row-generating extension shape (U2) the
    grouped-agg pandas_udf can't express.

    Lazily constructed because the ``@udtf`` decorator needs a Spark-4
    runtime; semantics mirror ``operators/text.py:chunk_plan`` (chunk =
    ``size`` tokens, stride = ``size - overlap``) so the column-math
    planner stays canonical and the UDTF is the per-row materializer for
    SQL users: ``SELECT c.* FROM docs, LATERAL chunk_text(text, 8, 2) c``.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: long, start_tok: long, n_tokens: long, chunk: string")
    class ChunkText:
        def eval(self, text: str, size: int = 8, overlap: int = 2):
            toks = (text or "").split()
            if not toks:
                yield 0, 0, 0, ""
                return
            stride = max(1, size - overlap)
            idx, start = 0, 0
            while start < len(toks):
                piece = toks[start : start + size]
                yield idx, start, len(piece), " ".join(piece)
                idx += 1
                if start + size >= len(toks):  # tail fully covered
                    break
                start += stride

    return ChunkText


def register_sql_table_functions(spark) -> None:
    """Register the UDTF surface: ``chunk_text`` becomes callable from SQL
    (scalar args or LATERAL over a table column)."""
    spark.udtf.register("chunk_text", make_chunk_udtf())
