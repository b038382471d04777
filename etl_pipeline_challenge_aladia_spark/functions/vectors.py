"""Vector column helpers for embedding similarity (north-star scope).

All JVM-side higher-order functions — no Python UDFs. ``F.aggregate`` folds
left-to-right, giving a deterministic summation order (important for
cross-engine comparisons and reproducible ranking).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> -> array<double> so all arithmetic is f64."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _chain_sum(terms: list[Column]) -> Column:
    """Left-associative ``t0 + t1 + ...`` — the SAME evaluation order as
    ``F.aggregate``'s sequential fold (the fold's extra leading ``0.0 +``
    is an IEEE identity), so unrolled and folded sums are bit-equal."""
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def dot_col(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-fold dot product of two array<double> columns.

    Pass ``dim`` (when statically known) to UNROLL the sum into a flat
    expression tree instead of the higher-order fold. Values are
    bit-identical (same summation order). Measured locally the two forms
    perform about the same at dim=64 (the unrolled codegen tree is large
    enough to offset the fold's interpretation cost), so the fold stays
    the default; the unrolled form exists for engines/dims where the
    trade-off differs and as the bit-equality reference."""
    if dim is not None:
        return _chain_sum([a.getItem(i) * b.getItem(i) for i in range(dim)])
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column, dim: int | None = None) -> Column:
    """L2 norm of an array<double> column (see ``dot_col`` on ``dim``)."""
    if dim is not None:
        return F.sqrt(
            _chain_sum([a.getItem(i) * a.getItem(i) for i in range(dim)])
        )
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine_similarity_col(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity; 0.0 when either norm is zero. ``dim`` unrolls
    all three folds into codegen (bit-identical values)."""
    denom = norm_col(a, dim) * norm_col(b, dim)
    return F.when(denom > 0, dot_col(a, b, dim) / denom).otherwise(F.lit(0.0))


def l2_normalize_col(a: Column) -> Column:
    """Unit-normalize an array<double> column; zero vectors pass through
    unchanged (norm 0 would otherwise divide by zero)."""
    n = norm_col(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)


def let_col(value: Column, body) -> Column:
    """Bind a scalar subexpression ONCE per row: ``body`` receives a lambda
    variable holding ``value``'s result, instead of the expression tree
    itself.

    Why this exists: Catalyst inlines outer expressions referenced inside
    higher-order-function lambdas and performs no common-subexpression
    reuse across them — an O(d) scalar like ``array_max(transform(a, abs))``
    referenced in a per-element lambda is re-evaluated for EVERY element,
    turning an O(d) kernel into O(d^2) per row. Binding it through a
    single-element ``transform`` makes it a true lambda variable (evaluated
    once, then read by reference), the expression-level LET Spark SQL
    lacks. Still 100% JVM-side."""
    return F.transform(F.array(value), body).getItem(0)


def int8_quantize_col(a: Column) -> Column:
    """Symmetric int8 quantization of an array<double>: scale = amax/127,
    q_i = clamp(floor(v_i/scale + 0.5), -127, 127). The floor(x+0.5)
    rounding is the engine-portable half-up convention
    (functions/rounding.py); vectors whose scale underflows to zero
    (all-zero, or amax below ~6.3e-322 — beneath int8 resolution)
    quantize to zeros rather than dividing by an underflowed scale
    (ANSI division-by-zero; found by the hypothesis property test).

    ``amax`` is let-bound (see ``let_col``) so the O(d) max is computed
    once per row, not once per element."""
    return let_col(
        F.array_max(F.transform(a, F.abs)),
        lambda amax: F.when(
            amax / F.lit(127.0) > 0,
            F.transform(
                a,
                lambda x: F.greatest(
                    F.lit(-127).cast("long"),
                    F.least(
                        F.lit(127).cast("long"),
                        F.floor(x / (amax / F.lit(127.0)) + F.lit(0.5)),
                    ),
                ),
            ),
        ).otherwise(F.transform(a, lambda x: F.lit(0).cast("long"))),
    )


def int8_quant_error_col(a: Column) -> Column:
    """Mean absolute reconstruction error of int8 round-trip quantization,
    as a double. The fidelity metric for deciding whether a stored corpus
    can ship int8 embeddings (4x smaller scans) instead of f32. Pure fold
    arithmetic — deterministic order, engine-reproducible.

    Quantize + reconstruct + error run in ONE transform with ``amax``
    let-bound (``let_col``): the previous shape re-derived
    ``array_max(transform(a, abs))`` inside both the quantize lambda and
    the error lambda — O(d) work per ELEMENT, O(d^2) per row, the exact
    duplicated-subtree class commit 14237eb fixed for the PQ queries."""
    return let_col(
        F.array_max(F.transform(a, F.abs)),
        lambda amax: F.when(
            amax / F.lit(127.0) > 0,
            F.aggregate(
                F.transform(
                    a,
                    lambda x: F.abs(
                        x
                        - F.greatest(
                            F.lit(-127).cast("long"),
                            F.least(
                                F.lit(127).cast("long"),
                                F.floor(x / (amax / F.lit(127.0)) + F.lit(0.5)),
                            ),
                        ).cast("double")
                        * (amax / F.lit(127.0))
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size(a),
        ).otherwise(F.lit(0.0)),
    )
