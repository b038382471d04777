"""Block-combination Hamming LSH — the candidate-generation scheme that
survives corpus scale.

The round-9 banding (split a w-bit fingerprint into B disjoint bands,
self-join on any identical band) has the right pigeonhole guarantee but
a FIXED band-key space of 2^(w/B) values: 16-bit keys for the 64-bit
media hashes, 8-bit keys for the 32-bit doc SimHash. Random, unrelated
fingerprints collide on a band with probability 2^-(w/B), so the
candidate join emits ~n^2 / 2^(w/B) pairs from hash noise alone —
QUADRATIC once the corpus outgrows the key space (65k media items /
256 documents per band bucket on average at 100-TB corpus sizes). The
fixture never exposes it, exactly like the round-9 hub-frame finding.

Fix (Manku, Jain & Das Sarma, "Detecting Near-Duplicates for Web
Crawling", WWW 2007 — the production simhash design): split the
fingerprint into B blocks and build one table per (B - d)-sized block
SUBSET, keyed on the CONCATENATION of that subset's blocks. Pigeonhole:
a pair within Hamming distance d has differing bits in at most d
blocks, so some (B - d) blocks are all identical and the table for that
exact subset catches the pair — recall stays exactly 100%, never
probabilistic. The key is now (B - d)/B of the whole fingerprint wide
(e.g. 32 of 64 bits at B=6, d=3 instead of 16), shrinking the random-
collision rate from 2^-16 to 2^-32 — the difference between quadratic
blowup at 10^5 items and at 10^9. Cost: C(B, B-d) tables instead of B
(20 vs 4 at B=6, d=3) — a constant-factor row expansion bought for an
asymptotic class, the same trade Manku ran over 8B pages.

Reference scope note: the reference pipeline (CarlaOnate/
etl-pipeline-challenge-aladia) has no similarity operators at all —
this module belongs to the training-data extension surface
(SURVEY.md §2 north-star scope).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_bounds(bits: int, blocks: int) -> list[tuple[int, int]]:
    """Split ``[0, bits)`` into ``blocks`` contiguous (offset, width)
    ranges whose widths differ by at most one bit (the wider blocks
    first), covering every bit exactly once."""
    base, extra = divmod(bits, blocks)
    bounds: list[tuple[int, int]] = []
    off = 0
    for i in range(blocks):
        w = base + (1 if i < extra else 0)
        bounds.append((off, w))
        off += w
    return bounds


def block_combo_key_cols(
    sig_col: str | Column, bits: int, blocks: int, key_blocks: int
) -> list[Column]:
    """One key Column per ``key_blocks``-sized subset of the ``blocks``
    blocks of a ``bits``-wide integer fingerprint: the subset's block
    values packed contiguously into one non-negative long (key width =
    sum of the subset's block widths, <= 63 bits by construction for
    bits <= 64 and key_blocks < blocks).

    Table t's key collides for two fingerprints iff ALL blocks of
    subset t are pairwise identical — the Manku table layout. The
    bitwiseAND mask clears any sign-extension from the arithmetic
    shift, so the top block of a negative 64-bit hash packs correctly.
    """
    c = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    bounds = block_bounds(bits, blocks)
    keys: list[Column] = []
    for combo in combinations(range(blocks), key_blocks):
        key: Column | None = None
        shift = 0
        for bi in combo:
            off, w = bounds[bi]
            v = F.shiftright(c, off).bitwiseAND(F.lit((1 << w) - 1))
            piece = F.shiftleft(v, shift) if shift else v
            key = piece if key is None else key.bitwiseOR(piece)
            shift += w
        assert key is not None
        keys.append(key.cast("long"))
    return keys


def _check_guarantee(max_hamming: int, blocks: int, key_blocks: int) -> None:
    if max_hamming > blocks - key_blocks:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming <= blocks - key_blocks: "
            f"{max_hamming} > {blocks} - {key_blocks}"
        )


def explode_block_keys(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    bits: int,
    blocks: int,
    key_blocks: int,
) -> DataFrame:
    """(id, sig) -> one row per (id, sig, table, key) index entry —
    C(blocks, key_blocks) rows per input fingerprint."""
    keys = block_combo_key_cols(sig_col, bits, blocks, key_blocks)
    return sigs.select(
        F.col(id_col),
        F.col(sig_col),
        F.posexplode(F.array(*keys)).alias("table", "key"),
    )


def hamming_block_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int,
    bits: int = 64,
    blocks: int = 6,
    key_blocks: int = 3,
) -> DataFrame:
    """All (id_a < id_b, hamming) pairs within ``max_hamming`` of each
    other, by block-combination LSH + exact bit_count verification.

    The verified output is EXACTLY the Hamming ball (recall 100% by the
    subset pigeonhole, precision 100% by the verify filter), so the
    result set is independent of the (blocks, key_blocks) layout — the
    layout only decides how much candidate noise the join pays, which
    is what makes swapping banding schemes oracle-neutral."""
    _check_guarantee(max_hamming, blocks, key_blocks)
    rows = explode_block_keys(sigs, id_col, sig_col, bits, blocks, key_blocks)
    a, b = rows.alias("a"), rows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col}_a"),
            F.col(f"b.{id_col}").alias(f"{id_col}_b"),
            F.bit_count(
                F.col(f"a.{sig_col}").bitwiseXOR(F.col(f"b.{sig_col}"))
            )
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def hamming_block_pairs_across(
    delta_sigs: DataFrame,
    store_sigs: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int,
    bits: int = 64,
    blocks: int = 6,
    key_blocks: int = 3,
) -> DataFrame:
    """Delta-vs-store form (every delta fingerprint against every stored
    one within the ball; the delta never joins itself): (delta_id,
    corpus_id, hamming), distinct. Same guarantee and oracle-neutrality
    as :func:`hamming_block_pairs`."""
    _check_guarantee(max_hamming, blocks, key_blocks)
    a = explode_block_keys(
        delta_sigs, id_col, sig_col, bits, blocks, key_blocks
    ).alias("a")
    b = explode_block_keys(
        store_sigs, id_col, sig_col, bits, blocks, key_blocks
    ).alias("b")
    return (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.key") == F.col("b.key")),
        )
        .select(
            F.col(f"a.{id_col}").alias("delta_id"),
            F.col(f"b.{id_col}").alias("corpus_id"),
            F.bit_count(
                F.col(f"a.{sig_col}").bitwiseXOR(F.col(f"b.{sig_col}"))
            )
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
