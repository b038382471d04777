"""Round-10b: block-combination Hamming LSH (operators/hamming.py).

The round-9 disjoint-band layout keyed candidates on 2^(w/B)-value
spaces (16-bit for media, 8-bit for doc SimHash) — random fingerprints
collide there at 2^-(w/B), so candidate volume is quadratic once the
corpus outgrows the key space. These tests pin the Manku-layout
replacement: noise immunity (a planted band-key hub admits ZERO
candidates under subset keys), exact recall (output == the brute-force
Hamming ball), and the guarantee validation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.operators.hamming import (
    block_bounds,
    explode_block_keys,
    hamming_block_pairs,
    hamming_block_pairs_across,
)


def test_block_bounds_partition_every_bit_once():
    for bits in (32, 64):
        for blocks in (4, 5, 6, 8):
            bounds = block_bounds(bits, blocks)
            covered = []
            for off, w in bounds:
                covered.extend(range(off, off + w))
            assert covered == list(range(bits))
            widths = {w for _, w in bounds}
            assert max(widths) - min(widths) <= 1


def _sig_df(spark, sigs):
    return spark.createDataFrame(
        [(i, int(np.int64(np.uint64(s)))) for i, s in enumerate(sigs)],
        "media_id long, ahash long",
    )


def test_subset_keys_immune_to_band_hub(spark):
    """40 fingerprints identical in bits [0,16) — the whole key of the
    OLD layout's band 0, which admitted all C(40,2)=780 of them as
    candidates — but pairwise distinct in blocks 1..5 of the new
    layout. No pair shares 3 identical blocks, so the subset-keyed
    index admits ZERO candidates: the quadratic noise class is gone at
    the candidate level, not just post-verification."""
    sigs = []
    for i in range(40):
        v = 0xABCD  # bits [0,16) shared by everyone
        for off in (16, 22, 33, 44, 54):  # lands in blocks 1..5
            v |= i << off
        sigs.append(v)
    df = _sig_df(spark, sigs)
    rows = explode_block_keys(df, "media_id", "ahash", 64, 6, 3)
    a, b = rows.alias("a"), rows.alias("b")
    candidates = a.join(
        b,
        (F.col("a.table") == F.col("b.table"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.media_id") < F.col("b.media_id")),
    ).count()
    assert candidates == 0
    assert hamming_block_pairs(df, "media_id", "ahash", 3).count() == 0


def _brute_pairs(sigs, max_hamming):
    out = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            d = bin((sigs[i] ^ sigs[j]) & ((1 << 64) - 1)).count("1")
            if d <= max_hamming:
                out.add((i, j, d))
    return out


@pytest.mark.parametrize("max_hamming,blocks,key_blocks", [(3, 6, 3), (6, 8, 2)])
def test_block_pairs_equal_bruteforce_ball(
    spark, max_hamming, blocks, key_blocks
):
    """Recall AND precision == 100% on a seeded corpus with planted
    flips at every distance 0..max_hamming+2: the verified output is
    exactly the brute-force Hamming ball, independent of layout."""
    rng = np.random.default_rng(7)
    base = [int(rng.integers(0, 1 << 64, dtype=np.uint64)) for _ in range(12)]
    sigs = list(base)
    for k, b in enumerate(base):
        flipped = b
        for bit in rng.choice(64, size=(k % (max_hamming + 3)), replace=False):
            flipped ^= 1 << int(bit)
        sigs.append(flipped)
    got = {
        (r.media_id_a, r.media_id_b, r.hamming)
        for r in hamming_block_pairs(
            _sig_df(spark, sigs),
            "media_id",
            "ahash",
            max_hamming,
            blocks=blocks,
            key_blocks=key_blocks,
        ).collect()
    }
    assert got == _brute_pairs(sigs, max_hamming)


def test_across_screens_delta_against_store_only(spark):
    base = int(np.random.default_rng(3).integers(0, 1 << 63))
    delta = _sig_df(spark, [base])  # media_id 0
    store = spark.createDataFrame(
        [(100, base ^ 0b101), (101, base ^ ((1 << 20) - 1))],
        "media_id long, ahash long",
    )
    got = hamming_block_pairs_across(
        delta, store, "media_id", "ahash", max_hamming=3
    ).collect()
    assert [(r.delta_id, r.corpus_id, r.hamming) for r in got] == [(0, 100, 2)]


def test_guarantee_validation_raises():
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_block_pairs(None, "id", "sig", 4, blocks=6, key_blocks=3)


def test_layout_tradeoff_invariant_ball_decreasing_noise(spark):
    """doc_simhash_layout_tradeoff's contract in data: n_verified (the
    exact Hamming ball) is IDENTICAL under every layout with the same
    pigeonhole guarantee, and candidate noise never grows as subset
    keys widen — (4,1) is the pre-r10 disjoint-band layout, so its row
    is the measured cost of the old scheme."""
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    rows = sorted(
        CATALOG["doc_simhash_layout_tradeoff"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r.key_bits,
    )
    assert [(r.blocks, r.key_blocks) for r in rows] == [(4, 1), (6, 3), (8, 5)]
    assert len({r.n_verified for r in rows}) == 1
    # (4,1)'s 16-bit keys are the loosest admission rule by a wide
    # margin, so it should dominate the tighter-key layouts on ANY
    # fixture. The (6,3)-vs-(8,5) ordering, by contrast, is NOT implied
    # by the pigeonhole guarantee (different block partitions don't nest
    # their candidate sets), so it is deliberately not asserted — a
    # regenerated fixture could legitimately flip it (r10 ADVICE #3).
    assert rows[0].n_candidates >= rows[1].n_candidates
    assert rows[0].n_candidates >= rows[2].n_candidates
    assert all(r.n_candidates >= r.n_verified for r in rows)


def test_simhash64_near_dup_equals_bruteforce(spark):
    """The catalog query's output set == the brute-force d<=3 ball over
    its own 64-bit signatures, and the signatures genuinely use the
    upper 32 bits (the whole point of the width upgrade)."""
    from etl_pipeline_challenge_aladia_spark.operators.similarity import (
        simhash64_col_agg,
    )
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sig_rows = simhash64_col_agg(docs).collect()
    assert any(abs(r.simhash) > (1 << 32) for r in sig_rows)
    ids = [r.id for r in sig_rows]
    raw = [r.simhash & ((1 << 64) - 1) for r in sig_rows]
    expect = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]), d)
        for (i, j, d) in _brute_pairs(raw, 3)
    }
    got = {
        (r.doc_id_a, r.doc_id_b, r.hamming)
        for r in CATALOG["doc_simhash64_near_dup"].spark(spark, sf).collect()
    }
    assert got == expect
