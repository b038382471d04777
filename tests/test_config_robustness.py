"""Results must not depend on the physical join strategy or the shuffle
partition count. At 100 TB, dimension tables outgrow broadcast thresholds
and partition counts differ per cluster — a query whose RESULT changes
under those knobs has a partition- or broadcast-dependent bug (e.g. a
non-commutative aggregate, an order-sensitive limit without a tie-break,
or driver-side state). This re-runs a join/agg/window-heavy sample with
AUTO broadcast selection disabled (threshold -1; the engine's explicit
F.broadcast hints stay, and are reserved for provably bounded frames —
see the cartesian/BNLJ audit) AND a different (prime) shuffle partition
count, asserting bit-identical results against the default config.
"""

from __future__ import annotations

import pytest

SAMPLE = [
    "tpch_q3_shipping_priority",       # dim joins + top-k
    "tpch_q5_local_supplier_volume",   # 6-way star join
    "tpch_q18_large_volume_customer",  # HAVING pushdown + joins
    "cdc_avg_watched_ratio_per_video", # flagship dedup window + agg
    "window_top3_parts_per_supplier",  # rank window
    "minhash_near_dup",                # LSH self-join + verification
    "doc_leakage_safe_split",          # broadcast cluster map by default
    "doc_token_budget_sample",         # per-group running-sum window
    "emb_ivf_topk",                    # broadcast centroids by default
    "doc_unigram_surprisal",           # vocab join + global top-k
    # round-7 additions:
    "doc_dup_pagerank",                # iterative join/agg rounds + top-k
    "events_attribution_touch",        # ignore-nulls windows + unpivot agg
    "doc_source_segment_overlap",      # collect_set + in-row pair expansion
    "emb_top_pc_power_iteration",      # driver-literal loop + decimal norm
    "orders_topk_revenue_concentration",  # TakeOrdered(k) cutoff ties
    "events_session_paths",            # ordered path aggregate + top-20
    # round-7d additions:
    "orders_pareto_frontier",          # two-phase prefix-max windows
    "emb_mutual_knn_pairs",            # blocked GEMM + rank + mutual join
    "orders_value_decile_migration",   # 1-row boundary broadcast + joins
    "doc_cdc_chunk_dedup",             # lag windows + position reassembly
    "doc_vocab_coverage_curve",        # TakeOrdered head + rank window
    "events_mad_outlier_days",         # two quantile frames + top-3 ties
    # round-8 additions:
    "orders_rfm_segments",             # 9-value boundary broadcast (rewrite)
    "emb_mutual_knn_ivf",              # centroid broadcast + cell join + rank
    "emb_ivf_nprobe_tradeoff",         # probe frames reused across variants
    "doc_lsh_band_tradeoff",           # shared signatures across variants
    "doc_cdc_chunk_dedup_incremental", # chunk store anti-shape left join
    "media_video_frame_near_dup",      # hash-keyed containment join
    "events_audience_overlap",         # user-keyed self-join + totals
    "dq_fk_orphans",                   # five key-grain orphan joins
    # round-9 additions:
    "doc_bpe_apply",                   # per-round 1-row merge broadcast
    "media_dup_doc_contamination",     # banded self-join + doc-dim joins
    "doc_lsh_band_autotune",           # measured-decision walk (counts)
    "emb_ivf_nprobe_autotune",         # bounded nprobe walk + exact sample
    "media_cross_source_leakage",      # 3-family fingerprint union + dims
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.mark.parametrize("name", SAMPLE)
def test_result_invariant_under_no_broadcast_and_prime_partitions(
    spark, sf_dir, name
):
    from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG

    spec = CATALOG[name]
    baseline = _rows(spec.spark(spark, sf_dir))
    conf = spark.conf
    old_thresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_parts = conf.get("spark.sql.shuffle.partitions")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.shuffle.partitions", "7")
        stressed = _rows(spec.spark(spark, sf_dir))
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        conf.set("spark.sql.shuffle.partitions", old_parts)
    assert stressed == baseline, (
        f"{name}: result changed under no-broadcast / 7-partition config"
    )
