"""Approximate operators bounded against exact answers (the correct
contract for sketches — they are engine-specific, so no DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_challenge_aladia_spark.functions.sketches import (
    approx_distinct,
    approx_quantiles,
    bloom_prune_probe,
)
from etl_pipeline_challenge_aladia_spark.sources.files import load_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    exact = orders.select(F.count_distinct("o_custkey")).collect()[0][0]
    approx = orders.select(approx_distinct("o_custkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = ev.select(approx_quantiles("value", [0.5, 0.9])).collect()[0][0]
    exact = ev.selectExpr("percentile(value, array(0.5, 0.9))").collect()[0][0]
    lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    spread = hi - lo
    for a, e in zip(approx, exact):
        assert abs(a - e) / spread < 0.02


def test_bloom_prune_preserves_join_result(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    plain = li.join(urgent, li.l_orderkey == urgent.o_orderkey).count()
    pruned_probe = bloom_prune_probe(
        li, urgent, "l_orderkey", "o_orderkey", expected_items=50_000
    )
    pruned = pruned_probe.join(urgent, pruned_probe.l_orderkey == urgent.o_orderkey).count()
    assert pruned == plain > 0
    # the filter actually prunes (selective join): strictly fewer probe rows
    assert pruned_probe.count() < li.count()
    # the probe is pure JVM: native might_contain, no Python eval node
    plan = pruned_probe._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_prune_fallback_semi_join(spark, sf_dir, monkeypatch):
    """Capability degradation (VERDICT r02 #3): with the private JVM bloom
    surfaces unavailable, bloom_prune_probe must transparently use the
    public broadcast semi-join prefilter — same join result, broadcast
    semi-join plan, still zero Python eval nodes."""
    import etl_pipeline_challenge_aladia_spark.functions.sketches as sk

    monkeypatch.setattr(sk, "_NATIVE_BLOOM_OK", False)

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    plain = li.join(urgent, li.l_orderkey == urgent.o_orderkey).count()
    pruned_probe = bloom_prune_probe(li, urgent, "l_orderkey", "o_orderkey")
    pruned = pruned_probe.join(
        urgent, pruned_probe.l_orderkey == urgent.o_orderkey
    ).count()
    assert pruned == plain > 0
    assert pruned_probe.count() < li.count()
    plan = pruned_probe._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # probe failure itself also flips the cache to the fallback
    monkeypatch.setattr(sk, "_NATIVE_BLOOM_OK", None)
    monkeypatch.setattr(
        sk.F, "lit", lambda *_a, **_k: (_ for _ in ()).throw(RuntimeError("gone"))
    )
    assert sk._native_bloom_available(spark) is False


def test_heavy_hitters_exact_verified(spark):
    """heavy_hitters = freqItems candidates (superset) + exact verify:
    output is EXACTLY the >= threshold set, including an item sitting
    right ON the boundary; sub-threshold and long-tail values never
    appear; counts and integer shares are exact; empty input -> empty."""
    import pytest

    from etl_pipeline_challenge_aladia_spark.functions.sketches import (
        heavy_hitters,
    )

    # 1000 rows: 'a' x 300, 'b' x 100 (exactly 100 permille), 'c' x 99
    # (just below), 501-value long tail
    rows = (["a"] * 300 + ["b"] * 100 + ["c"] * 99
            + [f"tail{i}" for i in range(501)])
    df = spark.createDataFrame([(v,) for v in rows], "token string")
    got = {
        r["token"]: (r["n_occurrences"], r["share_permille"])
        for r in heavy_hitters(df, "token", support_permille=100).collect()
    }
    assert got == {"a": (300, 300), "b": (100, 100)}

    assert heavy_hitters(df.limit(0), "token").count() == 0
    with pytest.raises(ValueError, match="support_permille"):
        heavy_hitters(df, "token", support_permille=0)


def test_hll_rollup_persists_and_merges(spark, sf_dir, tmp_path):
    """Stored-sketch rollup contract: daily HLL sketches written to
    parquet re-load and MERGE to coarser rollups whose estimates track
    the exact distinct counts (within HLL error), and merging is
    partitioning/order-invariant; the merged weekly estimate equals the
    direct weekly sketch's estimate exactly (same sketch algebra)."""
    from pyspark.sql import functions as F

    from etl_pipeline_challenge_aladia_spark.functions.sketches import (
        hll_merge_estimate,
        hll_rollup,
    )
    from etl_pipeline_challenge_aladia_spark.sources.files import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        "user_id",
    )
    daily = hll_rollup(ev, ["week", "day"], "user_id")
    path = str(tmp_path / "daily_rollup")
    daily.write.parquet(path)  # binary sketch column survives parquet
    stored = spark.read.parquet(path)

    weekly = {
        r["week"]: r["approx_uniques"]
        for r in hll_merge_estimate(stored, ["week"]).collect()
    }
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy("week")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(weekly) == set(exact)
    for wk, est in weekly.items():
        assert abs(est - exact[wk]) / max(1, exact[wk]) < 0.05

    # merge algebra: merged-daily == direct-weekly, bit-equal estimates
    direct = {
        r["week"]: r["approx_uniques"]
        for r in hll_merge_estimate(
            hll_rollup(ev, ["week"], "user_id"), ["week"]
        ).collect()
    }
    assert weekly == direct
    # partitioning invariance
    re_part = {
        r["week"]: r["approx_uniques"]
        for r in hll_merge_estimate(stored.repartition(7), ["week"]).collect()
    }
    assert re_part == weekly
