"""Doc-drift guards: artifacts the judge reads must match the code.

VERDICT r6 #6: IMPLEMENTATION.md's headline key count silently lagged
the registry twice (178→255→272); pin it so the next addition fails
fast here instead of shipping stale docs.
"""

from __future__ import annotations

import os
import re

from flirt_consume_spark.queries import REGISTRY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_implementation_md_key_count_matches_registry():
    with open(os.path.join(REPO, "IMPLEMENTATION.md")) as fh:
        head = fh.read(400)
    m = re.search(r"^(\d+) query keys registered", head, re.M)
    assert m, "IMPLEMENTATION.md must state '<N> query keys registered'"
    assert int(m.group(1)) == len(REGISTRY), (
        f"IMPLEMENTATION.md says {m.group(1)} keys, REGISTRY has "
        f"{len(REGISTRY)} — update the doc headline"
    )


def test_entry_point_exposes_full_registry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    q, o = mod.queries(), mod.oracle_sql()
    assert set(q) == set(REGISTRY)
    # every key ships an oracle (ROWS_ONLY keys would be absent here;
    # the registry currently has none)
    assert set(o) == {k for k, s in REGISTRY.items() if s.oracle}


def test_driver_window_is_round13():
    """VERDICT r7 #8: the active rotation must match the documented round.

    The round-13 window: the keys whose internals were restructured by
    this optimization round lead (fresh external rows on the live
    plans are worth the most), then the complete r7-vintage staleness
    backlog minus the two stream keys deferred to round 14 (they carry
    independent stream==batch equivalence evidence — the r11
    precedent). Every name must resolve (typos would silently waste
    the driver's 50-key sample).
    """
    from flirt_consume_spark.queries import _ROUND13_WINDOW

    assert len(_ROUND13_WINDOW) == 50
    assert len(set(_ROUND13_WINDOW)) == 50, "window repeats a key"
    # changed-this-round keys lead
    assert _ROUND13_WINDOW[0] == "agg_weighted_median"
    changed = {
        "agg_weighted_median", "join_setsim", "audit_fk",
        "shape_local_supplier_volume", "shape_market_share",
        "scan_pyds", "sink_pyds", "llm_ngram_jaccard",
        "llm_minhash_dedup", "dedup_components",
        "dedup_components_star", "llm_semdedup", "llm_cross_dedup",
    }
    assert changed <= set(_ROUND13_WINDOW[: len(changed)])
    # The r7-vintage backlog is covered except the two deferred
    # stream keys (computed from the CORRECTNESS_r* history by
    # tools at window construction; pinned literally here).
    r7_backlog = {
        "agg_cms", "agg_mode", "agg_skew_kurt", "cdc_time_travel",
        "emb_mmr", "graph_assortativity", "graph_bfs_dist",
        "join_geo_nearest", "join_interval_overlap", "join_nullsafe",
        "llm_bpe_pairs", "llm_hash_embed", "llm_ngram_lm",
        "sample_reservoir", "shape_custdist",
        "shape_disjunctive_revenue", "shape_forecast_revenue",
        "shape_important_stock", "shape_parts_supplier",
        "shape_potential_promotion", "shape_promo_effect",
        "shape_returned_items", "shape_small_qty_revenue",
        "shape_top_customers", "shape_top_supplier",
        "sql_distant_customers", "sql_lateral", "sql_min_cost",
        "sql_pivot", "sql_recursive", "sql_waiting_orders",
        "time_interpolate", "time_interval_merge", "time_workdays",
        "win_locf", "win_range_hour", "win_zscore",
    }
    assert len(r7_backlog) == 37
    assert r7_backlog <= set(_ROUND13_WINDOW)
    assert list(REGISTRY)[:50] == _ROUND13_WINDOW, (
        "REGISTRY insertion order must start with the round-13 window"
    )


def test_divergence_rulings_present_and_complete():
    """VERDICT r11 task 6: every surviving mirror divergence carries a
    permanent ruling in IMPLEMENTATION.md. The pins (edge-sweep
    expectations + the two pinned divergence tests) reference rulings
    R1-R7 by id; this test keeps the section and all seven ids alive
    so a doc edit cannot orphan a pin."""
    with open(os.path.join(REPO, "IMPLEMENTATION.md")) as fh:
        doc = fh.read()
    assert "Permanent divergence rulings" in doc
    for rid, key in [
        ("R1", "agg_rollup"), ("R2", "agg_cube"),
        ("R3", "agg_grouping_sets"), ("R4", "scan_filemeta"),
        ("R5", "llm_editdist"), ("R6", "agg_percentile"),
        ("R7", "agg_approx_percentile"),
    ]:
        assert f"**{rid} " in doc or f"{rid} `{key}`" in doc, (rid, key)
        assert f"`{key}`" in doc, key
