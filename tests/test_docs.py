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


def test_driver_window_is_round12():
    """VERDICT r7 #8: the active rotation must match the documented round.

    The round-12 window (VERDICT r11 task 1): the round's one NEW key
    first (emb_recall_planted — the only key with no external row
    ever), then llm_simpson (query/oracle text changed this round by
    the Σc² decimal widening, also r6-vintage), then the complete
    remaining r6-vintage backlog (43 keys), then the first five
    r7-vintage keys in registry order. Every name must resolve (typos
    would silently waste the driver's 50-key sample).
    """
    from flirt_consume_spark.queries import _ROUND12_WINDOW

    assert len(_ROUND12_WINDOW) == 50
    assert len(set(_ROUND12_WINDOW)) == 50, "window repeats a key"
    assert _ROUND12_WINDOW[:2] == ["emb_recall_planted", "llm_simpson"], (
        "the never-checked key and the changed-this-round key lead"
    )
    # The complete r6-vintage staleness backlog is in the window.
    r6_backlog = {
        "agg_abc", "agg_approx_distinct", "agg_approx_percentile",
        "agg_bucketed", "agg_concurrency", "agg_distinct", "agg_pivot",
        "agg_rollup", "agg_route", "alloc_remainder",
        "attribution_touch", "audit_benford", "audit_fk", "audit_srm",
        "bm25_rank", "dedup_rank", "emb_covariance",
        "emb_power_iteration", "graph_ancestors", "join_asof",
        "join_enrich", "join_pointpoly", "join_range", "join_setsim",
        "llm_collocations", "llm_dupspans", "llm_simpson",
        "llm_winnow", "sample_weighted", "scan_variant",
        "scd2_history", "set_union", "shape_market_share",
        "shape_product_profit", "shape_volume_shipping",
        "temporal_align", "time_cusum", "time_downsample",
        "time_seasonal", "topk", "udf_scalar_iter", "win_drawdown",
        "win_rolling", "win_transitions",
    }
    assert len(r6_backlog) == 44
    assert r6_backlog <= set(_ROUND12_WINDOW)
    assert list(REGISTRY)[:50] == _ROUND12_WINDOW, (
        "REGISTRY insertion order must start with the round-12 window"
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
