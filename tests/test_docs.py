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


def test_driver_window_is_round11():
    """VERDICT r7 #8: the active rotation must match the documented round.

    The round-11 window finishes the staleness drain (VERDICT r10 task
    1): changed-this-round keys first (the two decimal widenings + the
    three timezone-free oracle rewrites), then the remaining r4-vintage
    streaming keys, then ALL 42 r5-vintage keys — after this window no
    key's latest external driver row predates round 6. Every name must
    resolve (typos would silently waste the driver's 50-key sample).
    """
    from flirt_consume_spark.queries import _ROUND11_WINDOW

    assert len(_ROUND11_WINDOW) == 50
    assert len(set(_ROUND11_WINDOW)) == 50, "window repeats a key"
    assert _ROUND11_WINDOW[:5] == [
        "win_bollinger", "agg_ols",
        "stream_tumbling", "stream_sliding", "stream_ohlc",
    ], "keys whose query/oracle text changed this round lead the window"
    # The complete sub-r6 staleness backlog is in the window: the five
    # r4-vintage streaming keys plus all 42 r5-vintage keys.
    r4_backlog = {
        "stream_dedup", "stream_session", "stream_sliding",
        "stream_static", "stream_tumbling",
    }
    r5_backlog = {
        "agg_bitmap_distinct", "agg_bitmap_intersect",
        "agg_grouping_sets", "agg_mad_outliers", "agg_sketch_merge",
        "agg_time_weighted", "cdc_apply", "cohort_retention",
        "emb_kmeans", "emb_quantize", "graph_pagerank",
        "graph_triangles", "join_asof_nearest", "join_bloom",
        "join_colocated", "join_geo", "llm_chunk", "llm_contaminate",
        "llm_corpus_pipeline", "llm_dataset_card", "llm_heavy_hitters",
        "llm_inverted_index", "llm_rarity", "llm_tfidf",
        "pareto_frontier", "profile_table", "sample_mixture",
        "scan_badrecords", "scan_evolve", "scan_orc", "scan_pyds",
        "scd2_lookup", "sink_merge", "sink_zorder", "snapshot_diff",
        "sql_exists", "time_gap_fill", "time_islands", "time_ohlc",
        "udf_arrow", "win_ewma", "win_running_distinct",
    }
    assert len(r5_backlog) == 42
    assert (r4_backlog | r5_backlog) <= set(_ROUND11_WINDOW)
    assert list(REGISTRY)[:50] == _ROUND11_WINDOW, (
        "REGISTRY insertion order must start with the round-11 window"
    )
