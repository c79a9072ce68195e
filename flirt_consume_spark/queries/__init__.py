"""Query registry: every SURVEY.md §2 operator as a (Spark, oracle-SQL) pair.

Importing this package populates ``REGISTRY``; ``__spark_entry__.py``
exposes it to the driver, and ``tools/check.py`` + tests verify each
pair locally against DuckDB with the exact driver semantics
(row count + schema + order-insensitive value hash).
"""

from flirt_consume_spark.queries.base import REGISTRY, QuerySpec  # noqa: F401

# Import for side effect: each module registers its query keys.
# (Import order no longer controls the driver window — see the explicit
# key-level rotation below, which is precise where module order wasn't.)
from flirt_consume_spark.queries import mixture  # noqa: F401,E402
from flirt_consume_spark.queries import lifecycle  # noqa: F401,E402
from flirt_consume_spark.queries import sketches  # noqa: F401,E402
from flirt_consume_spark.queries import robust  # noqa: F401,E402
from flirt_consume_spark.queries import advanced  # noqa: F401,E402
from flirt_consume_spark.queries import corpus  # noqa: F401,E402
from flirt_consume_spark.queries import evolution  # noqa: F401,E402
from flirt_consume_spark.queries import analytics  # noqa: F401,E402
from flirt_consume_spark.queries import retrieval  # noqa: F401,E402
from flirt_consume_spark.queries import governance  # noqa: F401,E402
from flirt_consume_spark.queries import relational  # noqa: F401,E402
from flirt_consume_spark.queries import temporal  # noqa: F401,E402
from flirt_consume_spark.queries import scalar  # noqa: F401,E402
from flirt_consume_spark.queries import windows  # noqa: F401,E402
from flirt_consume_spark.queries import llm  # noqa: F401,E402
from flirt_consume_spark.queries import extras  # noqa: F401,E402
from flirt_consume_spark.queries import shapes  # noqa: F401,E402
from flirt_consume_spark.queries import tpch_tail  # noqa: F401,E402
from flirt_consume_spark.queries import pipeline  # noqa: F401,E402
from flirt_consume_spark.queries import streaming  # noqa: F401,E402
from flirt_consume_spark.queries import enrich  # noqa: F401,E402
from flirt_consume_spark.queries import distrib  # noqa: F401,E402
from flirt_consume_spark.queries import curation  # noqa: F401,E402
from flirt_consume_spark.queries import trend  # noqa: F401,E402
from flirt_consume_spark.queries import facets  # noqa: F401,E402
from flirt_consume_spark.queries import leakage  # noqa: F401,E402
from flirt_consume_spark.queries import hopping  # noqa: F401,E402

# --- driver-window rotation ----------------------------------------------
# External verifiers sample REGISTRY in insertion order with a bounded
# window of 50 keys per round. Rotation plan (updated each round):
#   round 6 (this list): the 35 keys that had never received a
#     driver-side CORRECTNESS row as of round 5 (all round-5 late
#     additions in retrieval/governance/shapes/extras/streaming), then
#     15 of the stalest r3-vintage keys whose code changed since their
#     last driver row (loader rewrite + the win_ntile/sort_global
#     distributed-rank rewrites), exactly filling the window.
#   round 7 (next): FIRST the 42 round-6 additions with zero driver
#     rows so far —
#     13 early (queries/enrich.py: win_locf, join_interval_overlap,
#       shape_custdist, shape_top_customers, llm_ngram_lm,
#       llm_bpe_pairs, sql_waiting_orders, sql_distant_customers,
#       sql_min_cost, cdc_time_travel, join_geo_nearest,
#       llm_hash_embed, win_zscore),
#     8 TPC-H tail shapes (queries/tpch_tail.py:
#       shape_forecast_revenue, shape_promo_effect, shape_top_supplier,
#       shape_parts_supplier, shape_small_qty_revenue,
#       shape_disjunctive_revenue, shape_potential_promotion,
#       shape_important_stock),
#     16 engine-surface late additions (stream_join, sql_recursive,
#       agg_mode, join_nullsafe, win_range_hour, sql_lateral, scan_xml,
#       udtf_analyze, sql_pivot, scan_binary, agg_skew_kurt,
#       time_workdays, agg_weighted_median, stream_outer,
#       time_interval_merge, emb_recall_eval),
#     5 distributional/traversal additions (queries/distrib.py:
#       audit_ks, time_interpolate, graph_bfs_dist, sample_reservoir,
#       agg_cms)
#     plus udtf_table_arg (queries/extras.py, TABLE-argument UDTF)
#     and sink_pyds (queries/advanced.py, Python data source writer),
#     plus the 15 curation-wave keys (queries/curation.py: agg_argmax,
#       win_nth, set_intersect_all, scan_filemeta, llm_gram_novelty,
#       audit_kanon, audit_chisq, time_autocorr, time_rle,
#       sample_systematic, llm_bpe_train, set_union_byname,
#       agg_delta_method, audit_contract, llm_bpe_encode,
#       eval_confusion, quota_budget_select, eval_pr_curve,
#       eval_auc, sql_params, anon_generalize, scalar_try,
#       eval_calibration;
#       queries/tpch_tail.py: shape_returned_items;
#       queries/advanced.py: llm_semdedup;
#       queries/retrieval.py: emb_pca_project, emb_mmr;
#       queries/distrib.py: audit_mannwhitney, audit_ttest)
#     plus the 11 round-6 fourth/fifth-wave keys (queries/trend.py:
#       time_theilsen, time_mannkendall, time_pettitt, time_vwap,
#       agg_basket_pairs, graph_node_jaccard, agg_subsample_ci;
#       queries/facets.py: str_mask, scan_partitioned, win_bollinger,
#       graph_assortativity;
#       queries/leakage.py: llm_cross_dedup, graph_kcore, sql_unpivot)
#     — that makes 90+, overfilling the 50-slot window; push
#     the overflow to round 8 ahead of the
#     oldest r3-vintage keys (relational/temporal/scalar block:
#     filter_*, join_anti/semi/outer,
#     agg_conditional/percentile/collect/stats/cube, set_diff,
#     unpivot_long, str_*, math_scalar, array/map_ops, json_extract,
#     geo_haversine, expand_schedule, time_normalize/bucket/duration,
#     win_firstlast/distribution, join_asof_fwd), then the oldest
#     r4-vintage keys.
_ROUND6_WINDOW = [
    # 35 never-driver-checked (per CORRECTNESS_r01..r05 artifacts)
    "agg_abc", "agg_approx_percentile", "agg_bucketed", "agg_concurrency",
    "agg_cuped", "agg_gini", "agg_ols", "alloc_remainder",
    "attribution_touch", "audit_benford", "audit_fk", "audit_srm",
    "bm25_rank", "emb_covariance", "emb_power_iteration", "graph_ancestors",
    "join_pointpoly", "join_setsim", "llm_collocations", "llm_dupspans",
    "llm_simpson", "llm_winnow", "sample_weighted", "scan_variant",
    "shape_market_share", "shape_product_profit", "shape_volume_shipping",
    "stream_ohlc", "temporal_align", "time_cusum", "time_downsample",
    "time_seasonal", "udf_scalar_iter", "win_drawdown", "win_transitions",
    # 15 stalest r3-vintage keys most affected by later rewrites
    "agg_approx_distinct", "win_ntile", "sort_global", "topk",
    "agg_route", "agg_distinct", "agg_rollup", "agg_pivot",
    "join_enrich", "join_asof", "join_range", "dedup_rank",
    "win_rolling", "set_union", "scd2_history",
]


def _rotate_front(front: list[str]) -> None:
    missing = [k for k in front if k not in REGISTRY]
    if missing:  # fail loudly: a typo here would silently waste the window
        raise KeyError(f"rotation names unknown query keys: {missing}")
    snap = dict(REGISTRY)
    order = front + [k for k in snap if k not in set(front)]
    REGISTRY.clear()
    for k in order:
        REGISTRY[k] = snap[k]


_rotate_front(_ROUND6_WINDOW)
