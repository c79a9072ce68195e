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
#   round 6: the 35 keys never driver-checked as of round 5 + 15 stale
#     r3-vintage keys whose code changed since their last driver row.
#     Outcome (CORRECTNESS_r06.json): all 50 green.
#   round 7: the first 50 (registry order) of the 94 round-6 additions
#     that still had zero driver rows, graph_assortativity promoted to
#     slot 1 (sf0.1 overflow fix needed a driver row on fixed code).
#     Outcome (CORRECTNESS_r07.json): all 50 green.
#   round 8 (this list): the final 44 keys that have never had a driver
#     row, then 6 stale-backfill slots: agg_percentile + agg_winsorize
#     (r3/r5 driver rows predate their round-7 rewrite onto
#     grouped_percentiles AND this round's shared-rank optimization),
#     agg_gini + agg_delta_method* (round-7 decimal widenings from the
#     capacity audit; *delta_method is already in the 44),
#     project_rename + filter_valid + expand_schedule (the three
#     stalest r3-vintage rows). After this window every registry key
#     has externally-recorded driver evidence at least once.
_ROUND8_WINDOW = [
    "audit_ttest", "time_survival", "time_holt", "time_kalman",
    "time_crosscorr", "time_viterbi", "agg_argmax", "win_nth",
    "set_intersect_all", "scan_filemeta", "llm_gram_novelty",
    "audit_kanon", "audit_chisq", "time_autocorr", "time_rle",
    "sample_systematic", "llm_bpe_train", "llm_bpe_encode",
    "set_union_byname", "agg_delta_method", "audit_contract",
    "eval_confusion", "quota_budget_select", "eval_pr_curve",
    "eval_auc", "sql_params", "anon_generalize", "scalar_try",
    "eval_calibration", "time_theilsen", "time_mannkendall",
    "time_pettitt", "time_vwap", "agg_basket_pairs",
    "graph_node_jaccard", "agg_subsample_ci", "str_mask",
    "scan_partitioned", "win_bollinger", "llm_cross_dedup",
    "graph_kcore", "sql_unpivot", "time_hopping", "llm_index_size",
    # stale backfill (6)
    "agg_percentile", "agg_winsorize", "agg_gini",
    "project_rename", "filter_valid", "expand_schedule",
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


_rotate_front(_ROUND8_WINDOW)
