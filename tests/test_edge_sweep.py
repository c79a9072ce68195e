"""Degenerate-input robustness: every query family must survive an
empty source directory and a one-row-per-table directory.

This is the pinned pytest slice of ``tools/edge_sweep.py`` (the
standalone runner covers all registry keys at round close; this
subset keeps the suite fast while still covering every module and
every risky shape — iterative driver loops, argmax collects,
checkpointed range layouts, session-cached fits).

Why it matters at 100 TB: empty partitions are ROUTINE in production
(a month with no flights, a filter that eliminates a source, an
upstream job that wrote zero rows). An operator that throws
IndexError on an empty frame is a pipeline outage; the contract is
"well-formed empty result" (or a deliberate, documented guard).
"""

from __future__ import annotations

import pytest

from flirt_consume_spark.queries import REGISTRY
from tools.edge_sweep import make_degenerate

SF = "/root/testdata/sf0.001"

# One key per risky implementation shape, spanning every module:
# driver-side iterative loops (argmax/centroid collects), session-
# cached fits, checkpointed range layouts, multi-stage graph loops,
# pandas-UDF kernels, sketch builders, and plain relational plans.
KEYS = [
    "agg_route",  # hash agg
    "agg_percentile",  # staged grouped_percentiles rank path
    "agg_weighted_median",  # bucketized weighted quantile
    "win_rank",  # ranking_family fold + global_rank checkpoint
    "audit_ks",  # multi-counter global_cumsum
    "join_asof",  # union + running scan
    "join_setsim",  # LSH banding + verify
    "graph_pagerank",  # fixed-round iterative joins
    "graph_bfs_dist",  # frontier loop with driver-side convergence
    "graph_kcore",  # peel loop
    "dedup_components_star",  # star-contraction loop
    "emb_kmeans",  # Lloyd's with driver centroid collect
    "emb_mmr",  # greedy k-round selection
    "emb_pca_project",  # power-iteration fit cache
    "llm_bpe_train",  # argmax collect per round (regression: IndexError)
    "llm_bpe_encode",  # consumes the cached BPE fit
    "llm_semdedup",  # k-means cells + in-cell pairing
    "llm_minhash_dedup",  # minhash bands
    "llm_quality",  # text heuristics
    "llm_multimodal",  # NULL-payload pandas kernel (regression)
    "scan_binary",  # NULL-text fixture build (regression)
    "scan_text",  # tab-line round-trip of NULL text (regression)
    "udtf_expand",  # UDTF generator over NULL text (regression)
    "udtf_analyze",  # UDTF analyze-chunk over NULL text (regression)
    "udtf_table_arg",  # UDTF table-arg NULL-sum convention (regression)
    "win_rolling_median",  # all-NULL frame selection (regression)
    "time_theilsen",  # NULL-slope pair filter (regression)
    "agg_subsample_ci",  # short replica array selection (regression)
    "audit_ttest",  # zero-variance try_divide family (regression)
    "agg_ols",  # constant-regressor var_x = 0 (skew regression)
    "time_kalman",  # per-series recursive pandas UDF
    "time_viterbi",  # per-series DP pandas UDF
    "stream_tumbling",  # streaming-semantics batch twin
    "sample_reservoir",  # hierarchical top-k
    "agg_cms",  # count-min sketch rows
    "scan_filemeta",  # file-metadata source
    "sink_compact",  # writes derived output dir
    "sink_upsert",  # partitioned write + schema'd read-back (regression)
    "scan_partitioned",  # hive-layout read-back (regression)
    "join_dpp",  # DPP fact read-back (regression)
    "agg_histogram",  # min==max bucket-width guard (regression)
    "profile_table",  # whole-table profiling
    "sql_recursive",  # recursive-CTE expansion loop
    "topk",  # TakeOrdered path
]


@pytest.fixture(scope="module", params=["empty", "one", "nulls", "skew"])
def degenerate_dir(request, tmp_path_factory):
    root = tmp_path_factory.mktemp("edge")
    return make_degenerate(SF, str(root), request.param)


@pytest.mark.parametrize("key", KEYS)
def test_degenerate_input_no_crash(spark, degenerate_dir, key):
    df = REGISTRY[key].fn(spark, degenerate_dir)
    # noop sink: full evaluation of every output column (a bare
    # count() lets Catalyst prune a crashing projection out of the
    # plan); then the count must be well-defined and the schema the
    # key's declared shape.
    df.write.format("noop").mode("overwrite").save()
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
