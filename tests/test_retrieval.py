"""Invariant tests for the retrieval/governance round-5 additions:
prefix-filtering losslessness, BM25 ranking sanity, the distributed
prefix sum, and determinism of the weighted sample.

Oracle hash-parity for every key is covered by test_oracle_parity; the
tests here pin the ALGORITHMIC claims the oracles can't express
(recall == 1.0 vs brute force, scale-path == single-reducer result).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flirt_consume_spark.operators import dedup as D
from flirt_consume_spark.operators import retrieval as R
from flirt_consume_spark.operators.scale import global_cumsum
from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.queries.base import t


def test_prefix_filter_lossless(spark, sf_dir):
    """The prefix filter must find EXACTLY the brute-force pair set —
    recall 1.0 (the lossless claim) and precision 1.0 (exact verify)."""
    sh = D.shingle_table(t(spark, sf_dir, "documents"))
    got = {
        (r.id_a, r.id_b, r.n_inter, r.n_union)
        for r in R.prefix_filtered_pairs(sh, tau_num=2, tau_den=5).collect()
    }
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    brute = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .join(sizes.select(F.col("doc_id").alias("id_a"),
                           F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"),
                           F.col("n").alias("nb")), "id_b")
        .withColumn("n_union", F.col("na") + F.col("nb") - F.col("n_inter"))
        .filter(5 * F.col("n_inter") >= 2 * F.col("n_union"))
    )
    want = {
        (r.id_a, r.id_b, r.n_inter, r.n_union) for r in brute.collect()
    }
    assert got == want
    assert len(got) > 0  # non-vacuous: sf0.001 has near-dup docs


def test_bm25_rare_term_dominates(spark, sf_dir):
    """A doc containing the rare query term must outscore every doc
    containing only the common terms (rational idf ordering)."""
    docs = t(spark, sf_dir, "documents")
    from flirt_consume_spark.operators.text import tokens

    stream = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    scored = R.bm25_scores(stream, ("dup", "spark", "merge")).collect()
    has_rare = {
        r.doc_id
        for r in stream.filter(F.col("token") == "dup")
        .select("doc_id").distinct().collect()
    }
    if not has_rare:
        pytest.skip("no rare-term docs at this sf")
    best_without = max(
        (r.bm25 for r in scored if r.doc_id not in has_rare), default=0.0
    )
    worst_with = min(r.bm25 for r in scored if r.doc_id in has_rare)
    assert worst_with > best_without


def test_global_cumsum_matches_single_reducer(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderkey").alias("v")
    )
    got = global_cumsum(
        orders, "v", [F.col("v").desc(), F.col("o_orderkey")]
    )
    from pyspark.sql.window import Window

    w = (
        Window.orderBy(F.col("v").desc(), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = orders.withColumn("cum", F.sum("v").over(w))
    assert {(r.o_orderkey, r.cum) for r in got.collect()} == {
        (r.o_orderkey, r.cum) for r in want.collect()
    }


def test_global_cumsum_rejects_float():
    import pandas as pd
    from flirt_consume_spark.session import get_spark

    spark = get_spark("tests")
    df = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]}))
    with pytest.raises(ValueError, match="integral"):
        global_cumsum(df, "v", [F.col("k")])


def test_sample_weighted_deterministic(spark, sf_dir):
    fn = REGISTRY["sample_weighted"].fn
    a = [(r.o_orderkey, r.priority) for r in fn(spark, sf_dir).collect()]
    b = [(r.o_orderkey, r.priority) for r in fn(spark, sf_dir).collect()]
    assert a == b
    assert len(a) > 0 and len(a) <= 100


def test_agg_abc_partitions_revenue(spark, sf_dir):
    rows = REGISTRY["agg_abc"].fn(spark, sf_dir).collect()
    classes = {r.abc_class for r in rows}
    assert classes <= {"A", "B", "C"}
    li = t(spark, sf_dir, "lineitem")
    total_parts = li.select("l_partkey").distinct().count()
    assert sum(r.n_parts for r in rows) == total_parts


def test_attribution_models_agree_on_total(spark, sf_dir):
    rows = REGISTRY["attribution_touch"].fn(spark, sf_dir).collect()
    first = [r for r in rows if r.model == "first_touch"]
    last = [r for r in rows if r.model == "last_touch"]
    assert abs(
        sum(r.revenue for r in first) - sum(r.revenue for r in last)
    ) < 1e-6
    assert sum(r.n_conversions for r in first) == sum(
        r.n_conversions for r in last
    )


def test_audit_fk_clean_on_fixture(spark, sf_dir):
    rows = REGISTRY["audit_fk"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    # the synthetic TPC-H-ish fixture is referentially intact
    assert all(r.n_orphans == 0 for r in rows)
    assert all(r.n_rows > 0 for r in rows)


def test_dupspans_spans_are_maximal_and_real(spark, sf_dir):
    """Every reported span must be reproducible from the raw token
    arrays: tokens[start_a : start_a+len] == tokens[start_b : ...]."""
    from flirt_consume_spark.operators.text import tokens

    docs = {
        r.doc_id: r.tok
        for r in t(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("tok"))
        .collect()
    }
    rows = REGISTRY["llm_dupspans"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        a = docs[r.doc_a][r.start_a - 1 : r.start_a - 1 + r.len_tokens]
        b = docs[r.doc_b][r.start_b - 1 : r.start_b - 1 + r.len_tokens]
        assert a == b and len(a) == r.len_tokens >= 9


def test_concurrency_bounds(spark, sf_dir):
    """Peak concurrency is positive and never exceeds the number of
    intervals alive in that month's 7-day reach."""
    rows = REGISTRY["agg_concurrency"].fn(spark, sf_dir).collect()
    total = t(spark, sf_dir, "orders").count()
    assert len(rows) > 0
    assert all(0 < r.peak_active <= total for r in rows)
    # sweep conservation: the running count never dips below zero and
    # returns to exactly zero after the last boundary (every +1 start
    # is matched by its -1 end).
    from flirt_consume_spark.operators.scale import global_cumsum

    orders = t(spark, sf_dir, "orders")
    starts = orders.select(
        F.col("o_orderdate").alias("d"), F.lit(1).alias("delta"), "o_orderkey"
    )
    ends = orders.select(
        F.date_add("o_orderdate", 7).alias("d"),
        F.lit(-1).alias("delta"),
        "o_orderkey",
    )
    swept = global_cumsum(
        starts.unionByName(ends),
        "delta",
        [F.col("d"), F.col("delta"), F.col("o_orderkey")],
        cum_col="cur",
    )
    assert swept.agg(F.min("cur")).collect()[0][0] >= 0
    last = (
        swept.orderBy(F.col("d").desc(), F.col("delta").desc(),
                      F.col("o_orderkey").desc())
        .limit(1)
        .collect()[0]
    )
    assert last.cur == 0


def test_temporal_align_segments_tile(spark, sf_dir):
    """Aligned segments must tile each key's timeline: consecutive,
    non-overlapping, seg_end == next seg_start."""
    rows = REGISTRY["temporal_align"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    by_key = {}
    for r in rows:
        by_key.setdefault(r.custkey, []).append(r)
    checked = 0
    for segs in by_key.values():
        # zero-length segments (same-day events) sort by end too;
        # the open final segment (None end) sorts last
        segs.sort(
            key=lambda r: (r.seg_start, r.seg_end is None, r.seg_end or "")
        )
        for cur, nxt in zip(segs, segs[1:]):
            assert cur.seg_end == nxt.seg_start
            checked += 1
        # only the final (open) segment may have NULL end
        assert all(s.seg_end is not None for s in segs[:-1])
        assert segs[-1].seg_end is None
    assert checked > 0


def test_collocations_lift_consistent(spark, sf_dir):
    """Reported lift must equal n*c_ab/(c_a*c_b) recomputed from the
    raw bigram stream, and support floor must hold."""
    rows = REGISTRY["llm_collocations"].fn(spark, sf_dir).collect()
    if not rows:
        pytest.skip("support floor above sf fixture counts")
    from flirt_consume_spark.operators.text import shingles, tokens

    toks = (
        t(spark, sf_dir, "documents")
        .select(tokens("text").alias("tok"))
        .filter(F.size("tok") >= 2)
    )
    bigs = toks.select(F.explode(shingles("tok", 2)).alias("bg")).collect()
    from collections import Counter

    c_ab = Counter(r.bg for r in bigs)
    c_a = Counter(r.bg.split(" ")[0] for r in bigs)
    n = len(bigs)
    import math

    for r in rows:
        assert r.c_ab == c_ab[f"{r.w1} {r.w2}"] >= 30
        want = math.floor(n * r.c_ab / (c_a[r.w1] * c_a[r.w2]) * 1e6) / 1e6
        assert abs(r.lift - want) < 1e-9


def test_gini_matches_direct_formula(spark, sf_dir):
    rows = REGISTRY["agg_gini"].fn(spark, sf_dir).collect()
    assert rows and all(0.0 <= r.gini < 1.0 for r in rows)
    # recompute one segment driver-side from raw data
    import math

    seg = rows[0].segment
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == seg)
    xs = sorted(
        (int(r[0]), r[1])
        for r in orders.join(
            cust, orders["o_custkey"] == cust["c_custkey"]
        )
        .selectExpr("CAST(floor(o_totalprice*100) AS LONG)", "o_orderkey")
        .collect()
    )
    xs = [v for v, _k in sorted(xs, key=lambda t_: (t_[0], t_[1]))]
    n, sx = len(xs), sum(xs)
    srx = sum((i + 1) * v for i, v in enumerate(xs))
    want = math.floor((2 * srx - (n + 1) * sx) / (n * sx) * 1e6) / 1e6
    got = [r.gini for r in rows if r.segment == seg][0]
    assert abs(got - want) < 1e-9


def test_drawdown_matches_naive(spark, sf_dir):
    rows = {
        r.user_id: r.max_drawdown
        for r in REGISTRY["win_drawdown"].fn(spark, sf_dir).collect()
    }
    assert rows and all(v >= 0 for v in rows.values())
    ev = sorted(
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    from collections import defaultdict

    import math

    series = defaultdict(list)
    for r in ev:
        series[r.user_id].append(math.floor(r.value * 1e6) - 50_000_000)

    for uid, vals in series.items():
        cum, peak, worst = 0, None, 0
        for v in vals:
            cum += v
            peak = cum if peak is None else max(peak, cum)
            worst = max(worst, peak - cum)
        assert abs(rows[uid] - worst / 1e6) < 1e-6, uid


def test_downsample_picks_real_points(spark, sf_dir):
    got = REGISTRY["time_downsample"].fn(spark, sf_dir).collect()
    assert got
    ev = t(spark, sf_dir, "events").selectExpr(
        "event_type",
        "unix_micros(ts) div 1000000 AS xs",
        "CAST(floor(value*1e6) AS LONG) AS yl",
    ).collect()
    pts = {(r.event_type, r.xs, r.yl) for r in ev}
    per_series = {}
    for r in got:
        assert (r.event_type, r.ts_sec, int(round(r.value * 1e6))) in pts
        per_series.setdefault(r.event_type, set()).add(r.bucket)
    # each series covered by the full bucket range (n >> NB here)
    for btk in per_series.values():
        assert btk == set(range(50))


def test_transitions_rows_normalize(spark, sf_dir):
    rows = REGISTRY["win_transitions"].fn(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_prev = defaultdict(float)
    for r in rows:
        assert 0.0 <= r.prob <= 1.0
        by_prev[r.prev_type] += r.prob
    # floor-rounding loses < 1e-6 per cell; rows sum to ~1
    assert all(abs(s - 1.0) < 1e-4 for s in by_prev.values())


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = REGISTRY["audit_benford"].fn(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.expected for r in rows if r.expected) - 1.0) < 1e-4


def test_srm_statistic_nonnegative(spark, sf_dir):
    r = REGISTRY["audit_srm"].fn(spark, sf_dir).collect()[0]
    assert r.chi2 >= 0 and r.n_a + r.n_b > 0
    # parity split of user ids is balanced on the fixture
    assert r.srm is False


def test_winnow_guarantee(spark, sf_dir):
    """Winnowing guarantee: two docs sharing a substring of
    >= w + gram - 1 tokens share at least one selected fingerprint.
    The dup-family pairs found by llm_dupspans (>= 9 shared tokens,
    gram=3, w=4 => threshold 6) must overlap in fingerprints."""
    from pyspark.sql.window import Window as W2

    from flirt_consume_spark.operators.text import shingles, tokens

    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("_tok")).filter(
        F.size("_tok") >= 3
    )
    hashed = toks.select(
        "doc_id", F.posexplode(shingles("_tok", 3)).alias("_p0", "sh")
    ).select("doc_id", F.col("_p0").alias("i"), F.md5("sh").alias("h"))
    w = W2.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)
    fps = {}
    for r in hashed.select(
        "doc_id", F.min("h").over(w).alias("fp")
    ).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    pairs = REGISTRY["llm_dupspans"].fn(spark, sf_dir).collect()
    assert pairs
    for p in pairs:
        assert fps[p.doc_a] & fps[p.doc_b], (p.doc_a, p.doc_b)


def test_alloc_sums_exactly_to_totals(spark, sf_dir):
    """The allocation invariant largest-remainder exists for: per
    order, allocated cents sum EXACTLY to the order's cent total."""
    rows = REGISTRY["alloc_remainder"].fn(spark, sf_dir)
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("total"),
    )
    per_order = rows.groupBy("l_orderkey").agg(
        F.sum("alloc_cents").alias("s")
    )
    bad = (
        per_order.join(orders, "l_orderkey")
        .filter(F.col("s") != F.col("total"))
        .count()
    )
    assert bad == 0
    assert rows.filter(F.col("alloc_cents") < 0).count() == 0


def test_ancestors_chains_are_consistent(spark, sf_dir):
    """Every depth-d ancestor must be reachable by composing d
    single-parent hops (checked by rebuilding chains driver-side)."""
    rows = REGISTRY["graph_ancestors"].fn(spark, sf_dir).collect()
    assert rows
    parents = {}
    for r in rows:
        if r.depth == 1:
            parents[r.node] = r.ancestor
    for r in rows:
        cur = r.node
        for _ in range(r.depth):
            assert cur in parents, (r.node, r.depth)
            cur = parents[cur]
        assert cur == r.ancestor, (r.node, r.depth, r.ancestor)


def test_covariance_psd_diagonal_and_symmetry_slice(spark, sf_dir):
    """Variances (diagonal) are non-negative, and the matrix agrees
    with numpy's covariance on the raw vectors (up to the declared
    1e-9 floor grid)."""
    import numpy as np

    rows = REGISTRY["emb_covariance"].fn(spark, sf_dir).collect()
    cov = {(r.i, r.j): r.cov for r in rows}
    assert all(cov[(i, i)] >= 0 for i in range(1, 65))
    vecs = np.array(
        [
            r.embedding
            for r in t(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ]
    )
    xl = np.floor(vecs * 1e6) / 1e6
    n = xl.shape[0]
    want = (xl.T @ xl) / n - np.outer(xl.mean(axis=0), xl.mean(axis=0))
    for (i, j), got in cov.items():
        assert abs(got - want[i - 1, j - 1]) < 2e-9, (i, j)


def test_power_iteration_matches_numpy_kernel(spark, sf_dir):
    """The distributed 3-iteration power-method kernel must agree with
    an independent numpy replication of the same algebra (to the
    declared floor grids), and its iterates must obey the PSD
    invariant: the Rayleigh quotient is non-decreasing step to step —
    true for ANY spectrum, unlike eigenvector alignment, which
    depends on the data's spectral gap (the fixture's is ~0.93, far
    too flat for 3 iterations to converge — that trade is documented
    on the key)."""
    import numpy as np

    got = {
        r.i: r.v
        for r in REGISTRY["emb_power_iteration"].fn(spark, sf_dir).collect()
    }
    v = np.array([got[i] for i in range(1, 65)])
    vecs = np.array(
        [
            r.embedding
            for r in t(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ]
    )
    xl = np.floor(vecs * 1e6) / 1e6
    n = xl.shape[0]
    # the same floored covariance the engine computes
    cov = np.floor(
        ((xl.T @ xl) / n - np.outer(xl.mean(axis=0), xl.mean(axis=0))) * 1e9
    ) / 1e9
    w1 = np.floor(cov.sum(axis=1) * 1e15) / 1e15
    w2 = np.floor(cov @ w1 * 1e18) / 1e18
    w3 = np.floor(cov @ w2 * 1e18) / 1e18
    want = np.floor(w3 / np.abs(w3).max() * 1e9) / 1e9
    assert np.max(np.abs(v - want)) < 1e-6, np.max(np.abs(v - want))

    def rayleigh(x):
        return (x @ cov @ x) / (x @ x)

    assert rayleigh(w2) >= rayleigh(w1) - 1e-12
    assert rayleigh(w3) >= rayleigh(w2) - 1e-12


def test_seasonal_residuals_center_and_flags(spark, sf_dir):
    rows = REGISTRY["time_seasonal"].fn(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_dow = defaultdict(list)
    for r in rows:
        by_dow[r.dow].append(r.residual)
        assert abs((r.daily_value - r.expected) - r.residual) < 2e-6
    # residuals average ~0 within each day-of-week group (mean removed)
    for dow, rs in by_dow.items():
        assert abs(sum(rs) / len(rs)) < 1e-3, dow
    # 3-sigma flags are rare by construction
    flagged = sum(1 for r in rows if r.is_anomaly)
    assert flagged <= max(1, len(rows) // 5)


def test_pointpoly_matches_python_raycast(spark, sf_dir):
    """The SQL ray cast must agree with an independent Python
    implementation on every customer point."""
    from flirt_consume_spark.queries.governance import _PIP_POLY

    rows = REGISTRY["join_pointpoly"].fn(spark, sf_dir).collect()
    got = {(r.segment, r.inside): r.n_customers for r in rows}

    def inside(x, y):
        n = len(_PIP_POLY)
        c = 0
        for k in range(n):
            x1, y1 = _PIP_POLY[k]
            x2, y2 = _PIP_POLY[(k + 1) % n]
            if (y1 > y) != (y2 > y):
                d = y2 - y1
                lhs, rhs = (x - x1) * d, (x2 - x1) * (y - y1)
                if (lhs < rhs) if d > 0 else (lhs > rhs):
                    c += 1
        return c % 2 == 1

    from collections import Counter

    want = Counter()
    for r in t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).collect():
        k = r.c_custkey
        lon4 = ((k * 131) % 360 - 180) * 4 + 1
        lat4 = ((k * 7) % 140 - 70) * 4 + 1
        want[(r.c_mktsegment, inside(lon4, lat4))] += 1
    assert got == dict(want)
    assert any(k[1] for k in got) and any(not k[1] for k in got)


def test_ols_matches_numpy(spark, sf_dir):
    rows = REGISTRY["agg_ols"].fn(spark, sf_dir).collect()
    assert rows
    import numpy as np

    data = t(spark, sf_dir, "orders").join(
        t(spark, sf_dir, "customer"),
        F.expr("o_custkey = c_custkey"),
    ).selectExpr(
        "c_mktsegment AS segment",
        "CAST(floor(c_acctbal) AS LONG) AS x",
        "CAST(floor(o_totalprice) AS LONG) AS y",
    ).collect()
    from collections import defaultdict

    by_seg = defaultdict(list)
    for r in data:
        by_seg[r.segment].append((r.x, r.y))
    for r in rows:
        xs, ys = zip(*by_seg[r.segment])
        slope, intercept = np.polyfit(xs, ys, 1)
        assert abs(r.slope - slope) < 1e-6
        assert abs(r.intercept - intercept) < 1e-2  # intercept ~1e5 scale
        cc = np.corrcoef(xs, ys)[0, 1]
        assert abs(r.r2 - cc * cc) < 1e-5
        assert 0.0 <= r.r2 <= 1.0


def test_cusum_walk_and_single_peak(spark, sf_dir):
    """CUSUM must equal the Python prefix walk, and exactly the
    max-|cusum| day(s) carry the changepoint flag."""
    import math

    rows = sorted(
        REGISTRY["time_cusum"].fn(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    daily = sorted(
        t(spark, sf_dir, "events")
        .selectExpr(
            "CAST(ts AS DATE) AS d",
            "CAST(floor(value*100) AS LONG) AS c",
        )
        .groupBy("d")
        .sum("c")
        .collect(),
        key=lambda r: str(r.d),
    )
    cents = [r["sum(c)"] for r in daily]
    mu = sum(cents) / len(cents)
    cs, walk = 0, []
    for c in cents:
        cs += math.floor((c - mu) * 1e3)
        walk.append(cs)
    peak = max(abs(v) for v in walk)
    for r, v in zip(rows, walk):
        assert abs(r.cusum - v / 1e3 / 100) < 1e-6
        assert r.is_changepoint == (abs(v) == peak)
    assert sum(1 for r in rows if r.is_changepoint) >= 1


def test_bucketed_agg_has_no_exchange(spark, sf_dir):
    """The bucketed-table aggregation must plan WITHOUT any Exchange:
    the layout satisfies the clustering requirement."""
    import contextlib
    import io as _io

    df = REGISTRY["agg_bucketed"].fn(spark, sf_dir)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_pca_project_consistent_with_power_iteration(spark):
    """emb_pca_project's score must equal the dot product of the raw
    quantized vector with emb_power_iteration's published direction
    (both on their declared grids) — cross-key consistency, computed
    here in numpy."""
    import numpy as np

    from flirt_consume_spark.io import load_table
    from flirt_consume_spark.queries import REGISTRY

    SF = "/root/testdata/sf0.001"
    v = {r["i"]: r["v"] for r in REGISTRY["emb_power_iteration"].fn(spark, SF).collect()}
    vl = np.array([round(v[i] * 1e9) for i in sorted(v)], dtype="int64")
    emb = load_table(spark, SF, "embeddings").collect()
    got = {r["vec_id"]: r["score"] for r in REGISTRY["emb_pca_project"].fn(spark, SF).collect()}
    assert set(got) == {r["vec_id"] for r in emb}
    for r in emb:
        xl = np.floor(np.array(r["embedding"], dtype="float64") * 1e6).astype("int64")
        assert got[r["vec_id"]] == float(int((xl * vl).sum())) / 1e15


def test_mmr_matches_greedy_reference(spark):
    """Replay greedy MMR in numpy (same integer kernel) and demand
    the identical selection sequence and state values."""
    import numpy as np

    from flirt_consume_spark.io import load_table
    from flirt_consume_spark.queries import REGISTRY
    from flirt_consume_spark.queries.retrieval import _MMR_K, _MMR_SENTINEL

    SF = "/root/testdata/sf0.001"
    emb = load_table(spark, SF, "embeddings").collect()
    X = {
        r["vec_id"]: np.floor(
            np.array(r["embedding"], dtype="float64") * 1e6
        ).astype("int64")
        for r in emb
    }
    q = X[0]
    rel = {v: int((x * q).sum()) for v, x in X.items() if v != 0}
    ms = {v: _MMR_SENTINEL for v in rel}
    expect = []
    for rank in range(1, _MMR_K + 1):
        best = min(rel, key=lambda v: (-(2 * rel[v] - ms[v]), v))
        expect.append((rank, best, rel[best], ms[best]))
        sx = X[best]
        del rel[best], ms[best]
        for v in rel:
            ms[v] = max(ms[v], int((X[v] * sx).sum()))
    got = sorted(
        (r["sel_rank"], r["vec_id"], r["rel"], r["ms"])
        for r in REGISTRY["emb_mmr"].fn(spark, SF).collect()
    )
    assert got == expect
    # diversification sanity: the selected set is pairwise less
    # similar than a same-size top-rel set on average
    sel = [v for _, v, _, _ in expect]
    toprel = sorted(rel_all := {v: int((x * q).sum()) for v, x in X.items() if v != 0},
                    key=lambda v: (-rel_all[v], v))[:_MMR_K]

    def avg_pair_dot(ids):
        tot, n = 0, 0
        for a in ids:
            for b in ids:
                if a < b:
                    tot += int((X[a] * X[b]).sum()); n += 1
        return tot / n

    assert avg_pair_dot(sel) <= avg_pair_dot(toprel)


# --- planted-neighbor ANN recall (VERDICT r10 task 3) ---------------------


def test_emb_recall_eval_measures_real_retrieval(spark, tmp_path):
    """On the driver fixture recall@3 ≈ chance by construction
    (isotropic vectors have no true neighbors), so the oracle-parity
    pass only proved STRUCTURE. This test points the same query at a
    planted-neighbor fixture (md5-derived cluster centers + bounded
    perturbation — the LSH planes' determinism discipline, so the
    measurement is exact and stable): every query's true top-3 are its
    own cluster, and the LSH index must actually find them.

    Measured on the shipped builder defaults (10 clusters × 12
    members, eps=0.05, the registry's 8-plane/256-bucket index):
    28/30 hits — one cluster straddles a hyperplane and splits across
    buckets, which is exactly the failure mode recall@k exists to
    quantify. Pinned exactly (deterministic), with ≥0.8 as the
    contract bound so a plane-count change doesn't silently gut the
    index."""
    from flirt_consume_spark.testing import build_planted_embeddings

    d = build_planted_embeddings(str(tmp_path / "planted"))
    rows = REGISTRY["emb_recall_eval"].fn(spark, d).collect()
    assert len(rows) == 10
    total_hits = sum(r["n_hit"] for r in rows)
    assert total_hits == 28  # deterministic: md5 fixture + md5 planes
    mean_recall = sum(r["recall_at_3"] for r in rows) / len(rows)
    assert mean_recall >= 0.8  # ≫ chance (~0.02 on 256 buckets)


def test_planted_fixture_ground_truth_holds(spark, tmp_path):
    """The planting itself must be sound: exact cosine top-3 of every
    probe query is SAME-CLUSTER (vec_id ≡ cluster mod n_clusters), so
    recall against it measures the index, not fixture noise."""
    from flirt_consume_spark.operators import similarity as S
    from flirt_consume_spark.testing import build_planted_embeddings

    d = build_planted_embeddings(str(tmp_path / "planted"))
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    exact = S.knn_exact(emb, list(range(10)), k=3).collect()
    assert len(exact) == 30
    for r in exact:
        assert r["neighbor_id"] % 10 == r["query_id"] % 10


def test_emb_recall_planted_registry_key(spark):
    """VERDICT r11 task 5: the driver-visible registry key
    `emb_recall_planted` must carry a REAL recall@3 number — the
    planted table is built in-plan from md5 arithmetic (no parquet
    fixture, no RNG), identically in both engines.

    Measured on the shipped construction (10 clusters × 12 members,
    noise/16, 8-plane index): n_exact_true = 3 for every query (the
    exact top-3 recovers the planted cluster — ground truth is
    sound) and 27/30 ANN hits. Pinned exactly (deterministic), with
    ≥0.8 mean recall as the contract lower bound — chance on 119
    candidates is ~0.025, so any blocking regression that guts the
    index trips this loudly."""
    rows = REGISTRY["emb_recall_planted"].fn(spark, "unused").collect()
    assert len(rows) == 10
    assert all(r["n_exact_true"] == 3 for r in rows)
    total_hits = sum(r["n_hit"] for r in rows)
    assert total_hits == 27  # deterministic: md5 table + md5 planes
    mean_recall = sum(r["recall_at_3"] for r in rows) / len(rows)
    assert mean_recall >= 0.8  # ≫ chance (~0.025)


def test_minhash_band_recall_pinned(spark):
    """Text-dedup analogue of the planted ANN recall: the MinHash
    band index (12 md5/sha slices, 4 bands x 3) must actually FIND
    the high-Jaccard pairs the exact n-gram measure defines — the
    quality number behind llm_minhash_dedup's blocking claim.

    On the sf0.001 documents fixture the true >=0.5-Jaccard pairs all
    sit at s >= 0.888 (near-duplicates), where one-band capture is
    1-(1-s^3)^4 >= 0.9996 — and the construction is deterministic
    (crypto-hash slices, no seeded RNG), so the measurement pins
    EXACTLY: recall 28/28, and on this fixture the candidate set is
    also exactly the true set (precision 1.0 — no low-sim text pairs
    collide in any band)."""
    from flirt_consume_spark.io import load_table
    from flirt_consume_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_stream,
        shingle_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    true = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(shingle_table(docs), min_sim=0.5).collect()
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            minhash_signatures(shingle_stream(docs))
        ).collect()
    }
    assert len(true) == 28
    assert true <= cand  # recall 1.0
    assert cand == true  # and no spurious candidates on this fixture


def test_ivf_recall_on_planted_fixture(spark, tmp_path):
    """IVF counterpart of the LSH planted-recall measurements: on the
    planted fixture the label column IS the true cluster, so the IVF
    cells (label centroids) should reconstruct the ground-truth
    blocking almost perfectly — per-cell search must find the exact
    top-3 (which test_planted_fixture_ground_truth_holds proves is
    same-cluster). Deterministic; pinned exact with a >=0.9 contract
    bound (vs ~0.025 chance), the quality number behind llm_ann_ivf's
    cell-blocking claim."""
    from flirt_consume_spark.operators import similarity as S
    from flirt_consume_spark.testing import build_planted_embeddings

    d = build_planted_embeddings(str(tmp_path / "planted"))
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.knn_exact(emb, list(range(10)), k=3).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_ivf(emb, list(range(10)), k=3).collect()
    }
    assert len(exact) == 30
    hits = len(exact & ivf)
    assert hits == 30  # deterministic: cells == true clusters
    assert hits / len(exact) >= 0.9
