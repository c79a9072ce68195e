"""First-principles recomputes for the trend/association wave
(queries/trend.py) — each key's statistic is re-derived in plain
Python/numpy from the same fixture and compared exactly (the oracle
parity test already pins the DuckDB SQL; these pin the MATH)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from flirt_consume_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _monthly(duck):
    return duck.execute(
        """
        SELECT CAST((year(CAST(o_orderdate AS DATE)) - 1995) * 12
                    + (month(CAST(o_orderdate AS DATE)) - 1) AS INTEGER) AS m,
               CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev
        FROM read_parquet(?) GROUP BY 1 ORDER BY 1
        """,
        [SF + "/orders.parquet"],
    ).fetchall()


def test_theilsen_matches_numpy_median(spark, duck):
    row = REGISTRY["time_theilsen"].fn(spark, SF).collect()[0]
    series = _monthly(duck)
    slopes = [
        (rb - ra) / (mb - ma)
        for (ma, ra), (mb, rb) in itertools.combinations(series, 2)
    ]
    assert row.n_months == len(series)
    assert row.n_pairs == len(slopes)
    arr = sorted(slopes)
    n = len(arr)
    expect = (arr[(n + 1) // 2 - 1] + arr[(n + 2) // 2 - 1]) / 2.0
    assert row.slope_cents_per_month == expect


def test_mannkendall_matches_direct_recompute(spark, duck):
    row = REGISTRY["time_mannkendall"].fn(spark, SF).collect()[0]
    y = [rev for _, rev in _monthly(duck)]
    n = len(y)
    s = sum(
        np.sign(b - a) for a, b in itertools.combinations(y, 2)
    )
    _, counts = np.unique(y, return_counts=True)
    tie = sum(int(t) * (t - 1) * (2 * t + 5) for t in counts if t > 1)
    var_num = n * (n - 1) * (2 * n + 5) - tie
    assert row.n_months == n
    assert row.s_stat == s
    assert row.var_num == var_num
    sd = np.sqrt(var_num / 18.0)
    if s > 0:
        assert row.z == pytest.approx((s - 1) / sd, rel=1e-12)
    elif s < 0:
        assert row.z == pytest.approx((s + 1) / sd, rel=1e-12)
    else:
        assert row.z == 0.0


def test_pettitt_matches_bruteforce_sign_sums(spark, duck):
    row = REGISTRY["time_pettitt"].fn(spark, SF).collect()[0]
    series = _monthly(duck)  # ordered by m
    y = [rev for _, rev in series]
    n = len(y)
    # brute force: U_t = sum_{i<=t} sum_{j>t} sign(y_j - y_i)
    best_k, best_t = -1, None
    for tpos in range(1, n):
        u = sum(
            int(np.sign(y[j] - y[i]))
            for i in range(tpos)
            for j in range(tpos, n)
        )
        if abs(u) > best_k:
            best_k, best_t = abs(u), tpos
    assert row.n_months == n
    assert row.k_stat == best_k
    assert row.t_star == best_t
    assert row.m_star == series[best_t - 1][0]


def test_vwap_matches_pandas(spark, duck):
    rows = REGISTRY["time_vwap"].fn(spark, SF).collect()
    got = {(r.l_returnflag, str(r.ship_month)): r for r in rows}
    ref = duck.execute(
        """
        SELECT l_returnflag,
               CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE) AS mo,
               SUM(CAST(floor(l_quantity) AS BIGINT)) AS vol,
               SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS cents
        FROM read_parquet(?) GROUP BY 1, 2
        """,
        [SF + "/lineitem.parquet"],
    ).fetchall()
    assert len(got) == len(ref)
    for rf, mo, vol, cents in ref:
        r = got[(rf, str(mo))]
        assert (r.volume, r.notional_cents) == (vol, cents)
        assert r.vwap_cents == float(cents) / float(vol)


def test_basket_pairs_matches_python_baskets(spark, duck):
    rows = REGISTRY["agg_basket_pairs"].fn(spark, SF).collect()
    assert rows, "no brand pairs produced"
    ob = duck.execute(
        """
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM read_parquet(?) l JOIN read_parquet(?) p
          ON l.l_partkey = p.p_partkey
        """,
        [SF + "/lineitem.parquet", SF + "/part.parquet"],
    ).fetchall()
    baskets: dict[int, set] = {}
    for ok, brand in ob:
        baskets.setdefault(ok, set()).add(brand)
    n_orders = len(baskets)
    deg: dict[str, int] = {}
    pair_cnt: dict[tuple, int] = {}
    for basket in baskets.values():
        for brand in basket:
            deg[brand] = deg.get(brand, 0) + 1
        for a, b in itertools.combinations(sorted(basket), 2):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
    got = {(r.brand_a, r.brand_b): r for r in rows}
    assert set(got) == set(pair_cnt)
    for (a, b), cnt in pair_cnt.items():
        r = got[(a, b)]
        assert (r.n_pair, r.n_a, r.n_b) == (cnt, deg[a], deg[b])
        assert r.support == cnt / n_orders
        assert r.lift == (cnt * float(n_orders)) / (
            float(deg[a]) * float(deg[b])
        )


def test_node_jaccard_matches_python_sets(spark, duck):
    rows = REGISTRY["graph_node_jaccard"].fn(spark, SF).collect()
    ue = duck.execute(
        "SELECT DISTINCT user_id, event_type FROM read_parquet(?)",
        [SF + "/events.parquet"],
    ).fetchall()
    users: dict[str, set] = {}
    for u, et in ue:
        users.setdefault(et, set()).add(u)
    expect = {}
    for a, b in itertools.combinations(sorted(users), 2):
        inter = len(users[a] & users[b])
        if inter:
            expect[(a, b)] = (inter, len(users[a]), len(users[b]))
    got = {(r.type_a, r.type_b): (r.n_common, r.deg_a, r.deg_b) for r in rows}
    assert got == expect
    for r in rows:
        assert r.jaccard == r.n_common / (r.deg_a + r.deg_b - r.n_common)


def test_subsample_ci_order_stats(spark, duck):
    row = REGISTRY["agg_subsample_ci"].fn(spark, SF).collect()[0]
    reps = duck.execute(
        """
        SELECT (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                % 32) AS rep,
               COUNT(*) AS cnt,
               SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
        FROM read_parquet(?) GROUP BY 1
        """,
        [SF + "/orders.parquet"],
    ).fetchall()
    means = sorted(float(c) / n for _, n, c in reps)
    assert row.n_replicas == len(reps) == 32
    assert row.lo_cents == means[1]
    assert row.hi_cents == means[30]
    assert row.n_orders == sum(n for _, n, _ in reps)
    assert min(means) <= row.mean_cents <= max(means)
