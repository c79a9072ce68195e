"""First-principles recomputes + plan assertions for the facet wave
(queries/facets.py)."""

from __future__ import annotations

import re

import numpy as np

from flirt_consume_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_mask_shapes_match_python(spark, duck):
    rows = REGISTRY["str_mask"].fn(spark, SF).collect()
    props = [
        p
        for (p,) in duck.execute(
            "SELECT props FROM read_parquet(?)", [SF + "/events.parquet"]
        ).fetchall()
    ]

    def shape(s: str) -> str:
        return re.sub(r"[0-9]", "n", re.sub(r"[a-z]", "x", re.sub(r"[A-Z]", "X", s)))

    expect: dict[str, list] = {}
    for p in props:
        expect.setdefault(shape(p), []).append(p)
    got = {r.shape: r for r in rows}
    assert set(got) == set(expect)
    for sh, vals in expect.items():
        r = got[sh]
        assert r.n_events == len(vals)
        assert r.n_distinct == len(set(vals))
        assert r.example == min(vals)


def test_scan_partitioned_prunes_directories(spark):
    # the partition predicate must land in PartitionFilters (directory
    # pruning), NOT in PushedFilters (row-group pruning)
    from flirt_consume_spark.queries.facets import _partitioned_orders

    root = _partitioned_orders(spark, SF)
    df = spark.read.parquet(root).filter("o_year = 1996")
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_year" in m.group(1), plan[:2000]


def test_bollinger_matches_pandas_rolling(spark, duck):
    rows = REGISTRY["win_bollinger"].fn(spark, SF).collect()
    daily = duck.execute(
        """
        SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
               SUM(CAST(floor(l_extendedprice) AS BIGINT)) AS rev
        FROM read_parquet(?) GROUP BY 1, 2 ORDER BY 1, 2
        """,
        [SF + "/lineitem.parquet"],
    ).fetchall()
    series: dict[str, list] = {}
    for flag, d, rev in daily:
        series.setdefault(flag, []).append((d, int(rev)))
    got = {(r.flag, str(r.d)): r for r in rows}
    assert len(got) == len(daily)
    for flag, pts in series.items():
        revs = [v for _, v in pts]
        for i, (d, rev) in enumerate(pts):
            w = revs[max(0, i - 6) : i + 1]
            n, s, ss = len(w), sum(w), sum(v * v for v in w)
            r = got[(flag, str(d))]
            assert (r.n, r.rev) == (n, rev)
            mid = float(s) / float(n)
            sd = np.sqrt(float(n * ss - s * s)) / float(n)
            assert r.mid == mid
            assert r.lower == mid - 2.0 * sd
            assert r.upper == mid + 2.0 * sd


def test_assortativity_matches_numpy(spark, duck):
    row = REGISTRY["graph_assortativity"].fn(spark, SF).collect()[0]
    edges = duck.execute(
        """
        SELECT DISTINCT o.o_custkey, p.p_brand
        FROM read_parquet(?) o
        JOIN read_parquet(?) l ON l.l_orderkey = o.o_orderkey
        JOIN read_parquet(?) p ON p.p_partkey = l.l_partkey
        """,
        [
            SF + "/orders.parquet",
            SF + "/lineitem.parquet",
            SF + "/part.parquet",
        ],
    ).fetchall()
    du: dict[int, int] = {}
    dt: dict[str, int] = {}
    for c, b in edges:
        du[c] = du.get(c, 0) + 1
        dt[b] = dt.get(b, 0) + 1
    x = np.array([du[c] for c, _ in edges], dtype=np.float64)
    y = np.array([dt[b] for _, b in edges], dtype=np.float64)
    assert row.n_edges == len(edges)
    expect = np.corrcoef(x, y)[0, 1]
    assert abs(row.assortativity - expect) < 1e-12
