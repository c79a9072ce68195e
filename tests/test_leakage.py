"""First-principles replays for the leakage wave (queries/leakage.py)."""

from __future__ import annotations

import hashlib

from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.queries.leakage import _KCORE_K, _KCORE_ROUNDS

SF = "/root/testdata/sf0.001"


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100


def _lsh_pairs_py(spark):
    from flirt_consume_spark.queries.llm import _lsh_pairs

    return [(r.doc_a, r.doc_b) for r in _lsh_pairs(spark, SF).collect()]


def test_cross_dedup_matches_python_replay(spark, duck):
    rows = REGISTRY["llm_cross_dedup"].fn(spark, SF).collect()
    docs = duck.execute(
        "SELECT doc_id, source, text FROM read_parquet(?)",
        [SF + "/documents.parquet"],
    ).fetchall()
    heldout = {d for d, _, _ in docs if _bucket(d) >= 90}
    sha = {d: hashlib.sha256(txt.encode()).hexdigest() for d, _, txt in docs}
    held_shas = {sha[d] for d in heldout}
    pairs = _lsh_pairs_py(spark)
    near: set = set()
    for a, b in pairs:
        if a in heldout and b not in heldout:
            near.add(b)
        if b in heldout and a not in heldout:
            near.add(a)
    per_src: dict[str, list] = {}
    for d, src, _ in docs:
        if d not in heldout:
            per_src.setdefault(src, []).append(d)
    got = {r.source: r for r in rows}
    assert set(got) == set(per_src)
    for src, ids in per_src.items():
        r = got[src]
        exact = [d for d in ids if sha[d] in held_shas]
        near_ids = [d for d in ids if d in near]
        dropped = {d for d in ids if sha[d] in held_shas or d in near}
        assert r.n_train == len(ids)
        assert r.n_exact_leak == len(exact)
        assert r.n_near_leak == len(near_ids)
        assert r.n_dropped == len(dropped)


def test_kcore_matches_python_peel_and_converges(spark):
    rows = REGISTRY["graph_kcore"].fn(spark, SF).collect()
    pairs = _lsh_pairs_py(spark)
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    rounds_to_converge = 0
    for _ in range(_KCORE_ROUNDS):
        deg: dict = {}
        for s, _d in edges:
            deg[s] = deg.get(s, 0) + 1
        keep = {n for n, c in deg.items() if c >= _KCORE_K}
        ne = {(s, d) for s, d in edges if s in keep and d in keep}
        if ne == edges:
            break
        edges = ne
        rounds_to_converge += 1
    # the fixed round budget must cover convergence, with headroom
    assert rounds_to_converge < _KCORE_ROUNDS
    expect: dict = {}
    for s, _d in edges:
        expect[s] = expect.get(s, 0) + 1
    got = {r.doc_id: r.core_degree for r in rows}
    assert got == expect
    # 2-core invariant: every surviving node keeps degree >= k
    assert all(c >= _KCORE_K for c in got.values())


def test_sql_unpivot_matches_wide_sums(spark, duck):
    rows = REGISTRY["sql_unpivot"].fn(spark, SF).collect()
    ref = duck.execute(
        """
        SELECT p_brand,
               SUM(CAST(floor(CAST(p_size AS DOUBLE) * 100) AS BIGINT)) AS su,
               SUM(CAST(floor(p_retailprice * 100) AS BIGINT)) AS rp
        FROM read_parquet(?) GROUP BY 1
        """,
        [SF + "/part.parquet"],
    ).fetchall()
    got = {(r.p_brand, r.metric): r.total_centi for r in rows}
    assert len(got) == 2 * len(ref)
    for brand, su, rp in ref:
        assert got[(brand, "size_units")] == su
        assert got[(brand, "retail_price")] == rp
