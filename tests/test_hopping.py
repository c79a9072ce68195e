"""First-principles replays for the hopping wave (queries/hopping.py)."""

from __future__ import annotations

import datetime

from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.queries.hopping import _HOP_DAYS

SF = "/root/testdata/sf0.001"


def test_hopping_matches_python_windows(spark, duck):
    rows = REGISTRY["time_hopping"].fn(spark, SF).collect()
    orders = duck.execute(
        """
        SELECT CAST(o_orderdate AS DATE),
               CAST(floor(o_totalprice * 100) AS BIGINT)
        FROM read_parquet(?)
        """,
        [SF + "/orders.parquet"],
    ).fetchall()
    expect: dict[datetime.date, list] = {}
    for d, cents in orders:
        for off in range(_HOP_DAYS):
            ws = d - datetime.timedelta(days=off)
            expect.setdefault(ws, []).append(cents)
    got = {r.wstart: r for r in rows}
    assert set(got) == set(expect)
    for ws, vals in expect.items():
        assert got[ws].n_orders == len(vals)
        assert got[ws].rev_cents == sum(vals)
    # conservation: every order lands in exactly _HOP_DAYS windows
    assert sum(r.n_orders for r in rows) == _HOP_DAYS * len(orders)


def test_index_size_matches_python_varint(spark, duck):
    rows = REGISTRY["llm_index_size"].fn(spark, SF).collect()
    docs = duck.execute(
        "SELECT doc_id, text FROM read_parquet(?)",
        [SF + "/documents.parquet"],
    ).fetchall()
    postings: dict[str, set] = {}
    for doc_id, text in docs:
        for tok in text.strip().lower().split():
            postings.setdefault(tok, set()).add(doc_id)

    def varint_len(x: int) -> int:
        n = 1
        while x >= 128:
            x >>= 7
            n += 1
        return n

    got = {r.token: r for r in rows}
    assert set(got) == set(postings)
    for tok, ids in postings.items():
        ordered = sorted(ids)
        deltas = [b - a for a, b in zip([0] + ordered[:-1], ordered)]
        vb = sum(min(varint_len(d), 5) for d in deltas)
        r = got[tok]
        assert r.df == len(ids)
        assert r.varint_bytes == vb
        assert r.raw_bytes == 8 * len(ids)
