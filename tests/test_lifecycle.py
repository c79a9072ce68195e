"""Targeted tests for queries/lifecycle.py: plan shapes plus
semantic invariants against independent recomputations."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from flirt_consume_spark.io import load_table
from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.queries.lifecycle import _change_log

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --- plan shapes -----------------------------------------------------------


def test_scd2_lookup_is_hash_join_with_residual(spark):
    """Equi key + interval residual must plan as a hash join, never a
    nested loop over the fact side."""
    p = plan_of(REGISTRY["scd2_lookup"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Join" in p


def test_pareto_has_no_partitionless_window(spark):
    """The two-level rewrite exists precisely to avoid a single-
    reducer window: every Window must carry a partition spec."""
    p = plan_of(REGISTRY["pareto_frontier"].fn(spark, SF))
    # both windows hash-partition on a real key; a partition-less
    # window would show up as a SinglePartition exchange feeding it
    assert p.count("hashpartitioning(") >= 1
    assert "SinglePartition" not in p, p


def test_time_weighted_single_exchange(spark):
    """lead() window and the groupBy both key on user_id — the agg
    must reuse the window's partitioning (one exchange total)."""
    p = plan_of(REGISTRY["agg_time_weighted"].fn(spark, SF))
    assert p.count("hashpartitioning(") == 1, p


# --- semantic invariants ---------------------------------------------------


def test_cdc_apply_matches_manual_replay(spark):
    log = _change_log(spark, SF).toPandas()
    state = {}
    # replay in the query's total order: ascending, so the last-
    # applied op per key is exactly the window's rn=1 winner
    for _, r in log.sort_values(
        ["key", "version", "price_cents", "op"]
    ).iterrows():
        if r["op"] == "D":
            state.pop(r["key"], None)
        else:
            state[r["key"]] = r["price_cents"]
    got = {
        r["key"]: r["price_cents"]
        for r in REGISTRY["cdc_apply"].fn(spark, SF).collect()
    }
    assert got == state


def test_cdc_log_has_multiple_versions_per_key(spark):
    """The op is only meaningful if keys actually carry histories."""
    vc = (
        _change_log(spark, SF)
        .groupBy("key")
        .count()
        .agg(F.max("count").alias("mx"), F.avg("count").alias("av"))
        .collect()[0]
    )
    assert vc["mx"] >= 3 and vc["av"] > 1.5


def test_scd2_lookup_one_version_per_interval_hit(spark):
    """Every output row's day-of-month falls inside its version's
    validity interval (recomputed independently)."""
    out = REGISTRY["scd2_lookup"].fn(spark, SF)
    od = load_table(spark, SF, "orders").select(
        "o_orderkey", F.dayofmonth("o_orderdate").alias("dom")
    )
    j = out.join(od, "o_orderkey")
    bad = j.filter(
        (F.col("dom") < F.col("c_custkey") % 28 + 1)
        | (F.col("dom") > F.col("c_custkey") % 28 + 15)
    ).count()
    assert bad == 0


def test_ewma_bounds_and_constant_series(spark):
    """EWMA numerator/31 must lie within [min, max] of the last 5
    quantized values; for a user's first event it equals the value."""
    out = REGISTRY["win_ewma"].fn(spark, SF).toPandas()
    ev = (
        load_table(spark, SF, "events")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.floor(F.col("value") * 1e6).cast("bigint").alias("vq"),
        )
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    m = out.merge(ev, on=["event_id", "user_id"])
    assert (m["ewma_den"] == 31).all()
    hist: dict = {}
    for _, r in m.sort_values(["user_id", "ts", "event_id"]).iterrows():
        h = hist.setdefault(r["user_id"], [])
        h.append(r["vq"])
        window = h[-5:]
        assert min(window) * 31 <= r["ewma_num"] <= max(window) * 31
        if len(h) == 1:
            assert r["ewma_num"] == r["vq"] * 31


def test_pareto_frontier_is_exactly_nondominated(spark):
    pts = (
        load_table(spark, SF, "part")
        .select(
            "p_partkey",
            (F.col("p_retailprice") * 100).cast("bigint").alias("pc"),
            F.col("p_size").cast("bigint").alias("sz"),
        )
        .toPandas()
    )
    got = set(REGISTRY["pareto_frontier"].fn(spark, SF).toPandas()["p_partkey"])
    rows = list(pts.itertuples(index=False))
    expect = set()
    for r in rows:
        dominated = any(
            (o.pc <= r.pc and o.sz > r.sz) or (o.pc < r.pc and o.sz >= r.sz)
            for o in rows
        )
        if not dominated:
            expect.add(r.p_partkey)
    assert got == expect
