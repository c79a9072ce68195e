"""Targeted tests for queries/mixture.py: plan shapes the 100-TB
story relies on, plus semantic invariants checked against independent
recomputations (pandas / countDistinct ground truth)."""

from __future__ import annotations

import contextlib
import io

import pandas as pd

from pyspark.sql import functions as F

from flirt_consume_spark.io import load_table
from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.queries.mixture import _MIX_PCT

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --- plan shapes -----------------------------------------------------------


def test_bitmap_distinct_avoids_expand(spark):
    """The whole point of the bitmap path: COUNT(DISTINCT) compiles to
    an Expand (row duplication per distinct-agg), the bitmap fold must
    not — both stages are plain partial-aggregatable HashAggregates."""
    p = plan_of(REGISTRY["agg_bitmap_distinct"].fn(spark, SF))
    assert "Expand" not in p, p
    assert p.count("HashAggregate") >= 4  # partial+final for both stages


def test_heavy_hitters_broadcasts_totals(spark):
    p = plan_of(REGISTRY["llm_heavy_hitters"].fn(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_gap_fill_spine_is_narrow_expansion(spark):
    p = plan_of(REGISTRY["time_gap_fill"].fn(spark, SF))
    assert "explode(sequence" in p  # spine built by sequence+explode
    assert "CartesianProduct" not in p


def test_running_distinct_single_exchange_prefix(spark):
    """Both windows partition on a user_id prefix: the plan may sort
    twice but must not shuffle more than twice (one per distinct
    partitioning, never one per window function)."""
    p = plan_of(REGISTRY["win_running_distinct"].fn(spark, SF))
    n_exchange = p.count("hashpartitioning(")
    assert 1 <= n_exchange <= 2, p


# --- semantic invariants ---------------------------------------------------


def test_bitmap_distinct_matches_count_distinct(spark):
    got = {
        r["event_type"]: r["n_users"]
        for r in REGISTRY["agg_bitmap_distinct"].fn(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_rolling_median_matches_pandas(spark):
    ev = (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["vq"] = (ev["value"] * 1e6).apply(lambda v: float(int(v // 1)))
    expect = (
        ev.groupby("user_id")["vq"]
        .rolling(5, min_periods=1)
        .median()
        .reset_index(level=0, drop=True)
    )
    ev["expect"] = expect
    got = (
        REGISTRY["win_rolling_median"].fn(spark, SF).toPandas()
    ).set_index("event_id")["roll_med"]
    for _, row in ev.iterrows():
        assert got[row["event_id"]] == row["expect"], row["event_id"]


def test_running_distinct_is_monotone_and_exact_at_end(spark):
    df = REGISTRY["win_running_distinct"].fn(spark, SF).toPandas()
    ev = (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", "ts", "event_type")
        .toPandas()
    )
    m = df.merge(ev, on=["event_id", "user_id"]).sort_values(
        ["user_id", "ts", "event_id"]
    )
    for uid, g in m.groupby("user_id"):
        seen = g["n_types_seen"].tolist()
        assert seen == sorted(seen), uid  # monotone non-decreasing
        assert seen[-1] == g["event_type"].nunique(), uid


def test_mixture_quotas_and_determinism(spark):
    docs = load_table(spark, SF, "documents")
    total = docs.count()
    avail = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    out1 = REGISTRY["sample_mixture"].fn(spark, SF).toPandas()
    out2 = REGISTRY["sample_mixture"].fn(spark, SF).toPandas()
    # deterministic: identical selection across runs
    assert set(out1["doc_id"]) == set(out2["doc_id"])
    target = total // 2
    got = out1.groupby("lang")["doc_id"].count().to_dict()
    for lang, pct in _MIX_PCT.items():
        quota = target * pct // 100
        assert got.get(lang, 0) == min(quota, avail.get(lang, 0)), lang


def test_gap_fill_contiguous_and_conserving(spark):
    out = REGISTRY["time_gap_fill"].fn(spark, SF).toPandas()
    ev = (
        load_table(spark, SF, "events")
        .select("event_type", F.to_date("ts").alias("day"))
        .toPandas()
    )
    for et, g in out.groupby("event_type"):
        days = sorted(g["day"])
        span = (days[-1] - days[0]).days + 1
        assert len(days) == span  # dense: no missing day in range
        assert len(set(days)) == len(days)  # no duplicates
        assert g["n_events"].sum() == (ev["event_type"] == et).sum()


def test_inverted_index_postings_sorted_bounded(spark):
    out = REGISTRY["llm_inverted_index"].fn(spark, SF).toPandas()
    assert (out["df"] >= 5).all()
    for _, row in out.iterrows():
        ids = [int(x) for x in row["postings_head"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) <= 8
        assert len(ids) == min(row["df"], 8)
