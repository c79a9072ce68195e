"""Targeted tests for queries/robust.py against pandas/numpy
recomputations."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from flirt_consume_spark.io import load_table
from flirt_consume_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_nearest_asof_matches_bruteforce(spark):
    ev = (
        load_table(spark, SF, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("t_us"),
        )
        .toPandas()
    )
    clicks = ev[ev.event_type == "click"]
    got = {
        r["event_id"]: (r["click_id"], r["gap_us"])
        for r in REGISTRY["join_asof_nearest"].fn(spark, SF).collect()
    }
    purchases = ev[ev.event_type == "purchase"]
    assert len(got) == len(purchases)
    for _, p in purchases.iterrows():
        cand = clicks[clicks.user_id == p.user_id]
        cid, gap = got[p.event_id]
        if cand.empty:
            assert cid is None and gap is None
            continue
        gaps = (cand.t_us - p.t_us).abs()
        best = gaps.min()
        assert gap == best
        # the chosen click is one of the minimal-gap candidates, and
        # on a tie between directions the backward one was taken
        chosen = cand[cand.event_id == cid].iloc[0]
        assert abs(chosen.t_us - p.t_us) == best
        if best > 0 and (cand.t_us == p.t_us - best).any() and (
            cand.t_us == p.t_us + best
        ).any():
            assert chosen.t_us == p.t_us - best  # tie -> backward


def test_mad_outliers_matches_numpy(spark):
    ev = (
        load_table(spark, SF, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * 1e6).cast("bigint").alias("vq"),
        )
        .toPandas()
    )
    got = {
        r["event_type"]: r
        for r in REGISTRY["agg_mad_outliers"].fn(spark, SF).collect()
    }
    for et, g in ev.groupby("event_type"):
        m = np.median(g["vq"])
        ad = (g["vq"] - m).abs()
        mad = np.median(ad)
        r = got[et]
        assert r["med"] == m and r["mad"] == mad
        assert r["n"] == len(g)
        assert r["n_outliers"] == int((ad > 3 * mad).sum())
