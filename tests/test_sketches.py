"""Targeted tests for queries/sketches.py."""

from __future__ import annotations

import contextlib
import io
from itertools import combinations

from pyspark.sql import functions as F

from flirt_consume_spark.io import load_table
from flirt_consume_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bitmap_intersect_avoids_expand_and_user_selfjoin(spark):
    """The join must be on word_idx (64-user words), never a distinct
    (group, user) self-join, and no Expand anywhere."""
    p = plan_of(REGISTRY["agg_bitmap_intersect"].fn(spark, SF))
    assert "Expand" not in p
    assert "word_idx" in p  # join key is the word, not the user


def test_ohlc_is_single_agg_no_window(spark):
    p = plan_of(REGISTRY["time_ohlc"].fn(spark, SF))
    assert "Window" not in p  # open/close via min_by, not row_number
    assert p.count("hashpartitioning(") == 1, p


def test_bitmap_intersect_matches_set_intersection(spark):
    ev = load_table(spark, SF, "events").select("event_type", "user_id").toPandas()
    sets = {
        et: set(g["user_id"]) for et, g in ev.groupby("event_type")
    }
    expect = {}
    for a, b in combinations(sorted(sets), 2):
        n = len(sets[a] & sets[b])
        if n > 0:
            expect[(a, b)] = n
    got = {
        (r["type_a"], r["type_b"]): r["n_both"]
        for r in REGISTRY["agg_bitmap_intersect"].fn(spark, SF).collect()
    }
    assert got == expect


def test_ohlc_matches_pandas_resample(spark):
    ev = (
        load_table(spark, SF, "events")
        .select(
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("t_us"),
            F.floor(F.col("value") * 1e6).cast("bigint").alias("vq"),
        )
        .toPandas()
    )
    ev["bar"] = ev["t_us"] // (900 * 1_000_000)
    ev = ev.sort_values(["event_type", "bar", "t_us", "event_id"])
    g = ev.groupby(["event_type", "bar"])["vq"]
    expect = g.agg(["first", "max", "min", "last", "count"])
    got = (
        REGISTRY["time_ohlc"].fn(spark, SF)
        .toPandas()
        .set_index(["event_type", "bar"])
        .sort_index()
    )
    assert len(got) == len(expect)
    for idx, row in expect.iterrows():
        grow = got.loc[idx]
        assert grow["open_q"] == row["first"], idx
        assert grow["high_q"] == row["max"], idx
        assert grow["low_q"] == row["min"], idx
        assert grow["close_q"] == row["last"], idx
        assert grow["n_ticks"] == row["count"], idx


def test_sketch_merge_accuracy_flag_true(spark):
    out = REGISTRY["agg_sketch_merge"].fn(spark, SF).toPandas()
    assert out["within_tol"].all()
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.event_type: r.exact_users for r in
            REGISTRY["agg_sketch_merge"].fn(spark, SF).collect()} == exact
