"""Sketch & time-series rollup operators: bitmap set intersection
(audience overlap), mergeable HLL sketches (the incremental-distinct
pattern), and OHLC bar resampling.

These extend the cardinality family (A2/A3/A13): `agg_bitmap_distinct`
showed exact distinct without Expand; `agg_bitmap_intersect` reuses
the same bitmaps for exact SET INTERSECTION cardinalities (AND +
popcount — the warehouse 'audience overlap' query), and
`agg_sketch_merge` demonstrates the property that makes sketches THE
100-TB cardinality answer: per-partition sketches merge losslessly,
so daily sketches roll up to any period without rescanning raw data.
`time_ohlc` is the classic market-data downsample (open/high/low/
close per bucket) built on min_by/max_by with a total tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flirt_consume_spark.queries.base import query, t


def _bitmap_words(ev: DataFrame) -> DataFrame:
    """Per (event_type, 64-id word) bitmap of distinct user ids —
    shared stage 1 of the bitmap distinct/intersect family."""
    return (
        ev.select(
            "event_type",
            F.expr("user_id DIV 64").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 64) AS INT))"
            ).alias("mask"),
        )
        .groupBy("event_type", "word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


@query(
    "agg_bitmap_intersect",
    oracle="""
    WITH s AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_both
    FROM s a JOIN s b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def agg_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-intersection cardinality for every pair of groups
    ('users who did BOTH view and purchase') via bitmap AND — the
    audience-overlap query. The naive form self-joins the distinct
    (group, user) pairs on user (a shuffle of every membership row,
    quadratic in group fan-out); the bitmap form joins 64-user WORDS
    on word_idx and popcounts the AND — the shuffle shrinks 64×, and
    the pair explosion happens on words, not users. Empty
    intersections are filtered (the oracle's inner join can't see
    them). Scales: stage 1 is map-side combinable; stage 2's join key
    (word_idx) is uniformly dense by construction — no skew."""
    ev = t(spark, sf_dir, "events")
    w = _bitmap_words(ev)
    a = w.select(
        F.col("event_type").alias("type_a"),
        "word_idx",
        F.col("word").alias("_wa"),
    )
    b = w.select(
        F.col("event_type").alias("type_b"),
        "word_idx",
        F.col("word").alias("_wb"),
    )
    return (
        a.join(b, "word_idx")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("_wa").bitwiseAND(F.col("_wb"))))
            .cast("bigint")
            .alias("n_both")
        )
        .filter(F.col("n_both") > 0)
    )


@query(
    "agg_sketch_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_tol
    FROM events GROUP BY event_type
    """,
)
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — the reason sketches win at 100 TB:
    build one DataSketches-HLL per (group, DAY), then merge the daily
    sketches into the period estimate WITHOUT touching raw data
    again. This is the incremental pattern behind every 'distinct
    users last N days' dashboard: daily sketches are tiny, additive,
    and reusable for any window. Verification follows the A3
    contract: the estimate is randomized, so the checked output is
    the exact count + a Spark-side accuracy boolean (merged estimate
    within 15% — HLL lgK=12 guarantees ~1.6% rsd, so the bound has
    9σ headroom); the estimate itself stays a Spark-side artifact.
    A broken merge (double counting, dropped registers) trips the
    boolean and breaks the hash."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    # null-safe: a NULL event_type is a legitimate group on both
    # sides of this group-domain ⋈ group-domain join; a plain name
    # join would drop it (groupBy keeps it, EqualTo doesn't).
    from flirt_consume_spark.operators.scale import _nullsafe_equi_join

    return _nullsafe_equi_join(merged, exact, ["event_type"]).select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.greatest(F.col("exact_users"), F.lit(1))
            < F.lit(0.15)
        ).alias("within_tol"),
    )


# OHLC bucket: 15 minutes, epoch-aligned.
_BAR_US = 900 * 1_000_000

# Total tie-break key: fixed-width zero-padded (epoch µs, event_id)
# string — lexicographic order == (ts, event_id) numeric order, and
# both engines' arg_min/min_by accept a scalar VARCHAR key.
_KEY_SQL = (
    "lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || "
    "lpad(CAST(event_id AS VARCHAR), 12, '0')"
)


@query(
    "time_ohlc",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             epoch_us(ts) // {_BAR_US} AS bar,
             CAST(floor(value * 1e6) AS BIGINT) AS vq,
             {_KEY_SQL} AS k
      FROM events)
    SELECT event_type, CAST(bar AS BIGINT) AS bar,
           arg_min(vq, k) AS open_q,
           CAST(MAX(vq) AS BIGINT) AS high_q,
           CAST(MIN(vq) AS BIGINT) AS low_q,
           arg_max(vq, k) AS close_q,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM v GROUP BY event_type, bar
    """,
)
def time_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling: open/high/low/close + tick count per
    (series, 15-minute epoch-aligned bucket) — the canonical
    market-data downsample, and the general first/last-in-bucket
    rollup shape. min_by/max_by pick open/close in the SAME single
    aggregation as high/low (no window, no second pass, no sort); the
    ordering key is a fixed-width (µs, event_id) string, total, so
    ties resolve identically on both engines. One map-side-combinable
    agg — min_by's partial state is one (value, key) pair — so this
    scales exactly like a plain groupBy at 100 TB."""
    ev = t(spark, sf_dir, "events")
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    from flirt_consume_spark.queries.base import finite_or_fail

    v = ev.select(
        "event_type",
        F.expr(f"unix_micros(ts) DIV {_BAR_US}").alias("bar"),
        F.floor(finite_or_fail(F.col("value"), "time_ohlc") * 1e6)
        .cast("bigint")
        .alias("vq"),
        key.alias("k"),
    )
    return v.groupBy("event_type", "bar").agg(
        F.min_by("vq", "k").alias("open_q"),
        F.max("vq").alias("high_q"),
        F.min("vq").alias("low_q"),
        F.max_by("vq", "k").alias("close_q"),
        F.count("*").cast("bigint").alias("n_ticks"),
    )
