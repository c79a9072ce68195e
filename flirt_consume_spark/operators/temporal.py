"""Temporal operators — the reference's signature transforms.

SURVEY.md §2.E: flirt-consume's core job is expanding a flight
*schedule* (date range + day-of-week operating mask) into dated
flight *legs*, normalizing published local times + UTC offsets into
absolute timestamps, and bucketing by calendar month for the
collection-swap sink. Plus J6, the temporal as-of join that matches a
dated leg to the schedule version in effect.

All pure narrow/built-in ops:
- expansion is `explode(sequence(...))` — a narrow generator, no
  shuffle, and Catalyst prunes it like any other projection;
- the as-of join is the union+running-last trick: ONE shuffle by key
  (no pair explosion, no range-join nested loop), which is the shape
  that survives 100× scale — versions and probes co-partition by key
  and the window scans each partition once, ordered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def expand_schedule(
    df: DataFrame,
    start_col: str,
    end_col: str,
    mask_col: str | Column,
    out_col: str = "leg_date",
) -> DataFrame:
    """E1: one row per operating date in [start, end] whose ISO weekday
    (Mon=1..Sun=7) bit is set in the 7-char '1'/'0' mask.

    `sequence + explode` keeps this a narrow op — each input row
    expands locally, no shuffle; at 100 TB the expansion parallelizes
    with the scan.
    """
    mask = F.col(mask_col) if isinstance(mask_col, str) else mask_col
    d = F.explode(
        F.sequence(
            F.to_date(start_col), F.to_date(end_col), F.expr("interval 1 day")
        )
    ).alias(out_col)
    out = df.select("*", d)
    isodow = F.weekday(out_col) + 1  # Spark weekday: Mon=0 → ISO Mon=1
    return out.filter(F.substring(mask, 1, 7).substr(isodow, F.lit(1)) == "1")


def normalize_local_time(
    df: DataFrame, ts_col: str, offset_min_col: str | Column, out_col: str = "utc_ts"
) -> DataFrame:
    """E2: local wall-clock + minutes-east-of-UTC offset -> absolute
    UTC timestamp (`utc = local - offset`), with the day-rollover the
    reference handles for overnight arrivals surfaced as day_shift."""
    off = (
        F.col(offset_min_col) if isinstance(offset_min_col, str) else offset_min_col
    )
    out = df.withColumn(
        out_col, F.col(ts_col) - (off * F.expr("INTERVAL 1 MINUTE"))
    )
    return out.withColumn(
        "day_shift", F.datediff(F.to_date(out_col), F.to_date(ts_col))
    )


def asof_join(
    versions: DataFrame,
    probes: DataFrame,
    key: str,
    version_ts: str,
    probe_ts: str,
    version_cols: list[str],
    probe_cols: list[str],
) -> DataFrame:
    """J6: for each probe row, attach the latest version row of the
    same key with version_ts <= probe_ts (ties: version wins over
    probe at the same instant; among same-instant versions the one
    with the largest tiebreak column order below).

    Implemented as union + running last_value over a single
    (key)-partitioned window — one shuffle, linear scan, no
    probe×version pair explosion. The window orders by (ts, side)
    with versions sorted before probes at equal timestamps.
    """
    v = versions.select(
        F.col(key).alias("_k"),
        F.col(version_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in version_cols],
        *[F.lit(None).cast(dict(probes.dtypes)[c]).alias(c) for c in probe_cols],
    )
    p = probes.select(
        F.col(key).alias("_k"),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(versions.dtypes)[c]).alias(c) for c in version_cols],
        *[F.col(c) for c in probe_cols],
    )
    u = v.unionByName(p)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", *version_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_v_{c}")
            for c in version_cols
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            F.col("_k").alias(key),
            F.col("_ts").alias(probe_ts),
            *[F.col(c) for c in probe_cols],
            *[F.col(f"_v_{c}").alias(c) for c in version_cols],
        )
    )


def asof_join_forward(
    versions: DataFrame,
    probes: DataFrame,
    key: str,
    version_ts: str,
    probe_ts: str,
    version_cols: list[str],
    probe_cols: list[str],
) -> DataFrame:
    """J6b: forward as-of — for each probe row, attach the EARLIEST
    version row of the same key with version_ts >= probe_ts (the
    "next schedule version after this query date" / time-to-next-event
    direction; pandas merge_asof(direction='forward')).

    Same single-shuffle union + running-scan shape as ``asof_join``,
    mirrored: first_value over a [current, unbounded following] frame,
    with probes sorted BEFORE versions at equal timestamps so a
    same-instant version is visible to the probe (>= semantics). Among
    same-instant versions the smallest tiebreak-column order wins.
    """
    v = versions.select(
        F.col(key).alias("_k"),
        F.col(version_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in version_cols],
        *[F.lit(None).cast(dict(probes.dtypes)[c]).alias(c) for c in probe_cols],
    )
    p = probes.select(
        F.col(key).alias("_k"),
        F.col(probe_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(versions.dtypes)[c]).alias(c) for c in version_cols],
        *[F.col(c) for c in probe_cols],
    )
    u = v.unionByName(p)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", *version_cols)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = u.select(
        "*",
        *[
            F.first(c, ignorenulls=True).over(w).alias(f"_v_{c}")
            for c in version_cols
        ],
    )
    return (
        filled.filter(F.col("_side") == 0)
        .select(
            F.col("_k").alias(key),
            F.col("_ts").alias(probe_ts),
            *[F.col(c) for c in probe_cols],
            *[F.col(f"_v_{c}").alias(c) for c in version_cols],
        )
    )
