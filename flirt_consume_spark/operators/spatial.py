"""Spatial similarity join via grid-cell bucketing (the geo analogue
of the LSH band trick in operators/dedup.py).

An all-pairs "points within R km" join is O(n²) — a cross join the
100-TB design point cannot afford. Bucketing each point into a
``cell_deg``-degree grid cell and probing only the 3×3 neighborhood
turns it into one equi-join on cell id: candidate generation is
|cell|² per cell (bounded, local), and the exact haversine predicate
then removes false positives, so results are identical to the brute
force by construction — same candidate-generator/exact-verifier split
as MinHash→Jaccard.

Cell size must satisfy R ≤ cell_deg·111.195·cos(max|lat|) km so the
3×3 neighborhood fully covers the radius in longitude (latitude needs
only R ≤ cell_deg·111.195). Longitude wraps at ±180° via modular cell
arithmetic, so dateline-straddling pairs are found; poles are the
caller's responsibility (the guard below refuses latitudes where the
cos factor breaks the covering invariant).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flirt_consume_spark.functions import haversine_km

_KM_PER_DEG = 111.195  # mean earth: 2πR/360 at R=6371 km


def grid_within_radius(
    points: DataFrame,
    key: str,
    lat: str,
    lon: str,
    radius_km: float,
    cell_deg: float,
    max_abs_lat: float = 75.0,
) -> DataFrame:
    """All pairs (key_a < key_b) within ``radius_km``, via grid
    bucketing + exact haversine verify. ``points`` must have unique
    ``key`` and |lat| ≤ ``max_abs_lat``.

    Returns (key_a, key_b, dist_km) with dist rounded to 3 decimals
    (≈1 m — below that, IEEE trig differs across engines in the last
    ulp)."""
    min_cover = radius_km / (
        _KM_PER_DEG * math.cos(math.radians(max_abs_lat))
    )
    if cell_deg < min_cover:
        raise ValueError(
            f"cell_deg={cell_deg} cannot cover radius_km={radius_km} at "
            f"lat {max_abs_lat} (needs >= {min_cover:.3f} deg): pairs "
            "crossing more than one cell boundary would be silently lost"
        )
    n_lon_cells = int(round(360.0 / cell_deg))
    pts = points.select(
        F.col(key).alias("_k"),
        F.col(lat).cast("double").alias("_lat"),
        F.col(lon).cast("double").alias("_lon"),
        F.floor((F.col(lat) + 90.0) / cell_deg).cast("int").alias("_ci"),
        F.floor((F.col(lon) + 180.0) / cell_deg).cast("int").alias("_cj"),
    )
    # Probe side: each point fans out to its 3x3 cell neighborhood
    # (9 rows — constant factor, no shuffle growth in the key domain);
    # build side keeps one row per point. Longitude cells wrap mod
    # n_lon_cells so dateline neighbors land in the same bucket.
    offsets = F.array(
        *[
            F.struct(F.lit(di).alias("di"), F.lit(dj).alias("dj"))
            for di in (-1, 0, 1)
            for dj in (-1, 0, 1)
        ]
    )
    probe = pts.select(
        F.col("_k").alias("key_a"),
        F.col("_lat").alias("lat_a"),
        F.col("_lon").alias("lon_a"),
        F.explode(offsets).alias("_o"),
        "_ci",
        "_cj",
    ).select(
        "key_a",
        "lat_a",
        "lon_a",
        (F.col("_ci") + F.col("_o.di")).alias("_nci"),
        F.pmod(F.col("_cj") + F.col("_o.dj"), F.lit(n_lon_cells)).alias(
            "_ncj"
        ),
    )
    build = pts.select(
        F.col("_k").alias("key_b"),
        F.col("_lat").alias("lat_b"),
        F.col("_lon").alias("lon_b"),
        F.col("_ci").alias("_bci"),
        F.pmod(F.col("_cj"), F.lit(n_lon_cells)).alias("_bcj"),
    )
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    # Each pair matches in exactly one bucket (the cell containing b),
    # so no distinct is needed.
    return (
        probe.join(
            build,
            (F.col("_nci") == F.col("_bci"))
            & (F.col("_ncj") == F.col("_bcj")),
        )
        .filter((F.col("key_a") < F.col("key_b")) & (dist <= radius_km))
        .select(
            "key_a", "key_b", F.round(dist, 3).alias("dist_km")
        )
    )
