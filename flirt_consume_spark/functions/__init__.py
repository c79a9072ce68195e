"""Column-expression function library (no UDFs — Catalyst-visible only).

Everything here returns pyspark Column expressions built from
built-in functions, so whole-stage codegen and pushdown see through
them. The one numerically sensitive function (haversine) documents
its oracle-rounding contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """F7: great-circle distance in km (FLIRT displays route distances;
    SURVEY.md §2.H F7). Pure column expr — sin/cos/asin/sqrt are JVM
    intrinsics inside codegen. IEEE-double trig can differ from other
    engines in the last ulp, so oracle comparisons round to 3
    decimals (≈1 m) — error margin ~1e-12 km, collision-safe.
    """
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    h = F.sin(dlat) * F.sin(dlat) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.sin(dlon) * F.sin(dlon)
    return 2 * F.lit(EARTH_RADIUS_KM) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def synth_coord(key: Column, mult: int, span: int, offset: float) -> Column:
    """Deterministic pseudo-coordinate from an integer key (the driver
    tables carry no lat/lon; both engines compute this identically in
    exact integer arithmetic + one exact binary-fraction add)."""
    return (key * mult) % span - span / 2 + offset
