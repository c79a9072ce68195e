"""Deterministic Count-Min Sketch building blocks.

Shared by the batch key `agg_cms` (queries/distrib.py) and the
streaming job `cms_stream` (streaming/jobs.py): both must compute the
IDENTICAL md5 bucket addresses for the mergeability equivalence
(stream-folded cells == batch cells) to be testable bit-for-bit.

Why not Spark's built-in ``count_min_sketch()`` aggregate: it returns
an opaque binary keyed to Spark's seeded hash family — unmergeable
with anything outside the JVM and not replayable by an external
oracle. The md5 row construction is engine-neutral: DuckDB (and the
pure-python test harness) rebuild the same cells exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_D = 4  # hash rows
CMS_W = 64  # buckets per row (small so collisions are real in tests)


def cms_bucket(row_col: Column, key: Column, d: int = CMS_D, w: int = CMS_W) -> Column:
    """Bucket address of ``key`` in hash row ``row_col``:
    md5('cms{i}:' || key) first 8 hex digits, mod w — pure column
    arithmetic, identical on any engine that has md5."""
    out = F.lit(None)
    for i in range(d):
        h = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cms{i}:"), key.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % w
        )
        out = F.when(row_col == i, h).otherwise(out)
    return out


def cms_cells(
    df: DataFrame,
    key: str,
    d: int = CMS_D,
    w: int = CMS_W,
    weight: str | None = None,
) -> DataFrame:
    """The d·w-cell sketch of ``df[key]``: one hash aggregation whose
    output size is CONSTANT in the input (the shuffle carries cell
    partials, map-side combined — never raw keys). Works identically
    on a batch DataFrame and a streaming one (counts are associative,
    so the state store's incremental fold IS the sketch merge).

    ``weight`` (r12): build the sketch from PRE-AGGREGATED
    (key, count) rows — cnt = Σ weight instead of a row count. Lets a
    caller that already holds per-key counts hash each distinct key
    d times instead of hashing every raw row d times (the md5 work is
    the dominant per-row cost); the resulting cells are identical
    because the sketch is a sum over keys either way."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("row_id")
    cols = [F.col(key).alias("_k")] + (
        [F.col(weight).alias("_wt")] if weight is not None else []
    )
    agg = (
        F.sum("_wt").alias("cnt")
        if weight is not None
        else F.count(F.lit(1)).alias("cnt")
    )
    keep = ["row_id"] + (["_wt"] if weight is not None else [])
    return (
        df.select(*cols, rows)
        .select(
            *keep,
            cms_bucket(F.col("row_id"), F.col("_k"), d, w).alias("bucket"),
        )
        .groupBy("row_id", "bucket")
        .agg(agg)
    )
