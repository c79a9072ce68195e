"""Oracle-parity comparison used by tools/check.py and the pytest suite.

Canonicalization is deliberately *stricter* than the driver's
order-insensitive value hash: values are compared bit-exactly (floats
via repr), so a pass here implies a pass under any sane hash.
"""

from __future__ import annotations

import datetime
import math
import time

import duckdb
import pandas as pd

from flirt_consume_spark.schemas import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact double repr — bit-level comparison
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        # Repo convention: real timestamps are stringified inside the
        # queries, so a datetime here is a DATE that one client binding
        # widened to midnight-datetime — compare as the calendar date.
        return v.date().isoformat() if v == v.normalize() else v.isoformat()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(canon_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def check_key(spark, con, spec, sf_dir: str) -> dict:
    """Run one QuerySpec on Spark + DuckDB and compare canonically."""
    out = {"key": spec.key, "oracle": spec.oracle is not None}
    t0 = time.time()
    sdf = spec.fn(spark, sf_dir).toPandas()
    out["spark_sec"] = round(time.time() - t0, 2)
    out["rows"] = len(sdf)
    if spec.oracle is None:
        out["status"] = "ROWS_ONLY"
        return out
    ddf = con.execute(spec.oracle).df()
    if sorted(sdf.columns) != sorted(ddf.columns):
        out["status"] = "FAIL_SCHEMA"
        out["spark_cols"] = sorted(sdf.columns)
        out["duck_cols"] = sorted(ddf.columns)
        return out
    if len(sdf) != len(ddf):
        out["status"] = "FAIL_ROWCOUNT"
        out["duck_rows"] = len(ddf)
        return out
    # A column that is entirely NULL on BOTH engines compares equal
    # regardless of pandas dtype accidents: each client binding picks
    # object-None or float64-NaN for an all-NULL column depending on
    # the declared type it saw, and canon_value renders those "∅" vs
    # "NaN". Inside a float64 column pandas already cannot carry a
    # NULL≠NaN distinction (NULL arrives AS NaN), so collapsing the
    # all-NULL case loses no comparison strength — it only removes
    # the dtype accident (surfaced by the all-NULL degenerate mirror:
    # array_ops/time_cusum/time_seasonal false FAIL_VALUES).
    for c in sdf.columns:
        if sdf[c].isna().all() and ddf[c].isna().all():
            sdf[c] = None
            ddf[c] = None
    srows, drows = canon_rows(sdf), canon_rows(ddf)
    if srows == drows:
        out["status"] = "OK"
        return out
    out["status"] = "FAIL_VALUES"
    diffs = [(a, b) for a, b in zip(srows, drows) if a != b]
    out["n_diff_rows"] = len(diffs)
    out["sample"] = [{"spark": list(a), "duck": list(b)} for a, b in diffs[:3]]
    return out
