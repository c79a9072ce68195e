"""Oracle-parity comparison used by tools/check.py and the pytest suite.

Canonicalization is deliberately *stricter* than the driver's
order-insensitive value hash: values are compared bit-exactly (floats
via repr), so a pass here implies a pass under any sane hash.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os
import time

import duckdb
import pandas as pd

from flirt_consume_spark.schemas import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Oracle SQL is required to be timezone-free (plain TIMESTAMP
    # arithmetic, no to_timestamp/TIMESTAMPTZ), because the external
    # driver runs it on a connection we don't control. Pinning UTC here
    # is defense in depth for the local replica only.
    con.execute("SET TimeZone='UTC'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _md5_unit(tag: str) -> float:
    """Deterministic value in [-1, 1) from an md5 tag — the same
    no-seeded-RNG discipline as the LSH hyperplanes (operators/
    similarity.py): reproducible across processes, hosts, rounds."""
    h = int(hashlib.md5(tag.encode()).hexdigest()[:8], 16)
    return h / float(1 << 31) - 1.0


def build_planted_embeddings(
    out_dir: str,
    n_clusters: int = 10,
    per_cluster: int = 12,
    dim: int = 64,
    eps: float = 0.05,
) -> str:
    """Write an embeddings.parquet with PLANTED nearest neighbors.

    The driver fixture's vectors are isotropic noise, so recall@k of
    any index over it is ≈ chance by construction — fine for parity,
    useless as a retrieval-quality measurement (VERDICT r10 task 3).
    This builder plants ground truth: ``n_clusters`` md5-derived unit
    centers, each with ``per_cluster`` members = normalize(center +
    eps·noise). With eps ≪ inter-center distance, every vector's true
    top-(per_cluster−1) neighbors are its own cluster, so a correct
    exact kNN scores recall 1.0 and an ANN index's recall measures
    how often its blocking keeps clusters together.

    vec_id layout: member m of cluster c gets id m·n_clusters + c, so
    ids 0..n_clusters−1 (the registry queries probe vec_id < 10) fall
    one per cluster. label = cluster id. Schema matches the driver
    fixture exactly (vec_id int64, embedding list<float>, label int32).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    def unit(tag: str) -> list[float]:
        v = [_md5_unit(f"{tag}/{d}") for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    ids, vecs, labels = [], [], []
    for c in range(n_clusters):
        center = unit(f"planted-center/{c}")
        for m in range(per_cluster):
            noise = unit(f"planted-noise/{c}/{m}")
            raw = [a + eps * b for a, b in zip(center, noise)]
            n = math.sqrt(sum(x * x for x in raw)) or 1.0
            ids.append(m * n_clusters + c)
            vecs.append([x / n for x in raw])
            labels.append(c)
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    tbl = pa.table(
        {
            "vec_id": pa.array([ids[i] for i in order], pa.int64()),
            "embedding": pa.array(
                [vecs[i] for i in order], pa.list_(pa.float32())
            ),
            "label": pa.array([labels[i] for i in order], pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    pq.write_table(tbl, path)
    return out_dir


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
