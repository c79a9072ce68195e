"""Timezone invariance of every oracle SQL string (ADVICE r10 medium).

The external driver runs oracle_sql() on a DuckDB connection WE DO NOT
CONTROL — its session TimeZone is whatever the host dictates. An oracle
that renders timestamps through TIMESTAMPTZ (to_timestamp, epoch_ms →
strftime, now()) produces different strings per host zone and fails the
hash compare on any non-UTC machine even though the engine is correct.
Round-10 shipped exactly that bug in stream_tumbling/sliding/ohlc.

This gate runs every registered oracle twice — TimeZone UTC vs
Pacific/Kiritimati (UTC+14, the maximal offset, no DST) — and requires
identical results. DuckDB-only: no Spark session, so it costs seconds.
"""

from __future__ import annotations

import duckdb
import pytest

from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.schemas import TABLE_NAMES

SF = "/root/testdata/sf0.001"


def _con(tz: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"SET TimeZone='{tz}'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF}/{name}.parquet')"
        )
    return con


def test_every_oracle_is_timezone_invariant():
    utc, kir = _con("UTC"), _con("Pacific/Kiritimati")
    bad = []
    for key, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            a = utc.execute(spec.oracle).df()
            b = kir.execute(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001 — collect, report once
            bad.append((key, f"ERROR {type(exc).__name__}: {exc}"))
            continue
        cols = sorted(a.columns)
        a = a[cols].sort_values(by=cols).reset_index(drop=True)
        b = b[cols].sort_values(by=cols).reset_index(drop=True)
        if not a.equals(b):
            bad.append((key, "results differ across session TimeZone"))
    assert not bad, bad


def test_harness_detects_tz_sensitivity():
    """Negative control: the comparison above must actually catch a
    TIMESTAMPTZ-rendering oracle (the round-10 bug shape)."""
    utc, kir = _con("UTC"), _con("Pacific/Kiritimati")
    sql = "SELECT strftime(to_timestamp(0), '%Y-%m-%d %H:%M:%S') AS s"
    a = utc.execute(sql).fetchone()[0]
    b = kir.execute(sql).fetchone()[0]
    assert a != b  # if DuckDB ever changes this, revisit the gate


def test_streaming_oracles_survive_epoch_extremes():
    """Regression pin for the round-11 INT32 interval overflow: the
    window-start rendering in the streaming oracles must execute over
    the FULL int64-µs timestamp range (the epoch robustness mirror
    carries 1677-09-21 / 2262-04-11 / epoch-0 rows) and stay
    timezone-invariant there. `secs * INTERVAL 1 SECOND` fails this
    (DuckDB casts the multiplier to INT32); make_timestamp(µs) holds."""
    import pandas as pd

    extremes = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 2, 2],
            "event_type": ["view", "click", "view", "click"],
            "ts": [
                pd.Timestamp("1677-09-21T00:12:44"),
                pd.Timestamp("1970-01-01T00:00:00"),
                pd.Timestamp("2262-04-11T23:47:16"),
                pd.Timestamp("2024-06-01T12:34:56.789"),
            ],
            "value": [1.0, 2.0, 3.0, 4.0],
            "props": ["{}"] * 4,
        }
    )
    results = {}
    for tz in ("UTC", "Pacific/Kiritimati"):
        con = duckdb.connect()
        con.execute(f"SET TimeZone='{tz}'")
        con.register("events", extremes)
        for key in ("stream_tumbling", "stream_sliding", "stream_ohlc"):
            df = con.execute(REGISTRY[key].oracle).df()
            cols = sorted(df.columns)
            rows = df[cols].sort_values(by=cols).reset_index(drop=True)
            results.setdefault(key, []).append(rows)
    for key, (a, b) in results.items():
        assert len(a) > 0, key
        assert a.equals(b), f"{key} window starts depend on session TZ"
        # and the extreme years actually surfaced in the output
        years = {s[:4] for s in a["win_start"]}
        assert {"1677", "2262"} <= years, (key, years)
