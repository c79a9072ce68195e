"""Degenerate-input robustness sweep over the full query registry.

A query engine that is correct at sf0.01 can still crash in
production on the inputs that inevitably appear at 100 TB: an empty
month partition, a table reduced to one row by a selective filter, a
source that a bad upstream job wrote with zero rows. Every operator
must either produce a well-formed (possibly empty) result or fail
with a *deliberate* contract error — never an unhandled
IndexError / ZeroDivisionError / ArithmeticException from code that
assumed "at least one row".

This tool materializes two degenerate mirrors of a scale-factor
directory (schema copied from the real parquet, so column types are
identical):

- ``empty``  — every table with 0 rows;
- ``one``    — every table truncated to exactly 1 row (FK joins then
  mostly miss, exercising empty *intermediate* frames inside plans
  whose inputs are non-empty — a different failure class than empty
  scans);
- ``nulls``  — full sf row count, but every VALUE column is NULL
  while key / ordering columns stay intact (the data model's PK/FK
  and event-time NOT NULL contracts hold, so a failure here is a
  genuine NULL-handling bug in a measure path, not a violated
  precondition). This is the "a bad upstream job wrote the rows but
  lost the payloads" scenario;
- ``skew``   — full sf row count with PKs intact, but every FK /
  dimension / payload column collapsed to its FIRST value: one
  customer owns every order, one user emits every event, every
  document is the same text, every embedding the same vector. The
  production shape is a hot key after an upstream bug (or a
  legitimately viral entity); it stresses single-group windows,
  dedup/similarity pair explosions on all-identical content, and
  every documented deterministic-tiebreak claim (an op with a
  nondeterministic tie-break fails the oracle compare here, because
  EVERY row ties).

and runs every registered query against each, recording OK /
EXPECTED-GUARD (a deliberate raise_error with our contract message) /
CRASH. Exit code 1 if any CRASH.

Four seeded-random mirrors extend the fixed shapes to value-domain
boundaries (``--seed``, default 42): ``zipf`` (FK/dimension columns
resampled from their own rows with Zipf(1.5) rank weights — heavy
hitters plus long tail), ``unicode`` (content text replaced with
empty strings, NFC-vs-NFD diacritics, CJK/RTL, ZWJ emoji, a 4 KiB
run), ``nonfinite`` (NaN/+Inf/-Inf injected into double-domain
measures: events.value and embedding coordinates), and ``epoch``
(event times mixed with 1677/2262 pandas extremes and epoch 0).

Usage:
    python tools/edge_sweep.py [--base /root/testdata/sf0.001]
                               [--only key1,key2] [--mode empty,one]
                               [--seed 42]

The sweep is also wired into tests/test_edge_sweep.py for a pinned
subset; this standalone runner covers the full registry for the
round-close checklist.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Keys whose contract *requires* data and which raise a deliberate,
#: documented error on degenerate input (message carried by
#: F.raise_error or a ValueError from plan-build validation). An
#: entry here must cite why empty input is a contract violation
#: rather than a silently-empty result.
#:
#: Contract: the value must be the guard's raise text VERBATIM (the
#: exact F.raise_error literal), not a generic substring — the
#: classifier matches by substring, so a loose value like "error"
#: would silently reclassify ANY crash on that key as expected. Each
#: entry is paired with tests/test_edge_sweep.py cases asserting (a)
#: the verbatim text classifies EXPECTED-GUARD and (b) a NON-matching
#: exception on the same key still reports CRASH.
def _finite_guard_text(op: str) -> str:
    """The exact queries/base.py finite_or_fail raise literal for one
    op tag — imported from the single shared constant
    (queries/base.py FINITE_GUARD_TEXT) rather than re-derived here,
    so a wording change there can never drift from these entries."""
    from flirt_consume_spark.queries.base import FINITE_GUARD_TEXT

    return FINITE_GUARD_TEXT.format(op=op)


#: The five order-statistic keys whose plans carry an explicit
#: finite_or_fail guard: a NaN/Inf measure would silently leak the
#: floor-saturated LongMax sentinel into a median/min_by/arg_min, so
#: the guard fails the action deliberately. Each entry is the guard's
#: verbatim raise text (stream_ohlc guards inside the shared
#: jobs.ohlc_agg transform, hence the "ohlc_agg" tag).
EXPECTED_GUARDS: dict[str, str] = {
    "agg_mad_outliers": _finite_guard_text("agg_mad_outliers"),
    "win_rolling_median": _finite_guard_text("win_rolling_median"),
    "time_ohlc": _finite_guard_text("time_ohlc"),
    "emb_quantize": _finite_guard_text("emb_quantize"),
    "stream_ohlc": _finite_guard_text("ohlc_agg"),
}

#: Columns collapsed to their first value in ``skew`` mode: FKs,
#: dimensions, event time, and content payloads. PKs (and lineitem's
#: composite line number) stay unique so the data model still holds.
SKEW_COLS: dict[str, set] = {
    "region": set(),
    "nation": {"n_regionkey"},
    "customer": {"c_nationkey", "c_mktsegment"},
    "supplier": {"s_nationkey"},
    "part": {"p_brand", "p_type", "p_size"},
    "orders": {
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        "o_orderdate",
    },
    "lineitem": {
        "l_partkey",
        "l_suppkey",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    },
    "events": {"user_id", "event_type", "ts"},
    "documents": {"text", "lang", "source", "n_chars"},
    "embeddings": {"embedding", "label"},
}

#: Columns that stay non-NULL in ``nulls`` mode: primary/foreign keys
#: and event-time/ordering columns — the data model declares these
#: NOT NULL (TPC-H PK/FK contracts; an event without a timestamp is
#: malformed upstream, not late). Everything else goes NULL.
KEEP_IN_NULLS: dict[str, set] = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey", "n_regionkey"},
    "customer": {"c_custkey", "c_nationkey"},
    "supplier": {"s_suppkey", "s_nationkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey", "o_custkey", "o_orderdate"},
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}


#: Seeded-random mirror modes (round-10, VERDICT r9 task 3): the four
#: fixed degenerate shapes (empty/one/nulls/skew) cannot see value-
#: DOMAIN boundaries — Zipf-skewed key distributions, unicode/empty-
#: string text, NaN/±Inf doubles, extreme-epoch timestamps. Each mode
#: perturbs only the columns where that boundary legitimately occurs
#: in production (NaN money or a NULL PK is a violated upstream
#: contract, NOT an input the engine must absorb — same scoping
#: argument as KEEP_IN_NULLS).
RANDOM_MODES = ("zipf", "unicode", "nonfinite", "epoch")

#: Text columns that carry CONTENT (not format-contracted payloads
#: like events.props JSON): replaced with draws from a unicode pool
#: in ``unicode`` mode.
UNICODE_COLS: dict[str, set] = {
    "documents": {"text", "source"},
    "part": {"p_name"},
    "customer": {"c_name"},
}

#: The unicode pool: empty string, whitespace-only, NBSP, combining
#: diacritics in both normal forms (NFC "é" vs NFD "é" — NOT
#: equal strings, a dedup/grouping stressor), CJK, RTL Arabic,
#: ZWJ emoji family, a 4 KiB run, and control whitespace.
UNICODE_POOL = [
    "",
    "   ",
    " ",
    "café naïve",
    "café naïve",
    "日本語の文書",
    "مرحبا بالعالم",
    "\U0001f468‍\U0001f469‍\U0001f467‍\U0001f466 family",
    "x" * 4096,
    "line\nbreak\ttab\rcr",
    "ẞß SS ss",
]

#: Double-domain measure columns where NaN/±Inf legitimately occur
#: (sensor-style values, embedding coordinates). Money/decimal-domain
#: columns are excluded: a NaN price is a violated precondition.
NONFINITE_COLS: dict[str, set] = {
    "events": {"value"},
    "embeddings": {"embedding"},
}

#: Event-time columns stressed with pandas-representable extremes
#: (1677-09-21 / 2262-04-11, the ns-epoch int64 range) plus epoch 0 —
#: negative epoch seconds and far-future dates catch epoch-math and
#: window-bucketing sign bugs.
EPOCH_COLS: dict[str, set] = {
    "events": {"ts"},
    "orders": {"o_orderdate"},
}


def _random_mirror_table(name, tbl, mode: str, seed: int):
    """Apply one seeded random perturbation to one arrow table."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    if n == 0:
        return tbl
    # Per-(mode, table) stream: stable regardless of TABLES order.
    # crc32, not hash() — Python string hashing is salted per process.
    import zlib

    rng = np.random.default_rng(
        seed + (zlib.crc32(f"{mode}/{name}".encode()) % (1 << 16))
    )
    cols, changed = [], False
    for i, f in enumerate(tbl.schema):
        col = tbl.column(i)
        if mode == "zipf" and f.name in SKEW_COLS[name]:
            # Resample the column FROM ITS OWN ROWS with Zipf(1.5)
            # rank weights over a seeded permutation: heavy hitters
            # plus a long tail, referential integrity preserved
            # (every drawn value already exists).
            perm = rng.permutation(n)
            ranks = (rng.zipf(1.5, size=n) - 1) % n
            col = pc.take(col.combine_chunks(), pa.array(perm[ranks]))
            changed = True
        elif mode == "unicode" and f.name in UNICODE_COLS.get(name, ()):
            pick = rng.integers(0, 2 * len(UNICODE_POOL), size=n)
            orig = col.to_pylist()
            vals = [
                UNICODE_POOL[p] if p < len(UNICODE_POOL) else orig[j]
                for j, p in enumerate(pick)
            ]
            col = pa.array(vals, type=f.type)
            changed = True
        elif mode == "nonfinite" and f.name in NONFINITE_COLS.get(name, ()):
            if pa.types.is_floating(f.type):
                # Capture validity BEFORE to_pandas: the conversion
                # renders NULL as NaN, which would silently turn every
                # originally-NULL row into injected poison and erase
                # the NULL/NaN distinction the NULL-skip contracts are
                # exercised against (ADVICE r10).
                null_mask = pc.is_null(col.combine_chunks()).to_numpy(
                    zero_copy_only=False
                )
                vals = np.asarray(col.to_pandas(), dtype="float64")
                cls = rng.integers(0, 10, size=n)
                vals = np.where(cls == 0, np.nan, vals)
                vals = np.where(cls == 1, np.inf, vals)
                vals = np.where(cls == 2, -np.inf, vals)
                col = pa.array(vals, type=f.type, mask=null_mask)
            else:  # list<float>: poison one coordinate of ~30% of rows
                lst = col.to_pylist()
                for j in range(n):
                    v = lst[j]
                    if not v:
                        continue
                    cls = rng.integers(0, 10)
                    if cls < 3:
                        v = list(v)
                        v[int(rng.integers(0, len(v)))] = [
                            float("nan"), float("inf"), float("-inf")
                        ][cls]
                        lst[j] = v
                col = pa.array(lst, type=f.type)
            changed = True
        elif mode == "epoch" and f.name in EPOCH_COLS.get(name, ()):
            import pandas as pd

            s = col.to_pandas()
            cls = rng.integers(0, 10, size=n)
            s = s.where(cls != 0, pd.Timestamp("1677-09-21T00:12:44"))
            s = s.where(cls != 1, pd.Timestamp("2262-04-11T23:47:16"))
            s = s.where(cls != 2, pd.Timestamp("1970-01-01T00:00:00"))
            col = pa.Array.from_pandas(s, type=f.type)
            changed = True
        cols.append(col)
    return pa.table(cols, schema=tbl.schema) if changed else tbl


def make_degenerate(
    base: str, out_root: str, mode: str, seed: int = 42
) -> str:
    """Write a schema-identical mirror of ``base`` with the mode's
    degenerate or seeded-random perturbation applied. Uses pyarrow
    directly (no Spark session needed) so the mirror build can't
    perturb the session under test."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(out_root, mode)
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for name in TABLES:
        src = os.path.join(base, f"{name}.parquet")
        tbl = pq.read_table(src)
        if mode in RANDOM_MODES:
            tbl = _random_mirror_table(name, tbl, mode, seed)
        elif mode == "nulls":
            keep = KEEP_IN_NULLS[name]
            cols = [
                tbl.column(i)
                if f.name in keep
                else pa.nulls(tbl.num_rows, f.type)
                for i, f in enumerate(tbl.schema)
            ]
            tbl = pa.table(cols, schema=tbl.schema)
        elif mode == "skew":
            hot = SKEW_COLS[name]
            import pyarrow.compute as pc

            cols = []
            for i, f in enumerate(tbl.schema):
                col = tbl.column(i)
                if f.name in hot and tbl.num_rows > 0:
                    first = col.combine_chunks().take([0])
                    col = pa.chunked_array(
                        [pc.take(first, pa.array([0] * tbl.num_rows))]
                    )
                cols.append(col)
            tbl = pa.table(cols, schema=tbl.schema)
        else:
            n = 0 if mode == "empty" else min(1, tbl.num_rows)
            tbl = tbl.slice(0, n)
        pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
    return out


#: nonfinite-mirror contract: a NaN/±Inf measure entering an
#: exact-decimal quantization FAILS THE ACTION LOUDLY on both engines
#: (Spark: the shared finite_or_fail guard or a downstream ANSI long
#: overflow of the saturated sentinel; DuckDB: CAST refuses the
#: non-finite double). These keys are therefore EXPECTED-REJECT on
#: the nonfinite mirror, matched STRICTLY on (mode, key, marker) —
#: any other exception on the same key still reports CRASH.
NONFINITE_REJECTS: set = {
    # 29 ANSI long-overflow rejections (sum/multiply of the floor-
    # saturated sentinel):
    "agg_cuped", "agg_delta_method", "agg_skew_kurt", "agg_stats",
    "agg_time_weighted", "attribution_touch", "emb_covariance",
    "emb_kmeans", "emb_mmr", "emb_pca_project", "emb_power_iteration",
    "join_dpp", "join_salted", "llm_ann_ivf", "llm_centroid",
    "llm_semdedup", "stream_dedup", "stream_session", "stream_static",
    "stream_tumbling", "time_autocorr", "time_cusum",
    "time_downsample", "time_seasonal", "win_drawdown", "win_ewma",
    "win_range_hour", "win_rolling", "win_zscore",
    # (the five explicit finite_or_fail keys graduated to
    # EXPECTED_GUARDS — verbatim-text classification; this set now
    # holds ONLY the ANSI value-rejection keys, whose error class is
    # plan/task-order dependent and cannot be pinned verbatim)
}

NONFINITE_REJECT_MARKERS = (
    "non-finite measure value",  # finite_or_fail raise text
    "ARITHMETIC_OVERFLOW",       # Spark ANSI long overflow
    "NUMERIC_VALUE_OUT_OF_RANGE",  # ANSI decimal reject of the sentinel
    # (which ANSI class fires first is plan/task-order dependent; all
    # are value rejections of the floor-saturated non-finite input.
    # The bare exception CLASS name deliberately does NOT appear here:
    # matching "SparkArithmeticException" would classify ANY
    # arithmetic failure — an unrelated overflow bug included — as
    # expected; the error-class strings above already cover the
    # wrapped cases, ADVICE r10.)
)


def run_sweep(
    spark, sf_dir: str, keys: list[str], mode: str = ""
) -> dict:
    from flirt_consume_spark.queries import REGISTRY

    results: dict[str, dict] = {}
    for k in keys:
        fn = REGISTRY[k].fn
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            # noop sink first: full evaluation of EVERY output column
            # (a bare count() lets Catalyst prune a crashing
            # projection out of the plan entirely).
            df.write.format("noop").mode("overwrite").save()
            rows = df.count()
            results[k] = {"status": "OK", "rows": rows}
        except Exception as exc:  # noqa: BLE001 — classification is the point
            msg = f"{type(exc).__name__}: {exc}"
            expected = k in EXPECTED_GUARDS and EXPECTED_GUARDS[k] in msg
            reject = (
                mode == "nonfinite"
                and k in NONFINITE_REJECTS
                and any(m in msg for m in NONFINITE_REJECT_MARKERS)
            )
            results[k] = {
                "status": (
                    "EXPECTED-GUARD"
                    if expected
                    else "EXPECTED-REJECT" if reject else "CRASH"
                ),
                "error": msg[:500],
            }
            if not expected and not reject:
                results[k]["trace"] = traceback.format_exc()[-2000:]
        results[k]["sec"] = round(time.time() - t0, 2)
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--mode", default="empty,one,nulls,skew,zipf,unicode,nonfinite,epoch"
    )
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out-root", default="/tmp/flirt_edge_sweep")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from flirt_consume_spark.queries import REGISTRY
    from flirt_consume_spark.session import get_spark

    keys = sorted(REGISTRY)
    if args.only:
        keys = [k for k in args.only.split(",") if k]

    spark = get_spark()
    report: dict[str, dict] = {}
    rc = 0
    for mode in args.mode.split(","):
        sf_dir = make_degenerate(args.base, args.out_root, mode, args.seed)
        res = run_sweep(spark, sf_dir, keys, mode=mode)
        report[mode] = res
        crashes = {k: v for k, v in res.items() if v["status"] == "CRASH"}
        ok = sum(1 for v in res.values() if v["status"] == "OK")
        print(
            f"[{mode}] OK={ok} EXPECTED-GUARD="
            f"{sum(1 for v in res.values() if v['status'] == 'EXPECTED-GUARD')}"
            f" EXPECTED-REJECT="
            f"{sum(1 for v in res.values() if v['status'] == 'EXPECTED-REJECT')}"
            f" CRASH={len(crashes)}",
            flush=True,
        )
        for k, v in sorted(crashes.items()):
            print(f"  CRASH {k}: {v['error'][:200]}")
            rc = 1
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
