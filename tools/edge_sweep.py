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

Usage:
    python tools/edge_sweep.py [--base /root/testdata/sf0.001]
                               [--only key1,key2] [--mode empty,one]

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
#: Contract for the first entry that lands here: the value must be
#: the guard's raise text VERBATIM (e.g. the exact F.raise_error
#: literal), not a generic substring — the classifier matches by
#: substring, so a loose value like "error" would silently
#: reclassify ANY crash on that key as expected. Pair the entry with
#: a tests/test_edge_sweep.py case asserting a NON-matching
#: exception on the same key still reports CRASH.
EXPECTED_GUARDS: dict[str, str] = {}

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


def make_degenerate(base: str, out_root: str, mode: str) -> str:
    """Write a schema-identical mirror of ``base`` with 0 or 1 rows
    per table. Uses pyarrow directly (no Spark session needed) so the
    mirror build can't perturb the session under test."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(out_root, mode)
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for name in TABLES:
        src = os.path.join(base, f"{name}.parquet")
        tbl = pq.read_table(src)
        if mode == "nulls":
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


def run_sweep(spark, sf_dir: str, keys: list[str]) -> dict:
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
            results[k] = {
                "status": "EXPECTED-GUARD" if expected else "CRASH",
                "error": msg[:500],
            }
            if not expected:
                results[k]["trace"] = traceback.format_exc()[-2000:]
        results[k]["sec"] = round(time.time() - t0, 2)
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default="")
    ap.add_argument("--mode", default="empty,one,nulls,skew")
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
        sf_dir = make_degenerate(args.base, args.out_root, mode)
        res = run_sweep(spark, sf_dir, keys)
        report[mode] = res
        crashes = {k: v for k, v in res.items() if v["status"] == "CRASH"}
        ok = sum(1 for v in res.values() if v["status"] == "OK")
        print(
            f"[{mode}] OK={ok} EXPECTED-GUARD="
            f"{sum(1 for v in res.values() if v['status'] == 'EXPECTED-GUARD')}"
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
