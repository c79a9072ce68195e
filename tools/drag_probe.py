"""Session-drag / cold-rep measurement harness (round 12, VERDICT r11
tasks 2+3). Runs ONE Spark session and records, for every registry
key, wall seconds plus live-JVM heap, cumulative GC time, and loadavg:

1. the 12 alphabetically-first keys twice (cold + warm session-start
   reference),
2. one rep of ALL keys in bench order (the full-session load),
3. the same 12 keys again at session END (position ~273),
4. clearCache + System.gc(), then the 12 keys once more.

late_rerun/early_rep2 per key isolates session-position drag from
host noise; the heap/GC columns attribute (or exonerate) JVM
accumulation. Findings and the round-12 ruling live in BENCH_NOTES.md
("Round-12 session-drag attribution"): no positional drag exists —
the historical in-session inflation was ambient host load.

Usage (solo, nothing else running):
    python tools/drag_probe.py [--sf /root/testdata/sf0.1]
                               [--out /tmp/drag_probe.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/drag_probe.json")
    ap.add_argument("--early", type=int, default=12)
    args = ap.parse_args()

    import bench
    from flirt_consume_spark.queries import REGISTRY
    from flirt_consume_spark.session import get_spark

    spark = get_spark("drag-probe")
    bench.warmup(spark, args.sf)
    jvm = spark.sparkContext._jvm
    rt = jvm.java.lang.Runtime.getRuntime()

    def gc_ms() -> int:
        beans = (
            jvm.java.lang.management.ManagementFactory
            .getGarbageCollectorMXBeans()
        )
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    def heap_mb() -> float:
        return (rt.totalMemory() - rt.freeMemory()) / 1048576.0

    rows: list[dict] = []

    def run(key: str, phase: str) -> None:
        g0, t0 = gc_ms(), time.time()
        try:
            REGISTRY[key].fn(spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            sec = time.time() - t0
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            sec = -1.0
            print(f"# err {key}: {e}", file=sys.stderr)
        rows.append(
            {
                "phase": phase,
                "key": key,
                "sec": round(sec, 3),
                "heap_mb": round(heap_mb(), 1),
                "gc_ms_cum": gc_ms(),
                "gc_ms_delta": gc_ms() - g0,
                "load1": round(os.getloadavg()[0], 2),
            }
        )

    keys = sorted(REGISTRY)
    early = keys[: args.early]
    for k in early:
        run(k, "early_rep1")
    for k in early:
        run(k, "early_rep2")
    for i, k in enumerate(keys):
        run(k, "full_pass")
        if i % 40 == 0:
            print(
                f"# at {i}/{len(keys)} heap={heap_mb():.0f}MB gc={gc_ms()}ms",
                file=sys.stderr,
            )
    for k in early:
        run(k, "late_rerun")
    spark.catalog.clearCache()
    jvm.System.gc()
    time.sleep(2)
    for k in early:
        run(k, "after_gc")
    with open(args.out, "w") as fh:
        json.dump(rows, fh, indent=0)
    print(f"# wrote {len(rows)} rows to {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
