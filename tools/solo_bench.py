"""Solo per-key micro-bench for optimization work (round 12).

Times the given registry keys in one Spark session with the bench's
noop-sink methodology (N interleaved reps, median/min/first), and can
dump `.explain("formatted")` for each key to a directory — the raw
material for plans/r12/<key>_{before,after}.txt.

Usage:
    python tools/solo_bench.py [--sf DIR] [--reps N]
        [--explain-dir plans/r12 --suffix before] key [key ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--clear",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="clearCache() before every rep (default on, matching "
        "bench.py r13): every sample is a true cold invocation — no "
        "CacheManager reuse across reps. --no-clear restores the "
        "legacy warm mode for diagnosis.",
    )
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    spark = get_spark("solo-bench")
    import bench

    bench.warmup(spark, args.sf)

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for key in args.keys:
            df = REGISTRY[key].fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.explain_dir, f"{key}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"# wrote {path}", file=sys.stderr)

    if args.reps <= 0:
        return 0
    samples: dict[str, list[float]] = {k: [] for k in args.keys}
    for _rep in range(args.reps):
        for key in args.keys:
            if args.clear:
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"solo:{key}")
            t0 = time.time()
            bench.materialize(REGISTRY[key].fn(spark, args.sf))
            samples[key].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {}
    for key, vals in samples.items():
        out[key] = {
            "median": round(statistics.median(vals), 3),
            "min": round(min(vals), 3),
            "first": round(vals[0], 3),
            "all": [round(v, 3) for v in vals],
        }
    print(json.dumps({"sf": args.sf, "loadavg": list(os.getloadavg()), "keys": out}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
