"""Per-round benchmark: times every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {key: sec, ...}, "sf": "..."}

Materialization uses the noop sink (full execution on executors, no
driver-side row transfer), so timings measure the query plan, not
collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.session import get_spark


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    timings: dict[str, float] = {}
    for key in sorted(REGISTRY):
        spec = REGISTRY[key]
        t0 = time.time()
        try:
            materialize(spec.fn(spark, sf_dir))
            timings[key] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[key] = -1.0
            print(f"# bench error {key}: {type(e).__name__}: {e}", file=sys.stderr)
    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
