"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at
the given scale factor, canonicalizes both results, and compares them
exactly — stricter than any order-insensitive hash, so a PASS here
implies a PASS in CORRECTNESS_r{N}.json.

Usage: python tools/check.py [--sf /root/testdata/sf0.01] [keys...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.session import get_spark
from flirt_consume_spark.testing import check_key, duck_connect


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("CHECK_SF", "/root/testdata/sf0.01"))
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    con = duck_connect(args.sf)
    spark = get_spark("check")
    keys = args.keys or list(REGISTRY)
    n_fail = 0
    for key in keys:
        try:
            res = check_key(spark, con, REGISTRY[key], args.sf)
        except Exception as e:  # noqa: BLE001
            res = {"key": key, "status": "ERROR", "error": f"{type(e).__name__}: {e}"}
        if res["status"] not in ("OK", "ROWS_ONLY"):
            n_fail += 1
        print(json.dumps(res, default=str))
    print(f"# {len(keys)} checked, {n_fail} failing")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
