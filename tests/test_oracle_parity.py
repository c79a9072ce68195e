"""Every registered query key must match its DuckDB oracle at sf0.001.

This mirrors the driver's sf0.01 gate (SURVEY.md §5.1) on the smaller
fixture for speed; tools/check.py runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from flirt_consume_spark.queries import REGISTRY
from flirt_consume_spark.testing import check_key

ALL_KEYS = sorted(REGISTRY)


@pytest.mark.parametrize("key", ALL_KEYS)
def test_oracle_parity(spark, duck, sf_dir, key):
    res = check_key(spark, duck, REGISTRY[key], sf_dir)
    assert res["status"] in ("OK", "ROWS_ONLY"), res
    if res["status"] == "ROWS_ONLY":
        assert res["rows"] >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # Every declared oracle key must have a runnable query fn and SQL.
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
