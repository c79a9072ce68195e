"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``flirt_consume_spark/``; every query key maps
to SURVEY.md §2's operator inventory (see queries/*.py docstrings).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flirt_consume_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the J1+A1 enrichment rollup (orders × customer × nation ×
    region → revenue per region/nation), the Spark re-expression of
    the reference's enrich-then-aggregate consume path.
    """
    return REGISTRY["join_enrich"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: spec.fn for key, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return {
        key: spec.oracle for key, spec in REGISTRY.items() if spec.oracle is not None
    }
