"""In-flight pipeline metrics via ``DataFrame.observe`` (S19/ops).

A 100-TB job should not re-scan its input to learn what it just
processed: ``observe`` attaches aggregate METRICS to a plan node and
collects them as a side effect of the action that was running anyway
(rows seen, nulls, violation counts) — the Spark-native version of
accumulator-based row audits, without a second pass and without
accumulator double-counting on task retries (observed metrics are
tied to the query execution, not to task attempts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(df: DataFrame, price_col: str = "o_totalprice"):
    """Attach a standard quality observation to ``df``: row count,
    null count of the price column, and the exact integer-cent sum.
    Returns (observed_df, observation) — run any action on the
    returned frame, then read ``observation.get`` (blocks until the
    action finishes) for the metrics of exactly the rows that flowed
    through this node.
    """
    obs = Observation("quality")
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(price_col).isNull().cast("long")).alias("n_null_price"),
        F.sum(F.floor(F.col(price_col) * 100).cast("long")).alias(
            "sum_cents"
        ),
    )
    return out, obs
